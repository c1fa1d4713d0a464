"""Interactive demo app: generate / pose-interpolate / style-mix / upscale.

The product surface of the reference Streamlit app (app.py:99-409) rebuilt on
the stdlib http.server (this image has no streamlit/gradio): a single-page UI
posting JSON to /api/*, the model served by the same fully-jitted pipelines
the CLI uses. Poses come from precomputed SMPL pickles in a pose cache dir
(reference app_cache/pose/*), styles from a DeepFashionSample-style dataset
dir; per-slot text overrides swap CLIP image embeddings for pooled text
embeddings exactly like mix_style (generate_utils.py:172-190).

    python -m upgpt_tpu.app --base configs/deepfashion/interp_256.yaml \
        --ckpt logs/run/checkpoints/best --port 7860

Without CLIP weights it falls back to the debug encoder (clearly labeled) so
the UI and plumbing remain demonstrable in weightless environments.
"""

from __future__ import annotations

import argparse
import base64
import io
import json
import pickle
import sys
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from pathlib import Path
from typing import Dict, Optional

import numpy as np

from upgpt_tpu.inference.pipeline import (
    STYLE_NAMES, GenerationPipeline, UpscalePipeline, interpolate_masks,
    interpolate_smpl, mix_style,
)

_PAGE = """<!doctype html>
<html><head><title>upgpt-tpu demo</title><style>
body{font-family:sans-serif;max-width:900px;margin:2em auto}
img{image-rendering:pixelated;border:1px solid #ccc;margin:4px}
textarea,input{width:100%%}button{padding:.5em 1.5em;margin:.5em 0}
.row{display:flex;gap:1em}.col{flex:1}</style></head><body>
<h2>upgpt-tpu — person image generation %(mode)s</h2>
<div class=row><div class=col>
<label>Caption</label><textarea id=txt rows=2>a woman wearing a red dress</textarea>
<label>Style text overrides (JSON slot-&gt;text)</label>
<textarea id=styles rows=2>{}</textarea>
<label>Pose id</label><input id=pose value="0">
<label>Frames (pose interpolation; 1 = single)</label><input id=frames value="1">
<label>Steps</label><input id=steps value="50">
<label>Sampler</label><select id=sampler>
<option value="ddim">ddim</option><option value="dpm++">dpm++ (fast, ~20 steps)</option><option value="unipc">unipc (fastest, ~10 steps)</option>
</select>
<button onclick="gen()">Generate</button>
<button onclick="up()">Upscale last</button>
</div><div class=col id=out></div></div>
<script>
async function call(ep, body){
  const r = await fetch(ep,{method:'POST',body:JSON.stringify(body)});
  const j = await r.json();
  if(j.error){alert(j.error);return}
  document.getElementById('out').innerHTML =
    j.images.map(s=>`<img src="data:image/png;base64,${s}">`).join('');
}
function gen(){call('/api/generate',{txt:document.getElementById('txt').value,
  style_texts:JSON.parse(document.getElementById('styles').value||'{}'),
  pose:document.getElementById('pose').value,
  frames:+document.getElementById('frames').value,
  steps:+document.getElementById('steps').value,
  sampler:document.getElementById('sampler').value})}
function up(){call('/api/upscale',{})}
</script></body></html>"""


class DemoState:
    def __init__(self, model, params, encoder, pose_dir: Optional[str],
                 steps: int = 50):
        self.model = model
        self.params = params
        self.encoder = encoder
        self.pose_dir = Path(pose_dir) if pose_dir else None
        self.pipes: Dict[tuple, GenerationPipeline] = {}
        self.last_sample: Optional[np.ndarray] = None
        self.upscale: Optional[UpscalePipeline] = None
        self.upscale_params = None
        self._key_counter = 0

    def pipe(self, steps: int, sampler: str = "ddim") -> GenerationPipeline:
        key = (steps, sampler)
        if key not in self.pipes:
            self.pipes[key] = GenerationPipeline(
                self.model, num_steps=steps, eta=1.0, sampler=sampler)
        return self.pipes[key]

    def load_pose(self, pose_id: str):
        h, w = self.model.config.latent_size
        if self.pose_dir and (self.pose_dir / f"{pose_id}.p").exists():
            with open(self.pose_dir / f"{pose_id}.p", "rb") as f:
                p = pickle.load(f)
            smpl = np.concatenate([
                np.asarray(p[0]["pred_body_pose"], np.float32).reshape(1, -1),
                np.asarray(p[0]["pred_betas"], np.float32).reshape(1, -1),
                np.asarray(p[0]["pred_camera"], np.float32).reshape(1, -1),
            ], 1)
            mask_png = self.pose_dir / f"{pose_id}_mask.png"
            if mask_png.exists():
                from PIL import Image

                from upgpt_tpu.data.transforms import (
                    mask_transform_binary, silhouette_bbox,
                )
                m = silhouette_bbox(np.asarray(Image.open(mask_png)))
                mask = mask_transform_binary(m, (h, w))
            else:
                mask = self._default_mask(h, w)
            return smpl, mask
        # deterministic fallback pose
        rng = np.random.default_rng(abs(hash(pose_id)) % 2**31)
        return (rng.normal(size=(1, 85)).astype(np.float32) * 0.2,
                self._default_mask(h, w))

    @staticmethod
    def _default_mask(h, w):
        m = np.full((h, w, 1), -1.0, np.float32)
        m[h // 8 : -h // 8, w // 6 : -w // 6] = -0.99215686
        return m

    def generate(self, req: Dict) -> np.ndarray:
        import jax

        frames = max(1, int(req.get("frames", 1)))
        steps = int(req.get("steps", 50))
        sampler = str(req.get("sampler", "ddim"))  # "ddim" | "dpm++" | "unipc"
        txt = [req.get("txt", "")]
        text_emb = np.asarray(self.encoder.text_hidden(txt))

        # style embeddings: empty style stack + optional per-slot text override
        style_emb = np.zeros((1, len(STYLE_NAMES), text_emb.shape[-1]), np.float32)
        overrides = req.get("style_texts") or {}
        if overrides:
            texts = [overrides.get(n, "") for n in STYLE_NAMES]
            pooled = np.asarray(self.encoder.text_pooled(texts))[None]
            flags = [bool(overrides.get(n)) for n in STYLE_NAMES]
            style_emb = np.asarray(mix_style(style_emb, pooled, flags))

        smpl, mask = self.load_pose(str(req.get("pose", "0")))
        if frames > 1:
            smpl2, mask2 = self.load_pose(str(req.get("pose2", "1")))
            alphas = np.linspace(1.0, 0.0, frames).astype(np.float32)
            smpl_b = np.asarray(interpolate_smpl(smpl, smpl2, alphas))
            mask_b = interpolate_masks(mask, mask2, alphas)
        else:
            smpl_b, mask_b = smpl[None], mask[None]

        batch = {
            "text_emb": np.repeat(text_emb, frames, 0),
            "style_emb": np.repeat(style_emb, frames, 0),
            "smpl": smpl_b.reshape(frames, 1, -1),
            "person_mask": mask_b,
        }
        self._key_counter += 1
        imgs = self.pipe(steps, sampler).generate(
            self.params, {k: np.asarray(v) for k, v in batch.items()},
            jax.random.PRNGKey(self._key_counter), shared_x_T=frames > 1,
        )
        self.last_sample = np.asarray(imgs)
        return self.last_sample


def _png_b64(img: np.ndarray) -> str:
    from PIL import Image

    arr = np.clip((img + 1) / 2, 0, 1)
    buf = io.BytesIO()
    Image.fromarray((arr * 255).astype(np.uint8)).save(buf, "PNG")
    return base64.b64encode(buf.getvalue()).decode()


def make_handler(state: DemoState, mode_label: str):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def _json(self, payload, code=200):
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            body = (_PAGE % {"mode": mode_label}).encode()
            self.send_response(200)
            self.send_header("Content-Type", "text/html")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_POST(self):
            try:
                n = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(n) or b"{}")
                if self.path == "/api/generate":
                    imgs = state.generate(req)
                    self._json({"images": [_png_b64(i) for i in imgs]})
                elif self.path == "/api/upscale":
                    if state.last_sample is None or state.upscale is None:
                        raise RuntimeError(
                            "no previous sample or no upscale model configured"
                        )
                    import jax

                    out = state.upscale.upscale(
                        state.upscale_params,
                        np.asarray(state.last_sample),
                        np.asarray(state.encoder.text_hidden([""])),
                        None, jax.random.PRNGKey(0),
                    )
                    self._json({"images": [_png_b64(i) for i in np.asarray(out)]})
                else:
                    self._json({"error": f"unknown endpoint {self.path}"}, 404)
            except Exception as e:  # surfaces errors to the UI
                self._json({"error": f"{type(e).__name__}: {e}"}, 500)

    return Handler


def main(argv=None):
    p = argparse.ArgumentParser("upgpt_tpu.app")
    p.add_argument("--base", nargs="*", default=[])
    p.add_argument("--ckpt", default=None)
    p.add_argument("--pose-dir", default=None)
    p.add_argument("--port", type=int, default=7860)
    args = p.parse_args(argv)

    from upgpt_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()
    from upgpt_tpu.cli import _build_cond_encoder, _restore_params
    from upgpt_tpu.config import instantiate_from_config, merge_configs

    cfg = merge_configs(args.base) if args.base else {
        "model": {"target": "upgpt_tpu.zoo.build_latent_diffusion",
                  "params": {"variant": "tiny", "use_flash_attention": False}}
    }
    model = instantiate_from_config(cfg["model"])
    if args.ckpt:
        params = _restore_params(model, args.ckpt)
        mode = ""
    else:
        import jax

        params = model.init_params(jax.random.PRNGKey(0))
        mode = "(RANDOM WEIGHTS — demo plumbing only)"
    encoder = _build_cond_encoder(cfg, model, allow_debug=True)
    state = DemoState(model, params, encoder, args.pose_dir)

    server = ThreadingHTTPServer(("0.0.0.0", args.port), make_handler(state, mode))
    print(f"upgpt-tpu demo on http://localhost:{args.port} {mode}", file=sys.stderr)
    server.serve_forever()


if __name__ == "__main__":
    main()

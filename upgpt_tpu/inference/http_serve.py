"""Production HTTP endpoint over the batching ServingEngine.

`cli serve` stands this up as a deployable daemon (the reference's only
interactive surface is the Streamlit demo, app.py:99-409 — it runs one
request at a time; here concurrent HTTP requests batch into full
static-shape device programs through `inference.serving.ServingEngine`).

Endpoints (JSON in/out):

- `POST /v1/generate` — one request, one image.
  Production contract: raw conditioning embeddings
      {"text_emb": [[...77x768]], "style_emb": [[...9x768]],
       "smpl": [[...1x85]], "person_mask": [[[...HxWx1]]]}
  Convenience contract (needs a conditioning encoder): {"txt": "..."}
  plus any of the raw fields; missing fields default to the encoder's
  empty-style embeddings / zero smpl / centered bbox mask.
  Response: {"image_b64": <png>, "latency_s": ...}.
- `GET /v1/stats` — engine stats (requests, occupancy, p50/p95 latency).
- `GET /healthz` — liveness.

Each HTTP worker thread blocks on its request's Future, so concurrency
across clients is exactly the engine's batching window. Images return as
base64 PNG; the engine's uint8 output path keeps the device->host
transfer at 1 byte/px.
"""

from __future__ import annotations

import base64
import io
import json
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Dict, Optional, Tuple

import numpy as np

MASK_BG = -1.0
MASK_BOX = -0.99215686


def default_person_mask(h: int, w: int) -> np.ndarray:
    """Centered bbox at the reference's fill constants (app default)."""
    m = np.full((h, w, 1), MASK_BG, np.float32)
    m[h // 8 : -h // 8, w // 6 : -w // 6] = MASK_BOX
    return m


def _png_b64(img: np.ndarray) -> str:
    from PIL import Image

    if img.dtype != np.uint8:
        img = (np.clip((img.astype(np.float32) + 1) / 2, 0, 1) * 255).astype(
            np.uint8
        )
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, "PNG")
    return base64.b64encode(buf.getvalue()).decode()


class RequestBuilder:
    """Turn a JSON payload into the engine's per-sample conditioning."""

    def __init__(
        self,
        encoder,
        mask_hw: Tuple[int, int],
        context_dim: int = 768,
        text_len: int = 77,
        num_styles: int = 9,
        pose_dim: Optional[int] = 85,
    ):
        self.encoder = encoder
        self.mask_hw = mask_hw
        self.context_dim = context_dim
        self.text_len = text_len
        self.num_styles = num_styles
        self.pose_dim = pose_dim

    def build(self, req: Dict) -> Dict[str, np.ndarray]:
        cond: Dict[str, np.ndarray] = {}
        if "text_emb" in req:
            cond["text_emb"] = np.asarray(req["text_emb"], np.float32)
        elif self.encoder is not None:
            cond["text_emb"] = np.asarray(
                self.encoder.text_hidden([req.get("txt", "")])
            )[0]
        else:
            raise ValueError("text_emb required (no conditioning encoder)")
        if cond["text_emb"].shape != (self.text_len, self.context_dim):
            raise ValueError(
                f"text_emb must be ({self.text_len}, {self.context_dim}), "
                f"got {cond['text_emb'].shape}"
            )
        if "style_emb" in req:
            cond["style_emb"] = np.asarray(req["style_emb"], np.float32)
            if cond["style_emb"].shape != (self.num_styles, self.context_dim):
                raise ValueError(
                    f"style_emb must be ({self.num_styles}, "
                    f"{self.context_dim}), got {cond['style_emb'].shape}"
                )
        else:
            cond["style_emb"] = np.zeros(
                (self.num_styles, self.context_dim), np.float32
            )
        if self.pose_dim:
            cond["smpl"] = (
                np.asarray(req["smpl"], np.float32).reshape(1, self.pose_dim)
                if "smpl" in req
                else np.zeros((1, self.pose_dim), np.float32)
            )
        if "person_mask" in req:
            cond["person_mask"] = np.asarray(req["person_mask"], np.float32)
            if cond["person_mask"].ndim == 2:
                cond["person_mask"] = cond["person_mask"][..., None]
            # a wrong-shape mask must 400 here, not fail the whole device
            # batch it gets padded into
            if cond["person_mask"].shape != (*self.mask_hw, 1):
                raise ValueError(
                    f"person_mask must be {(*self.mask_hw, 1)}, "
                    f"got {cond['person_mask'].shape}"
                )
        else:
            cond["person_mask"] = default_person_mask(*self.mask_hw)
        return cond


def make_serve_handler(engine, builder: RequestBuilder, timeout_s: float = 600.0):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet; stats live at /v1/stats
            pass

        def _json(self, payload, code=200):
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._json({"ok": True})
            elif self.path == "/v1/stats":
                self._json(engine.stats.summary())
            else:
                self._json({"error": f"unknown endpoint {self.path}"}, 404)

        def do_POST(self):
            if self.path != "/v1/generate":
                self._json({"error": f"unknown endpoint {self.path}"}, 404)
                return
            try:
                n = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(n) or b"{}")
                cond = builder.build(req)
            except (ValueError, KeyError, json.JSONDecodeError) as e:
                self._json({"error": f"{type(e).__name__}: {e}"}, 400)
                return
            t0 = time.perf_counter()
            try:
                img = engine.submit(cond).result(timeout=timeout_s)
            except Exception as e:  # noqa: BLE001 — surface batch failures
                self._json({"error": f"{type(e).__name__}: {e}"}, 500)
                return
            self._json({
                "image_b64": _png_b64(np.asarray(img)),
                "latency_s": round(time.perf_counter() - t0, 4),
            })

    return Handler


def serve(engine, builder: RequestBuilder, port: int = 8000,
          host: str = "0.0.0.0", timeout_s: float = 600.0) -> ThreadingHTTPServer:
    """Build the threading HTTP server (caller runs serve_forever)."""
    return ThreadingHTTPServer(
        (host, port), make_serve_handler(engine, builder, timeout_s=timeout_s))

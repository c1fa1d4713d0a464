"""CLIP checkpoint converters: HF transformers and openai-clip -> flax trees.

Two upstream formats exist in the reference's dependency set:
- HF `CLIPTextModel` (openai/clip-vit-large-patch14) — used by
  FrozenCLIPEmbedder (modules.py:137-162) and the laion CLIPModel variant.
- openai-clip `CLIP` state dicts (ViT-L/14 jit=False) — used by
  FrozenCLIPTextEmbedder / FrozenClipImageEmbedder2; attention is packed
  (in_proj_weight = [q; k; v]).

Both map onto models.clip.CLIPTextTower / CLIPVisionTower.
"""

from __future__ import annotations

from typing import Dict, Mapping

import numpy as np

Array = np.ndarray
StateDict = Mapping[str, Array]


def _np(t) -> Array:
    if isinstance(t, np.ndarray):
        return t
    return t.detach().cpu().float().numpy()


def _dense(sd, w, b=None) -> Dict[str, Array]:
    out = {"kernel": np.ascontiguousarray(_np(sd[w]).T)}
    if b is not None and b in sd:
        out["bias"] = _np(sd[b])
    return out


def _ln(sd, prefix) -> Dict[str, Array]:
    return {"scale": _np(sd[f"{prefix}.weight"]), "bias": _np(sd[f"{prefix}.bias"])}


def convert_hf_clip_text(sd: StateDict, num_layers: int = 12) -> Dict:
    """HF CLIPTextModel(.text_model) state_dict -> CLIPTextTower params."""
    p = "text_model." if any(k.startswith("text_model.") for k in sd) else ""
    params: Dict = {
        "token_embedding": {
            "embedding": _np(sd[f"{p}embeddings.token_embedding.weight"])
        },
        "position_embedding": _np(sd[f"{p}embeddings.position_embedding.weight"]),
        "ln_final": _ln(sd, f"{p}final_layer_norm"),
    }
    for i in range(num_layers):
        lp = f"{p}encoder.layers.{i}"
        params[f"block_{i}"] = {
            "attn": {
                "q_proj": _dense(sd, f"{lp}.self_attn.q_proj.weight", f"{lp}.self_attn.q_proj.bias"),
                "k_proj": _dense(sd, f"{lp}.self_attn.k_proj.weight", f"{lp}.self_attn.k_proj.bias"),
                "v_proj": _dense(sd, f"{lp}.self_attn.v_proj.weight", f"{lp}.self_attn.v_proj.bias"),
                "out_proj": _dense(sd, f"{lp}.self_attn.out_proj.weight", f"{lp}.self_attn.out_proj.bias"),
            },
            "ln1": _ln(sd, f"{lp}.layer_norm1"),
            "ln2": _ln(sd, f"{lp}.layer_norm2"),
            "fc1": _dense(sd, f"{lp}.mlp.fc1.weight", f"{lp}.mlp.fc1.bias"),
            "fc2": _dense(sd, f"{lp}.mlp.fc2.weight", f"{lp}.mlp.fc2.bias"),
        }
    if "text_projection.weight" in sd:
        params["text_projection"] = np.ascontiguousarray(
            _np(sd["text_projection.weight"]).T
        )
    else:
        # bare CLIPTextModel has no projection; identity keeps pooled usable
        d = params["position_embedding"].shape[1]
        params["text_projection"] = np.eye(d, dtype=np.float32)
    return params


def _openai_block(sd: StateDict, lp: str, width: int) -> Dict:
    """openai-clip residual block with packed qkv."""
    w = _np(sd[f"{lp}.attn.in_proj_weight"])  # (3w, w)
    b = _np(sd[f"{lp}.attn.in_proj_bias"])
    qw, kw, vw = np.split(w, 3, axis=0)
    qb, kb, vb = np.split(b, 3, axis=0)
    t = lambda m: np.ascontiguousarray(m.T)
    return {
        "attn": {
            "q_proj": {"kernel": t(qw), "bias": qb},
            "k_proj": {"kernel": t(kw), "bias": kb},
            "v_proj": {"kernel": t(vw), "bias": vb},
            "out_proj": _dense(sd, f"{lp}.attn.out_proj.weight", f"{lp}.attn.out_proj.bias"),
        },
        "ln1": _ln(sd, f"{lp}.ln_1"),
        "ln2": _ln(sd, f"{lp}.ln_2"),
        "fc1": _dense(sd, f"{lp}.mlp.c_fc.weight", f"{lp}.mlp.c_fc.bias"),
        "fc2": _dense(sd, f"{lp}.mlp.c_proj.weight", f"{lp}.mlp.c_proj.bias"),
    }


def convert_openai_clip_text(sd: StateDict, num_layers: int = 12) -> Dict:
    """openai-clip CLIP state dict (text side) -> CLIPTextTower params."""
    width = _np(sd["positional_embedding"]).shape[1]
    params: Dict = {
        "token_embedding": {"embedding": _np(sd["token_embedding.weight"])},
        "position_embedding": _np(sd["positional_embedding"]),
        "ln_final": _ln(sd, "ln_final"),
        "text_projection": _np(sd["text_projection"]),
    }
    for i in range(num_layers):
        params[f"block_{i}"] = _openai_block(sd, f"transformer.resblocks.{i}", width)
    return params


def convert_openai_clip_vision(sd: StateDict, num_layers: int = 24) -> Dict:
    """openai-clip CLIP state dict (visual side) -> CLIPVisionTower params."""
    conv_w = _np(sd["visual.conv1.weight"])  # (width, 3, P, P) no bias
    params: Dict = {
        "patch_embedding": {"kernel": np.ascontiguousarray(conv_w.transpose(2, 3, 1, 0))},
        "class_embedding": _np(sd["visual.class_embedding"]),
        "position_embedding": _np(sd["visual.positional_embedding"]),
        "ln_pre": _ln(sd, "visual.ln_pre"),
        "ln_post": _ln(sd, "visual.ln_post"),
        "visual_projection": _np(sd["visual.proj"]),
    }
    width = params["class_embedding"].shape[0]
    for i in range(num_layers):
        params[f"block_{i}"] = _openai_block(
            sd, f"visual.transformer.resblocks.{i}", width
        )
    return params


def convert_hf_clip_vision(sd: StateDict, num_layers: int = 24) -> Dict:
    """HF CLIPVisionModel(.vision_model) state_dict -> CLIPVisionTower params."""
    p = "vision_model." if any(k.startswith("vision_model.") for k in sd) else ""
    conv_w = _np(sd[f"{p}embeddings.patch_embedding.weight"])
    params: Dict = {
        "patch_embedding": {"kernel": np.ascontiguousarray(conv_w.transpose(2, 3, 1, 0))},
        "class_embedding": _np(sd[f"{p}embeddings.class_embedding"]),
        "position_embedding": _np(sd[f"{p}embeddings.position_embedding.weight"]),
        "ln_pre": _ln(sd, f"{p}pre_layrnorm"),  # sic: HF's misspelled key
        "ln_post": _ln(sd, f"{p}post_layernorm"),
    }
    for i in range(num_layers):
        lp = f"{p}encoder.layers.{i}"
        params[f"block_{i}"] = {
            "attn": {
                "q_proj": _dense(sd, f"{lp}.self_attn.q_proj.weight", f"{lp}.self_attn.q_proj.bias"),
                "k_proj": _dense(sd, f"{lp}.self_attn.k_proj.weight", f"{lp}.self_attn.k_proj.bias"),
                "v_proj": _dense(sd, f"{lp}.self_attn.v_proj.weight", f"{lp}.self_attn.v_proj.bias"),
                "out_proj": _dense(sd, f"{lp}.self_attn.out_proj.weight", f"{lp}.self_attn.out_proj.bias"),
            },
            "ln1": _ln(sd, f"{lp}.layer_norm1"),
            "ln2": _ln(sd, f"{lp}.layer_norm2"),
            "fc1": _dense(sd, f"{lp}.mlp.fc1.weight", f"{lp}.mlp.fc1.bias"),
            "fc2": _dense(sd, f"{lp}.mlp.fc2.weight", f"{lp}.mlp.fc2.bias"),
        }
    if "visual_projection.weight" in sd:
        params["visual_projection"] = np.ascontiguousarray(
            _np(sd["visual_projection.weight"]).T
        )
    else:
        width = params["class_embedding"].shape[0]
        params["visual_projection"] = np.eye(width, dtype=np.float32)[:, :768].copy()
    return params

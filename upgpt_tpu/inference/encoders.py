"""Conditioning encoders: raw batch (txt strings, style images, smpl) ->
embedding batch for LatentDiffusion.

Mirrors the reference's frozen cond stages (encoders/modules.py): the text
tower produces the 77x768 last_hidden_state (FrozenCLIPEmbedder), the vision
tower pools each of the 9 style slots (FrozenClipImageEmbedder2), and the
pooled text tower supplies per-slot overrides for style mixing
(FrozenCLIPTextEmbedder, normalize=False at inference).

`CLIPConditioningEncoder` needs converted CLIP weights + the BPE merges file;
`DebugConditioningEncoder` is a deterministic stand-in (seeded-hash
embeddings) so training/sampling smoke runs work in weightless environments —
clearly NOT parity, and it says so loudly.
"""

from __future__ import annotations

import hashlib
from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from upgpt_tpu.data.tokenizer import CLIPTokenizer
from upgpt_tpu.models.clip import (
    CLIPTextConfig, CLIPTextTower, CLIPVisionConfig, StyleImageEncoder,
)


class CLIPConditioningEncoder:
    """Frozen CLIP text + style-image encoding, jitted once per batch shape."""

    def __init__(
        self,
        text_params,
        vision_params,
        tokenizer: CLIPTokenizer,
        text_config: Optional[CLIPTextConfig] = None,
        vision_config: Optional[CLIPVisionConfig] = None,
    ):
        self.tokenizer = tokenizer
        self.text_tower = CLIPTextTower(text_config or CLIPTextConfig())
        self.style_encoder = StyleImageEncoder(vision_config or CLIPVisionConfig())
        self.text_params = text_params
        self.vision_params = vision_params
        self._encode_text = jax.jit(
            lambda p, ids: self.text_tower.apply({"params": p}, ids)
        )
        self._encode_styles = jax.jit(
            lambda p, imgs: self.style_encoder.apply({"params": {"vision": p}}, imgs)
        )

    def text_hidden(self, texts: Sequence[str]) -> jax.Array:
        ids = jnp.asarray(self.tokenizer(list(texts)))
        hidden, _ = self._encode_text(self.text_params, ids)
        return hidden

    def text_pooled(self, texts: Sequence[str]) -> jax.Array:
        ids = jnp.asarray(self.tokenizer(list(texts)))
        _, pooled = self._encode_text(self.text_params, ids)
        return pooled

    def style_embeddings(self, styles: jax.Array) -> jax.Array:
        """(B, 9, 224, 224, 3) CLIP-normalized -> (B, 9, 768)."""
        return self._encode_styles(self.vision_params, jnp.asarray(styles))

    def encode_batch(self, batch: Dict) -> Dict:
        out = dict(batch)
        out["text_emb"] = self.text_hidden(batch["txt"])
        if "styles" in batch:
            out["style_emb"] = self.style_embeddings(batch["styles"])
        return out


class DebugConditioningEncoder:
    """Deterministic hash-based embeddings — smoke runs only, NOT parity."""

    def __init__(self, context_dim: int = 768, text_len: int = 77):
        self.context_dim = context_dim
        self.text_len = text_len

    def _emb(self, key: str, shape) -> np.ndarray:
        seed = int.from_bytes(hashlib.sha256(key.encode()).digest()[:4], "little")
        return np.random.default_rng(seed).normal(size=shape).astype(np.float32) * 0.1

    def text_hidden(self, texts: Sequence[str]) -> np.ndarray:
        return np.stack([self._emb(t, (self.text_len, self.context_dim)) for t in texts])

    def text_pooled(self, texts: Sequence[str]) -> np.ndarray:
        return np.stack([self._emb("pool:" + t, (self.context_dim,)) for t in texts])

    def style_embeddings(self, styles) -> np.ndarray:
        styles = np.asarray(styles)
        b, n = styles.shape[:2]
        flat = styles.reshape(b, n, -1)
        # reduce each slot deterministically to a pseudo-embedding
        rng = np.random.default_rng(0)
        proj = rng.normal(size=(flat.shape[-1], self.context_dim)).astype(np.float32)
        return (flat @ proj / np.sqrt(flat.shape[-1])).astype(np.float32) * 0.1

    def encode_batch(self, batch: Dict) -> Dict:
        out = dict(batch)
        out["text_emb"] = self.text_hidden(batch["txt"])
        if "styles" in batch:
            out["style_emb"] = self.style_embeddings(batch["styles"])
        return out

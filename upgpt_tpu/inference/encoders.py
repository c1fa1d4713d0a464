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


def _dequant_styles(imgs):
    """uint8 compact-pipeline style crops -> CLIP-normalized float32,
    ON DEVICE (runs inside the jitted encoder). Same arithmetic as
    transforms.clip_normalize_image; exact for uint8-sourced crops, and
    the uint8 zero slot reproduces normalize(black) == empty_style."""
    if imgs.dtype != jnp.uint8:
        return imgs
    from upgpt_tpu.data.transforms import CLIP_MEAN, CLIP_STD

    return (imgs.astype(jnp.float32) / 255.0
            - jnp.asarray(CLIP_MEAN)) / jnp.asarray(CLIP_STD)


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
            lambda p, imgs: self.style_encoder.apply(
                {"params": {"vision": p}}, _dequant_styles(imgs))
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
        self._proj_cache: dict = {}
        # memoization: the encoder is a frozen deterministic function, so
        # caching by input identity is exact; captions/styles repeat heavily
        # across epochs, and without the cache the per-step encode is the
        # dominant host cost of the train loop (measured 42-120 ms/batch)
        self._text_cache: dict = {}
        self._style_cache: dict = {}

    def _emb(self, key: str, shape) -> np.ndarray:
        seed = int.from_bytes(hashlib.sha256(key.encode()).digest()[:4], "little")
        return np.random.default_rng(seed).normal(size=shape).astype(np.float32) * 0.1

    def text_hidden(self, texts: Sequence[str]) -> np.ndarray:
        out = []
        for t in texts:
            e = self._text_cache.get(t)
            if e is None:
                e = self._emb(t, (self.text_len, self.context_dim))
                # text entries are (77, 768) f32 = ~236 KB each; cap the
                # cache by BYTES these imply (~240 MB), not a huge count
                if len(self._text_cache) < 1024:
                    self._text_cache[t] = e
            out.append(e)
        return np.stack(out)

    def text_pooled(self, texts: Sequence[str]) -> np.ndarray:
        return np.stack([self._emb("pool:" + t, (self.context_dim,)) for t in texts])

    def style_embeddings(self, styles) -> np.ndarray:
        styles = np.asarray(styles)
        b, n = styles.shape[:2]
        # deterministic pseudo-embedding: spatially subsample FIRST (8x8
        # stride — pixel detail is irrelevant for a smoke encoder), then a
        # CACHED random projection. The original regenerated a full
        # (150528, 768) gaussian every call: ~60 s/batch, which serialized
        # the whole train loop behind the conditioning encode.
        sub = styles[:, :, ::8, ::8, :]
        if sub.dtype == np.uint8:
            # compact pipeline: same normalization the CLIP path applies,
            # so debug embeddings agree across the two dataset formats
            from upgpt_tpu.data.transforms import CLIP_MEAN, CLIP_STD

            sub = (sub.astype(np.float32) / 255.0 - CLIP_MEAN) / CLIP_STD
        flat = np.ascontiguousarray(sub, dtype=np.float32).reshape(b, n, -1)
        proj = self._proj_cache.get(flat.shape[-1])
        if proj is None:
            proj = np.random.default_rng(0).normal(
                size=(flat.shape[-1], self.context_dim)).astype(np.float32)
            self._proj_cache[flat.shape[-1]] = proj
        scale = np.float32(0.1 / np.sqrt(flat.shape[-1]))
        out = np.empty((b, n, self.context_dim), np.float32)
        for i in range(b):
            for j in range(n):
                key = hashlib.sha1(flat[i, j].tobytes()).digest()
                e = self._style_cache.get(key)
                if e is None:
                    e = (flat[i, j] @ proj) * scale
                    if len(self._style_cache) < 32768:  # 3 KB each, ~100 MB
                        self._style_cache[key] = e
                out[i, j] = e
        return out

    def encode_batch(self, batch: Dict) -> Dict:
        out = dict(batch)
        out["text_emb"] = self.text_hidden(batch["txt"])
        if "styles" in batch:
            out["style_emb"] = self.style_embeddings(batch["styles"])
        return out

"""CLIP text + vision towers in flax — the frozen conditioning encoders.

The reference uses three CLIP entry points (ldm/modules/encoders/modules.py):
- FrozenCLIPEmbedder (137-162): HF `openai/clip-vit-large-patch14` text model,
  returns the 77x768 last_hidden_state — the main `cond_stage` for every
  released model.
- FrozenCLIPTextEmbedder (165-198): openai-clip ViT-L/14 text tower, returns
  the POOLED text feature (EOS token -> ln_final -> text_projection); used
  per style slot for text->style overrides (normalize=False at inference,
  generate_utils.py:133-135).
- FrozenClipImageEmbedder2 (234-256): openai-clip ViT-L/14 image tower over
  the (B, 9, 3, 224, 224) style stack -> (B, 9, 768) pooled embeddings.

Both HF CLIPTextModel and openai-clip share the same architecture: byte-BPE
tokens -> embed + learned positions -> pre-LN transformer with causal mask ->
final LN; pooled = hidden state at the EOS position (argmax of token ids)
projected by text_projection. ViT: 14x14 patch conv -> class token + learned
positions -> ln_pre -> pre-LN transformer (no mask) -> ln_post on class token
-> visual projection. Activation is QuickGELU for the openai checkpoints and
exact GELU for the laion ones (CLIPTextImageCrossAtten's tower) — config flag.

TPU notes: tokens are tiny; the towers are pure MXU matmul chains, run in
bf16 with fp32 LayerNorms. Weight loading happens through
upgpt_tpu.convert.clip_weights; no torch/transformers import here.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

Dtype = jnp.dtype


@dataclasses.dataclass(frozen=True)
class CLIPTextConfig:
    vocab_size: int = 49408
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    mlp_ratio: int = 4
    max_positions: int = 77
    quick_gelu: bool = True  # openai ckpts; laion uses exact gelu
    projection_dim: int = 768
    dtype: Dtype = jnp.float32


@dataclasses.dataclass(frozen=True)
class CLIPVisionConfig:
    image_size: int = 224
    patch_size: int = 14
    hidden_size: int = 1024
    num_layers: int = 24
    num_heads: int = 16
    mlp_ratio: int = 4
    quick_gelu: bool = True
    projection_dim: int = 768
    dtype: Dtype = jnp.float32


def _act(x: jax.Array, quick: bool) -> jax.Array:
    if quick:
        return x * jax.nn.sigmoid(1.702 * x)
    return jax.nn.gelu(x, approximate=False)


class CLIPAttention(nn.Module):
    hidden: int
    heads: int
    dtype: Dtype

    @nn.compact
    def __call__(self, x, causal_mask: Optional[jax.Array] = None):
        b, t, c = x.shape
        d = self.hidden // self.heads
        q = nn.Dense(self.hidden, dtype=self.dtype, name="q_proj")(x)
        k = nn.Dense(self.hidden, dtype=self.dtype, name="k_proj")(x)
        v = nn.Dense(self.hidden, dtype=self.dtype, name="v_proj")(x)
        q = q.reshape(b, t, self.heads, d) * (d**-0.5)
        k = k.reshape(b, t, self.heads, d)
        v = v.reshape(b, t, self.heads, d)
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
        if causal_mask is not None:
            scores = scores + causal_mask
        probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(b, t, c)
        return nn.Dense(self.hidden, dtype=self.dtype, name="out_proj")(out)


class CLIPBlock(nn.Module):
    hidden: int
    heads: int
    mlp_ratio: int
    quick_gelu: bool
    dtype: Dtype

    @nn.compact
    def __call__(self, x, causal_mask=None):
        ln = lambda name: nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name=name)
        h = ln("ln1")(x).astype(x.dtype)
        x = x + CLIPAttention(self.hidden, self.heads, self.dtype, name="attn")(
            h, causal_mask
        )
        h = ln("ln2")(x).astype(x.dtype)
        h = nn.Dense(self.hidden * self.mlp_ratio, dtype=self.dtype, name="fc1")(h)
        h = _act(h, self.quick_gelu)
        h = nn.Dense(self.hidden, dtype=self.dtype, name="fc2")(h)
        return x + h


class CLIPTextTower(nn.Module):
    """Returns (last_hidden_state, pooled_projected)."""

    config: CLIPTextConfig

    @nn.compact
    def __call__(self, token_ids: jax.Array):
        cfg = self.config
        b, t = token_ids.shape
        tok = nn.Embed(cfg.vocab_size, cfg.hidden_size, dtype=cfg.dtype,
                       name="token_embedding")(token_ids)
        pos = self.param(
            "position_embedding",
            nn.initializers.normal(0.01),
            (cfg.max_positions, cfg.hidden_size),
        )
        x = tok + pos[None, :t].astype(tok.dtype)
        # additive causal mask in fp32 score space
        neg = jnp.finfo(jnp.float32).min
        causal = jnp.triu(jnp.full((t, t), neg, jnp.float32), k=1)[None, None]
        for i in range(cfg.num_layers):
            x = CLIPBlock(
                cfg.hidden_size, cfg.num_heads, cfg.mlp_ratio, cfg.quick_gelu,
                cfg.dtype, name=f"block_{i}",
            )(x, causal)
        x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="ln_final")(x)
        x = x.astype(jnp.float32)
        # pooled: hidden state at EOS (= argmax token id), projected
        eos = jnp.argmax(token_ids, axis=-1)
        pooled = x[jnp.arange(b), eos]
        proj = self.param(
            "text_projection", nn.initializers.normal(0.01),
            (cfg.hidden_size, cfg.projection_dim),
        )
        pooled = pooled @ proj.astype(jnp.float32)
        return x, pooled


class CLIPVisionTower(nn.Module):
    """Returns (patch_hidden_states incl. cls, pooled_projected)."""

    config: CLIPVisionConfig

    @nn.compact
    def __call__(self, pixels: jax.Array):
        """pixels: (B, H, W, 3) CLIP-normalized."""
        cfg = self.config
        b = pixels.shape[0]
        x = nn.Conv(
            cfg.hidden_size, (cfg.patch_size, cfg.patch_size),
            strides=(cfg.patch_size, cfg.patch_size), padding="VALID",
            use_bias=False, dtype=cfg.dtype, name="patch_embedding",
        )(pixels.astype(cfg.dtype))
        n = (cfg.image_size // cfg.patch_size) ** 2
        x = x.reshape(b, n, cfg.hidden_size)
        cls = self.param(
            "class_embedding", nn.initializers.normal(0.01), (cfg.hidden_size,)
        )
        x = jnp.concatenate(
            [jnp.broadcast_to(cls.astype(x.dtype), (b, 1, cfg.hidden_size)), x], axis=1
        )
        pos = self.param(
            "position_embedding", nn.initializers.normal(0.01),
            (n + 1, cfg.hidden_size),
        )
        x = x + pos[None].astype(x.dtype)
        x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="ln_pre")(x).astype(
            cfg.dtype
        )
        for i in range(cfg.num_layers):
            x = CLIPBlock(
                cfg.hidden_size, cfg.num_heads, cfg.mlp_ratio, cfg.quick_gelu,
                cfg.dtype, name=f"block_{i}",
            )(x)
        pooled = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="ln_post")(
            x[:, 0].astype(jnp.float32)
        )
        proj = self.param(
            "visual_projection", nn.initializers.normal(0.01),
            (cfg.hidden_size, cfg.projection_dim),
        )
        return x.astype(jnp.float32), pooled @ proj.astype(jnp.float32)


class StyleImageEncoder(nn.Module):
    """FrozenClipImageEmbedder2 (modules.py:234-256): (B, 9, 224, 224, 3)
    CLIP-normalized style stack -> (B, 9, 768) pooled embeddings, slots
    folded into the batch dim for one big MXU pass."""

    config: CLIPVisionConfig

    @nn.compact
    def __call__(self, styles: jax.Array):
        b, n = styles.shape[:2]
        flat = styles.reshape((b * n,) + styles.shape[2:])
        _, pooled = CLIPVisionTower(self.config, name="vision")(flat)
        return pooled.reshape(b, n, -1)

"""CLIPTextImageCrossAtten: the trainable text<->style fusion cond stage.

Reference encoders/modules.py:259-323: a frozen laion CLIP
(CLIP-ViT-L-14-laion2B, exact-gelu activation) encodes text to the 77x768
last_hidden_state and styles to per-slot pooled embeddings (image or text
mode), then a TRAINABLE CrossAttention(query=768, context=768, heads=8,
dim_head=96) lets the text tokens attend over the style slots. Used by
configs/deepfashion/inshop_laion_clip.yaml with cond_stage_key_2='styles'.

Here the frozen towers live outside (upgpt_tpu.inference.encoders /
models.clip with quick_gelu=False); this module is the trainable fusion that
joins the optimizer group (reference ddpm.py:1501-1509 via
cond_stage_trainable).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from upgpt_tpu.models.unet import CrossAttention


class TextStyleCrossAttention(nn.Module):
    """text hidden states (B, 77, D) x style embeddings (B, S, D) -> (B, 77, D)."""

    dim: int = 768
    num_heads: int = 8
    head_dim: int = 96
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, text_hidden: jax.Array, style_emb: jax.Array) -> jax.Array:
        return CrossAttention(
            num_heads=self.num_heads, head_dim=self.head_dim, out_dim=self.dim,
            dtype=self.dtype, name="cross_att",
        )(text_hidden, context=style_emb)


class CLIPTextImageCrossAttenStage:
    """Functional cond stage bundling frozen towers + the trainable fusion.

    style_encode='image' uses pooled vision embeddings per slot;
    style_encode='text' uses pooled text embeddings per slot
    (modules.py:306-316).
    """

    def __init__(self, cond_encoder, style_encode: str = "image",
                 dim: int = 768):
        assert style_encode in ("image", "text")
        self.encoder = cond_encoder
        self.style_encode = style_encode
        self.fusion = TextStyleCrossAttention(dim=dim)

    def init_params(self, key: jax.Array, text_len: int = 77, n_styles: int = 9,
                    dim: int = 768):
        t = jnp.zeros((1, text_len, dim))
        s = jnp.zeros((1, n_styles, dim))
        return self.fusion.init(key, t, s)["params"]

    def __call__(self, params, txt, styles) -> jax.Array:
        text_hidden = self.encoder.text_hidden(txt)
        if self.style_encode == "image":
            style_emb = self.encoder.style_embeddings(styles)
        else:
            style_emb = jnp.stack([self.encoder.text_pooled(s) for s in styles])
        return self.fusion.apply({"params": params}, text_hidden, style_emb)

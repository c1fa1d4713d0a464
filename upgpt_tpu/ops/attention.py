"""Multi-head attention core with fp32 softmax island.

Single entry point used by the U-Net's SpatialTransformer, the VAE's mid
AttnBlock, and the trainable CLIPTextImageCrossAtten fusion. The reference has
two mathematically identical scale conventions — `d**-0.5` applied to scores
(attention.py:158,180) and `1/sqrt(sqrt(d))` applied to q and k separately
(openaimodel.py:366-369) — both reduce to softmax(q @ k^T / sqrt(d)); we use
the q/k-split form for bf16 stability and always run the softmax in fp32, as
the reference forces (openaimodel.py:370,404).

On TPU, a Pallas flash-attention kernel handles the self-attention path when
shapes qualify (see upgpt_tpu/ops/flash_attention.py); this file is the
always-correct XLA fallback and the dispatch point.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp


def multi_head_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    num_heads: int,
    mask: Optional[jax.Array] = None,
    use_flash: bool = False,
) -> jax.Array:
    """Attention over (B, Tq, H*D) query and (B, Tk, H*D) key/value.

    Returns (B, Tq, H*D). Softmax accumulates in fp32 and the result is cast
    back to the input dtype. `mask` is an optional (B, Tk) boolean where False
    positions are excluded (reference attention.py:182-186).
    """
    b, tq, inner = q.shape
    tk = k.shape[1]
    assert inner % num_heads == 0
    d = inner // num_heads

    if use_flash and mask is None:
        from upgpt_tpu.ops.flash_attention import flash_attention_qualifies, flash_attention

        if flash_attention_qualifies(b, num_heads, tq, tk, d, q.dtype):
            qh = q.reshape(b, tq, num_heads, d).transpose(0, 2, 1, 3)
            kh = k.reshape(b, tk, num_heads, d).transpose(0, 2, 1, 3)
            vh = v.reshape(b, tk, num_heads, d).transpose(0, 2, 1, 3)
            out = flash_attention(qh, kh, vh)
            return out.transpose(0, 2, 1, 3).reshape(b, tq, inner)

    scale = 1.0 / math.sqrt(math.sqrt(d))
    qh = (q * jnp.asarray(scale, q.dtype)).reshape(b, tq, num_heads, d)
    kh = (k * jnp.asarray(scale, k.dtype)).reshape(b, tk, num_heads, d)
    vh = v.reshape(b, tk, num_heads, d)

    # (B, H, Tq, Tk) scores on the MXU; accumulate fp32.
    scores = jnp.einsum("bqhd,bkhd->bhqk", qh, kh, preferred_element_type=jnp.float32)
    if mask is not None:
        neg = jnp.finfo(jnp.float32).min
        scores = jnp.where(mask[:, None, None, :], scores, neg)
    probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs, vh, preferred_element_type=jnp.float32)
    return out.astype(q.dtype).reshape(b, tq, inner)


def attention_weight_split(
    z_q: jax.Array,
    kv_src: Optional[jax.Array],
    attn_params,
    num_heads: int,
    kv=None,
) -> jax.Array:
    """Attention with the head split taken on the WEIGHTS, not activations.

    `q = z @ Wq` followed by reshape(B, T, H, D) physically repacks the
    (B, T, H*D) activation whenever H*D isn't lane-aligned (e.g. the 256px
    nets' 896 = 8 x 112 mid/ds4 levels: measured ~640 MB of layout-copy
    traffic per sampler program, docs/PERF.md round 3). Splitting the
    loop-invariant weights instead — einsum('btc,chd->bhtd') — makes every
    per-head activation be BORN in its final layout; XLA hoists the weight
    reshapes out of the sampling scan. Identical math to
    multi_head_attention (same fp32 softmax island, same q/k scale split).

    `kv`: optional precomputed PACKED (B, Tk, H*D) k/v pair (the sampler's
    cross-attention hoist); those are reshaped (small: Tk=87).
    """
    comp = z_q.dtype
    wq = attn_params["to_q"]["kernel"].astype(comp)
    cin, inner = wq.shape
    d = inner // num_heads
    scale = jnp.asarray(1.0 / math.sqrt(math.sqrt(d)), comp)
    qh = jnp.einsum("btc,chd->bhtd", z_q * scale,
                    wq.reshape(cin, num_heads, d))
    if kv is not None:
        k, v = kv
        b, tk, _ = k.shape
        kh = k.reshape(b, tk, num_heads, d).transpose(0, 2, 1, 3)
        vh = v.reshape(b, tk, num_heads, d).transpose(0, 2, 1, 3)
    else:
        src = z_q if kv_src is None else kv_src.astype(comp)
        wk = attn_params["to_k"]["kernel"].astype(comp)
        wv = attn_params["to_v"]["kernel"].astype(comp)
        kh = jnp.einsum("bsc,chd->bhsd", src,
                        wk.reshape(wk.shape[0], num_heads, d))
        vh = jnp.einsum("bsc,chd->bhsd", src,
                        wv.reshape(wv.shape[0], num_heads, d))
    kh = kh * scale.astype(kh.dtype)
    scores = jnp.einsum("bhtd,bhsd->bhts", qh, kh,
                        preferred_element_type=jnp.float32)
    probs = jax.nn.softmax(scores, axis=-1).astype(vh.dtype)
    oh = jnp.einsum("bhts,bhsd->bhtd", probs, vh,
                    preferred_element_type=jnp.float32).astype(comp)
    wo = attn_params["to_out"]["kernel"].astype(comp)
    out = jnp.einsum("bhtd,hdc->btc", oh,
                     wo.reshape(num_heads, d, wo.shape[-1]))
    return out + attn_params["to_out"]["bias"].astype(comp)

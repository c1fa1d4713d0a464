"""Unit tests for core ops against independently computed golden values.

Goldens are computed with torch (CPU) where the reference semantics came from
torch built-ins (GroupNorm, GELU), and with closed-form numpy elsewhere.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from upgpt_tpu.ops.basic import (
    asymmetric_pad_hw,
    group_norm,
    nearest_upsample_2x,
    silu,
    timestep_embedding,
    timestep_embedding_ddpm,
)
from upgpt_tpu.ops.attention import multi_head_attention


def test_group_norm_matches_torch():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 8, 6, 64)).astype(np.float32)
    scale = rng.normal(size=(64,)).astype(np.float32)
    bias = rng.normal(size=(64,)).astype(np.float32)

    got = group_norm(jnp.asarray(x), jnp.asarray(scale), jnp.asarray(bias),
                     num_groups=32, eps=1e-6)
    # torch GroupNorm is NCHW
    xt = torch.from_numpy(x).permute(0, 3, 1, 2)
    gn = torch.nn.GroupNorm(32, 64, eps=1e-6)
    with torch.no_grad():
        gn.weight.copy_(torch.from_numpy(scale))
        gn.bias.copy_(torch.from_numpy(bias))
        want = gn(xt).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5, rtol=2e-5)


def test_group_norm_fp32_island_bf16():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(1, 4, 4, 32)).astype(np.float32)
    ones = jnp.ones((32,))
    zeros = jnp.zeros((32,))
    ref = group_norm(jnp.asarray(x), ones, zeros)
    low = group_norm(jnp.asarray(x, dtype=jnp.bfloat16), ones, zeros)
    assert low.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(low, dtype=np.float32), np.asarray(ref), atol=0.05
    )


def test_timestep_embedding_unet_convention():
    """cos-first, freqs exp(-log(1e4)*i/half) (reference util.py:151-171)."""
    t = jnp.asarray([0.0, 1.0, 500.0, 999.0])
    emb = timestep_embedding(t, 224)
    assert emb.shape == (4, 224)
    # t=0: cos(0)=1 for first half, sin(0)=0 for second half
    np.testing.assert_allclose(np.asarray(emb[0, :112]), np.ones(112), atol=1e-6)
    np.testing.assert_allclose(np.asarray(emb[0, 112:]), np.zeros(112), atol=1e-6)
    half = 112
    freqs = np.exp(-np.log(10000.0) * np.arange(half) / half)
    want = np.concatenate([np.cos(500.0 * freqs), np.sin(500.0 * freqs)])
    # fp32 cos/sin of args up to 500 carries ~1e-3 error vs fp64; the
    # reference computes in fp32 too (util.py:162-166), so this is parity.
    np.testing.assert_allclose(np.asarray(emb[2]), want, atol=3e-3)


def test_timestep_embedding_ddpm_convention():
    """sin-first, denominator half-1 (reference model.py:12-30)."""
    t = jnp.asarray([7.0])
    emb = timestep_embedding_ddpm(t, 128)
    half = 64
    freqs = np.exp(np.arange(half) * -(np.log(10000.0) / (half - 1)))
    want = np.concatenate([np.sin(7.0 * freqs), np.cos(7.0 * freqs)])
    np.testing.assert_allclose(np.asarray(emb[0]), want, atol=5e-5)


def test_silu_matches_torch():
    x = np.linspace(-5, 5, 101).astype(np.float32)
    got = np.asarray(silu(jnp.asarray(x)))
    want = F.silu(torch.from_numpy(x)).numpy()
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_nearest_upsample_matches_torch():
    rng = np.random.default_rng(2)
    x = rng.normal(size=(2, 5, 3, 7)).astype(np.float32)
    got = np.asarray(nearest_upsample_2x(jnp.asarray(x)))
    xt = torch.from_numpy(x).permute(0, 3, 1, 2)
    want = F.interpolate(xt, scale_factor=2, mode="nearest").permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got, want)


def test_asymmetric_pad():
    x = jnp.ones((1, 3, 3, 2))
    p = asymmetric_pad_hw(x)
    assert p.shape == (1, 4, 4, 2)
    assert float(p[0, 3, 0, 0]) == 0.0 and float(p[0, 0, 3, 0]) == 0.0
    assert float(p[0, 0, 0, 0]) == 1.0


def test_attention_matches_naive():
    rng = np.random.default_rng(3)
    b, tq, tk, h, d = 2, 12, 7, 4, 16
    q = rng.normal(size=(b, tq, h * d)).astype(np.float32)
    k = rng.normal(size=(b, tk, h * d)).astype(np.float32)
    v = rng.normal(size=(b, tk, h * d)).astype(np.float32)
    got = np.asarray(multi_head_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), num_heads=h))

    # naive torch reference, scale d**-0.5 on scores (attention.py:158,180)
    qt = torch.from_numpy(q).reshape(b, tq, h, d).permute(0, 2, 1, 3)
    kt = torch.from_numpy(k).reshape(b, tk, h, d).permute(0, 2, 1, 3)
    vt = torch.from_numpy(v).reshape(b, tk, h, d).permute(0, 2, 1, 3)
    scores = qt @ kt.transpose(-1, -2) * d**-0.5
    want = (scores.softmax(-1) @ vt).permute(0, 2, 1, 3).reshape(b, tq, h * d).numpy()
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_attention_mask():
    rng = np.random.default_rng(4)
    b, t, h, d = 1, 6, 2, 8
    q = jnp.asarray(rng.normal(size=(b, t, h * d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, t, h * d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, t, h * d)).astype(np.float32))
    mask = jnp.asarray([[True, True, True, False, False, False]])
    got = multi_head_attention(q, k, v, num_heads=h, mask=mask)
    got2 = multi_head_attention(q, k[:, :3], v[:, :3], num_heads=h)
    np.testing.assert_allclose(np.asarray(got), np.asarray(got2), atol=1e-5)

"""Flash-attention kernel numerics (interpret mode) + dispatch rules."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from upgpt_tpu.ops.attention import multi_head_attention
from upgpt_tpu.ops.flash_attention import flash_attention, flash_attention_qualifies


def test_qualifier_rules():
    f32 = jnp.dtype(jnp.float32)
    assert flash_attention_qualifies(8, 8, 768, 768, 28, f32)     # ds1 @256px
    assert flash_attention_qualifies(8, 8, 3072, 3072, 64, f32)   # ds2 @512px
    assert flash_attention_qualifies(8, 1, 768, 768, 512, f32)   # VAE mid attn
    assert not flash_attention_qualifies(8, 8, 192, 192, 56, f32)  # too short
    assert not flash_attention_qualifies(8, 8, 768, 87, 28, f32)   # cross-attn
    assert not flash_attention_qualifies(8, 8, 8192, 8192, 64, f32)  # > resident


def test_flash_matches_reference_d28():
    """The awkward head_dim=28 case (224ch / 8 heads) — wrapper pads lanes."""
    rng = np.random.default_rng(0)
    b, h, t, d = 2, 4, 512, 28
    q = jnp.asarray(rng.normal(size=(b, h, t, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, h, t, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, h, t, d)).astype(np.float32))
    with pltpu.force_tpu_interpret_mode():
        got = flash_attention(q, k, v)
    scale = 1.0 / np.sqrt(d)
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k) * scale
    want = jnp.einsum("bhqk,bhkd->bhqd", jax.nn.softmax(scores, -1), v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5, rtol=1e-4)


def test_flash_via_multi_head_attention_dispatch():
    """multi_head_attention must route qualifying shapes through the kernel
    and produce the same result as its XLA path."""
    rng = np.random.default_rng(1)
    b, t, h, d = 1, 512, 4, 32
    q = jnp.asarray(rng.normal(size=(b, t, h * d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, t, h * d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, t, h * d)).astype(np.float32))
    ref = multi_head_attention(q, k, v, num_heads=h, use_flash=False)
    with pltpu.force_tpu_interpret_mode():
        got = multi_head_attention(q, k, v, num_heads=h, use_flash=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5, rtol=1e-4)


def test_flash_bf16():
    rng = np.random.default_rng(2)
    b, h, t, d = 1, 2, 512, 64
    q = jnp.asarray(rng.normal(size=(b, h, t, d)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(b, h, t, d)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(b, h, t, d)), jnp.bfloat16)
    with pltpu.force_tpu_interpret_mode():
        got = flash_attention(q, k, v)
    assert got.dtype == jnp.bfloat16
    scale = 1.0 / np.sqrt(d)
    qf, kf, vf = (x.astype(jnp.float32) for x in (q, k, v))
    want = jnp.einsum("bhqk,bhkd->bhqd",
                      jax.nn.softmax(jnp.einsum("bhqd,bhkd->bhqk", qf, kf) * scale, -1),
                      vf)
    np.testing.assert_allclose(np.asarray(got, np.float32), np.asarray(want),
                               atol=0.05, rtol=0.05)


def test_flash_gradients_match_reference():
    """custom_vjp backward == gradients of the naive formulation."""
    rng = np.random.default_rng(3)
    b, h, t, d = 1, 2, 512, 32
    q = jnp.asarray(rng.normal(size=(b, h, t, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, h, t, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, h, t, d)).astype(np.float32))

    from upgpt_tpu.ops.flash_attention import _reference_attention

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(_reference_attention(q, k, v) ** 2)

    # backward kernel runs during the grad evaluation, so the interpret-mode
    # scope must cover the whole grad call, not just the forward
    with pltpu.force_tpu_interpret_mode():
        g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, bg in zip(g_flash, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bg),
                                   atol=1e-4, rtol=1e-3)


def test_flash_pallas_backward_d28():
    """Pallas backward at the awkward 224ch/8-head geometry (d=28)."""
    from upgpt_tpu.ops.flash_attention import _reference_attention

    rng = np.random.default_rng(7)
    b, h, t, d = 1, 2, 512, 28
    q = jnp.asarray(rng.normal(size=(b, h, t, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, h, t, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, h, t, d)).astype(np.float32))
    ct = jnp.asarray(rng.normal(size=(b, h, t, d)).astype(np.float32))

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v) * ct)

    def loss_ref(q, k, v):
        return jnp.sum(_reference_attention(q, k, v) * ct)

    with pltpu.force_tpu_interpret_mode():
        g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, bg in zip(g_flash, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bg),
                                   atol=1e-4, rtol=1e-3)


def test_flash_blocked_backward_long_t():
    """Long-T shape through the two-pass blocked backward (512px regime)."""
    from upgpt_tpu.ops.flash_attention import _reference_attention

    b, h, t, d = 1, 1, 1280, 32
    rng = np.random.default_rng(9)
    q = jnp.asarray(rng.normal(size=(b, h, t, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, h, t, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, h, t, d)).astype(np.float32))
    ct = jnp.asarray(rng.normal(size=(b, h, t, d)).astype(np.float32))

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v) * ct)

    def loss_ref(q, k, v):
        return jnp.sum(_reference_attention(q, k, v) * ct)

    with pltpu.force_tpu_interpret_mode():
        g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, bg in zip(g_flash, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bg),
                                   atol=1e-4, rtol=1e-3)


def test_bwd_blocked_vmem_gate():
    """Kernel-vs-XLA backward dispatch boundaries (measured on v5e)."""
    from upgpt_tpu.ops.flash_attention import _bwd_blocked_fits

    assert _bwd_blocked_fits(768, 28, 2)      # 256px train, bf16
    assert _bwd_blocked_fits(3072, 32, 2)     # mm_512 train, bf16 (measured)
    assert _bwd_blocked_fits(768, 512, 2)     # VAE attn @256px, bf16
    assert not _bwd_blocked_fits(1024, 512, 4)  # VAE attn f32 -> XLA path

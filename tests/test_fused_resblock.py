"""Fused GN+SiLU+conv3x3 kernel vs the XLA composition (interpret mode)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from upgpt_tpu.ops.fused_resblock import (
    _reference, fused_gn_silu_conv, fused_resblock_qualifies,
)


@pytest.mark.parametrize("shape,out_ch", [
    ((2, 8, 6, 224), 224),   # level-1 geometry (downscaled spatial)
    ((1, 4, 3, 448), 896),   # channel change
    ((2, 4, 4, 64), 64),
])
def test_fused_resblock_matches_reference(shape, out_ch):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=shape).astype(np.float32))
    gs = jnp.asarray(rng.normal(size=shape[-1:]).astype(np.float32))
    gb = jnp.asarray(rng.normal(size=shape[-1:]).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(3, 3, shape[-1], out_ch)).astype(np.float32) * 0.05)
    b = jnp.asarray(rng.normal(size=(out_ch,)).astype(np.float32))

    want = _reference(x, gs, gb, k, b, 32, 1e-5)
    with pltpu.force_tpu_interpret_mode():
        got = fused_gn_silu_conv(x, gs, gb, k, b, 32, 1e-5)
    # kernel computes the matmuls in bf16 weights (as production does);
    # tolerance reflects bf16 weight rounding
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=0.05, rtol=0.02)


def test_fused_resblock_zero_padding_edges():
    """Border pixels must see zero padding exactly like SAME-1 conv."""
    x = jnp.ones((1, 4, 4, 32))
    gs, gb = jnp.ones((32,)), jnp.zeros((32,))
    k = jnp.ones((3, 3, 32, 8)) * 0.01
    b = jnp.zeros((8,))
    want = _reference(x, gs, gb, k, b, 32, 1e-5)
    with pltpu.force_tpu_interpret_mode():
        got = fused_gn_silu_conv(x, gs, gb, k, b, 32, 1e-5)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-3)


def test_fused_resblock_gradients():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(1, 4, 4, 64)).astype(np.float32))
    gs = jnp.ones((64,))
    gb = jnp.zeros((64,))
    k = jnp.asarray(rng.normal(size=(3, 3, 64, 32)).astype(np.float32) * 0.05)
    b = jnp.zeros((32,))

    def loss_fused(x, gs, gb, k, b):
        with pltpu.force_tpu_interpret_mode():
            return jnp.sum(fused_gn_silu_conv(x, gs, gb, k, b, 32, 1e-5) ** 2)

    def loss_ref(x, gs, gb, k, b):
        return jnp.sum(_reference(x, gs, gb, k, b, 32, 1e-5) ** 2)

    gf = jax.grad(loss_fused, argnums=(0, 3))(x, gs, gb, k, b)
    gr = jax.grad(loss_ref, argnums=(0, 3))(x, gs, gb, k, b)
    # the backward is exact (XLA-recompute vjp); the residual difference is
    # the bf16-weight forward entering g = dL/dout = 2*out
    for a, b_ in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=2e-2, rtol=5e-2)


def test_qualifier():
    assert fused_resblock_qualifies((8, 32, 24, 224), 224)
    assert fused_resblock_qualifies((8, 16, 12, 448), 448)
    # 896x896x9 bf16 weights alone are ~14 MB -> stays on XLA
    assert not fused_resblock_qualifies((8, 8, 6, 896), 896)
    assert not fused_resblock_qualifies((8, 256, 192, 128), 128)  # VAE size
    assert not fused_resblock_qualifies((8, 8, 8, 100), 100)

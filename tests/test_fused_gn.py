"""Fused GroupNorm kernel vs the reference jnp op (interpret mode on CPU)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from upgpt_tpu.ops.basic import group_norm, silu
from upgpt_tpu.ops.fused_gn import fused_group_norm, fused_group_norm_qualifies


@pytest.mark.parametrize("shape,groups", [
    ((2, 8, 6, 224), 32),   # U-Net level-1 geometry
    ((1, 4, 3, 896), 32),   # deep level
    ((2, 8, 8, 128), 32),   # VAE-ish
])
@pytest.mark.parametrize("with_silu", [False, True])
def test_fused_gn_matches_reference(shape, groups, with_silu):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=shape).astype(np.float32))
    scale = jnp.asarray(rng.normal(size=shape[-1:]).astype(np.float32))
    bias = jnp.asarray(rng.normal(size=shape[-1:]).astype(np.float32))

    want = group_norm(x, scale, bias, num_groups=groups, eps=1e-5)
    if with_silu:
        want = silu(want)

    with pltpu.force_tpu_interpret_mode():
        got = fused_group_norm(x, scale, bias, num_groups=groups,
                               with_silu=with_silu)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-4, rtol=1e-4)


def test_fused_gn_bf16_dtype_roundtrip():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(1, 4, 4, 256)), jnp.bfloat16)
    ones = jnp.ones((256,))
    zeros = jnp.zeros((256,))
    with pltpu.force_tpu_interpret_mode():
        got = fused_group_norm(x, ones, zeros)
    assert got.dtype == jnp.bfloat16
    want = group_norm(x, ones, zeros)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32), atol=0.05
    )


def test_qualifier():
    assert fused_group_norm_qualifies((8, 32, 24, 224), 32)
    assert fused_group_norm_qualifies((8, 64, 48, 256), 32)  # 512-model ds1
    assert not fused_group_norm_qualifies((8, 64, 48, 448), 32)  # > VMEM budget
    # 256px VAE decoder tensors exceed the VMEM budget
    assert not fused_group_norm_qualifies((8, 256, 192, 128), 32)
    assert not fused_group_norm_qualifies((8, 8, 8, 100), 32)


def test_fused_gn_gradients_match_reference():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(2, 4, 4, 64)).astype(np.float32))
    scale = jnp.asarray(rng.normal(size=(64,)).astype(np.float32))
    bias = jnp.asarray(rng.normal(size=(64,)).astype(np.float32))

    def loss_fused(x, s, b):
        with pltpu.force_tpu_interpret_mode():
            return jnp.sum(fused_group_norm(x, s, b, 32, 1e-5, True) ** 2)

    def loss_ref(x, s, b):
        return jnp.sum(silu(group_norm(x, s, b, num_groups=32, eps=1e-5)) ** 2)

    gf = jax.grad(loss_fused, argnums=(0, 1, 2))(x, scale, bias)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(x, scale, bias)
    for a, b_ in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=1e-4, rtol=1e-3)


@pytest.mark.parametrize("shape", [(2, 64, 48, 128), (1, 32, 24, 256)])
def test_tiled_gn_matches_reference(shape):
    """Decode-size tensors route to the row-tiled stats kernel; numerics
    must match the jnp GroupNorm exactly (same fp32 statistics)."""
    from upgpt_tpu.ops.fused_gn import (
        _tiled_gn_forward, tiled_group_norm_qualifies,
    )

    assert tiled_group_norm_qualifies(shape, 32)
    rng = np.random.default_rng(5)
    c = shape[-1]
    x = jnp.asarray(rng.normal(size=shape).astype(np.float32)) * 2.0 + 0.3
    scale = jnp.asarray(rng.normal(size=(c,)).astype(np.float32))
    bias = jnp.asarray(rng.normal(size=(c,)).astype(np.float32))
    with pltpu.force_tpu_interpret_mode():
        got = _tiled_gn_forward(x, scale, bias, 32, 1e-6, True)
    want = silu(group_norm(x, scale, bias, num_groups=32, eps=1e-6))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=1e-4)


def test_tiled_gn_dispatch_from_fused_entry():
    """fused_group_norm auto-routes oversize shapes to the tiled kernel."""
    from upgpt_tpu.ops.fused_gn import fused_group_norm_qualifies

    shape = (1, 256, 192, 128)  # decode-level: fails the one-pass gate
    assert not fused_group_norm_qualifies(shape, 32)
    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.normal(size=shape).astype(np.float32))
    scale = jnp.ones((128,), jnp.float32)
    bias = jnp.zeros((128,), jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        got = fused_group_norm(x, scale, bias, 32, 1e-6, False)
    want = group_norm(x, scale, bias, num_groups=32, eps=1e-6)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=1e-4)

"""Fused SpatialTransformer kernel: numerics vs the jnp twin (interpret
mode), both conditioning paths, gradients, and module dispatch."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from upgpt_tpu.models.unet import SpatialTransformer
from upgpt_tpu.ops.fused_transformer import (
    fused_transformer_block, fused_transformer_qualifies,
    transformer_block_reference,
)

B, H, W, C, HEADS, TK = 2, 8, 8, 64, 4, 11


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, H, W, C)), jnp.float32)
    ctx = jnp.asarray(rng.normal(size=(B, TK, C)), jnp.float32)
    mod = SpatialTransformer(C, HEADS, C // HEADS, context_dim=C)
    params = mod.init(jax.random.PRNGKey(0), x, ctx)["params"]
    # zero-init proj_out blocks everything downstream; randomize for a
    # non-degenerate parity check
    params = jax.tree.map(
        lambda a: jnp.asarray(rng.normal(size=a.shape) * 0.05, a.dtype), params)
    return x, ctx, params


def _tree(params):
    """params tree -> the plain-dict layout the kernel/twin expect."""
    return jax.tree.map(lambda a: a, params)


def test_qualify_rules():
    assert fused_transformer_qualifies(768, 224, 8, 87)
    assert fused_transformer_qualifies(192, 448, 8, 87)
    assert not fused_transformer_qualifies(48, 896, 8, 87)   # mid: VMEM
    assert not fused_transformer_qualifies(3072, 224, 8, 87)  # T too long
    assert not fused_transformer_qualifies(768, 224, 8, 87, depth=2)


def test_fused_matches_twin_with_context(setup):
    x, ctx, params = setup
    tokens = x.reshape(B, H * W, C)
    want = transformer_block_reference(tokens, _tree(params), HEADS, ctx)
    with pltpu.force_tpu_interpret_mode():
        got = fused_transformer_block(tokens, _tree(params), HEADS, ctx)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=1e-4)


def test_fused_matches_twin_with_precomputed_kv(setup):
    x, ctx, params = setup
    tokens = x.reshape(B, H * W, C)
    a2 = params["block_0"]["attn2"]
    k = ctx @ a2["to_k"]["kernel"]
    v = ctx @ a2["to_v"]["kernel"]
    want = transformer_block_reference(
        tokens, _tree(params), HEADS, None, kv=(k, v))
    with pltpu.force_tpu_interpret_mode():
        got = fused_transformer_block(
            tokens, _tree(params), HEADS, None, kv=(k, v))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=1e-4)
    # and the kv path equals the context path (same projections)
    want_ctx = transformer_block_reference(tokens, _tree(params), HEADS, ctx)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want_ctx),
                               atol=2e-5, rtol=1e-4)


def test_fused_gradients_match_twin(setup):
    x, ctx, params = setup
    tokens = x.reshape(B, H * W, C)

    def loss_fused(tok, p, c_):
        with pltpu.force_tpu_interpret_mode():
            return jnp.sum(fused_transformer_block(tok, p, HEADS, c_) ** 2)

    def loss_twin(tok, p, c_):
        return jnp.sum(transformer_block_reference(tok, p, HEADS, c_) ** 2)

    g_f = jax.grad(loss_fused, argnums=(0, 1, 2))(tokens, _tree(params), ctx)
    g_t = jax.grad(loss_twin, argnums=(0, 1, 2))(tokens, _tree(params), ctx)
    for a, b in zip(jax.tree.leaves(g_f), jax.tree.leaves(g_t)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-4, rtol=1e-3)


def test_module_dispatch_fused_equals_unfused(setup):
    x, ctx, params = setup
    plain = SpatialTransformer(C, HEADS, C // HEADS, context_dim=C)
    fused = SpatialTransformer(C, HEADS, C // HEADS, context_dim=C, fused=True)
    want = plain.apply({"params": params}, x, ctx)
    with pltpu.force_tpu_interpret_mode():
        got = fused.apply({"params": params}, x, ctx)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=1e-4)


def test_module_param_tree_layout(setup):
    """The holder-based tree must match the round-1 module tree exactly
    (converters/checkpoints depend on it)."""
    _, _, params = setup
    assert set(params) == {"norm", "proj_in", "proj_out", "block_0"}
    blk = params["block_0"]
    assert set(blk) == {"attn1", "attn2", "ff", "norm1", "norm2", "norm3"}
    assert set(blk["attn1"]) == {"to_q", "to_k", "to_v", "to_out"}
    assert set(blk["attn1"]["to_q"]) == {"kernel"}
    assert set(blk["attn1"]["to_out"]) == {"kernel", "bias"}
    assert set(blk["ff"]) == {"proj_in", "proj_out"}
    assert blk["ff"]["proj_in"]["kernel"].shape == (C, 8 * C)
    assert blk["ff"]["proj_out"]["kernel"].shape == (4 * C, C)

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


def test_ff_tile_always_divides():
    """A non-divisor FF tile would silently drop T % tile rows (and then
    crash on the residual add); the tile choice must divide T for every
    geometry the gate can approve."""
    from upgpt_tpu.ops.fused_transformer import _ff_tile

    for t in range(8, 1025, 8):
        for c in (64, 224, 448, 512):
            tile = _ff_tile(t, c)
            assert t % tile == 0, (t, c, tile)
            # and the f32 intermediate stays within the ~6 MB it budgets
            assert tile * 8 * c * 4 <= 6 * 1024 * 1024 or tile == t


def test_fused_matches_twin_nondivisible_256(setup):
    """t=112 tokens with c=512 forces FF tiling (112*8*512*4 > 6MB is
    false... use a geometry that tiles): verify a tiled-FF geometry where
    256 does not divide T computes every row."""
    rng = np.random.default_rng(1)
    t, c, heads, tk = 360, 512, 4, 11  # 360*8*512*4 = 5.9MB -> boundary
    # pick one that actually tiles: c=512, t=520 -> 8.5MB > 6MB, 520%256!=0
    t = 520
    x = jnp.asarray(rng.normal(size=(1, t, c)) * 0.1, jnp.float32)
    ctx = jnp.asarray(rng.normal(size=(1, tk, c)), jnp.float32)
    mod = SpatialTransformer(c, heads, c // heads, context_dim=c)
    params = mod.init(jax.random.PRNGKey(0),
                      jnp.zeros((1, 8, t // 8, c)), ctx)["params"]
    params = jax.tree.map(
        lambda a: jnp.asarray(rng.normal(size=a.shape) * 0.05, a.dtype),
        params)
    from upgpt_tpu.ops.fused_transformer import _ff_tile
    assert _ff_tile(t, c) not in (t, 256)  # the tiled, non-256 case
    want = transformer_block_reference(x, _tree(params), heads, ctx)
    with pltpu.force_tpu_interpret_mode():
        got = fused_transformer_block(x, _tree(params), heads, ctx)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=3e-5, rtol=1e-4)


def test_qualify_counts_in_kernel_cross_projection():
    """The training path (kv not precomputed) must budget wk2/wv2 and the
    raw context block; a geometry near the limit flips to not-qualifying."""
    # generous geometry qualifies both ways
    assert fused_transformer_qualifies(768, 224, 8, 87, kv_precomputed=False,
                                       ctx_dim=768)
    # both production geometries must still qualify on the TRAINING path
    # (context projected in-kernel, ctx_dim 768) — the budget is calibrated
    # for exactly these
    assert fused_transformer_qualifies(192, 448, 8, 87, kv_precomputed=False,
                                       ctx_dim=768)
    # the accounting must actually charge the context path: an absurd
    # context width flips the same geometry to not-qualifying
    assert not fused_transformer_qualifies(192, 448, 8, 87,
                                           kv_precomputed=False,
                                           ctx_dim=16384)


def test_fused_gradients_with_flash_attention():
    """TPU training integration path: the fused block's VJP recompute routes
    self-attention through flash_attention, whose own VJP is the blocked
    Pallas backward — grads must equal the pure-XLA twin."""
    b, h, w, c, heads = 1, 16, 32, 64, 4  # T = 512 -> flash qualifies
    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.normal(size=(b, h, w, c)), jnp.float32)
    ctx = jnp.asarray(rng.normal(size=(b, TK, c)), jnp.float32)
    mod = SpatialTransformer(c, heads, c // heads, context_dim=c)
    params = mod.init(jax.random.PRNGKey(0), x, ctx)["params"]
    params = jax.tree.map(
        lambda a: jnp.asarray(rng.normal(size=a.shape) * 0.05, a.dtype), params)
    tokens = x.reshape(b, h * w, c)

    def loss_fused(tok, p, c_):
        return jnp.sum(
            fused_transformer_block(tok, p, heads, c_, None, 1e-6, True) ** 2)

    def loss_twin(tok, p, c_):
        return jnp.sum(
            transformer_block_reference(tok, p, heads, c_,
                                        use_flash=False) ** 2)

    with pltpu.force_tpu_interpret_mode():
        g_f = jax.grad(loss_fused, argnums=(0, 1, 2))(tokens, params, ctx)
    g_t = jax.grad(loss_twin, argnums=(0, 1, 2))(tokens, params, ctx)
    for a, b_ in zip(jax.tree.leaves(g_f), jax.tree.leaves(g_t)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=5e-4, rtol=1e-3)


def test_spp_batched_program_matches_twin():
    """samples-per-program > 1: the merged-token kernel must be sample-
    independent — identical to the twin AND to the spp=1 kernel."""
    import upgpt_tpu.ops.fused_transformer as ft

    rng = np.random.default_rng(3)
    b = 4
    x = jnp.asarray(rng.normal(size=(b, H * W, C)), jnp.float32)
    ctx = jnp.asarray(rng.normal(size=(b, TK, C)), jnp.float32)
    mod = SpatialTransformer(C, HEADS, C // HEADS, context_dim=C)
    params = mod.init(jax.random.PRNGKey(0),
                      x.reshape(b, H, W, C), ctx)["params"]
    params = jax.tree.map(
        lambda a: jnp.asarray(rng.normal(size=a.shape) * 0.05, a.dtype),
        params)
    want = transformer_block_reference(x, _tree(params), HEADS, ctx)
    outs = {}
    for spp in (1, 2, 4):
        ft._SPP_OVERRIDE = spp
        try:
            with pltpu.force_tpu_interpret_mode():
                outs[spp] = np.asarray(fused_transformer_block(
                    x, _tree(params), HEADS, ctx))
        finally:
            ft._SPP_OVERRIDE = None
        np.testing.assert_allclose(outs[spp], np.asarray(want),
                                   atol=2e-5, rtol=1e-4)
    # sample order preserved: block si of the spp=4 program == spp=1 rows
    np.testing.assert_allclose(outs[4], outs[1], atol=1e-6)


def test_exp2_softmax_matches_exp():
    """exp2 softmax with log2(e) folded into q == exp softmax (real math
    identity; float drift must stay within bf16-irrelevant bounds)."""
    import upgpt_tpu.ops.fused_transformer as ft

    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.normal(size=(B, H * W, C)), jnp.float32)
    ctx = jnp.asarray(rng.normal(size=(B, TK, C)), jnp.float32)
    mod = SpatialTransformer(C, HEADS, C // HEADS, context_dim=C)
    params = mod.init(jax.random.PRNGKey(0),
                      x.reshape(B, H, W, C), ctx)["params"]
    params = jax.tree.map(
        lambda a: jnp.asarray(rng.normal(size=a.shape) * 0.05, a.dtype),
        params)
    prev = ft._SOFTMAX_EXP2
    try:
        ft._SOFTMAX_EXP2 = True
        with pltpu.force_tpu_interpret_mode():
            got2 = np.asarray(fused_transformer_block(
                x, _tree(params), HEADS, ctx))
        ft._SOFTMAX_EXP2 = False
        with pltpu.force_tpu_interpret_mode():
            got1 = np.asarray(fused_transformer_block(
                x, _tree(params), HEADS, ctx))
    finally:
        ft._SOFTMAX_EXP2 = prev
    np.testing.assert_allclose(got2, got1, atol=3e-6, rtol=1e-5)

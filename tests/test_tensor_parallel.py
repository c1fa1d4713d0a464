"""Tensor-parallel (model-axis) shardings: parity and spec checks.

The reference has no TP at all (Lightning DDP only, main.py:581); this is
the TPU-native extra axis SURVEY.md §2.2 reserves for the 512px stage.
Because `parallel/tp.py` only annotates layouts, GSPMD must keep the
logical program identical — we verify tp-sharded sampling matches the
single-device result on the virtual CPU mesh.
"""

import numpy as np
import jax
from jax.sharding import PartitionSpec as P

import pytest

from upgpt_tpu.diffusion.latent_diffusion import LatentDiffusion
from upgpt_tpu.inference.pipeline import GenerationPipeline
from upgpt_tpu.parallel.mesh import batch_sharding, create_mesh
from upgpt_tpu.parallel.tp import (
    shard_params,
    unet_param_specs,
    validate_divisibility,
)

from test_latent_diffusion import tiny_batch, tiny_config


def _specs_by_path(specs):
    flat, _ = jax.tree_util.tree_flatten_with_path(
        specs, is_leaf=lambda x: isinstance(x, P))
    return {
        "/".join(k.key for k in path if hasattr(k, "key")): spec
        for path, spec in flat
    }


def test_unet_param_specs_megatron_split():
    model = LatentDiffusion(tiny_config())
    shapes = jax.eval_shape(lambda: model.init_params(jax.random.PRNGKey(0)))
    by_path = _specs_by_path(unet_param_specs(shapes))

    # column-parallel: qkv projections + both GEGLU/transformer proj_in
    assert by_path["unet/mid_attn/block_0/attn1/to_q/kernel"] == P(None, "model")
    assert by_path["unet/mid_attn/block_0/attn2/to_k/kernel"] == P(None, "model")
    assert by_path["unet/mid_attn/block_0/ff/proj_in/kernel"] == P(None, "model")
    assert by_path["unet/mid_attn/block_0/ff/proj_in/bias"] == P("model")
    assert by_path["unet/mid_attn/proj_in/kernel"] == P(None, "model")
    # row-parallel: output projections, replicated bias
    assert by_path["unet/mid_attn/block_0/attn1/to_out/kernel"] == P("model", None)
    assert by_path["unet/mid_attn/block_0/attn1/to_out/bias"] == P()
    assert by_path["unet/mid_attn/block_0/ff/proj_out/kernel"] == P("model", None)
    assert by_path["unet/mid_attn/proj_out/kernel"] == P("model", None)
    # norms replicated
    assert by_path["unet/mid_attn/block_0/norm1/scale"] == P()
    # non-U-Net trees fully replicated
    for path, spec in by_path.items():
        if not path.startswith("unet/"):
            assert spec == P(), path
    n_sharded = sum(1 for s in by_path.values() if s != P())
    assert n_sharded >= 40  # every transformer matmul in the tiny geometry


def test_validate_divisibility():
    model = LatentDiffusion(tiny_config())
    shapes = jax.eval_shape(lambda: model.init_params(jax.random.PRNGKey(0)))
    validate_divisibility(shapes, tp=4, num_heads=4)  # inner=32: ok
    with pytest.raises(ValueError, match="num_heads"):
        validate_divisibility(shapes, tp=3, num_heads=4)
    with pytest.raises(ValueError, match="not divisible"):
        validate_divisibility(shapes, tp=3)


def test_tp_generate_matches_single_device(eight_devices):
    """data=2 x model=4 mesh sampling == single-device sampling."""
    model = LatentDiffusion(tiny_config())
    params = model.init_params(jax.random.PRNGKey(0))
    pipe = GenerationPipeline(model, num_steps=4, eta=0.0, decode=False)
    batch = {k: v for k, v in tiny_batch(b=8).items()
             if k in ("text_emb", "style_emb", "smpl", "person_mask")}
    key = jax.random.PRNGKey(5)

    z_single = np.asarray(pipe.generate(params, batch, key))

    mesh = create_mesh((2, 4))
    validate_divisibility(params, tp=4, num_heads=4)
    params_tp = shard_params(mesh, params)
    bsh = batch_sharding(mesh)
    batch_s = {k: jax.device_put(v, bsh) for k, v in batch.items()}
    z_tp = np.asarray(pipe.generate(params_tp, batch_s, key))

    # GSPMD only re-associates reductions; results agree to fp tolerance
    np.testing.assert_allclose(z_tp, z_single, atol=2e-4, rtol=2e-4)


def test_tp_training_step_matches_single_device(eight_devices):
    """Loss + grads under the model axis match the unsharded step."""
    from test_latent_diffusion import split_params

    model = LatentDiffusion(tiny_config())
    params = model.init_params(jax.random.PRNGKey(0))
    trainable, frozen = split_params(params)
    batch = tiny_batch(b=8)

    def loss_fn(p, b):
        return model.training_loss(p, b, jax.random.PRNGKey(1),
                                   frozen_params=frozen)

    (loss_1, _), grads_1 = jax.value_and_grad(loss_fn, has_aux=True)(
        trainable, batch)

    mesh = create_mesh((2, 4))
    trainable_tp = shard_params(mesh, trainable)
    bsh = batch_sharding(mesh)
    batch_s = {k: jax.device_put(v, bsh) for k, v in batch.items()}
    (loss_tp, _), grads_tp = jax.jit(
        jax.value_and_grad(loss_fn, has_aux=True))(trainable_tp, batch_s)

    np.testing.assert_allclose(float(loss_tp), float(loss_1),
                               atol=1e-5, rtol=1e-5)
    for g1, g2 in zip(jax.tree.leaves(grads_1["unet"]),
                      jax.tree.leaves(grads_tp["unet"])):
        np.testing.assert_allclose(np.asarray(g2), np.asarray(g1),
                                   atol=5e-4, rtol=5e-4)

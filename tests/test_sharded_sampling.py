"""Data-parallel sampling across the mesh: batch-sharded generate."""

import numpy as np
import jax
import jax.numpy as jnp

from upgpt_tpu.diffusion.latent_diffusion import LatentDiffusion
from upgpt_tpu.inference.pipeline import GenerationPipeline
from upgpt_tpu.parallel.mesh import batch_sharding, create_mesh, replicated_sharding

from test_latent_diffusion import tiny_batch, tiny_config


def test_sharded_generate_matches_single_device(eight_devices):
    model = LatentDiffusion(tiny_config())
    params = model.init_params(jax.random.PRNGKey(0))
    pipe = GenerationPipeline(model, num_steps=4, eta=0.0, decode=False)
    batch = {k: v for k, v in tiny_batch(b=8).items()
             if k in ("text_emb", "style_emb", "smpl", "person_mask")}
    key = jax.random.PRNGKey(5)

    z_single = np.asarray(pipe.generate(params, batch, key))

    mesh = create_mesh((8, 1))
    rep = replicated_sharding(mesh)
    bsh = batch_sharding(mesh)
    params_r = jax.device_put(params, rep)
    batch_s = {k: jax.device_put(v, bsh) for k, v in batch.items()}
    z_sharded = np.asarray(pipe.generate(params_r, batch_s, key))

    # per-batch-element RNG (x_T) is key-derived and identical under
    # threefry_partitionable, so sharded == single-device
    np.testing.assert_allclose(z_sharded, z_single, atol=1e-5, rtol=1e-5)

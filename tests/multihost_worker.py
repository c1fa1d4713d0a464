"""Subprocess worker for test_multihost: one host of a 2-process pod.

Each worker owns 4 virtual CPU devices; `jax.distributed.initialize` joins
them into one 8-device multi-controller runtime (the TPU-pod execution
model, reference Lightning `num_nodes` / DDP multi-node). The worker then
runs ONE real train step of the tiny LatentDiffusion over the global mesh,
feeding only its host-local slice of the global batch through the exact
production path (`host_local_slice` -> `shard_batch` ->
`make_array_from_process_local_data`), and writes the resulting loss and a
parameter checksum to a JSON file for the parent test to compare against
the single-process 8-device reference.
"""

import json
import os
import sys


def main() -> None:
    port, pid, out_path = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    mode = sys.argv[4] if len(sys.argv) > 4 else "train"
    here = os.path.dirname(os.path.abspath(__file__))
    sys.path.insert(0, os.path.dirname(here))  # repo root -> upgpt_tpu
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    os.environ.setdefault("HF_HUB_OFFLINE", "1")
    os.environ.setdefault("TRANSFORMERS_OFFLINE", "1")

    import jax

    # sitecustomize may have imported jax already (axon plugin); the config
    # update wins over the baked JAX_PLATFORMS env default (conftest.py does
    # the same for the in-pytest virtual mesh)
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_threefry_partitionable", True)

    from upgpt_tpu.parallel import multihost

    multihost.initialize(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=2,
        process_id=pid,
    )
    assert jax.process_count() == 2, jax.process_count()
    assert jax.device_count() == 8, jax.device_count()
    assert len(jax.local_devices()) == 4

    import numpy as np

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from test_latent_diffusion import tiny_batch, tiny_config, split_params

    from upgpt_tpu.diffusion.latent_diffusion import LatentDiffusion
    from upgpt_tpu.parallel.mesh import (
        batch_sharding, create_mesh, host_local_slice, replicated_sharding,
        shard_batch,
    )
    from upgpt_tpu.training.lr import lambda_linear_schedule
    from upgpt_tpu.training.train_state import create_train_state, train_step

    model = LatentDiffusion(tiny_config())
    params = model.init_params(jax.random.PRNGKey(0))
    trainable, frozen = split_params(params)
    state = create_train_state(
        trainable, learning_rate=1e-4,
        scheduler=lambda_linear_schedule([2], [1.0], [1.0], [1e-6], [10**13]),
        use_ema=True,
    )

    # every host materializes the same global batch deterministically, then
    # keeps only its slice — standing in for the host-sharded DataLoader
    global_batch = {k: np.asarray(v) for k, v in tiny_batch(b=8).items()}
    sl = host_local_slice(8)
    assert (sl.stop - sl.start) == 4
    local = {k: v[sl] for k, v in global_batch.items()}

    mesh = create_mesh((8, 1))
    rep = replicated_sharding(mesh)
    bsh = batch_sharding(mesh)
    batch = shard_batch(mesh, local)  # multi-process assembly path

    def rep_put(tree):
        return jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(
                rep, np.asarray(x)),
            tree,
        )

    state_r, frozen_r = rep_put(state), rep_put(frozen)
    rng = jax.random.PRNGKey(3)
    step_fn = jax.jit(
        lambda s, f, b: train_step(model, s, f, b, rng),
        in_shardings=(rep, rep, bsh),
    )
    new_state, metrics = step_fn(state_r, frozen_r, batch)

    # fully-replicated outputs are addressable on every host
    loss = float(np.asarray(jax.device_get(metrics["loss"])))
    checksum = float(sum(
        np.abs(np.asarray(jax.device_get(leaf), np.float64)).sum()
        for leaf in jax.tree.leaves(new_state.params)
    ))
    primary = multihost.is_primary()

    png = None
    if mode == "log_images":
        # the ImageLogger path is a COLLECTIVE (trainer.log_images docstring):
        # every process executes the sampler jit + the replicate-reshard;
        # only process 0 writes PNGs. A deadlock here would hang the pod at
        # the first image-log step in production.
        from upgpt_tpu.inference.encoders import DebugConditioningEncoder
        from upgpt_tpu.training.trainer import Trainer, TrainerConfig

        logdir = os.path.join(os.path.dirname(out_path), f"imglog_w{pid}")
        trainer = Trainer(
            model,
            TrainerConfig(logdir=logdir, log_images_every=None,
                          image_log_ddim_steps=2, use_ema=True),
            DebugConditioningEncoder(context_dim=64, text_len=7),
            mesh=mesh,
        )
        # log_images shards host-local arrays itself (process_count > 1)
        img_batch = {k: v for k, v in local.items()}
        trainer.log_images(new_state, frozen_r, img_batch, step=1)
        expected = os.path.join(logdir, "images", "samples_00000001.png")
        png = expected if os.path.exists(expected) else None

    multihost.barrier("test_multihost_done")
    with open(out_path, "w") as f:
        json.dump({"pid": pid, "loss": loss, "checksum": checksum,
                   "primary": primary, "step": int(new_state.step),
                   "png": png}, f)


if __name__ == "__main__":
    main()

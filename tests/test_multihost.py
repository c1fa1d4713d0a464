"""Multi-host (multi-node) data parallelism: TWO real OS processes, four
virtual CPU devices each, joined by `jax.distributed.initialize` into one
8-device multi-controller runtime — the execution model of a TPU pod and
the TPU-native replacement for the reference's multi-node DDP
(`Trainer(num_nodes=...)`, main.py:581).

The workers run one REAL train step over the global mesh through the
production data path (host-sliced batch -> `shard_batch` ->
`make_array_from_process_local_data`); the parent compares their loss and
updated-parameter checksum against the same step computed single-process
on this pytest process's own 8-device mesh. Host-sharded loader semantics
(DistributedSampler equivalence) are unit-tested in-process.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest
import jax

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)


def _free_port() -> int:
    # SO_REUSEADDR narrows the close->coordinator-rebind race window
    s = socket.socket()
    s.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_pod_matches_single_process(eight_devices, tmp_path):
    port = _free_port()
    outs = [tmp_path / f"w{i}.json" for i in range(2)]
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # worker sets its own 4-device flag
    env["JAX_PLATFORMS"] = "cpu"
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(HERE, "multihost_worker.py"),
             str(port), str(i), str(outs[i])],
            cwd=REPO, env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        )
        for i in range(2)
    ]
    logs = []
    for p in procs:
        out, _ = p.communicate(timeout=900)
        logs.append(out.decode(errors="replace"))
    for p, log in zip(procs, logs):
        assert p.returncode == 0, f"worker failed:\n{log[-3000:]}"

    results = [json.loads(o.read_text()) for o in outs]
    assert results[0]["primary"] and not results[1]["primary"]
    assert all(r["step"] == 1 for r in results)
    # both controllers computed the identical replicated result
    assert results[0]["loss"] == results[1]["loss"]
    assert results[0]["checksum"] == results[1]["checksum"]

    # single-process 8-device reference on THIS process's virtual mesh
    from test_latent_diffusion import tiny_batch, tiny_config, split_params

    from upgpt_tpu.diffusion.latent_diffusion import LatentDiffusion
    from upgpt_tpu.parallel.mesh import (
        batch_sharding, create_mesh, replicated_sharding, shard_batch,
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
    mesh = create_mesh((8, 1))
    rep, bsh = replicated_sharding(mesh), batch_sharding(mesh)
    batch = shard_batch(mesh, tiny_batch(b=8))
    rng = jax.random.PRNGKey(3)
    step_fn = jax.jit(
        lambda s, f, b: train_step(model, s, f, b, rng),
        in_shardings=(rep, rep, bsh),
    )
    new_state, metrics = step_fn(
        jax.device_put(state, rep), jax.device_put(frozen, rep), batch)

    ref_loss = float(np.asarray(metrics["loss"]))
    ref_checksum = float(sum(
        np.abs(np.asarray(leaf, np.float64)).sum()
        for leaf in jax.tree.leaves(new_state.params)
    ))
    np.testing.assert_allclose(results[0]["loss"], ref_loss, rtol=2e-5)
    np.testing.assert_allclose(results[0]["checksum"], ref_checksum,
                               rtol=2e-6)


def test_host_sharded_loader_partitions_global_batch():
    """Two host-views of the same loader are a disjoint partition of each
    global batch, in order — DistributedSampler parity."""
    from upgpt_tpu.data.deepfashion import DataLoader

    class Toy:
        def __len__(self):
            return 24

        def __getitem__(self, i):
            return {"x": np.full((2,), float(i), np.float32)}

    full = DataLoader(Toy(), batch_size=8, shuffle=True, seed=5)
    hosts = [
        DataLoader(Toy(), batch_size=8, shuffle=True, seed=5,
                   process_index=i, process_count=2)
        for i in range(2)
    ]
    for gb, h0, h1 in zip(full.epoch(2), hosts[0].epoch(2), hosts[1].epoch(2)):
        assert h0["x"].shape[0] == 4 and h1["x"].shape[0] == 4
        np.testing.assert_array_equal(
            np.concatenate([h0["x"], h1["x"]]), gb["x"])


def test_prefetch_loader_host_sharding_matches_serial():
    from upgpt_tpu.data.deepfashion import DataLoader, PrefetchDataLoader

    class Toy:
        def __len__(self):
            return 16

        def __getitem__(self, i):
            return {"x": np.full((3,), float(i), np.float32)}

    serial = DataLoader(Toy(), batch_size=4, shuffle=True, seed=1,
                        process_index=1, process_count=2)
    threaded = PrefetchDataLoader(Toy(), batch_size=4, shuffle=True, seed=1,
                                  num_workers=2, process_index=1,
                                  process_count=2)
    for sb, tb in zip(serial.epoch(0), threaded.epoch(0)):
        np.testing.assert_array_equal(sb["x"], tb["x"])


def test_single_host_defaults_unchanged():
    from upgpt_tpu.data.deepfashion import DataLoader

    class Toy:
        def __len__(self):
            return 8

        def __getitem__(self, i):
            return {"x": np.asarray([float(i)], np.float32)}

    batches = list(DataLoader(Toy(), batch_size=4, shuffle=False).epoch(0))
    assert [b["x"].shape[0] for b in batches] == [4, 4]
    np.testing.assert_array_equal(
        np.concatenate([b["x"][:, 0] for b in batches]), np.arange(8.0))


def test_initialize_is_noop_on_single_host(monkeypatch):
    """`cli train --multihost` must be safe on a single machine: with no
    coordinator argument and no cluster environment, initialize() returns
    without touching jax.distributed."""
    import upgpt_tpu.parallel.multihost as mh

    for v in ("JAX_COORDINATOR_ADDRESS", "COORDINATOR_ADDRESS",
              "MEGASCALE_COORDINATOR_ADDRESS"):
        monkeypatch.delenv(v, raising=False)
    # single-entry TPU_WORKER_HOSTNAMES (as single-chip runtimes set it)
    # must NOT be taken as a pod signal
    monkeypatch.setenv("TPU_WORKER_HOSTNAMES", "localhost")

    called = []
    monkeypatch.setattr(
        jax.distributed, "initialize",
        lambda **kw: called.append(kw), raising=True)
    monkeypatch.setattr(mh, "_INITIALIZED", False)
    mh.initialize()
    assert called == []

    # a multi-entry worker list IS a pod signal
    monkeypatch.setenv("TPU_WORKER_HOSTNAMES", "host-a,host-b")
    mh.initialize()
    assert len(called) == 1
    # and the wrapper is idempotent once connected
    monkeypatch.setattr(mh, "_INITIALIZED", True)
    mh.initialize()
    assert len(called) == 1


def test_tail_batch_wrap_padding():
    """drop_last=False tail batches that don't divide process_count are
    wrap-padded (DistributedSampler semantics): equal per-host counts, no
    sample silently dropped."""
    from upgpt_tpu.data.deepfashion import DataLoader

    class Toy:
        def __len__(self):
            return 9  # batches of 4 -> tail batch of 1

        def __getitem__(self, i):
            return {"x": np.asarray([float(i)], np.float32)}

    hosts = [
        DataLoader(Toy(), batch_size=4, shuffle=False, drop_last=False,
                   process_index=i, process_count=2)
        for i in range(2)
    ]
    b0, b1 = list(hosts[0].epoch(0)), list(hosts[1].epoch(0))
    assert len(b0) == len(b1) == 3
    # tail batch: global sel=[8]; wrap-pad -> host0=[8], host1=[8]
    np.testing.assert_array_equal(b0[-1]["x"], [[8.0]])
    np.testing.assert_array_equal(b1[-1]["x"], [[8.0]])
    # full batches still partition exactly
    np.testing.assert_array_equal(
        np.concatenate([b0[0]["x"], b1[0]["x"]])[:, 0], np.arange(4.0))


@pytest.mark.slow
def test_two_process_pod_log_images_collective(eight_devices, tmp_path):
    """Multi-host ImageLogger (VERDICT r2 item 6): both processes execute the
    sampling jit + replicate-reshard collectives; only process 0 writes the
    PNG. A rank-gated sampler would deadlock this test instead of passing."""
    port = _free_port()
    outs = [tmp_path / f"w{i}.json" for i in range(2)]
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(HERE, "multihost_worker.py"),
             str(port), str(i), str(outs[i]), "log_images"],
            cwd=REPO, env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        )
        for i in range(2)
    ]
    logs = []
    for p in procs:
        out, _ = p.communicate(timeout=900)
        logs.append(out.decode(errors="replace"))
    for p, log in zip(procs, logs):
        assert p.returncode == 0, f"worker failed:\n{log[-3000:]}"

    results = [json.loads(o.read_text()) for o in outs]
    r0 = next(r for r in results if r["pid"] == 0)
    r1 = next(r for r in results if r["pid"] == 1)
    assert r0["primary"] and r0["png"], "primary wrote no sample grid"
    assert not r1["primary"] and r1["png"] is None, (
        "non-primary must not write image artifacts")

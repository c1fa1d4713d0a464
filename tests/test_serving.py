"""Serving engine: batch packing, padding, pipelining, failure isolation."""

import time

import numpy as np
import jax
import pytest

from upgpt_tpu.diffusion.latent_diffusion import LatentDiffusion
from upgpt_tpu.inference.pipeline import GenerationPipeline
from upgpt_tpu.inference.serving import ServingEngine

from test_latent_diffusion import tiny_config


def _cond(seed, h=8, w=8):
    rng = np.random.default_rng(seed)
    return {
        "text_emb": rng.normal(size=(7, 64)).astype(np.float32),
        "style_emb": rng.normal(size=(9, 64)).astype(np.float32),
        "smpl": rng.normal(size=(1, 85)).astype(np.float32),
        "person_mask": rng.normal(size=(h, w, 1)).astype(np.float32),
    }


@pytest.fixture(scope="module")
def engine_parts():
    model = LatentDiffusion(tiny_config())
    params = model.init_params(jax.random.PRNGKey(0))
    pipe = GenerationPipeline(model, num_steps=5, eta=0.0)
    return pipe, params


def test_padded_tail_batch_matches_direct_call(engine_parts):
    """3 requests into a batch-4 engine: results equal the engine's exact
    batch recipe run directly (same padding rule, same fold_in key), and
    each future receives its own row."""
    pipe, params = engine_parts
    eng = ServingEngine(pipe, params, batch_size=4, max_delay_s=0.05)
    eng.start()
    conds = [_cond(i) for i in range(3)]
    futs = [eng.submit(c) for c in conds]
    outs = [f.result(timeout=120) for f in futs]
    eng.stop()

    assert eng.stats.summary()["requests"] == 3
    assert eng.stats.batches >= 1
    # engine recipe: pad with the last request's row, key = fold_in(base, 0)
    batch = {
        k: np.stack([c[k] for c in conds] + [conds[-1][k]])
        for k in conds[0]
    }
    want = np.asarray(pipe.generate(
        params, batch, jax.random.fold_in(jax.random.PRNGKey(0), 0)))
    for i, out in enumerate(outs):
        assert out.shape == want.shape[1:]
        np.testing.assert_allclose(out, want[i], atol=1e-5)


def test_many_requests_multiple_batches(engine_parts):
    pipe, params = engine_parts
    eng = ServingEngine(pipe, params, batch_size=2, max_delay_s=0.02)
    eng.start()
    futs = [eng.submit(_cond(i)) for i in range(5)]
    outs = [f.result(timeout=300) for f in futs]
    eng.stop()
    assert all(o.shape == outs[0].shape for o in outs)
    s = eng.stats.summary()
    assert s["requests"] == 5
    assert eng.stats.batches == 3  # 2 + 2 + padded tail
    assert eng.stats.padded_slots == 1
    assert s["p95_latency_s"] >= s["p50_latency_s"] > 0


def test_bad_request_fails_only_its_batch(engine_parts):
    pipe, params = engine_parts
    eng = ServingEngine(pipe, params, batch_size=2, max_delay_s=0.01)
    eng.start()
    bad = _cond(0)
    bad["text_emb"] = bad["text_emb"][:, :32]  # wrong embedding width
    f_bad = eng.submit(bad)
    with pytest.raises(Exception):
        f_bad.result(timeout=120)
    # engine keeps serving after the failed batch
    f_ok = eng.submit(_cond(1))
    assert f_ok.result(timeout=120).shape[-1] == 3
    eng.stop()


def test_mesh_sharded_serving_matches_single_device(engine_parts):
    """DP serving over an 8-device mesh returns the same images as the
    unsharded engine (jit scales the same program; padding included)."""
    from upgpt_tpu.parallel.mesh import create_mesh

    pipe, params = engine_parts
    conds = [_cond(i) for i in range(5)]  # 5 -> one padded batch of 8

    def run(mesh):
        eng = ServingEngine(pipe, params, batch_size=8, max_delay_s=0.05,
                            mesh=mesh)
        eng.start()
        outs = [f.result(timeout=300) for f in [eng.submit(c) for c in conds]]
        eng.stop()
        return outs

    single = run(None)
    mesh = create_mesh((8, 1))
    sharded = run(mesh)
    for a, b in zip(single, sharded):
        np.testing.assert_allclose(a, b, atol=2e-4)


def test_mesh_batch_divisibility_checked(engine_parts):
    from upgpt_tpu.parallel.mesh import create_mesh

    pipe, params = engine_parts
    with pytest.raises(ValueError, match="not divisible"):
        ServingEngine(pipe, params, batch_size=6, mesh=create_mesh((8, 1)))


def test_submit_before_start_raises(engine_parts):
    pipe, params = engine_parts
    eng = ServingEngine(pipe, params, batch_size=2)
    with pytest.raises(RuntimeError):
        eng.submit(_cond(0))


def test_stop_drains_queue(engine_parts):
    """Requests still queued when stop() is called are served, not dropped."""
    pipe, params = engine_parts
    eng = ServingEngine(pipe, params, batch_size=2, max_delay_s=5.0)
    eng.start()
    futs = [eng.submit(_cond(i)) for i in range(3)]
    time.sleep(0.01)
    eng.stop()  # drain: no 5 s window at shutdown
    for f in futs:
        assert f.result(timeout=120) is not None


def test_group_atomicity_and_pushback(engine_parts):
    """A group never splits across batches: 3 + 2 into a batch-4 engine
    packs as (3 + 1 pad) then (2 + 2 pads), never (3+1, 1+3)."""
    pipe, params = engine_parts
    eng = ServingEngine(pipe, params, batch_size=4, max_delay_s=0.2)
    eng.start()
    futs_a = eng.submit_group([_cond(i) for i in range(3)])
    futs_b = eng.submit_group([_cond(10 + i) for i in range(2)])
    outs = [f.result(timeout=300) for f in futs_a + futs_b]
    eng.stop()
    assert all(o.shape == outs[0].shape for o in outs)
    assert eng.stats.summary()["requests"] == 5
    assert eng.stats.batches == 2
    assert eng.stats.padded_slots == (4 - 3) + (4 - 2)


def test_group_larger_than_batch_rejected(engine_parts):
    pipe, params = engine_parts
    eng = ServingEngine(pipe, params, batch_size=2, max_delay_s=0.01)
    eng.start()
    with pytest.raises(ValueError, match="exceeds batch_size"):
        eng.submit_group([_cond(i) for i in range(3)])
    eng.stop()


def test_x_T_seed_shares_initial_noise(engine_parts):
    """Equal x_T_seeds in one batch -> identical x_T: identical conds with
    the same seed produce identical images (eta=0 sampler is deterministic
    given x_T), a different seed produces a different image."""
    pipe, params = engine_parts
    eng = ServingEngine(pipe, params, batch_size=4, max_delay_s=0.2)
    eng.start()
    base = _cond(0)
    conds = []
    for seed in (7, 7, 9):
        c = dict(base)
        c["x_T_seed"] = np.uint32(seed)
        conds.append(c)
    outs = [f.result(timeout=300) for f in eng.submit_group(conds)]
    eng.stop()
    np.testing.assert_allclose(outs[0], outs[1], atol=1e-6)
    assert np.abs(outs[0] - outs[2]).max() > 1e-3


def test_cli_dp_serving(tmp_path):
    """`cli serve --dp 2`: engine construction over a 2-device data mesh
    (XLA-path model rebuild), requests served through the sharded engine."""
    import argparse

    import orbax.checkpoint as ocp

    from upgpt_tpu.cli import _build_serving
    from upgpt_tpu.zoo import build_latent_diffusion

    model = build_latent_diffusion(variant="tiny", use_flash_attention=False)
    params = model.init_params(jax.random.PRNGKey(0))
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(tmp_path / "ckpt", params)
    ckptr.wait_until_finished()

    cfg = {"model": {"target": "upgpt_tpu.zoo.build_latent_diffusion",
                     "params": {"variant": "tiny",
                                "use_flash_attention": False}},
           "sampling": {"ddim_steps": 4, "eta": 0.0}}
    args = argparse.Namespace(
        ckpt=str(tmp_path / "ckpt"), debug_encoder=True, dp=2, batch=4,
        max_delay=0.05, seed=0, steps=4, sampler="ddim",
        upscale_base=None, upscale_ckpt=None)
    engine, builder, label = _build_serving(cfg, args)
    assert "dp2" in label
    assert engine.mesh is not None and engine.mesh.shape["data"] == 2
    # mesh path must run the XLA lowering (Pallas is per-device only)
    assert not engine.pipeline.model.config.unet.use_fused_groupnorm
    engine.start()
    futs = [engine.submit(builder.build({"txt": f"coat {i}"}))
            for i in range(2)]
    outs = [f.result(timeout=300) for f in futs]
    engine.stop()
    h, w = model.config.latent_size
    assert all(o.shape == (h * 8, w * 8, 3) or o.shape[-1] == 3
               for o in outs)


def test_chained_upscale_serving():
    """ServingEngine over the 2-stage ChainedUpscalePipeline: one submit
    yields a 512-stage image; both stages batch through the same engine."""
    from test_pipeline_extras import _tiny_upscale_config
    from upgpt_tpu.inference.pipeline import ChainedUpscalePipeline

    base = LatentDiffusion(tiny_config())
    up = LatentDiffusion(_tiny_upscale_config())
    params = {
        "base": base.init_params(jax.random.PRNGKey(0)),
        "up": up.init_params(jax.random.PRNGKey(1)),
    }
    chained = ChainedUpscalePipeline(base, up, num_steps=4, eta=0.0)
    eng = ServingEngine(chained, params, batch_size=2, max_delay_s=0.05)
    eng.start()
    futs = [eng.submit(_cond(i)) for i in range(3)]
    outs = [f.result(timeout=300) for f in futs]
    eng.stop()
    assert all(o.shape == (32, 24, 3) for o in outs)
    assert eng.stats.summary()["requests"] == 3


def test_mesh_throughput_accounting_with_pushback(engine_parts):
    """DP>1 throughput accounting (VERDICT r2 item 6): under an 8-device
    mesh, padding waste and group pushback are counted exactly — a group of
    5 then a group of 4 into a batch-8 engine must pack as (5 + 3 pads) and
    (4 + 4 pads), with occupancy = 9/16, never splitting a group across
    sharded batches."""
    from upgpt_tpu.parallel.mesh import create_mesh

    pipe, params = engine_parts
    mesh = create_mesh((8, 1))
    eng = ServingEngine(pipe, params, batch_size=8, max_delay_s=0.2,
                        mesh=mesh)
    eng.start()
    futs_a = eng.submit_group([_cond(i) for i in range(5)])
    futs_b = eng.submit_group([_cond(20 + i) for i in range(4)])
    outs = [f.result(timeout=600) for f in futs_a + futs_b]
    eng.stop()

    assert all(np.isfinite(o).all() for o in outs)
    assert eng.stats.batches == 2
    assert eng.stats.requests == 9
    assert eng.stats.images == 16
    assert eng.stats.padded_slots == (8 - 5) + (8 - 4)
    assert eng.stats.summary()["occupancy"] == pytest.approx(9 / 16)

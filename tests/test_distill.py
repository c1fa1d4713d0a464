"""Progressive distillation: grid nesting, target inversion, v-param, smoke.

The distillation math (training/distill.py) has no reference counterpart —
the reference serves DDIM-200 (app.py:55). These tests pin the properties
the few-step claim rests on: the halving grids nest exactly, the x-target
inversion is algebraically exact (a student step from the target lands on
the teacher's two-step result to fp32 precision), the v parameterization
round-trips through LatentDiffusion.to_eps, and a tiny end-to-end ladder
optimizes and samples through the standard GenerationPipeline.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from upgpt_tpu.diffusion.latent_diffusion import LatentDiffusion
from upgpt_tpu.training.distill import (
    DistillConfig, distill_step, make_distill_grids, make_stage_tables,
    progressive_distill,
)
from upgpt_tpu.training.train_state import create_train_state

from test_latent_diffusion import tiny_config, tiny_batch, split_params


def _schedule():
    return LatentDiffusion(tiny_config()).schedule


def test_grid_nesting_and_halving():
    sched = _schedule()
    grids = make_distill_grids(sched, start_steps=16, end_steps=1)
    assert [len(g) for g in grids] == [16, 8, 4, 2, 1]
    for parent, child in zip(grids, grids[1:]):
        # child = odd indices of parent: subset, and keeps t_max
        assert set(child) <= set(parent)
        np.testing.assert_array_equal(child, parent[1::2])
        assert child[-1] == parent[-1]
    # ascending, in-range ints
    for g in grids:
        assert (np.diff(g) > 0).all()
        assert g[0] >= 1 and g[-1] < sched.num_timesteps


def test_grid_requires_power_of_two_ladder():
    sched = _schedule()
    with pytest.raises(ValueError):
        make_distill_grids(sched, start_steps=12, end_steps=5)


def test_stage_tables_match_parent_points():
    sched = _schedule()
    (parent, child) = make_distill_grids(sched, 8, 4)
    tbl = make_stage_tables(sched, parent)
    np.testing.assert_array_equal(tbl.ts, child)
    np.testing.assert_array_equal(tbl.t_mid, parent[0::2])
    acp = sched.alphas_cumprod
    # step i's target point is parent[2i-1]; i=0 targets the DDIM terminal
    np.testing.assert_allclose(tbl.a_next[0], np.sqrt(acp[0]), rtol=1e-6)
    np.testing.assert_allclose(
        tbl.a_next[1:], np.sqrt(acp[parent[1:-1:2]]), rtol=1e-6)


def test_target_inversion_is_exact():
    """The distilled x target, plugged into ONE student DDIM step, lands
    exactly on the teacher's two-step endpoint — for ANY teacher outputs."""
    sched = _schedule()
    (parent, _) = make_distill_grids(sched, 8, 4)
    tbl = make_stage_tables(sched, parent)
    r = np.random.default_rng(0)
    for i in range(tbl.num_steps):
        a_t, s_t = tbl.a_t[i], tbl.s_t[i]
        a_m, s_m = tbl.a_mid[i], tbl.s_mid[i]
        a_n, s_n = tbl.a_next[i], tbl.s_next[i]
        z_t = r.normal(size=(4, 4)).astype(np.float32)
        # arbitrary (not oracle) teacher predictions
        x1 = r.normal(size=(4, 4)).astype(np.float32)
        e1 = (z_t - a_t * x1) / s_t
        z_mid = a_m * x1 + s_m * e1
        x2 = r.normal(size=(4, 4)).astype(np.float32)
        e2 = (z_mid - a_m * x2) / s_m
        z_next = a_n * x2 + s_n * e2

        ratio = s_n / s_t
        x_tgt = (z_next - ratio * z_t) / (a_n - ratio * a_t)
        # one student DDIM step from (z_t, t) with x-prediction x_tgt
        eps_tgt = (z_t - a_t * x_tgt) / s_t
        z_student = a_n * x_tgt + s_n * eps_tgt
        np.testing.assert_allclose(z_student, z_next, rtol=2e-4, atol=2e-4)


def test_v_param_roundtrip_to_eps():
    model = LatentDiffusion(tiny_config(parameterization="v"))
    s = model.schedule
    r = np.random.default_rng(1)
    x0 = jnp.asarray(r.normal(size=(2, 8, 8, 4)), jnp.float32)
    eps = jnp.asarray(r.normal(size=(2, 8, 8, 4)), jnp.float32)
    t = jnp.asarray([10, 77], jnp.int32)
    a = jnp.asarray(s.sqrt_alphas_cumprod)[t][:, None, None, None]
    sg = jnp.asarray(s.sqrt_one_minus_alphas_cumprod)[t][:, None, None, None]
    z_t = a * x0 + sg * eps
    v = a * eps - sg * x0
    np.testing.assert_allclose(
        np.asarray(model.to_eps(v, z_t, t)), np.asarray(eps),
        rtol=1e-5, atol=1e-5)


def test_v_training_loss_runs():
    model = LatentDiffusion(tiny_config(parameterization="v"))
    params = model.init_params(jax.random.PRNGKey(0))
    trainable, frozen = split_params(params)
    loss, metrics = jax.jit(
        lambda p: model.training_loss(
            p, tiny_batch(), jax.random.PRNGKey(1), frozen_params=frozen)
    )(trainable)
    assert np.isfinite(float(loss))


def test_synthetic_dataset_contract():
    from upgpt_tpu.data.synthetic import SyntheticPairs

    cfg = tiny_config()
    train = SyntheticPairs.for_model(cfg, n_samples=64, split="train")
    val = SyntheticPairs.for_model(cfg, n_samples=64, split="val")
    # split disjointness + held-out size
    assert set(train.indices).isdisjoint(set(val.indices))
    assert len(val) >= 1 and len(train) + len(val) == 64
    # determinism
    a, b = train.sample(3), train.sample(3)
    for k in a:
        np.testing.assert_array_equal(a[k], b[k])
    # shapes follow the model geometry; conditioning varies across samples
    s = train.sample(0)
    assert s["image"].shape == (16, 16, 3)
    assert s["person_mask"].shape == (8, 8, 1)
    assert s["text_emb"].shape == (77, 64)
    assert s["style_emb"].shape == (9, 64)
    assert s["smpl"].shape == (1, 85)
    t = train.sample(1)
    assert np.abs(s["image"] - t["image"]).max() > 0.1
    assert np.abs(s["smpl"] - t["smpl"]).max() > 0.01
    assert s["image"].min() >= -1.0 and s["image"].max() <= 1.0
    # mask carries the bbox quirk values only
    assert set(np.unique(s["person_mask"])) <= {-1.0, np.float32(-0.99215686)}
    # iterator: batches stack and cycle deterministically per seed
    it = train.iterator(4, seed=1, as_jnp=False)
    b0 = next(it)
    assert b0["image"].shape == (4, 16, 16, 3)


def test_distill_step_decreases_loss():
    """30 updates against a fixed random teacher on one stage: the student
    must move toward the teacher's two-step targets (loss falls >=3x —
    regression onto a fixed deterministic target field is easy)."""
    model = LatentDiffusion(tiny_config())
    params = model.init_params(jax.random.PRNGKey(0))
    trainable, frozen = split_params(params)
    sched = model.schedule
    grids = make_distill_grids(sched, 8, 4)
    tbl = make_stage_tables(sched, grids[0])

    student = LatentDiffusion(tiny_config(parameterization="v"))
    # copy: the step donates the student state while the teacher enters as
    # a live argument — shared buffers would trip XLA's donation check
    state = create_train_state(
        jax.tree.map(lambda x: jnp.array(x, copy=True), trainable), 2e-3,
        use_ema=False, weight_decay=0.0)
    batch = tiny_batch(b=4)
    step = jax.jit(lambda s, tp, bt: distill_step(
        student, s, tp, "eps", frozen, bt, jax.random.PRNGKey(3), tbl),
        donate_argnums=0)
    losses = []
    for _ in range(30):
        state, m = step(state, trainable, batch)
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert np.mean(losses[-5:]) < np.mean(losses[:5]) / 3, losses[:5] + losses[-5:]


@pytest.mark.slow
def test_progressive_ladder_end_to_end():
    """Full 8->4->2 ladder on the tiny geometry with synthetic data, then
    sample the 2-step student through the standard GenerationPipeline on
    its own grid — the zero-new-serving-code claim."""
    from upgpt_tpu.data.synthetic import SyntheticPairs
    from upgpt_tpu.inference.pipeline import GenerationPipeline

    model = LatentDiffusion(tiny_config())
    params = model.init_params(jax.random.PRNGKey(0))
    trainable, frozen = split_params(params)
    data = SyntheticPairs.for_model(model.config, n_samples=32)

    student, s_params, grid, hist = progressive_distill(
        model, trainable, frozen, data.iterator(4, as_jnp=True),
        DistillConfig(start_steps=8, end_steps=2, steps_per_stage=20,
                      learning_rate=1e-3, use_ema=True, ema_decay=0.95,
                      adapt_steps=5),
        rng=jax.random.PRNGKey(5))
    assert student.config.parameterization == "v"
    assert len(grid) == 2
    # adapt entry (steps=start grid) + the two halving stages
    assert [h["steps"] for h in hist] == [8, 4, 2]
    assert hist[0].get("adapt") is True
    assert all(np.isfinite(h["loss"]) for h in hist)

    pipe = GenerationPipeline(student, num_steps=2, eta=0.0,
                              timesteps=grid)
    assert pipe.num_steps == 2
    full = dict(s_params)
    full["vae"] = frozen["vae"]
    bt = data.batch([0, 1])
    eb = {k: jnp.asarray(v) for k, v in bt.items() if k != "image"}
    out = np.asarray(pipe.generate(full, eb, jax.random.PRNGKey(7)))
    assert out.shape == (2, 16, 16, 3)
    assert np.isfinite(out).all()


def test_chained_start_grid():
    """Ladder chaining contract: an explicit start_grid is continued by
    halving ITS OWN points (a nested child grid is not the fresh grid of
    its size), and a non-power-of-two ratio is rejected."""
    from upgpt_tpu.data.synthetic import SyntheticPairs

    model = LatentDiffusion(tiny_config(parameterization="v"))
    params = model.init_params(jax.random.PRNGKey(0))
    trainable, frozen = split_params(params)
    data = SyntheticPairs.for_model(model.config, n_samples=16)

    custom = np.asarray([7, 23, 61, 97], np.int64)  # arbitrary ascending
    student, s_params, grid, hist = progressive_distill(
        model, trainable, frozen, data.iterator(2, as_jnp=True),
        DistillConfig(start_steps=4, end_steps=2, steps_per_stage=2,
                      learning_rate=1e-4, use_ema=False, adapt_steps=0),
        rng=jax.random.PRNGKey(1), start_grid=custom)
    np.testing.assert_array_equal(grid, custom[1::2])
    assert [h["steps"] for h in hist] == [2]

    with pytest.raises(ValueError):
        progressive_distill(
            model, trainable, frozen, data.iterator(2, as_jnp=True),
            DistillConfig(start_steps=6, end_steps=4, steps_per_stage=1,
                          adapt_steps=0),
            start_grid=np.asarray([1, 5, 9, 13, 17, 21], np.int64))

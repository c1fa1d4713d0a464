"""Progressive distillation: few-step students below the 8-step wall.

Round-4 evidence (docs/PERF.md): the karras rho sweep proved t-grid shaping
cannot rescue <=6-step sampling on this model family — every rho setting
lands below the uniform grid, and all land below the DDIM-50 quality bar.
The remaining order-of-magnitude serving lever is distillation: train a
student that takes ONE step where the teacher takes TWO (Salimans & Ho,
"Progressive Distillation for Fast Sampling of Diffusion Models",
arXiv:2202.00512), then halve repeatedly: 64 -> 32 -> 16 -> 8 -> 4 -> 2 -> 1
sampling steps. The reference has no counterpart (it serves DDIM-200,
app.py:55); the protocol being beaten is its DDIM sampler
(ldm/models/diffusion/ddim.py:113-163).

TPU shape: one distill update is ONE jitted XLA program — frozen-VAE
encode, the teacher's two eta=0 DDIM sub-steps, the student forward, and
the AdamW update — with the per-stage t-grids entering as static (N,)
tables gathered per sample, so everything stays inside a single fused
program (no host round-trips, no data-dependent control flow). Students
are v-parameterized (arXiv:2202.00512 §2.4 appendix D: well-conditioned at
the few-step grids' high-t points where an eps-model's x0 estimate blows
up by 1/alpha_t); every existing sampler consumes them through
`LatentDiffusion.to_eps`, so a distilled checkpoint serves through the
same GenerationPipeline / ServingEngine / cli with zero new serving code.

CFG note: guidance distillation (folding a guidance scale into the
student) is deliberately out of scope — this model family's released eval
protocol never builds an unconditional batch (reference ddpm.py:1380-1444),
so the students match the guidance-off serving path they replace.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Iterator, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from upgpt_tpu.diffusion.latent_diffusion import LatentDiffusion
from upgpt_tpu.diffusion.schedule import (
    DiffusionSchedule, make_karras_timesteps,
)
from upgpt_tpu.training.train_state import TrainState, create_train_state


# ---------------- nested halving grids ----------------


def make_distill_grids(
    schedule: DiffusionSchedule,
    start_steps: int = 64,
    end_steps: int = 1,
    method: str = "uniform",
    rho: float = 7.0,
) -> List[np.ndarray]:
    """[g_N, g_N/2, ..., g_end]: ascending int t-grids, each the odd-index
    subset of its parent so a student step spans exactly two teacher steps.

    With an ascending parent grid h of length 2N, the child is h[1::2]:
    the child keeps t_max (last element, odd index) and the child's final
    update g[0] -> clean has teacher midpoint h[0] — exactly the two
    sub-steps the parent's own DDIM sampler would take. start_steps must be
    end_steps * 2^k so every stage halves evenly.
    """
    if start_steps % end_steps or (start_steps // end_steps) & (
            start_steps // end_steps - 1):
        raise ValueError(
            f"start_steps={start_steps} must be end_steps={end_steps} * 2^k")
    T = schedule.num_timesteps
    if method == "karras":
        ts = make_karras_timesteps(schedule, start_steps, rho)
    else:
        ts = np.unique(
            np.round(np.linspace(1, T - 1, start_steps)).astype(np.int64))
    if len(ts) != start_steps:
        raise ValueError(
            f"grid collapsed to {len(ts)} unique points (wanted "
            f"{start_steps}); use a coarser start grid")
    grids = [ts]
    while len(ts) > end_steps:
        ts = ts[1::2]
        grids.append(ts)
    return grids


@dataclasses.dataclass(frozen=True)
class StageTables:
    """Static per-stage tables for one halving stage (all shape (N,)).

    Index i is the student step FROM t=ts[i]; its target point is the
    parent grid's next-lower point (parent[2i-1], or the DDIM terminal
    acp[0] point for i=0 — the same terminal the student's own sampler
    uses, diffusion/schedule.make_ddim_schedule alphas_prev[0]).
    """

    ts: np.ndarray       # (N,) int32 student grid, ascending
    a_t: np.ndarray      # sqrt(acp) at ts
    s_t: np.ndarray      # sqrt(1-acp) at ts
    t_mid: np.ndarray    # (N,) int32 teacher midpoint
    a_mid: np.ndarray
    s_mid: np.ndarray
    a_next: np.ndarray   # student-step target point
    s_next: np.ndarray

    @property
    def num_steps(self) -> int:
        return int(self.ts.shape[0])


def make_stage_tables(
    schedule: DiffusionSchedule, parent: np.ndarray
) -> StageTables:
    """Tables for distilling a parent-grid teacher into a child-grid student."""
    assert len(parent) % 2 == 0, "parent grid must have even length"
    acp = schedule.alphas_cumprod.astype(np.float64)
    child = parent[1::2]
    mid = parent[0::2]
    # target of student step i: parent[2i-1]; for i=0 the DDIM terminal
    # point acp[0] (make_ddim_schedule's alphas_prev for the last update)
    nxt_acp = np.concatenate([[acp[0]], acp[parent[1:-1:2]]])
    a = lambda x: np.sqrt(x).astype(np.float32)
    s = lambda x: np.sqrt(1.0 - x).astype(np.float32)
    return StageTables(
        ts=child.astype(np.int32),
        a_t=a(acp[child]), s_t=s(acp[child]),
        t_mid=mid.astype(np.int32),
        a_mid=a(acp[mid]), s_mid=s(acp[mid]),
        a_next=a(nxt_acp), s_next=s(nxt_acp),
    )


# ---------------- the distillation loss (one XLA program) ----------------


def _pred_to_x_eps(out, x, a, sg, param):
    """(x0_hat, eps_hat) from a model output under `param` at (a, sg)."""
    out = out.astype(jnp.float32)
    x = x.astype(jnp.float32)
    if param == "eps":
        eps = out
        x0 = (x - sg * eps) / a
    elif param == "v":
        x0 = a * x - sg * out
        eps = sg * x + a * out
    else:
        raise NotImplementedError(param)
    return x0, eps


def distill_loss(
    student: LatentDiffusion,
    student_params: Dict[str, Any],
    teacher_params: Dict[str, Any],
    teacher_param_type: str,
    frozen_params: Dict[str, Any],
    batch: Dict[str, jax.Array],
    key: jax.Array,
    tables: StageTables,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """One progressive-distillation loss evaluation (arXiv:2202.00512 alg. 2).

    Draw t from the STUDENT grid, noise the data latent to z_t, run the
    teacher two eta=0 DDIM sub-steps (t -> t_mid -> t_next) on the parent
    grid, and regress the student's one-step x0 prediction onto the x
    target that makes its single DDIM update land exactly on the teacher's
    two-step result. Loss is in x-space with the paper's truncated-SNR
    weight max(SNR, 1) (§4 eq. 13). The teacher path is stop_gradient'd.

    Teacher and student share the frozen VAE; each applies its OWN
    conditioning stages (the pose LinearProject / cond_fusion are part of
    the trainable tree being distilled).
    """
    model = student  # same architecture family for both parameter sets
    all_s = dict(student_params)
    all_t = dict(teacher_params)
    all_s.update(frozen_params)
    all_t.update(frozen_params)

    k_enc, k_i, k_noise = jax.random.split(key, 3)
    z0 = model.encode_first_stage(all_s, batch["image"], k_enc)
    b = z0.shape[0]
    shape = (-1, 1, 1, 1)

    n = tables.num_steps
    i = jax.random.randint(k_i, (b,), 0, n)
    g = lambda tbl: jnp.asarray(tbl)[i]
    t = g(tables.ts)
    a_t = g(tables.a_t).reshape(shape)
    s_t = g(tables.s_t).reshape(shape)
    t_mid = g(tables.t_mid)
    a_mid = g(tables.a_mid).reshape(shape)
    s_mid = g(tables.s_mid).reshape(shape)
    a_next = g(tables.a_next).reshape(shape)
    s_next = g(tables.s_next).reshape(shape)

    eps = jax.random.normal(k_noise, z0.shape, jnp.float32)
    z_t = a_t * z0 + s_t * eps

    def build_cond(all_p):
        return {
            "c_crossattn": model.build_context(
                all_p, batch["text_emb"], batch.get("style_emb"),
                batch.get("smpl")),
            "c_concat": batch.get("person_mask"),
        }

    # teacher: two eta=0 DDIM sub-steps on the parent grid, no gradient
    cond_t = build_cond(all_t)
    out1 = model.apply_model(all_t, z_t, t, cond_t)
    x1, e1 = _pred_to_x_eps(out1, z_t, a_t, s_t, teacher_param_type)
    z_mid = a_mid * x1 + s_mid * e1
    out2 = model.apply_model(all_t, z_mid, t_mid, cond_t)
    x2, e2 = _pred_to_x_eps(out2, z_mid, a_mid, s_mid, teacher_param_type)
    z_next = a_next * x2 + s_next * e2

    # the x target whose single student DDIM step from (z_t, t) lands on
    # z_next exactly: z_next = a_next*x + s_next*(z_t - a_t*x)/s_t
    # => x = (z_next - (s_next/s_t) z_t) / (a_next - (s_next/s_t) a_t).
    # The denominator is strictly positive on a descending-sigma grid.
    ratio = s_next / s_t
    x_tgt = (z_next - ratio * z_t) / (a_next - ratio * a_t)
    x_tgt = jax.lax.stop_gradient(x_tgt)

    # student: one forward, x0 from its own parameterization
    cond_s = build_cond(all_s)
    out_s = model.apply_model(all_s, z_t, t, cond_s)
    x_hat, _ = _pred_to_x_eps(
        out_s, z_t, a_t, s_t, model.config.parameterization)

    snr = (a_t / s_t) ** 2
    w = jnp.maximum(snr, 1.0)
    sq = jnp.square(x_hat - x_tgt)
    if batch.get("loss_w") is not None:
        sq = sq * batch["loss_w"].astype(jnp.float32)
    loss = jnp.mean(w * sq)
    metrics = {
        "loss": loss,
        "loss_x": jnp.mean(sq),
        "teacher_gap": jnp.mean(jnp.square(x2 - x1)),
    }
    return loss, metrics


def distill_step(
    student: LatentDiffusion,
    state: TrainState,
    teacher_params: Dict[str, Any],
    teacher_param_type: str,
    frozen_params: Dict[str, Any],
    batch: Dict[str, jax.Array],
    rng: jax.Array,
    tables: StageTables,
) -> Tuple[TrainState, Dict[str, jax.Array]]:
    """One jitted distillation update (jit with teacher_param_type static)."""
    step_rng = jax.random.fold_in(rng, state.step)

    def loss_fn(params):
        return distill_loss(
            student, params, teacher_params, teacher_param_type,
            frozen_params, batch, step_rng, tables)

    (loss, metrics), grads = jax.value_and_grad(
        loss_fn, has_aux=True)(state.params)
    new_state = state.apply_gradients(grads)
    return new_state, metrics


def adapt_loss(
    student: LatentDiffusion,
    student_params: Dict[str, Any],
    teacher_params: Dict[str, Any],
    teacher_param_type: str,
    frozen_params: Dict[str, Any],
    batch: Dict[str, jax.Array],
    key: jax.Array,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """eps->v adaptation loss: regress the student's v output onto the
    teacher's own one-step prediction at the SAME t (uniform over the full
    trained range) — a pure re-parameterization fit, no step-halving."""
    model = student
    all_s = dict(student_params)
    all_t = dict(teacher_params)
    all_s.update(frozen_params)
    all_t.update(frozen_params)

    k_enc, k_t, k_noise = jax.random.split(key, 3)
    z0 = model.encode_first_stage(all_s, batch["image"], k_enc)
    b = z0.shape[0]
    sched = model.schedule
    t = jax.random.randint(k_t, (b,), 0, sched.num_timesteps)
    shape = (-1, 1, 1, 1)
    a = jnp.asarray(sched.sqrt_alphas_cumprod)[t].reshape(shape)
    sg = jnp.asarray(sched.sqrt_one_minus_alphas_cumprod)[t].reshape(shape)
    eps = jax.random.normal(k_noise, z0.shape, jnp.float32)
    z_t = a * z0 + sg * eps

    def build_cond(all_p):
        return {
            "c_crossattn": model.build_context(
                all_p, batch["text_emb"], batch.get("style_emb"),
                batch.get("smpl")),
            "c_concat": batch.get("person_mask"),
        }

    out_t = model.apply_model(all_t, z_t, t, build_cond(all_t))
    x_t_hat, e_t_hat = _pred_to_x_eps(out_t, z_t, a, sg, teacher_param_type)
    v_tgt = jax.lax.stop_gradient(a * e_t_hat - sg * x_t_hat)

    out_s = model.apply_model(all_s, z_t, t, build_cond(all_s))
    loss = jnp.mean(jnp.square(out_s.astype(jnp.float32) - v_tgt))
    return loss, {"loss": loss}


# ---------------- the stage driver ----------------


@dataclasses.dataclass(frozen=True)
class DistillConfig:
    start_steps: int = 64       # top teacher sampling grid
    end_steps: int = 4          # final student step count
    steps_per_stage: int = 2000  # optimizer steps per halving
    learning_rate: float = 1e-4  # paper: (much) lower than base training
    weight_decay: float = 0.0
    grid_method: str = "uniform"  # or "karras" (nested halving keeps shape)
    use_ema: bool = True          # hand each stage's EMA to the next stage
    ema_decay: float = 0.999      # shorter horizon than base training
    # anneal the learning rate linearly to zero over each stage
    # (arXiv:2202.00512 appendix: constant-lr Adam leaves a parameter-noise
    # floor around the optimum — measured round 5 as a per-step x-mse
    # plateau ~2e-4 that compounds over the student trajectory to ~0.91
    # MS-SSIM; annealing converges the last mile)
    anneal: bool = True
    # eps->v adaptation: N steps regressing a v-copy's output onto the
    # teacher's own one-step prediction at the same t. The result is used
    # ONLY as the stage-0 student INIT — the stage-0 teacher stays the
    # ORIGINAL eps model. (Round-5 full-geometry run measured why the
    # alternative fails: a 300-step adaptation converges to ~12% residual
    # v-RMS, and a ladder whose stage-0 TEACHER is that approximation is
    # quality-capped at 0.88 SSIM vs the real teacher's trajectory. As
    # init, the residual washes out because stage 0 optimizes the true
    # two-step target against the faithful teacher.)
    adapt_steps: int = 400


def progressive_distill(
    teacher: LatentDiffusion,
    teacher_params: Dict[str, Any],
    frozen_params: Dict[str, Any],
    data_iter: Iterator[Dict[str, jax.Array]],
    config: DistillConfig = DistillConfig(),
    rng: Optional[jax.Array] = None,
    log_fn: Optional[Callable[[str], None]] = None,
    jit_fn: Optional[Callable] = None,
    stage_cb: Optional[Callable[[int, np.ndarray, Dict[str, Any]], None]] = None,
    start_grid: Optional[np.ndarray] = None,
) -> Tuple[LatentDiffusion, Dict[str, Any], np.ndarray, List[Dict[str, Any]]]:
    """Run the full halving ladder; returns (student_model, student_params,
    student_grid, per_stage_history).

    The first stage distills the (usually eps-parameterized) base teacher;
    each later stage's teacher is the previous student (v). The student
    model is the teacher's config with parameterization="v" — identical
    architecture, so `init = copy of teacher weights` is exact.

    `jit_fn(step_fn)` lets callers wrap the stage step with shardings
    (pjit over a mesh) — default plain jax.jit with donated state.
    """
    log = log_fn or (lambda s: None)
    rng = jax.random.PRNGKey(0) if rng is None else rng

    student_cfg = dataclasses.replace(teacher.config, parameterization="v")
    student = LatentDiffusion(student_cfg)

    if start_grid is not None:
        # chained ladder: continue halving from a student's OWN saved grid
        # (a nested child grid is NOT the fresh karras/uniform grid of its
        # size — sidecar grids must be continued, not rebuilt)
        g = np.asarray(start_grid, dtype=np.int64)
        ratio = len(g) // config.end_steps
        if len(g) % config.end_steps or ratio & (ratio - 1):
            raise ValueError(
                f"start_grid of {len(g)} cannot halve to {config.end_steps}")
        grids = [g]
        while len(g) > config.end_steps:
            g = g[1::2]
            grids.append(g)
    else:
        grids = make_distill_grids(
            teacher.schedule, config.start_steps, config.end_steps,
            method=config.grid_method)
    t_params = teacher_params
    t_type = teacher.config.parameterization
    history: List[Dict[str, Any]] = []

    def _sched(n_steps):
        # linear-to-zero anneal over the stage (per-step multiplier)
        if not config.anneal:
            return None
        return lambda s: jnp.maximum(
            0.0, 1.0 - s.astype(jnp.float32) / n_steps)

    if t_type != "v" and config.adapt_steps > 0:
        log(f"adapt: {t_type} -> v, {config.adapt_steps} updates")
        state = create_train_state(
            jax.tree.map(lambda x: jnp.array(x, copy=True), t_params),
            learning_rate=config.learning_rate,
            scheduler=_sched(config.adapt_steps),
            use_ema=config.use_ema, ema_decay=config.ema_decay,
            weight_decay=config.weight_decay)

        def adapt_step(s, tp, bt, _type=t_type,
                       _rng=jax.random.fold_in(rng, 777)):
            step_rng = jax.random.fold_in(_rng, s.step)

            def loss_fn(p):
                return adapt_loss(student, p, tp, _type, frozen_params, bt,
                                  step_rng)

            (loss, metrics), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(s.params)
            return s.apply_gradients(grads), metrics

        step = (jit_fn or (lambda f: jax.jit(f, donate_argnums=0)))(adapt_step)
        t_dev = jax.tree.map(jnp.asarray, t_params)
        for k in range(config.adapt_steps):
            state, metrics = step(state, t_dev, next(data_iter))
            if k % max(1, config.adapt_steps // 5) == 0:
                log(f"  adapt step {k}: loss {float(metrics['loss']):.5f}")
        # INIT ONLY: the stage-0 student starts from the adapted weights,
        # but its teacher stays the original eps model (see DistillConfig)
        init_params = jax.device_get(
            state.ema.shadow if state.ema is not None else state.params)
        history.append({"stage": -1, "steps": len(grids[0]),
                        "loss": float(metrics["loss"]), "adapt": True})
    else:
        init_params = None

    for stage, parent in enumerate(grids[:-1]):
        tables = make_stage_tables(teacher.schedule, parent)
        n = tables.num_steps
        log(f"stage {stage}: {len(parent)} -> {n} steps, "
            f"{config.steps_per_stage} updates")

        # student init = COPY of the teacher weights (stage 0: the adapted
        # v-init when the adapt phase ran): the step donates the student
        # state while the teacher enters as a live argument, so shared
        # buffers would trip XLA's donation aliasing check
        src = init_params if (stage == 0 and init_params is not None) \
            else t_params
        state = create_train_state(
            jax.tree.map(lambda x: jnp.array(x, copy=True), src),
            learning_rate=config.learning_rate,
            scheduler=_sched(config.steps_per_stage),
            use_ema=config.use_ema, ema_decay=config.ema_decay,
            weight_decay=config.weight_decay)

        # teacher params enter as a traced ARGUMENT, not a closure — closed-
        # over device arrays are baked into the XLA program as constants
        # (a second full copy of the weights in HBM at flagship size)
        def stage_step(s, tp, bt, _type=t_type, _tables=tables,
                       _rng=jax.random.fold_in(rng, stage)):
            return distill_step(
                student, s, tp, _type, frozen_params, bt, _rng, _tables)

        step = (jit_fn or (lambda f: jax.jit(f, donate_argnums=0)))(stage_step)

        t_dev = jax.tree.map(jnp.asarray, t_params)
        last = {}
        for k in range(config.steps_per_stage):
            state, metrics = step(state, t_dev, next(data_iter))
            if k % max(1, config.steps_per_stage // 10) == 0:
                last = {m: float(v) for m, v in metrics.items()}
                log(f"  stage {stage} step {k}: loss {last['loss']:.5f} "
                    f"(x-mse {last['loss_x']:.5f})")
        last = {m: float(v) for m, v in metrics.items()}
        history.append({"stage": stage, "steps": n, **last})

        t_params = jax.device_get(
            state.ema.shadow if state.ema is not None else state.params)
        t_type = "v"
        if stage_cb is not None:
            # hand each intermediate student out (n-step grid + weights) so
            # callers can evaluate/save every rung of the ladder
            stage_cb(n, grids[stage + 1], t_params)

    return student, t_params, grids[-1], history

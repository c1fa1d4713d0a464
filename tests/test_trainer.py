"""Trainer e2e: synthetic DeepFashion tree -> DataLoader -> cond encoding ->
jitted train/eval steps -> checkpoints/resume/early-stop wiring."""

import numpy as np
import pytest
import jax

from upgpt_tpu.data.deepfashion import DataLoader
from upgpt_tpu.diffusion.latent_diffusion import LatentDiffusion
from upgpt_tpu.inference.encoders import DebugConditioningEncoder
from upgpt_tpu.training.trainer import Trainer, TrainerConfig

from test_latent_diffusion import tiny_config
from test_data import fashion_tree, _make  # noqa: F401  (fixture reuse)


class _TinyDs:
    """Wrap the real DeepFashionPair output into the tiny model's geometry."""

    def __init__(self, pair_ds):
        self.ds = pair_ds

    def __len__(self):
        return len(self.ds)

    def __getitem__(self, i):
        import numpy as np
        from PIL import Image

        s = self.ds[i]
        img = s["image"]
        # downscale to the tiny model's 16x16 image / 8x8 latent geometry
        small = np.asarray(
            Image.fromarray(((img + 1) * 127.5).astype(np.uint8)).resize((16, 16))
        ).astype(np.float32) / 127.5 - 1.0
        mask = np.asarray(
            Image.fromarray(s["person_mask"][..., 0]).resize((8, 8), Image.NEAREST)
        )[..., None]
        out = {"image": small, "person_mask": mask, "txt": s["txt"],
               "styles": s["styles"][:, ::16, ::16], "smpl": s["smpl"]}
        if "loss_w" in s:
            out["loss_w"] = np.asarray(
                Image.fromarray(s["loss_w"][..., 0]).resize((8, 8), Image.NEAREST)
            )[..., None]
        return out


@pytest.fixture(scope="module")
def loaders(fashion_tree):  # noqa: F811
    ds = _TinyDs(_make(fashion_tree, loss_weight={"face": 5.0}))
    train = DataLoader(ds, batch_size=2, shuffle=True, seed=0)
    val = DataLoader(ds, batch_size=2, shuffle=False)
    return train, val


def test_fit_two_epochs_checkpoint_resume(tmp_path, loaders):
    train, val = loaders
    model = LatentDiffusion(tiny_config())  # context_dim=64 in tiny_config
    enc = DebugConditioningEncoder(context_dim=64, text_len=7)
    cfg = TrainerConfig(
        base_learning_rate=1e-4, scale_lr=False, batch_size=2, max_epochs=2,
        log_every=1, log_images_every=None, logdir=str(tmp_path / "run"),
        early_stop_patience=None, warm_up_steps=1,
    )
    trainer = Trainer(model, cfg, enc)
    state = trainer.fit(train, val)
    assert int(state.step) == 2 * len(train)
    assert (tmp_path / "run" / "checkpoints" / "last").exists()
    assert (tmp_path / "run" / "metrics.jsonl").exists()
    lines = open(tmp_path / "run" / "metrics.jsonl").read().strip().split("\n")
    assert any('"val/loss_simple_ema"' in l for l in lines)

    # resume continues from saved step
    cfg2 = TrainerConfig(**{**cfg.__dict__, "max_epochs": 3})
    trainer2 = Trainer(model, cfg2, enc)
    state2 = trainer2.fit(train, val, resume=True)
    assert int(state2.step) == 3 * len(train)


def test_checkpoint_carries_frozen_vae(tmp_path, loaders):
    """The frozen first stage must travel with the checkpoint: a resumed run
    and `cli._restore_params` must see the SAME VAE the run trained against,
    never a fresh random init (round-1 advisor finding)."""
    train, val = loaders
    model = LatentDiffusion(tiny_config())
    enc = DebugConditioningEncoder(context_dim=64, text_len=7)
    cfg = TrainerConfig(
        base_learning_rate=1e-4, scale_lr=False, batch_size=2, max_epochs=1,
        log_every=1, log_images_every=None, logdir=str(tmp_path / "run"),
        early_stop_patience=None, warm_up_steps=1,
    )
    trainer = Trainer(model, cfg, enc)
    all_params = model.init_params(jax.random.PRNGKey(7))
    frozen = {"vae": all_params.pop("vae")}
    # host snapshots: fit's train step donates the state buffers
    frozen_np = jax.device_get(frozen)
    params_np = jax.device_get(all_params)
    trainer.fit(train, val, params=all_params, frozen_params=frozen)

    # the stored frozen VAE round-trips bit-exact through load_checkpoint
    from upgpt_tpu.training.train_state import create_train_state

    state = create_train_state(params_np, 1e-4, use_ema=True)
    _, restored = trainer.load_checkpoint(state, None)
    want = jax.tree.leaves(frozen_np["vae"])
    got = jax.tree.leaves(restored["vae"])
    assert all(np.array_equal(np.asarray(a), np.asarray(b))
               for a, b in zip(want, got))

    # _restore_params (cli sample/test path) picks the same VAE up
    from upgpt_tpu.cli import _restore_params

    params = _restore_params(model, str(tmp_path / "run" / "checkpoints" / "last"))
    got2 = jax.tree.leaves(params["vae"])
    assert all(np.array_equal(np.asarray(a), np.asarray(b))
               for a, b in zip(want, got2))


def test_async_save_failure_surfaces_on_next_join(tmp_path, loaders):
    """A wait=False checkpoint write that dies on the worker thread must not
    vanish: the next join point (another save, a restore, end of fit) raises
    so the trainer never silently believes the epoch checkpoint exists."""
    train, val = loaders
    model = LatentDiffusion(tiny_config())
    enc = DebugConditioningEncoder(context_dim=64, text_len=7)
    cfg = TrainerConfig(
        base_learning_rate=1e-4, scale_lr=False, batch_size=2, max_epochs=1,
        log_every=1, log_images_every=None, logdir=str(tmp_path / "run"),
        early_stop_patience=None, warm_up_steps=1,
    )
    trainer = Trainer(model, cfg, enc)

    class _Boom:
        def save(self, *a, **k):
            raise OSError("disk full")

        def wait_until_finished(self):
            pass

    trainer._ckpt = _Boom()
    from upgpt_tpu.training.train_state import create_train_state

    params = model.init_params(jax.random.PRNGKey(0))
    params.pop("vae")
    state = create_train_state(params, 1e-4, use_ema=True)

    trainer.save_checkpoint(state, None, "last", epoch=1, wait=False)
    with pytest.raises(RuntimeError, match="async checkpoint save failed"):
        trainer._join_pending_save()
    # the failure is reported once, then cleared
    trainer._join_pending_save()


def test_lr_scaling_rule():
    from upgpt_tpu.training.train_state import scaled_learning_rate

    # main.py:748-767: accumulate * ngpu * bs * base
    assert scaled_learning_rate(2e-6, 12, 4, 2, True) == pytest.approx(2e-6 * 2 * 4 * 12)
    assert scaled_learning_rate(2e-6, 12, 4, 2, False) == 2e-6


def test_compact_transport_exact_for_uint8_sourced_images():
    """uint8 image transport must be bit-exact for pixels that came from
    uint8 files (v/255*2-1 -> quantize -> dequantize is the identity), and
    the -0.99215686 mask constant survives the round trip."""
    import numpy as np
    import jax.numpy as jnp
    from upgpt_tpu.training.trainer import decode_transport, encode_transport

    v = np.arange(256, dtype=np.float32) / 255.0 * 2.0 - 1.0
    img = np.tile(v.reshape(1, 16, 16, 1), (2, 1, 1, 3)).astype(np.float32)
    mask = np.full((2, 4, 4, 1), -0.99215686, np.float32)
    emb = np.random.default_rng(0).normal(size=(2, 9, 64)).astype(np.float32)
    batch = {"image": img, "person_mask": mask, "style_emb": emb,
             "loss_w": np.ones((2, 4, 4, 1), np.float32)}

    enc = encode_transport(batch)
    assert enc["image"].dtype == np.uint8
    assert enc["person_mask"].dtype == np.uint8
    assert str(enc["style_emb"].dtype) == "bfloat16"
    assert enc["loss_w"].dtype == np.float32

    dec = decode_transport({k: jnp.asarray(a) for k, a in enc.items()})
    np.testing.assert_array_equal(np.asarray(dec["image"]), img)
    np.testing.assert_array_equal(np.asarray(dec["person_mask"]), mask)
    assert dec["style_emb"].dtype == jnp.float32
    # bf16 embedding transport truncates the mantissa; bound the error
    np.testing.assert_allclose(np.asarray(dec["style_emb"]), emb,
                               atol=0.0, rtol=2 ** -8)

    # the 'smpl' RPM mode's continuous mask is NOT uint8-exact -> must
    # ship as float32 unchanged, not quantized
    cont = np.random.default_rng(1).uniform(
        -1, 1, (2, 4, 4, 1)).astype(np.float32)
    enc2 = encode_transport({"person_mask": cont})
    assert enc2["person_mask"].dtype == np.float32
    np.testing.assert_array_equal(enc2["person_mask"], cont)


def test_trainstep_snapshots_and_sigusr2(tmp_path, loaders):
    """Periodic weight-only snapshots (ModelCheckpoint every_n_train_steps +
    save_weights_only, reference main.py:707-723) and the SIGUSR2
    introspection hook (reference main.py:784-788)."""
    import os
    import signal as _signal

    train, val = loaders
    model = LatentDiffusion(tiny_config())
    enc = DebugConditioningEncoder(context_dim=64, text_len=7)
    cfg = TrainerConfig(
        base_learning_rate=1e-4, scale_lr=False, batch_size=2, max_epochs=2,
        log_every=1, log_images_every=None, logdir=str(tmp_path / "run"),
        early_stop_patience=None, warm_up_steps=1, ckpt_every_steps=1,
    )
    trainer = Trainer(model, cfg, enc)

    fired = []
    orig = _signal.getsignal(_signal.SIGUSR2)
    try:
        state = trainer.fit(train, val)
        # handler was installed by fit; exercise it like a supervisor would
        handler = _signal.getsignal(_signal.SIGUSR2)
        assert callable(handler) and handler is not orig
        handler(_signal.SIGUSR2, None)
        fired.append(True)
    finally:
        _signal.signal(_signal.SIGUSR2, orig)
    assert fired

    steps = int(state.step)
    assert steps >= 1
    snaps = sorted(p.name for p in (tmp_path / "run" / "checkpoints").iterdir()
                   if p.name.startswith("trainstep_") and p.is_dir())
    assert snaps == [f"trainstep_{s:09d}" for s in range(1, steps + 1)]

    # weights-only payload: params (+ema) travel, optimizer state does not
    import orbax.checkpoint as ocp

    raw = ocp.StandardCheckpointer().restore(
        (tmp_path / "run" / "checkpoints" / snaps[-1]).absolute())
    assert "params" in raw and "opt_state" not in raw


def test_wandb_option_streams_scalars(tmp_path, loaders, monkeypatch):
    """TrainerConfig.wandb=True streams the same scalars to a wandb run
    (reference main.py:615-639's wandb logger choice). Exercised against a
    stub module — the real package is optional and import-guarded."""
    import sys
    import types

    calls = {"init": [], "log": [], "finish": 0}

    class _Run:
        def log(self, scalars, step=None):
            calls["log"].append((dict(scalars), step))

        def finish(self):
            calls["finish"] += 1

    stub = types.ModuleType("wandb")
    stub.init = lambda **kw: (calls["init"].append(kw), _Run())[1]
    monkeypatch.setitem(sys.modules, "wandb", stub)

    train, val = loaders
    model = LatentDiffusion(tiny_config())
    enc = DebugConditioningEncoder(context_dim=64, text_len=7)
    cfg = TrainerConfig(
        base_learning_rate=1e-4, scale_lr=False, batch_size=2, max_epochs=1,
        log_every=1, log_images_every=None, logdir=str(tmp_path / "run"),
        early_stop_patience=None, warm_up_steps=1, wandb=True,
    )
    trainer = Trainer(model, cfg, enc)
    trainer.fit(train, val)

    assert calls["init"] and calls["init"][0]["project"] == "upgpt-tpu"
    assert calls["init"][0]["config"]["batch_size"] == 2
    assert calls["finish"] == 1
    logged_keys = set().union(*(set(s) for s, _ in calls["log"]))
    assert "loss_simple" in logged_keys
    assert any(k.startswith("val/") for k in logged_keys)
    # steps are ints (wandb rejects float steps)
    assert all(isinstance(st, int) for _, st in calls["log"])


def test_wandb_absent_degrades_gracefully(tmp_path, loaders, monkeypatch):
    """wandb=True without the package installed must not break training."""
    import builtins
    import sys

    monkeypatch.delitem(sys.modules, "wandb", raising=False)
    real_import = builtins.__import__

    def _imp(name, *a, **k):
        if name == "wandb":
            raise ImportError("No module named 'wandb'")
        return real_import(name, *a, **k)

    monkeypatch.setattr(builtins, "__import__", _imp)

    train, val = loaders
    model = LatentDiffusion(tiny_config())
    enc = DebugConditioningEncoder(context_dim=64, text_len=7)
    cfg = TrainerConfig(
        base_learning_rate=1e-4, scale_lr=False, batch_size=2, max_epochs=1,
        log_every=1, log_images_every=None, logdir=str(tmp_path / "run"),
        early_stop_patience=None, warm_up_steps=1, wandb=True,
    )
    trainer = Trainer(model, cfg, enc)
    assert trainer._wandb is None
    state = trainer.fit(train, val)
    assert int(state.step) > 0


def test_save_grid_streams_to_tensorboard(tmp_path):
    """_save_grid writes the PNG AND pushes the same grid into the TB
    event stream (reference ImageLogger logs to disk + TestTube logger,
    main.py:302-450)."""
    tb_dir = tmp_path / "tb"
    tb_dir.mkdir()
    t = Trainer.__new__(Trainer)  # grid/TB plumbing only, no model needed
    try:
        from flax.metrics.tensorboard import SummaryWriter

        t._tb = SummaryWriter(str(tb_dir))
    except Exception:
        pytest.skip("tensorboard not available")
    imgs = np.linspace(-1, 1, 2 * 8 * 8 * 3, dtype=np.float32).reshape(
        2, 8, 8, 3)
    png = tmp_path / "grid.png"
    t._save_grid(imgs, png, tag="samples", step=7)
    t._tb.flush()
    assert png.exists()
    events = list(tb_dir.glob("events.out.tfevents.*"))
    assert events and events[0].stat().st_size > 100  # image payload landed


def test_log_images_writes_sample_and_progressive_grids(tmp_path, loaders):
    """ImageLogger surface incl. the denoise-row progression (reference
    progressive_denoising rows, ddpm.py:1395-1431 — VERDICT r3 item 9)."""
    train, val = loaders
    model = LatentDiffusion(tiny_config())
    enc = DebugConditioningEncoder(context_dim=64, text_len=7)
    cfg = TrainerConfig(
        base_learning_rate=1e-4, scale_lr=False, batch_size=2, max_epochs=1,
        log_every=1, log_images_every=1, image_log_ddim_steps=4,
        image_log_progressive_frames=3, logdir=str(tmp_path / "run"),
        early_stop_patience=None, warm_up_steps=1,
    )
    trainer = Trainer(model, cfg, enc)
    trainer.fit(train, val)
    imgs = sorted((tmp_path / "run" / "images").glob("*.png"))
    names = {p.name.split("_")[0] for p in imgs}
    assert "samples" in names
    assert "progressive" in names
    from PIL import Image

    prog = sorted((tmp_path / "run" / "images").glob("progressive_*.png"))[0]
    w, h = Image.open(prog).size
    assert w >= 3 * 16  # 3 frames of 16px side by side per row


def test_encode_transport_memo_audits_once():
    """The uint8-exactness audit is per-key-per-config, not per-batch
    (round-3 advisor: constant host tax at the wrong granularity). The memo
    caches the first batch's decision and sticks to it — including the
    lossy (smpl RPM) person_mask staying f32 on later batches without
    re-running array_equal."""
    from upgpt_tpu.training.trainer import encode_transport

    rng = np.random.default_rng(0)
    exact = (rng.integers(0, 256, (2, 8, 8, 3)).astype(np.float32)
             / 127.5 - 1.0)
    lossy = rng.normal(size=(2, 4, 4, 1)).astype(np.float32).clip(-1, 1)

    memo = {}
    out1 = encode_transport({"image": exact, "person_mask": lossy}, memo)
    assert out1["image"].dtype == np.uint8
    assert out1["person_mask"].dtype == np.float32
    assert memo == {"image": True, "person_mask": False}

    # second batch takes the memoized fast path; decisions stick
    out2 = encode_transport({"image": exact + 0, "person_mask": lossy}, memo)
    assert out2["image"].dtype == np.uint8
    assert out2["person_mask"].dtype == np.float32

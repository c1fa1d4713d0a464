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


def test_lr_scaling_rule():
    from upgpt_tpu.training.train_state import scaled_learning_rate

    # main.py:748-767: accumulate * ngpu * bs * base
    assert scaled_learning_rate(2e-6, 12, 4, 2, True) == pytest.approx(2e-6 * 2 * 4 * 12)
    assert scaled_learning_rate(2e-6, 12, 4, 2, False) == 2e-6

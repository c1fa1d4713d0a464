"""Interpolation, style mixing, and the upscale chain."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from upgpt_tpu.diffusion.latent_diffusion import LatentDiffusion, LatentDiffusionConfig
from upgpt_tpu.inference.pipeline import (
    MASK_BG, MASK_BOX, UpscalePipeline, interp_mask, interpolate_masks,
    interpolate_smpl, mix_style, prepare_lr_condition,
)
from upgpt_tpu.models.unet import UNetConfig
from upgpt_tpu.models.vae import AutoencoderConfig


def test_interpolate_smpl_lerp():
    src = jnp.ones((1, 85))
    dst = jnp.zeros((1, 85))
    alphas = jnp.asarray([1.0, 0.5, 0.0])
    out = interpolate_smpl(src, dst, alphas)
    assert out.shape == (3, 1, 85)
    # alpha*src + (1-alpha)*dst (reference app.py:298-300)
    np.testing.assert_allclose(np.asarray(out[:, 0, 0]), [1.0, 0.5, 0.0])


def test_interp_mask_bbox_lerp_and_fill():
    src = np.full((16, 12), MASK_BG, np.float32)
    src[2:6, 2:6] = MASK_BOX
    dst = np.full((16, 12), MASK_BG, np.float32)
    dst[8:14, 4:10] = MASK_BOX
    mid = interp_mask(src, dst, 0.5)
    vals = np.unique(mid)
    assert set(np.round(vals, 6)) == {-1.0, np.float32(np.round(MASK_BOX, 6))}
    # bbox corners average: rows (2,5)&(8,13) -> (5,9); cols (2,5)&(4,9) -> (3,7)
    rows = np.nonzero((mid != MASK_BG).any(1))[0]
    assert rows[0] == 5 and rows[-1] == 9

    stack = interpolate_masks(src[..., None], dst[..., None], [1.0, 0.0])
    assert stack.shape == (2, 16, 12, 1)
    np.testing.assert_allclose(stack[0, ..., 0][2:6, 2:6], MASK_BOX)


def test_mix_style_overrides_and_drops():
    img = jnp.ones((9, 8))
    txt = jnp.full((9, 8), 2.0)
    out = mix_style(img, txt, text_override=[True, False] * 4 + [True])
    assert float(out[0, 0]) == 2.0 and float(out[1, 0]) == 1.0
    empty = jnp.full((8,), -3.0)
    out2 = mix_style(img, drop_slots=[4], empty_style_emb=empty)
    assert float(out2[4, 0]) == -3.0 and float(out2[3, 0]) == 1.0


def test_prepare_lr_condition_shapes():
    x = jnp.zeros((2, 256, 192, 3))
    lr = prepare_lr_condition(x)
    assert lr.shape == (2, 128, 96, 3)


def test_upscale_chain_tiny():
    """End-to-end 2-stage chain with a tiny upscale model: 6ch in, 3ch out,
    lr-image concat, kl-f4-style z=3."""
    cfg = LatentDiffusionConfig(
        unet=UNetConfig(
            in_channels=6, model_channels=32, out_channels=3, num_res_blocks=1,
            attention_resolutions=(2,), channel_mult=(1, 2), num_heads=4,
            context_dim=64, use_flash_attention=False,
        ),
        vae=AutoencoderConfig(
            embed_dim=3, z_channels=3, ch=32, ch_mult=(1, 2), num_res_blocks=1,
            resolution=32,
        ),
        timesteps=100,
        latent_size=(16, 12),
        latent_channels=3,
        pose_input_dim=None,   # upscale stage has no pose token
        context_dim=64,
        use_ema=False,
    )
    model = LatentDiffusion(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    pipe = UpscalePipeline(model, num_steps=5, eta=0.0)

    rng = np.random.default_rng(0)
    image_256 = jnp.asarray(rng.uniform(-1, 1, (2, 256, 192, 3)).astype(np.float32))
    text_emb = jnp.asarray(rng.normal(size=(2, 7, 64)).astype(np.float32))
    style_emb = jnp.asarray(rng.normal(size=(2, 9, 64)).astype(np.float32))

    # tiny stage's latent grid is 16x12 -> lr must match
    lr = prepare_lr_condition(image_256, out_hw=(16, 12))
    out = pipe.inner.generate(
        params,
        {"text_emb": text_emb, "style_emb": style_emb, "person_mask": lr},
        jax.random.PRNGKey(1),
    )
    assert out.shape == (2, 32, 24, 3)
    assert np.isfinite(np.asarray(out)).all()


def _tiny_upscale_config():
    return LatentDiffusionConfig(
        unet=UNetConfig(
            in_channels=6, model_channels=32, out_channels=3, num_res_blocks=1,
            attention_resolutions=(2,), channel_mult=(1, 2), num_heads=4,
            context_dim=64, use_flash_attention=False,
        ),
        vae=AutoencoderConfig(
            embed_dim=3, z_channels=3, ch=32, ch_mult=(1, 2), num_res_blocks=1,
            resolution=32,
        ),
        timesteps=100,
        latent_size=(16, 12),
        latent_channels=3,
        pose_input_dim=None,
        context_dim=64,
        use_ema=False,
    )


def test_chained_upscale_pipeline():
    """One call: base 256-stage sample -> on-device lr resize -> upscale
    stage; equals running the two stages by hand with the same split keys."""
    from test_latent_diffusion import tiny_batch, tiny_config
    from upgpt_tpu.inference.pipeline import ChainedUpscalePipeline

    base = LatentDiffusion(tiny_config())
    up = LatentDiffusion(_tiny_upscale_config())
    params = {
        "base": base.init_params(jax.random.PRNGKey(0)),
        "up": up.init_params(jax.random.PRNGKey(1)),
    }
    chained = ChainedUpscalePipeline(base, up, num_steps=4, eta=0.0)
    batch = tiny_batch(b=2)
    key = jax.random.PRNGKey(7)
    out = np.asarray(chained.generate(params, batch, key))
    assert out.shape == (2, 32, 24, 3)
    assert np.isfinite(out).all()

    # manual two-stage run with the same key split
    k_base, k_up = jax.random.split(key)
    img256 = chained.base.generate(params["base"], batch, k_base)
    lr = prepare_lr_condition(img256, out_hw=(16, 12))
    want = chained.up.generate(
        params["up"],
        {"text_emb": batch["text_emb"], "style_emb": batch["style_emb"],
         "person_mask": lr},
        k_up,
    )
    np.testing.assert_allclose(out, np.asarray(want), atol=1e-5)

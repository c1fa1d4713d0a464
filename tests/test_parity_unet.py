"""Golden-parity: flax UNet vs reference torch UNetModel, converted weights.

This is the acceptance test for SURVEY.md hard part #1 (numerical parity of
converted weights): identical random torch weights are mapped through
convert_unet_state_dict and both nets are run on the same input.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import torch

from reference_loader import add_reference_to_path, reference_available
from upgpt_tpu.models.unet import UNetConfig, UNetModel
from upgpt_tpu.convert.torch_to_jax import convert_unet_state_dict

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference tree not present"
)


def _small_cfg():
    return UNetConfig(
        in_channels=5,
        model_channels=32,
        out_channels=4,
        num_res_blocks=2,
        attention_resolutions=(1, 2),
        channel_mult=(1, 2),
        num_heads=4,
        transformer_depth=1,
        context_dim=64,
        use_flash_attention=False,
        dtype=jnp.float32,
    )


@pytest.fixture(scope="module")
def torch_unet():
    add_reference_to_path()
    from ldm.modules.diffusionmodules.openaimodel import UNetModel as TorchUNet

    torch.manual_seed(0)
    net = TorchUNet(
        image_size=32,
        in_channels=5,
        model_channels=32,
        out_channels=4,
        num_res_blocks=2,
        attention_resolutions=[1, 2],
        channel_mult=[1, 2],
        num_heads=4,
        use_spatial_transformer=True,
        transformer_depth=1,
        context_dim=64,
        use_checkpoint=False,
        legacy=False,
    )
    return net.eval()


def test_unet_param_count_and_forward_parity(torch_unet):
    cfg = _small_cfg()
    sd = torch_unet.state_dict()
    params = convert_unet_state_dict(sd, cfg)

    model = UNetModel(cfg)
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 8, 8, 5)).astype(np.float32)
    t = np.asarray([3, 977], dtype=np.int32)
    ctx = rng.normal(size=(2, 11, 64)).astype(np.float32)

    # shape-check params against a fresh init (catches layout mistakes)
    ref_params = model.init(
        jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(t), jnp.asarray(ctx)
    )["params"]
    ref_shapes = jax.tree.map(lambda a: a.shape, ref_params)
    got_shapes = jax.tree.map(lambda a: a.shape, params)
    assert ref_shapes == got_shapes

    n_torch = sum(p.numel() for p in torch_unet.parameters())
    n_jax = sum(int(np.prod(a.shape)) for a in jax.tree.leaves(params))
    assert n_torch == n_jax

    with jax.default_matmul_precision("highest"):
        got = model.apply(
            {"params": params}, jnp.asarray(x), jnp.asarray(t), jnp.asarray(ctx)
        )

    with torch.no_grad():
        xt = torch.from_numpy(x).permute(0, 3, 1, 2)
        want = (
            torch_unet(xt, torch.from_numpy(t).long(), context=torch.from_numpy(ctx))
            .permute(0, 2, 3, 1)
            .numpy()
        )
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-4, rtol=1e-3)


def test_unet_interp256_geometry():
    """Full-size interp_256 U-Net builds and the converter's structural walk
    covers every torch key (models/upgpt/interp_256/config.yaml:40-55)."""
    add_reference_to_path()
    from ldm.modules.diffusionmodules.openaimodel import UNetModel as TorchUNet

    torch.manual_seed(1)
    net = TorchUNet(
        image_size=32, in_channels=5, model_channels=224, out_channels=4,
        num_res_blocks=2, attention_resolutions=[4, 2, 1],
        channel_mult=[1, 2, 4, 4], num_heads=8, use_spatial_transformer=True,
        transformer_depth=1, context_dim=768, use_checkpoint=False, legacy=False,
    )
    cfg = UNetConfig.interp_256(use_flash_attention=False)
    params = convert_unet_state_dict(net.state_dict(), cfg)
    n_torch = sum(p.numel() for p in net.parameters())
    n_jax = sum(int(np.prod(a.shape)) for a in jax.tree.leaves(params))
    assert n_torch == n_jax


def test_unet_upscale_geometry():
    """Released upscale geometry converts: ch_mult [1,2,2,4], attn ds [2,4,8]
    (models/upgpt/upscale/config.yaml:37-59). Guards the round-1 regression
    where upscale_512 carried interp_256's [1,2,4,4]."""
    add_reference_to_path()
    from ldm.modules.diffusionmodules.openaimodel import UNetModel as TorchUNet

    torch.manual_seed(2)
    net = TorchUNet(
        image_size=32, in_channels=6, model_channels=256, out_channels=3,
        num_res_blocks=2, attention_resolutions=[2, 4, 8],
        channel_mult=[1, 2, 2, 4], num_heads=8, use_spatial_transformer=True,
        transformer_depth=1, context_dim=768, use_checkpoint=False,
        legacy=False,
    )
    cfg = UNetConfig.upscale_512(use_flash_attention=False)
    assert cfg.channel_mult == (1, 2, 2, 4)
    params = convert_unet_state_dict(net.state_dict(), cfg)
    n_torch = sum(p.numel() for p in net.parameters())
    n_jax = sum(int(np.prod(a.shape)) for a in jax.tree.leaves(params))
    assert n_torch == n_jax


def test_upscale_noise_schedule():
    """Upscale stage trains/samples with linear_start=1e-4, linear_end=2e-2
    (models/upgpt/upscale/config.yaml:5-6), not the interp_256 defaults."""
    from upgpt_tpu.diffusion.latent_diffusion import LatentDiffusionConfig
    from upgpt_tpu import zoo

    cfg = LatentDiffusionConfig.upscale_512()
    assert (cfg.linear_start, cfg.linear_end) == (1e-4, 2e-2)
    zcfg = zoo.build_latent_diffusion("upscale").config
    assert (zcfg.linear_start, zcfg.linear_end) == (1e-4, 2e-2)
    assert zcfg.unet.channel_mult == (1, 2, 2, 4)

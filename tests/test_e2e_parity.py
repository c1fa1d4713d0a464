"""End-to-end parity: converted U-Net driven by our DDIM scan vs the
reference torch U-Net driven by the reference DDIMSampler.

This composes the two independently-verified pieces (weight conversion +
sampler math) and would catch any interface mismatch between them — e.g.
timestep indexing, context layout, or mask-concat ordering.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import torch

from reference_loader import add_reference_to_path, reference_available
from upgpt_tpu.convert.torch_to_jax import convert_unet_state_dict
from upgpt_tpu.diffusion.ddim import ddim_sample
from upgpt_tpu.diffusion.schedule import DiffusionSchedule, make_ddim_schedule
from upgpt_tpu.models.unet import UNetConfig, UNetModel

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference tree not present"
)


def test_sampler_plus_unet_parity():
    add_reference_to_path()
    from ldm.models.diffusion.ddim import DDIMSampler
    from ldm.modules.diffusionmodules.openaimodel import UNetModel as TorchUNet

    torch.manual_seed(0)
    tnet = TorchUNet(
        image_size=8, in_channels=5, model_channels=32, out_channels=4,
        num_res_blocks=1, attention_resolutions=[1], channel_mult=[1, 2],
        num_heads=4, use_spatial_transformer=True, transformer_depth=1,
        context_dim=64, use_checkpoint=False, legacy=False,
    ).eval()

    cfg = UNetConfig(
        in_channels=5, model_channels=32, out_channels=4, num_res_blocks=1,
        attention_resolutions=(1,), channel_mult=(1, 2), num_heads=4,
        transformer_depth=1, context_dim=64, use_flash_attention=False,
    )
    params = convert_unet_state_dict(tnet.state_dict(), cfg)
    jnet = UNetModel(cfg)

    schedule = DiffusionSchedule.create(
        1000, linear_start=0.00085, linear_end=0.0120
    )
    rng = np.random.default_rng(0)
    b = 2
    x_T = rng.normal(size=(b, 8, 8, 4)).astype(np.float32)
    mask = rng.choice([-1.0, -0.99215686], size=(b, 8, 8, 1)).astype(np.float32)
    ctx = rng.normal(size=(b, 11, 64)).astype(np.float32)

    # ---- reference: torch U-Net behind a hybrid-concat apply_model ----
    class Wrapper:
        parameterization = "eps"
        num_timesteps = 1000
        betas = torch.from_numpy(schedule.betas)
        alphas_cumprod = torch.from_numpy(schedule.alphas_cumprod)
        alphas_cumprod_prev = torch.from_numpy(schedule.alphas_cumprod_prev)
        sqrt_one_minus_alphas_cumprod = torch.from_numpy(
            schedule.sqrt_one_minus_alphas_cumprod
        )
        device = torch.device("cpu")

        def apply_model(self, x, t, c):
            xc = torch.cat(
                [x, torch.from_numpy(mask).permute(0, 3, 1, 2)], dim=1
            )
            return tnet(xc, t, context=torch.from_numpy(ctx))

    sampler = DDIMSampler(Wrapper())
    sampler.register_buffer = lambda n, a: setattr(sampler, n, a)
    sampler.make_schedule(ddim_num_steps=5, ddim_eta=0.0, verbose=False)
    with torch.no_grad():
        want, _ = sampler.ddim_sampling(
            cond=None, shape=x_T.shape,
            x_T=torch.from_numpy(x_T).permute(0, 3, 1, 2),
            temperature=0.0, log_every_t=10**9,
        )
    want = want.permute(0, 2, 3, 1).numpy()

    # ---- ours: converted U-Net behind the same routing, jitted scan ----
    mask_j = jnp.asarray(mask)
    ctx_j = jnp.asarray(ctx)

    def eps_model(x, t, cond):
        x_in = jnp.concatenate([x, mask_j], axis=-1)
        return jnet.apply({"params": params}, x_in, t, ctx_j)

    ddim = make_ddim_schedule(schedule, 5, eta=0.0)
    with jax.default_matmul_precision("highest"):
        got = ddim_sample(
            eps_model, schedule, ddim, x_T.shape, {},
            jax.random.PRNGKey(0), x_T=jnp.asarray(x_T),
        )
    np.testing.assert_allclose(np.asarray(got), want, atol=5e-4, rtol=1e-3)

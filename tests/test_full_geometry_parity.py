"""Full-geometry numerical parity rehearsal (VERDICT r2 item 2).

Every other parity test runs at toy widths (model_channels=32); the released
interp_256 geometry (224ch, 742-op U-Net graph,
/root/reference/models/upgpt/interp_256/config.yaml:40-55) was covered only
by a param-count test. Here a random-weight Lightning-layout checkpoint is
synthesized at the RELEASED geometry (incl. the LitEma model_ema.* shadow),
converted through the production converter, and the flax U-Net is compared
against the reference torch module (openaimodel.py:413-742) on one fp32
forward and one full DDIM update step. The measured max-abs-err is printed
so PERF.md can cite it.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import torch

from reference_loader import add_reference_to_path, reference_available
from upgpt_tpu.convert.torch_to_jax import (
    convert_unet_state_dict, ema_unet_state_dict,
)
from upgpt_tpu.models.unet import UNetConfig, UNetModel

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(not reference_available(),
                       reason="reference tree not present"),
]

B, H, W = 1, 32, 24  # interp_256 latent grid
CTX = 87  # 77 text + 9 style + 1 smpl tokens


@pytest.fixture(scope="module")
def released_geometry():
    """Torch U-Net at the released interp_256 geometry + a Lightning-style
    state_dict with a drifted model_ema shadow, converted both ways."""
    add_reference_to_path()
    from ldm.modules.diffusionmodules.openaimodel import UNetModel as TorchUNet
    from ldm.modules.ema import LitEma

    torch.manual_seed(0)
    tunet = TorchUNet(
        image_size=32, in_channels=5, model_channels=224, out_channels=4,
        num_res_blocks=2, attention_resolutions=[4, 2, 1],
        channel_mult=[1, 2, 4, 4], num_heads=8, use_spatial_transformer=True,
        transformer_depth=1, context_dim=768, use_checkpoint=False,
        legacy=False,
    ).eval()

    # the reference zero-inits every out/proj_out conv (zero_module,
    # openaimodel.py) — a freshly built net outputs EXACTLY zero, which
    # would make forward "parity" vacuous. Perturb all params first.
    with torch.no_grad():
        g = torch.Generator().manual_seed(123)
        for p in tunet.parameters():
            p.add_(torch.randn(p.shape, generator=g) * 0.02)

    class _Wrapper(torch.nn.Module):
        def __init__(self, net):
            super().__init__()
            self.diffusion_model = net

    wrapper = _Wrapper(tunet)
    ema = LitEma(wrapper)  # shadow snapshots the current weights
    with torch.no_grad():  # drift raw away so ema-vs-raw is distinguishable
        for p in tunet.parameters():
            p.mul_(1.01)

    # Lightning bucket layout (ddpm.py:433-494 key namespaces), in memory —
    # the pickle round-trip itself is covered by test_convert_cli at tiny
    # geometry; at 400M+ params it would only add minutes of IO
    unet_sd = {k: v for k, v in tunet.state_dict().items()}
    buckets = {
        "unet": {k: v.numpy() for k, v in unet_sd.items()},
        "ema": {k: v.numpy() for k, v in ema.state_dict().items()},
    }
    cfg = UNetConfig.interp_256(use_flash_attention=False,
                                dtype=jnp.float32)
    params_raw = convert_unet_state_dict(buckets["unet"], cfg)
    ema_sd = ema_unet_state_dict(buckets)
    assert ema_sd is not None
    params_ema = convert_unet_state_dict(ema_sd, cfg)
    return tunet, cfg, params_raw, params_ema


def _inputs(seed=0):
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(B, H, W, 5)).astype(np.float32)
    t = np.asarray([451] * B, np.int32)
    ctx = rng.normal(size=(B, CTX, 768)).astype(np.float32) * 0.3
    return x, t, ctx


def test_full_geometry_forward_parity(released_geometry):
    tunet, cfg, params_raw, params_ema = released_geometry
    x, t, ctx = _inputs()
    model = UNetModel(cfg)

    with jax.default_matmul_precision("highest"):
        got = np.asarray(model.apply(
            {"params": params_raw}, jnp.asarray(x), jnp.asarray(t),
            jnp.asarray(ctx)))
    with torch.no_grad():
        want = tunet(
            torch.from_numpy(x).permute(0, 3, 1, 2),
            torch.from_numpy(t).long(),
            context=torch.from_numpy(ctx),
        ).permute(0, 2, 3, 1).numpy()

    err = float(np.abs(got - want).max())
    scale = float(np.abs(want).max())
    print(f"\ninterp_256 full-geometry fp32 forward: max-abs-err={err:.3e} "
          f"(output scale {scale:.3e})")
    assert scale > 1e-3, "vacuous comparison: reference output is zero"
    assert err < 5e-3, err
    np.testing.assert_allclose(got, want, atol=5e-3, rtol=5e-2)

    # EMA weights differ from raw exactly as constructed (shadow = raw/1.01)
    k_raw = np.asarray(params_raw["conv_in"]["kernel"])
    k_ema = np.asarray(params_ema["conv_in"]["kernel"])
    np.testing.assert_allclose(k_ema * 1.01, k_raw, rtol=1e-5)


def test_full_geometry_one_ddim_step(released_geometry):
    """One full DDIM update at released geometry: the reference
    DDIMSampler.p_sample_ddim (ddim.py:166-204) around the torch U-Net vs
    our lax.scan sampler around the converted flax U-Net, single step,
    deterministic (eta=1, temperature=0 exercises the sigma/dir_xt terms)."""
    from ldm.models.diffusion.ddim import DDIMSampler

    from upgpt_tpu.diffusion.ddim import ddim_sample
    from upgpt_tpu.diffusion.schedule import DiffusionSchedule, make_ddim_schedule

    tunet, cfg, params_raw, _ = released_geometry
    schedule = DiffusionSchedule.create(
        1000, linear_start=0.00085, linear_end=0.0120)
    x, _, ctx = _inputs(1)
    x_T = x[..., :4]
    mask = x[..., 4:5]
    model = UNetModel(cfg)

    class _Shim:
        parameterization = "eps"
        num_timesteps = 1000
        device = torch.device("cpu")
        betas = torch.from_numpy(schedule.betas)
        alphas_cumprod = torch.from_numpy(schedule.alphas_cumprod)
        alphas_cumprod_prev = torch.from_numpy(schedule.alphas_cumprod_prev)
        sqrt_one_minus_alphas_cumprod = torch.from_numpy(
            schedule.sqrt_one_minus_alphas_cumprod)

        def apply_model(self, xt, t, c):
            # hybrid routing: cat([x, mask], 1) + crossattn context
            # (DiffusionWrapper, ddpm.py:1550-1577)
            m = torch.from_numpy(mask).permute(0, 3, 1, 2)
            with torch.no_grad():
                return tunet(torch.cat([xt, m], 1), t.long(),
                             context=torch.from_numpy(ctx))

    sampler = DDIMSampler(_Shim())
    sampler.register_buffer = lambda name, attr: setattr(sampler, name, attr)
    sampler.make_schedule(ddim_num_steps=1, ddim_eta=1.0, verbose=False)
    with torch.no_grad():
        want, _ = sampler.ddim_sampling(
            cond=None, shape=(B, 4, H, W),
            x_T=torch.from_numpy(x_T).permute(0, 3, 1, 2),
            temperature=0.0, log_every_t=10**9,
        )
    want = want.permute(0, 2, 3, 1).numpy()

    ddim = make_ddim_schedule(schedule, 1, eta=1.0)

    def eps_model(xt, t, cond):
        inp = jnp.concatenate([xt, jnp.asarray(mask)], axis=-1)
        return model.apply({"params": params_raw}, inp, t, jnp.asarray(ctx))

    with jax.default_matmul_precision("highest"):
        got = np.asarray(ddim_sample(
            eps_model, schedule, ddim, x_T.shape, cond={},
            key=jax.random.PRNGKey(0), x_T=jnp.asarray(x_T),
            temperature=0.0,
        ))

    err = float(np.abs(got - want).max())
    print(f"\ninterp_256 one-DDIM-step fp32: max-abs-err={err:.3e}")
    # non-vacuous: with the perturbed net, eps != 0, so the update differs
    # from what a zero-eps model would produce
    a1 = float(sampler.ddim_alphas[0])
    zero_eps = np.sqrt(float(sampler.ddim_alphas_prev[0]) / a1) * x_T
    assert float(np.abs(want - zero_eps).max()) > 1e-3
    assert err < 5e-3, err

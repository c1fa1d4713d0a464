"""cond_stage_key_2 route end-to-end: trainable text<->style fusion parity
vs the reference CrossAttention, optimizer-group membership (nonzero grads),
and the inshop_laion zoo variant (reference encoders/modules.py:259-323,
ddpm.py:460,707-713; configs/deepfashion/inshop_laion_clip.yaml)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from reference_loader import add_reference_to_path, reference_available
from upgpt_tpu.convert.torch_to_jax import convert_cond_fusion_state_dict
from upgpt_tpu.diffusion.latent_diffusion import LatentDiffusion
from upgpt_tpu.models.cond_fusion import TextStyleCrossAttention

from test_latent_diffusion import tiny_config, tiny_batch


@pytest.mark.skipif(not reference_available(), reason="reference tree absent")
def test_fusion_parity_vs_reference_cross_attention():
    """Random-weight parity with the exact module the reference trains:
    attention.CrossAttention(query_dim=768, context_dim=768, heads=8,
    dim_head=96) (modules.py:274-278)."""
    import torch

    add_reference_to_path()
    from ldm.modules.attention import CrossAttention as TorchCA

    torch.manual_seed(0)
    tca = TorchCA(query_dim=768, context_dim=768, heads=8, dim_head=96).eval()
    sd = {f"cross_att.{k}": v for k, v in tca.state_dict().items()}
    params = convert_cond_fusion_state_dict(sd)

    rng = np.random.default_rng(0)
    text = rng.normal(size=(2, 77, 768)).astype(np.float32)
    styles = rng.normal(size=(2, 9, 768)).astype(np.float32)

    model = TextStyleCrossAttention(dim=768)
    with jax.default_matmul_precision("highest"):
        got = model.apply(
            {"params": params}, jnp.asarray(text), jnp.asarray(styles)
        )
    with torch.no_grad():
        want = tca(torch.from_numpy(text), context=torch.from_numpy(styles)).numpy()
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-4, rtol=1e-3)


def test_fusion_in_train_step_gets_gradients():
    """With cond_fusion enabled the fusion params sit in the trainable tree
    and receive nonzero gradients in a real train step (the round-1 gap:
    fusion never reached the optimizer)."""
    from upgpt_tpu.training.train_state import create_train_state, train_step

    model = LatentDiffusion(tiny_config(cond_fusion="image"))
    params = model.init_params(jax.random.PRNGKey(0))
    frozen = {"vae": params.pop("vae")}
    assert "cond_fusion" in params

    state = create_train_state(params, 1e-3, use_ema=False)
    batch = tiny_batch(b=2)
    # NOTE: TWO zero-inits chain at init (same as torch): the U-Net's final
    # out-conv (openaimodel.py zero_module) blocks grads into everything
    # inside the net, so the SpatialTransformer's zero-init proj_out
    # (attention.py:254) itself gets zero grad on step 1 and stays zero.
    # Step 1 moves the out-conv; step 2 moves proj_out; only then can
    # gradients reach the context (and the fusion/pose stages).
    step = jax.jit(
        lambda s, f, b: train_step(model, s, f, b, jax.random.PRNGKey(1))
    )
    for _ in range(2):
        state, metrics = step(state, frozen, batch)
        assert np.isfinite(float(metrics["loss"]))

    import optax

    def loss_of(p):
        return model.training_loss(
            p, batch, jax.random.PRNGKey(2), frozen_params=frozen
        )[0]

    grads = jax.grad(loss_of)(state.params)
    for group in ("cond_fusion", "pose", "unet"):
        gnorm = float(optax.global_norm(grads[group]))
        assert np.isfinite(gnorm) and gnorm > 0, (group, gnorm)


def test_fusion_context_shape_and_forward():
    """Fused context = text(77-token eq.) + pose, NOT text+styles+pose."""
    model = LatentDiffusion(tiny_config(cond_fusion="image"))
    params = model.init_params(jax.random.PRNGKey(0), include_vae=False)
    rng = np.random.default_rng(0)
    text = jnp.asarray(rng.normal(size=(2, 7, 64)), jnp.float32)
    styles = jnp.asarray(rng.normal(size=(2, 9, 64)), jnp.float32)
    smpl = jnp.asarray(rng.normal(size=(2, 1, 85)), jnp.float32)
    ctx = model.build_context(params, text, styles, smpl)
    assert ctx.shape == (2, 7 + 1, 64)  # fused text + pose, no style tokens

    # default route keeps the 9 style tokens
    base = LatentDiffusion(tiny_config())
    bparams = base.init_params(jax.random.PRNGKey(0), include_vae=False)
    assert base.build_context(bparams, text, styles, smpl).shape == (2, 17, 64)


def test_zoo_inshop_laion_variant():
    from upgpt_tpu import zoo

    model = zoo.build_latent_diffusion("inshop_laion", use_flash_attention=False)
    assert model.fusion is not None
    assert model.config.cond_fusion == "image"
    assert model.config.unet.in_channels == 5  # smpl RPM mask concat

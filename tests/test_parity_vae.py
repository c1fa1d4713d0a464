"""Golden-parity: flax AutoencoderKL vs the reference torch VAE."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import torch

from reference_loader import add_reference_to_path, reference_available
from upgpt_tpu.models.vae import AutoencoderConfig, AutoencoderKL
from upgpt_tpu.convert.torch_to_jax import convert_vae_state_dict

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference tree not present"
)

DDCONFIG = dict(
    double_z=True, z_channels=4, resolution=32, in_channels=3, out_ch=3,
    ch=32, ch_mult=[1, 2], num_res_blocks=2, attn_resolutions=[], dropout=0.0,
)


@pytest.fixture(scope="module")
def torch_vae():
    add_reference_to_path()
    from ldm.models.autoencoder import AutoencoderKL as TorchVAE

    torch.manual_seed(0)
    net = TorchVAE(ddconfig=DDCONFIG, lossconfig={"target": "torch.nn.Identity"},
                   embed_dim=4)
    return net.eval()


def _cfg():
    return AutoencoderConfig(
        embed_dim=4, z_channels=4, double_z=True, ch=32, ch_mult=(1, 2),
        num_res_blocks=2, attn_resolutions=(), resolution=32,
    )


def test_vae_roundtrip_parity(torch_vae):
    cfg = _cfg()
    params = convert_vae_state_dict(torch_vae.state_dict(), cfg)
    model = AutoencoderKL(cfg)

    n_torch = sum(p.numel() for p in torch_vae.parameters())
    n_jax = sum(int(np.prod(a.shape)) for a in jax.tree.leaves(params))
    assert n_torch == n_jax

    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 32, 32, 3)).astype(np.float32) * 0.5

    with jax.default_matmul_precision("highest"):
        post = model.apply({"params": params}, jnp.asarray(x), method="encode")
        dec = model.apply({"params": params}, post.mode(), method="decode")

    with torch.no_grad():
        xt = torch.from_numpy(x).permute(0, 3, 1, 2)
        tpost = torch_vae.encode(xt)
        tmean = tpost.mode().permute(0, 2, 3, 1).numpy()
        tdec = torch_vae.decode(tpost.mode()).permute(0, 2, 3, 1).numpy()

    np.testing.assert_allclose(np.asarray(post.mode()), tmean, atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(dec), tdec, atol=5e-4, rtol=1e-3)


def test_vae_kl_f8_geometry():
    """kl-f8 converter walk covers every torch key (interp_256/config.yaml:57-77)."""
    add_reference_to_path()
    from ldm.models.autoencoder import AutoencoderKL as TorchVAE

    torch.manual_seed(1)
    dd = dict(DDCONFIG, ch=128, ch_mult=[1, 2, 4, 4], resolution=256)
    net = TorchVAE(ddconfig=dd, lossconfig={"target": "torch.nn.Identity"}, embed_dim=4)
    cfg = AutoencoderConfig.kl_f8()
    params = convert_vae_state_dict(net.state_dict(), cfg)
    n_torch = sum(p.numel() for p in net.parameters())
    n_jax = sum(int(np.prod(a.shape)) for a in jax.tree.leaves(params))
    assert n_torch == n_jax


def test_vae_kl_f4_geometry():
    """kl-f4 upscale-stage VAE (upscale/config.yaml:60-81)."""
    add_reference_to_path()
    from ldm.models.autoencoder import AutoencoderKL as TorchVAE

    torch.manual_seed(2)
    dd = dict(DDCONFIG, ch=128, ch_mult=[1, 2, 4], z_channels=3, resolution=256)
    net = TorchVAE(ddconfig=dd, lossconfig={"target": "torch.nn.Identity"}, embed_dim=3)
    cfg = AutoencoderConfig.kl_f4()
    params = convert_vae_state_dict(net.state_dict(), cfg)
    n_torch = sum(p.numel() for p in net.parameters())
    n_jax = sum(int(np.prod(a.shape)) for a in jax.tree.leaves(params))
    assert n_torch == n_jax


def test_diagonal_gaussian_kl_nll():
    from upgpt_tpu.models.vae import DiagonalGaussian

    rng = np.random.default_rng(3)
    moments = rng.normal(size=(2, 4, 4, 8)).astype(np.float32)
    dist = DiagonalGaussian(jnp.asarray(moments))

    add_reference_to_path()
    from ldm.modules.distributions.distributions import (
        DiagonalGaussianDistribution as TorchDist,
    )

    tdist = TorchDist(torch.from_numpy(moments).permute(0, 3, 1, 2))
    np.testing.assert_allclose(np.asarray(dist.kl()), tdist.kl().numpy(),
                               rtol=1e-4, atol=1e-4)
    sample = rng.normal(size=(2, 4, 4, 4)).astype(np.float32)
    got_nll = np.asarray(dist.nll(jnp.asarray(sample)))
    want_nll = tdist.nll(torch.from_numpy(sample).permute(0, 3, 1, 2)).numpy()
    np.testing.assert_allclose(got_nll, want_nll, rtol=1e-4, atol=1e-3)

"""KL-regularized conv VAE (the latent first stage), TPU-native NHWC.

Behavioral spec from the reference CompVis VAE
(ldm/modules/diffusionmodules/model.py: ResnetBlock 82-141, AttnBlock 150-203,
Encoder 368-459, Decoder 462-568; ldm/models/autoencoder.py:285-423;
ldm/modules/distributions/distributions.py:24-62):

- kl-f8 (main stage): ch=128, ch_mult (1,2,4,4), 2 resblocks, z=4, double_z,
  no attention except the mid block (interp_256/config.yaml:57-77).
- kl-f4 (upscale stage): z=3, ch_mult (1,2,4) (upscale/config.yaml:60-81).
- GroupNorm(32) eps=1e-6; swish nonlinearity; mid single-head attention over
  the full spatial grid; Downsample uses asymmetric (0,1,0,1) zero pad and a
  VALID stride-2 conv (model.py:60-79) — preserved exactly since released
  weights depend on it.
- DiagonalGaussian: moments conv'd to 2*z channels, logvar clamped [-30, 20],
  `sample` = mean + std*eps, `kl`, `nll`, `mode` (distributions.py:24-62).

The latent scale factor 0.18215 is applied by the diffusion model, not here
(reference ddpm.py:569-576).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from upgpt_tpu.ops.attention import multi_head_attention
from upgpt_tpu.ops.basic import asymmetric_pad_hw, group_norm, nearest_upsample_2x, silu

Dtype = jnp.dtype


@dataclasses.dataclass(frozen=True)
class AutoencoderConfig:
    embed_dim: int = 4
    z_channels: int = 4
    double_z: bool = True
    ch: int = 128
    ch_mult: Tuple[int, ...] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    attn_resolutions: Tuple[int, ...] = ()
    in_channels: int = 3
    out_ch: int = 3
    resolution: int = 256
    dropout: float = 0.0
    use_flash_attention: bool = False
    use_fused_groupnorm: bool = False  # Pallas GN stats (TPU serving path)
    dtype: Dtype = jnp.float32

    @classmethod
    def kl_f8(cls, **overrides) -> "AutoencoderConfig":
        return dataclasses.replace(cls(), **overrides)

    @classmethod
    def kl_f4(cls, **overrides) -> "AutoencoderConfig":
        base = cls(embed_dim=3, z_channels=3, ch_mult=(1, 2, 4))
        return dataclasses.replace(base, **overrides)


class VAEGroupNorm(nn.Module):
    """GN(32, eps 1e-6), optional fused SiLU; Pallas kernels when `fused`.

    Decode-resolution tensors route to the tiled-stats kernel (one bf16
    pass for statistics instead of XLA's fp32 convert_reduce chain);
    latent-resolution tensors use the one-pass per-image kernel."""

    channels: int
    fused: bool = False
    with_silu: bool = False

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (self.channels,))
        bias = self.param("bias", nn.initializers.zeros, (self.channels,))
        if self.fused and x.ndim == 4:
            from upgpt_tpu.ops.fused_gn import (
                fused_group_norm, fused_group_norm_qualifies,
                tiled_group_norm_qualifies,
            )

            if (fused_group_norm_qualifies(x.shape, 32)
                    or tiled_group_norm_qualifies(x.shape, 32)):
                return fused_group_norm(
                    x, scale, bias, 32, 1e-6, self.with_silu)
        out = group_norm(x, scale, bias, num_groups=32, eps=1e-6)
        return silu(out) if self.with_silu else out


class ResnetBlock(nn.Module):
    """GN(1e-6)->swish->conv ->GN->swish->dropout->conv + (1x1) shortcut.

    Reference model.py:82-141 (temb path unused: temb_channels=0 in both
    Encoder and Decoder).
    """

    out_channels: int
    dropout: float = 0.0
    dtype: Dtype = jnp.float32
    fused_gn: bool = False

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        in_ch = x.shape[-1]
        h = VAEGroupNorm(in_ch, self.fused_gn, with_silu=True, name="norm1")(x)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype, name="conv1")(h)
        h = VAEGroupNorm(self.out_channels, self.fused_gn, with_silu=True,
                         name="norm2")(h)
        if self.dropout > 0.0:
            h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype, name="conv2")(h)
        if in_ch != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype, name="nin_shortcut")(x)
        return x + h


class AttnBlock(nn.Module):
    """Single-head full self-attention over the spatial grid + residual.

    Reference model.py:150-203: 1x1 convs for q/k/v/out, scale c^-0.5,
    fp32 softmax.
    """

    channels: int
    dtype: Dtype = jnp.float32
    use_flash: bool = False
    fused_gn: bool = False

    @nn.compact
    def __call__(self, x):
        b, hh, ww, c = x.shape
        h = VAEGroupNorm(c, self.fused_gn, name="norm")(x)
        q = nn.Conv(c, (1, 1), dtype=self.dtype, name="q")(h).reshape(b, hh * ww, c)
        k = nn.Conv(c, (1, 1), dtype=self.dtype, name="k")(h).reshape(b, hh * ww, c)
        v = nn.Conv(c, (1, 1), dtype=self.dtype, name="v")(h).reshape(b, hh * ww, c)
        out = multi_head_attention(q, k, v, num_heads=1, use_flash=self.use_flash)
        out = out.reshape(b, hh, ww, c)
        out = nn.Conv(c, (1, 1), dtype=self.dtype, name="proj_out")(out)
        return x + out


class Downsample(nn.Module):
    """(0,1,0,1) asymmetric pad + VALID stride-2 conv (model.py:60-79)."""

    channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = asymmetric_pad_hw(x)
        return nn.Conv(
            self.channels, (3, 3), strides=(2, 2), padding="VALID",
            dtype=self.dtype, name="conv",
        )(x)


class Upsample(nn.Module):
    channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nearest_upsample_2x(x)
        return nn.Conv(self.channels, (3, 3), padding=1, dtype=self.dtype, name="conv")(x)


class Encoder(nn.Module):
    """Reference model.py:368-459."""

    config: AutoencoderConfig

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        cfg = self.config
        comp = cfg.dtype
        h = nn.Conv(cfg.ch, (3, 3), padding=1, dtype=comp, name="conv_in")(x.astype(comp))
        num_res = len(cfg.ch_mult)
        curr_res = cfg.resolution
        for i_level, mult in enumerate(cfg.ch_mult):
            block_out = cfg.ch * mult
            for i_block in range(cfg.num_res_blocks):
                h = ResnetBlock(
                    block_out, cfg.dropout, comp, cfg.use_fused_groupnorm,
                    name=f"down_{i_level}_block_{i_block}"
                )(h, deterministic=deterministic)
                if curr_res in cfg.attn_resolutions:
                    h = AttnBlock(block_out, comp, cfg.use_flash_attention,
                                  cfg.use_fused_groupnorm, name=f"down_{i_level}_attn_{i_block}")(h)
            if i_level != num_res - 1:
                h = Downsample(block_out, comp, name=f"down_{i_level}_downsample")(h)
                curr_res //= 2
        ch_mid = cfg.ch * cfg.ch_mult[-1]
        h = ResnetBlock(ch_mid, cfg.dropout, comp, cfg.use_fused_groupnorm,
                        name="mid_block_1")(
            h, deterministic=deterministic
        )
        h = AttnBlock(ch_mid, comp, cfg.use_flash_attention,
                      cfg.use_fused_groupnorm, name="mid_attn_1")(h)
        h = ResnetBlock(ch_mid, cfg.dropout, comp, cfg.use_fused_groupnorm,
                        name="mid_block_2")(
            h, deterministic=deterministic
        )
        h = VAEGroupNorm(ch_mid, cfg.use_fused_groupnorm, with_silu=True,
                         name="norm_out")(h)
        out_ch = 2 * cfg.z_channels if cfg.double_z else cfg.z_channels
        h = nn.Conv(out_ch, (3, 3), padding=1, dtype=comp, name="conv_out")(h)
        return h.astype(jnp.float32)


class Decoder(nn.Module):
    """Reference model.py:462-568."""

    config: AutoencoderConfig

    @nn.compact
    def __call__(self, z, *, deterministic: bool = True):
        cfg = self.config
        comp = cfg.dtype
        num_res = len(cfg.ch_mult)
        block_in = cfg.ch * cfg.ch_mult[-1]
        h = nn.Conv(block_in, (3, 3), padding=1, dtype=comp, name="conv_in")(
            z.astype(comp)
        )
        h = ResnetBlock(block_in, cfg.dropout, comp, cfg.use_fused_groupnorm,
                        name="mid_block_1")(
            h, deterministic=deterministic
        )
        h = AttnBlock(block_in, comp, cfg.use_flash_attention,
                      cfg.use_fused_groupnorm, name="mid_attn_1")(h)
        h = ResnetBlock(block_in, cfg.dropout, comp, cfg.use_fused_groupnorm,
                        name="mid_block_2")(
            h, deterministic=deterministic
        )
        curr_res = cfg.resolution // 2 ** (num_res - 1)
        for i_level in reversed(range(num_res)):
            block_out = cfg.ch * cfg.ch_mult[i_level]
            for i_block in range(cfg.num_res_blocks + 1):
                h = ResnetBlock(
                    block_out, cfg.dropout, comp, cfg.use_fused_groupnorm,
                    name=f"up_{i_level}_block_{i_block}"
                )(h, deterministic=deterministic)
                if curr_res in cfg.attn_resolutions:
                    h = AttnBlock(block_out, comp, cfg.use_flash_attention,
                                  cfg.use_fused_groupnorm, name=f"up_{i_level}_attn_{i_block}")(h)
            if i_level != 0:
                h = Upsample(block_out, comp, name=f"up_{i_level}_upsample")(h)
                curr_res *= 2
        h = VAEGroupNorm(h.shape[-1], cfg.use_fused_groupnorm, with_silu=True,
                         name="norm_out")(h)
        h = nn.Conv(cfg.out_ch, (3, 3), padding=1, dtype=comp, name="conv_out")(h)
        return h.astype(jnp.float32)


class DiagonalGaussian:
    """VAE posterior over (B, h, w, 2*z) moments (distributions.py:24-62)."""

    def __init__(self, moments: jax.Array):
        mean, logvar = jnp.split(moments, 2, axis=-1)
        self.mean = mean
        self.logvar = jnp.clip(logvar, -30.0, 20.0)
        self.std = jnp.exp(0.5 * self.logvar)
        self.var = jnp.exp(self.logvar)

    def sample(self, key: jax.Array) -> jax.Array:
        return self.mean + self.std * jax.random.normal(key, self.mean.shape, self.mean.dtype)

    def mode(self) -> jax.Array:
        return self.mean

    def kl(self, other: Optional["DiagonalGaussian"] = None) -> jax.Array:
        axes = tuple(range(1, self.mean.ndim))
        if other is None:
            return 0.5 * jnp.sum(
                jnp.square(self.mean) + self.var - 1.0 - self.logvar, axis=axes
            )
        return 0.5 * jnp.sum(
            jnp.square(self.mean - other.mean) / other.var
            + self.var / other.var
            - 1.0
            - self.logvar
            + other.logvar,
            axis=axes,
        )

    def nll(self, sample: jax.Array) -> jax.Array:
        axes = tuple(range(1, self.mean.ndim))
        logtwopi = float(np.log(2.0 * np.pi))
        return 0.5 * jnp.sum(
            logtwopi + self.logvar + jnp.square(sample - self.mean) / self.var,
            axis=axes,
        )


class AutoencoderKL(nn.Module):
    """Encoder + 1x1 quant/post-quant convs + Decoder (autoencoder.py:285-423)."""

    config: AutoencoderConfig

    def setup(self):
        cfg = self.config
        self.encoder = Encoder(cfg, name="encoder")
        self.decoder = Decoder(cfg, name="decoder")
        factor = 2 if cfg.double_z else 1
        self.quant_conv = nn.Conv(
            factor * cfg.embed_dim, (1, 1), dtype=cfg.dtype, name="quant_conv"
        )
        self.post_quant_conv = nn.Conv(
            cfg.z_channels, (1, 1), dtype=cfg.dtype, name="post_quant_conv"
        )

    def encode(self, x, *, deterministic: bool = True) -> DiagonalGaussian:
        moments = self.quant_conv(self.encoder(x, deterministic=deterministic))
        return DiagonalGaussian(moments.astype(jnp.float32))

    def decode(self, z, *, deterministic: bool = True) -> jax.Array:
        return self.decoder(self.post_quant_conv(z), deterministic=deterministic)

    def __call__(self, x, key, *, sample_posterior: bool = True,
                 deterministic: bool = True):
        posterior = self.encode(x, deterministic=deterministic)
        z = posterior.sample(key) if sample_posterior else posterior.mode()
        dec = self.decode(z, deterministic=deterministic)
        return dec, posterior

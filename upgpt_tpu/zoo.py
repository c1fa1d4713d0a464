"""Model zoo: named builders for the released UPGPT variants.

Capability matrix from SURVEY.md §2.5 / the reference's models/upgpt/*:

| variant    | latent     | concat        | context            | first stage |
|------------|------------|---------------|--------------------|-------------|
| pt_256     | 32x24x4    | bbox mask 1ch | 77 txt + 9 sty + 1 | kl-f8       |
| interp_256 | 32x24x4    | bbox mask 1ch | same + loss_w      | kl-f8       |
| mm_512     | 64x48x4    | smpl mask 1ch | same               | kl-f8       |
| upscale    | 128x96x3   | lr image 3ch  | 77 txt + 9 sty     | kl-f4       |

YAML configs under configs/ instantiate through these builders via the
`target:`/`params:` registry (upgpt_tpu.config).
"""

from __future__ import annotations

import dataclasses
import jax.numpy as jnp

from upgpt_tpu.diffusion.latent_diffusion import (
    LatentDiffusion, LatentDiffusionConfig,
)
from upgpt_tpu.models.unet import UNetConfig
from upgpt_tpu.models.vae import AutoencoderConfig

_DTYPES = {"float32": jnp.float32, "bfloat16": jnp.bfloat16}


def build_latent_diffusion(
    variant: str = "interp_256",
    dtype: str = "float32",
    use_checkpoint: bool = False,
    use_flash_attention: bool = True,
    **overrides,
) -> LatentDiffusion:
    comp = _DTYPES[dtype]
    builders = {
        "pt_256": _pt_256,
        "interp_256": _interp_256,
        "mm_512": _mm_512,
        "upscale": _upscale,
        "inshop_laion": _inshop_laion,
        "tiny": _tiny,  # CI/smoke geometry, not a released variant
        "tiny_upscale": _tiny_upscale,  # CI geometry for the 256->512 chain
    }
    if variant not in builders:
        raise KeyError(f"unknown variant {variant!r}; have {list(builders)}")
    cfg = builders[variant](comp, use_checkpoint, use_flash_attention)
    if overrides:
        cfg = dataclasses.replace(cfg, **overrides)
    return LatentDiffusion(cfg)


def _unet_256(comp, ckpt, flash) -> UNetConfig:
    # models/upgpt/interp_256/config.yaml:40-55
    return UNetConfig(
        in_channels=5, model_channels=224, out_channels=4, num_res_blocks=2,
        attention_resolutions=(4, 2, 1), channel_mult=(1, 2, 4, 4), num_heads=8,
        transformer_depth=1, context_dim=768, use_checkpoint=ckpt,
        use_flash_attention=flash, dtype=comp,
    )


def _pt_256(comp, ckpt, flash) -> LatentDiffusionConfig:
    return LatentDiffusionConfig(
        unet=_unet_256(comp, ckpt, flash),
        vae=AutoencoderConfig.kl_f8(dtype=comp),
        latent_size=(32, 24), latent_channels=4,
    )


def _interp_256(comp, ckpt, flash) -> LatentDiffusionConfig:
    return _pt_256(comp, ckpt, flash)  # same graph; loss weights are data-side


def _inshop_laion(comp, ckpt, flash) -> LatentDiffusionConfig:
    # configs/deepfashion/inshop_laion_clip.yaml: interp geometry with the
    # cond_stage_key_2 route — TRAINABLE text<->style CrossAttention fusion
    # over laion-CLIP embeddings (quick_gelu=False towers), smpl RPM mask,
    # context = fused text (77) + pose (1)
    return dataclasses.replace(
        _pt_256(comp, ckpt, flash), cond_fusion="image"
    )


def _mm_512(comp, ckpt, flash) -> LatentDiffusionConfig:
    # models/upgpt/mm_512/config.yaml: 512x384 -> 64x48 latent, smpl RPM
    return LatentDiffusionConfig(
        unet=_unet_256(comp, ckpt, flash),
        vae=AutoencoderConfig.kl_f8(dtype=comp, resolution=512),
        latent_size=(64, 48), latent_channels=4,
    )


def _upscale(comp, ckpt, flash) -> LatentDiffusionConfig:
    # models/upgpt/upscale/config.yaml:14-23,37-81
    return LatentDiffusionConfig(
        unet=UNetConfig(
            in_channels=6, model_channels=256, out_channels=3,
            num_res_blocks=2, attention_resolutions=(8, 4, 2),
            channel_mult=(1, 2, 2, 4), num_heads=8, transformer_depth=1,
            context_dim=768, use_checkpoint=ckpt, use_flash_attention=flash,
            dtype=comp,
        ),
        vae=AutoencoderConfig.kl_f4(dtype=comp, resolution=512),
        linear_start=1e-4, linear_end=2e-2,
        latent_size=(128, 96), latent_channels=3,
        pose_input_dim=None, use_ema=False,
    )


def _tiny(comp, ckpt, flash) -> LatentDiffusionConfig:
    """Miniature geometry for CI: full topology (hybrid concat, 87-token
    context path, pose stage), 1/50th the compute."""
    return LatentDiffusionConfig(
        unet=UNetConfig(
            in_channels=5, model_channels=32, out_channels=4, num_res_blocks=1,
            attention_resolutions=(1, 2), channel_mult=(1, 2), num_heads=4,
            context_dim=768, use_checkpoint=ckpt, use_flash_attention=flash,
            dtype=comp,
        ),
        vae=AutoencoderConfig(
            embed_dim=4, z_channels=4, ch=32, ch_mult=(1, 2), num_res_blocks=1,
            resolution=64, dtype=comp,
        ),
        timesteps=1000, latent_size=(32, 24), latent_channels=4,
    )


def _tiny_upscale(comp, ckpt, flash) -> LatentDiffusionConfig:
    """Miniature upscale-stage geometry for CI: lr-image concat (6ch in,
    3ch out), kl-f4-style z=3 first stage, no pose token — the `upscale`
    topology at 1/50th the compute (pairs with `tiny` for chained tests)."""
    return LatentDiffusionConfig(
        unet=UNetConfig(
            in_channels=6, model_channels=32, out_channels=3, num_res_blocks=1,
            attention_resolutions=(2,), channel_mult=(1, 2), num_heads=4,
            context_dim=768, use_checkpoint=ckpt, use_flash_attention=flash,
            dtype=comp,
        ),
        vae=AutoencoderConfig(
            embed_dim=3, z_channels=3, ch=32, ch_mult=(1, 2), num_res_blocks=1,
            resolution=64, dtype=comp,
        ),
        timesteps=1000, latent_size=(32, 24), latent_channels=3,
        pose_input_dim=None, linear_start=1e-4, linear_end=2e-2,
        use_ema=False,
    )


def build_autoencoder(kind: str = "kl_f8", dtype: str = "float32", **over):
    from upgpt_tpu.models.vae import AutoencoderKL

    comp = _DTYPES[dtype]
    cfg = (AutoencoderConfig.kl_f8 if kind == "kl_f8" else AutoencoderConfig.kl_f4)(
        dtype=comp, **over
    )
    return AutoencoderKL(cfg)

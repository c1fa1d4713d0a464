"""LatentDiffusion: the functional core of the framework.

Re-design of the reference `LatentDiffusion` LightningModule
(ldm/models/diffusion/ddpm.py:433-1547) as a stateless orchestrator over
explicit parameter pytrees:

    params = {
        "unet":  U-Net params (trainable),
        "pose":  LinearProject params (trainable; extra_cond 'pose_cond'),
        "vae":   AutoencoderKL params (frozen; gradients stopped),
    }

Conditioning contract (matches DiffusionWrapper 'hybrid', ddpm.py:1550-1577
and the token-concat of extra cond stages, ddpm.py:733-739):

    cond = {
        "c_crossattn": (B, T, 768) context tokens — CLIP text (77) ‖ style
                        embeddings (9) ‖ pose token (1),
        "c_concat":    (B, h, w, Cc) latent-resolution channel concat —
                        person mask (1ch) or low-res image (3ch), or None.
    }

Context assembly from raw encoders lives in upgpt_tpu.inference.pipeline /
upgpt_tpu.training; this module takes embeddings, keeping the hot path free
of tokenizers and PIL.

Dropped on purpose: the dead per-train-step VAE decode of the model output
(ddpm.py:1088-1089) — pure waste flagged in SURVEY.md §3.1.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from upgpt_tpu.diffusion.schedule import DiffusionSchedule
from upgpt_tpu.models.pose import LinearProject
from upgpt_tpu.models.unet import UNetConfig, UNetModel
from upgpt_tpu.models.vae import AutoencoderConfig, AutoencoderKL


@dataclasses.dataclass(frozen=True)
class LatentDiffusionConfig:
    unet: UNetConfig = dataclasses.field(default_factory=UNetConfig)
    vae: AutoencoderConfig = dataclasses.field(default_factory=AutoencoderConfig)
    timesteps: int = 1000
    beta_schedule: str = "linear"
    linear_start: float = 0.00085
    linear_end: float = 0.0120
    scale_factor: float = 0.18215
    parameterization: str = "eps"
    conditioning_key: str = "hybrid"  # None|concat|crossattn|hybrid
    # latent geometry (h, w) e.g. (32, 24) for 256x192 f8
    latent_size: Tuple[int, int] = (32, 24)
    latent_channels: int = 4
    # pose conditioning (LinearProject 85 -> 768); None disables (upscale stage)
    pose_input_dim: Optional[int] = 85
    context_dim: int = 768
    # cond_stage_key_2 route (inshop_laion_clip.yaml:12,82): a TRAINABLE
    # text<->style CrossAttention fuses style embeddings INTO the text tokens
    # instead of token-concatenating them. None disables; "image"/"text" is
    # the reference's style_encode mode (modules.py:306-316) — it selects
    # which embeddings the encoder feeds in, the fusion math is identical.
    cond_fusion: Optional[str] = None
    use_ema: bool = True
    l_simple_weight: float = 1.0
    original_elbo_weight: float = 0.0

    @classmethod
    def interp_256(cls, **overrides) -> "LatentDiffusionConfig":
        return dataclasses.replace(cls(), **overrides)

    @classmethod
    def upscale_512(cls, **overrides) -> "LatentDiffusionConfig":
        base = cls(
            unet=UNetConfig.upscale_512(),
            vae=AutoencoderConfig.kl_f4(),
            # upscale/config.yaml:5-6 trains on the SD-default schedule
            linear_start=1e-4,
            linear_end=2e-2,
            latent_size=(128, 96),
            latent_channels=3,
            pose_input_dim=None,
            use_ema=False,  # upscale/config.yaml `use_ema: false`
        )
        return dataclasses.replace(base, **overrides)


class LatentDiffusion:
    """Stateless model family: all methods take params explicitly."""

    def __init__(self, config: LatentDiffusionConfig):
        self.config = config
        self.unet = UNetModel(config.unet)
        self.vae = AutoencoderKL(config.vae)
        self.pose = (
            LinearProject(config.pose_input_dim, config.context_dim)
            if config.pose_input_dim
            else None
        )
        if config.cond_fusion:
            from upgpt_tpu.models.cond_fusion import TextStyleCrossAttention

            # trainable fusion (modules.py:274-278): CrossAttention(768,
            # heads 8, dim_head 96); joins the optimizer group via the
            # trainable param tree (reference ddpm.py:1501-1509)
            self.fusion = TextStyleCrossAttention(dim=config.context_dim)
        else:
            self.fusion = None
        self.schedule = DiffusionSchedule.create(
            timesteps=config.timesteps,
            beta_schedule=config.beta_schedule,
            linear_start=config.linear_start,
            linear_end=config.linear_end,
            parameterization=config.parameterization,
        )

    # ---------------- init ----------------

    def init_params(self, key: jax.Array, include_vae: bool = True) -> Dict[str, Any]:
        cfg = self.config
        h, w = cfg.latent_size
        k_unet, k_vae, k_pose = jax.random.split(key, 3)
        x = jnp.zeros((1, h, w, cfg.unet.in_channels))
        t = jnp.zeros((1,), jnp.int32)
        ctx = jnp.zeros((1, 1, cfg.context_dim))
        params: Dict[str, Any] = {
            "unet": self.unet.init(k_unet, x, t, ctx)["params"]
        }
        if self.pose is not None:
            params["pose"] = self.pose.init(
                k_pose, jnp.zeros((1, 1, cfg.pose_input_dim))
            )["params"]
        if self.fusion is not None:
            params["cond_fusion"] = self.fusion.init(
                jax.random.fold_in(key, 7),
                jnp.zeros((1, 77, cfg.context_dim)),
                jnp.zeros((1, 9, cfg.context_dim)),
            )["params"]
        if include_vae:
            img_ch = cfg.vae.in_channels
            f = 2 ** (len(cfg.vae.ch_mult) - 1)
            img = jnp.zeros((1, h * f, w * f, img_ch))
            params["vae"] = self.vae.init(
                jax.random.split(k_vae, 2)[0], img, k_vae
            )["params"]
        return params

    # ---------------- first stage ----------------

    def encode_first_stage(self, params, x: jax.Array, key: jax.Array) -> jax.Array:
        """Image [-1,1] NHWC -> scaled latent z (ddpm.py:569-576,891-929)."""
        posterior = self.vae.apply({"params": params["vae"]}, x, method="encode")
        z = posterior.sample(key)
        return jax.lax.stop_gradient(self.config.scale_factor * z)

    def encode_first_stage_mode(self, params, x: jax.Array) -> jax.Array:
        posterior = self.vae.apply({"params": params["vae"]}, x, method="encode")
        return jax.lax.stop_gradient(self.config.scale_factor * posterior.mode())

    def decode_first_stage(self, params, z: jax.Array) -> jax.Array:
        z = z / self.config.scale_factor
        return self.vae.apply({"params": params["vae"]}, z, method="decode")

    # ---------------- conditioning ----------------

    def pose_token(self, params, smpl: jax.Array) -> jax.Array:
        """(B, 1, 85) or (B, 85) SMPL vector -> (B, 1, 768) context token."""
        assert self.pose is not None, "this model variant has no pose stage"
        return self.pose.apply({"params": params["pose"]}, smpl)

    def build_context(
        self,
        params,
        text_emb: jax.Array,
        style_emb: Optional[jax.Array] = None,
        smpl: Optional[jax.Array] = None,
    ) -> jax.Array:
        """Context assembly.

        Default: token-concat of text (77), styles (9), pose (1)
        (ddpm.py:733-739). With cond_fusion (cond_stage_key_2 route,
        ddpm.py:707-713): styles are fused INTO the text tokens by the
        trainable CrossAttention, so the context is fused-text (77) + pose.
        """
        if self.fusion is not None:
            text_emb = self.fusion.apply(
                {"params": params["cond_fusion"]}, text_emb, style_emb
            )
            parts = [text_emb]
        else:
            parts = [text_emb]
            if style_emb is not None:
                parts.append(style_emb)
        if smpl is not None:
            parts.append(self.pose_token(params, smpl))
        return jnp.concatenate(parts, axis=1)

    # ---------------- diffusion math ----------------

    def q_sample(self, z0: jax.Array, t: jax.Array, noise: jax.Array) -> jax.Array:
        """Forward noising (reference ddpm.py:281-284)."""
        s = self.schedule
        a = jnp.asarray(s.sqrt_alphas_cumprod)[t]
        b = jnp.asarray(s.sqrt_one_minus_alphas_cumprod)[t]
        shape = (-1,) + (1,) * (z0.ndim - 1)
        return a.reshape(shape) * z0 + b.reshape(shape) * noise

    def apply_model(
        self, params, x_noisy: jax.Array, t: jax.Array, cond: Dict[str, Any],
        *, deterministic: bool = True,
    ) -> jax.Array:
        """DiffusionWrapper conditioning router (ddpm.py:1550-1577).

        `cond` may carry "cross_kv" — precomputed per-layer attn2 K/V of a
        loop-invariant context (models/unet.precompute_cross_kv) that the
        sampler hoists out of its scan."""
        key = self.config.conditioning_key
        context = cond.get("c_crossattn")
        concat = cond.get("c_concat")
        cross_kv = cond.get("cross_kv")
        if key == "hybrid":
            x_in = jnp.concatenate([x_noisy, concat.astype(x_noisy.dtype)], axis=-1)
        elif key == "concat":
            x_in = jnp.concatenate([x_noisy, concat.astype(x_noisy.dtype)], axis=-1)
            context = None
        elif key == "crossattn":
            x_in = x_noisy
        elif key is None:
            x_in, context = x_noisy, None
        else:
            raise NotImplementedError(key)
        return self.unet.apply(
            {"params": params["unet"]}, x_in, t, context,
            cross_kv=cross_kv, deterministic=deterministic,
        )

    def to_eps(self, model_out: jax.Array, x_t: jax.Array, t: jax.Array) -> jax.Array:
        """Convert the network output to an eps prediction.

        Every sampler here (DDIM/PLMS/DPM++/UniPC) consumes eps; for a
        v-parameterized model (distilled students) the conversion is
        eps_hat = sigma_t*z_t + alpha_t*v_hat (arXiv:2202.00512 appendix D
        — algebraically exact, so one wrapper makes ALL samplers work with
        any parameterization). Identity for eps models.
        """
        p = self.config.parameterization
        if p == "eps":
            return model_out
        s = self.schedule
        shape = (-1,) + (1,) * (x_t.ndim - 1)
        a = jnp.asarray(s.sqrt_alphas_cumprod)[t].reshape(shape)
        sg = jnp.asarray(s.sqrt_one_minus_alphas_cumprod)[t].reshape(shape)
        x32 = x_t.astype(jnp.float32)
        out32 = model_out.astype(jnp.float32)
        if p == "v":
            return sg * x32 + a * out32
        if p == "x0":
            return (x32 - a * out32) / jnp.maximum(sg, 1e-8)
        raise NotImplementedError(p)

    # ---------------- training loss ----------------

    def p_losses(
        self,
        params,
        z0: jax.Array,
        cond: Dict[str, Any],
        t: jax.Array,
        noise: jax.Array,
        loss_w: Optional[jax.Array] = None,
        *,
        deterministic: bool = True,
    ) -> Tuple[jax.Array, Dict[str, jax.Array]]:
        """Weighted eps-prediction loss (reference ddpm.py:1083-1123, minus
        the dead decode at 1088-1089)."""
        cfg = self.config
        x_noisy = self.q_sample(z0, t, noise)
        model_out = self.apply_model(
            params, x_noisy, t, cond, deterministic=deterministic
        )
        if cfg.parameterization == "eps":
            target = noise
        elif cfg.parameterization == "v":
            # velocity target v = alpha_t*eps - sigma_t*x0 (arXiv:2202.00512
            # eq. 10) — the parameterization the few-step distilled students
            # use; well-conditioned at high t where eps-prediction blows up
            # the x0 estimate by 1/alpha_t
            s = self.schedule
            shape = (-1,) + (1,) * (z0.ndim - 1)
            a = jnp.asarray(s.sqrt_alphas_cumprod)[t].reshape(shape)
            sg = jnp.asarray(s.sqrt_one_minus_alphas_cumprod)[t].reshape(shape)
            target = a * noise - sg * z0
        else:
            target = z0

        sq = jnp.square(model_out.astype(jnp.float32) - target.astype(jnp.float32))
        if loss_w is not None:
            sq = sq * loss_w.astype(jnp.float32)
        loss_simple = jnp.mean(sq, axis=(1, 2, 3))

        lvlb_w = jnp.asarray(self.schedule.lvlb_weights)[t]
        loss_vlb_per = jnp.mean(
            jnp.square(model_out.astype(jnp.float32) - target.astype(jnp.float32)),
            axis=(1, 2, 3),
        )
        loss_vlb = jnp.mean(lvlb_w * loss_vlb_per)

        loss = cfg.l_simple_weight * jnp.mean(loss_simple)
        loss = loss + cfg.original_elbo_weight * loss_vlb
        metrics = {
            "loss_simple": jnp.mean(loss_simple),
            "loss_vlb": loss_vlb,
            "loss": loss,
        }
        return loss, metrics

    def training_loss(
        self,
        params,
        batch: Dict[str, jax.Array],
        key: jax.Array,
        *,
        frozen_params: Optional[Dict[str, Any]] = None,
    ) -> Tuple[jax.Array, Dict[str, jax.Array]]:
        """One training loss evaluation from a raw batch.

        batch keys (NHWC, matching the data pipeline): 'image' in [-1,1],
        'person_mask' (h, w, 1) at latent res, 'text_emb' (77, 768),
        'style_emb' (9, 768), 'smpl' (1, 85), optional 'loss_w' (h, w, 1).

        `frozen_params` carries the VAE (and is merged for apply); gradients
        never flow into it (stop_gradient in encode_first_stage).
        """
        all_params = dict(params)
        if frozen_params:
            all_params.update(frozen_params)
        k_enc, k_t, k_noise = jax.random.split(key, 3)
        z0 = self.encode_first_stage(all_params, batch["image"], k_enc)
        b = z0.shape[0]
        t = jax.random.randint(k_t, (b,), 0, self.schedule.num_timesteps)
        noise = jax.random.normal(k_noise, z0.shape, z0.dtype)
        cond = {
            "c_crossattn": self.build_context(
                all_params,
                batch["text_emb"],
                batch.get("style_emb"),
                batch.get("smpl"),
            ),
            "c_concat": batch.get("person_mask"),
        }
        return self.p_losses(
            all_params, z0, cond, t, noise, batch.get("loss_w"),
            deterministic=True,
        )

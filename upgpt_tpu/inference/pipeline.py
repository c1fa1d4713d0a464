"""Inference surfaces: generation, style mixing, pose interpolation, upscale.

TPU-native counterpart of the reference's InferenceModel + app paths
(ldm/data/generate_utils.py:131-190, app.py:262-409): here the U-Net DDIM
loop and the VAE decode compile into ONE jitted XLA program per (config,
steps, batch-shape); multi-frame pose interpolation is a batched transform
feeding that single program, so U-Net weights are amortized across frames on
the lane dimension.

Conditioning enters as embeddings — text (77, 768) last-hidden-state, style
slots (9, 768) pooled CLIP image embeddings, SMPL (1, 85) raw vector — which
is exactly the reference's inference contract (its style stage is swapped to
a DummyModel passthrough because mix_style precomputes embeddings,
generate_utils.py:142).

Quirks preserved on purpose:
- shared seeded x_T across the batch (ddpm.py:1433-1437): one noise draw
  broadcast over the batch when `shared_x_T=True`.
- interpolation-mask fill values -1 (background) / -0.99215686 (box), the
  /255 backward-compat constant (generate_utils.py:103-128).
- the released eval protocol's inert CFG: guidance defaults to off exactly
  like log_images never builds an unconditional batch (ddpm.py:1380-1444).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from upgpt_tpu.diffusion.ddim import ddim_sample
from upgpt_tpu.diffusion.latent_diffusion import LatentDiffusion
from upgpt_tpu.diffusion.schedule import make_ddim_schedule

# 9 style slots, fixed order (reference deepfashion_inshop.py:21)
STYLE_NAMES = (
    "face", "hair", "headwear", "background", "top",
    "outer", "bottom", "shoes", "accesories",
)

MASK_BG = -1.0
MASK_BOX = -0.99215686  # 253/255-scaled bbox value (generate_utils.py:117)


class GenerationPipeline:
    """One fully-jitted text+style+pose -> image sampler for a model variant."""

    def __init__(
        self,
        model: LatentDiffusion,
        num_steps: int = 200,
        eta: float = 1.0,
        guidance_scale: float = 1.0,
        decode: bool = True,
        output_uint8: bool = False,
        sampler: str = "ddim",
        schedule_method: str = "uniform",
        timesteps=None,
    ):
        self.model = model
        self.num_steps = num_steps
        self.eta = eta
        self.guidance_scale = guidance_scale
        self.decode = decode
        # uint8 RGB output quarters the device->host transfer (the serving
        # path saves uint8 images anyway); off by default for tests/APIs
        # that expect [-1,1] floats
        self.output_uint8 = output_uint8
        # "ddim" (reference protocol), "dpm++" (DPM-Solver++(2M): same
        # quality in ~2.5x fewer steps) or "unipc" (UniPC-2: corrector on
        # top, usable at ~10 steps); the ODE solvers ignore eta
        if sampler not in ("ddim", "dpm++", "unipc"):
            raise ValueError(f"unknown sampler {sampler!r}")
        # t-grid: "uniform"/"quad" (reference grids) or "karras"
        # (beyond-parity low-step spacing, schedule.make_karras_timesteps)
        if schedule_method not in ("uniform", "quad", "karras"):
            raise ValueError(f"unknown schedule_method {schedule_method!r}")
        self.sampler = sampler
        self.schedule_method = schedule_method
        # explicit t-grid (ascending ints): the distilled students are only
        # valid on the exact nested grid they were trained on
        # (training/distill.py); DDIM is the matching one-eval-per-point
        # sampler there (a multistep solver adds nothing on a student that
        # was trained to jump the full sub-interval in one eval)
        if timesteps is not None and sampler != "ddim":
            raise ValueError("explicit timesteps require sampler='ddim'")
        if sampler == "dpm++":
            from upgpt_tpu.diffusion.dpm_solver import make_dpm_solver_schedule

            self.dpm = make_dpm_solver_schedule(
                model.schedule, num_steps, method=schedule_method)
        elif sampler == "unipc":
            from upgpt_tpu.diffusion.unipc import make_unipc_schedule

            self.unipc = make_unipc_schedule(
                model.schedule, num_steps, method=schedule_method)
        self.ddim = make_ddim_schedule(
            model.schedule, num_steps, eta=eta, method=schedule_method,
            timesteps=timesteps)
        # actual table length, not the requested count: the karras grid can
        # dedupe to fewer steps after integer-t quantization, and every
        # consumer of pipe.num_steps (labels, per-step math) must see what
        # will actually run
        if sampler == "dpm++":
            self.num_steps = self.dpm.num_steps
        elif sampler == "unipc":
            self.num_steps = self.unipc.num_steps
        else:
            self.num_steps = self.ddim.num_steps
        self._sample = jax.jit(self._sample_impl, static_argnames=("shared_x_T",))

    def _sample_impl(
        self,
        params: Dict[str, Any],
        batch: Dict[str, jax.Array],
        key: jax.Array,
        *,
        shared_x_T: bool = False,
    ) -> jax.Array:
        model = self.model
        cfg = model.config
        context = model.build_context(
            params,
            batch["text_emb"],
            batch.get("style_emb"),
            batch.get("smpl"),
        )
        cond = {"c_crossattn": context, "c_concat": batch.get("person_mask")}
        if cfg.conditioning_key in ("hybrid", "crossattn"):
            # context is fixed across the whole reverse process: hoist every
            # attn2 K/V projection out of the DDIM scan
            from upgpt_tpu.models.unet import precompute_cross_kv

            cond["cross_kv"] = precompute_cross_kv(
                params["unet"], context, cfg.unet
            )
        uncond = batch.get("uncond")  # optional dict for real CFG
        if uncond is not None and "cross_kv" in cond:
            from upgpt_tpu.models.unet import precompute_cross_kv

            uncond = dict(uncond)
            uncond["cross_kv"] = precompute_cross_kv(
                params["unet"], uncond["c_crossattn"], cfg.unet
            )

        b = batch["text_emb"].shape[0]
        h, w = cfg.latent_size
        shape = (b, h, w, cfg.latent_channels)

        key, k_noise = jax.random.split(key)
        if shared_x_T:
            x_T = jax.random.normal(k_noise, (1, h, w, cfg.latent_channels))
            x_T = jnp.broadcast_to(x_T, shape)
        elif "x_T_seed" in batch:
            # per-sample x_T keyed by an explicit (b,) int32 seed: samples
            # with EQUAL seeds in one batch share their initial noise — the
            # reference's seeded shared-x_T interpolation (ddpm.py:1433-1437)
            # expressed per request group inside a packed serving batch
            x_T = jax.vmap(
                lambda s: jax.random.normal(
                    jax.random.fold_in(k_noise, s),
                    (h, w, cfg.latent_channels),
                )
            )(batch["x_T_seed"].astype(jnp.uint32))
        else:
            x_T = jax.random.normal(k_noise, shape)

        def eps_model(x, t, c):
            # to_eps: v-/x0-parameterized models (distilled students) are
            # converted to eps so every sampler below works unchanged
            return model.to_eps(model.apply_model(params, x, t, c), x, t)

        if self.sampler == "dpm++":
            from upgpt_tpu.diffusion.dpm_solver import dpm_solver_pp_sample

            z = dpm_solver_pp_sample(
                eps_model, self.dpm, shape, cond, key,
                x_T=x_T, guidance_scale=self.guidance_scale, uncond=uncond,
            )
        elif self.sampler == "unipc":
            from upgpt_tpu.diffusion.unipc import unipc_sample

            z = unipc_sample(
                eps_model, self.unipc, shape, cond, key,
                x_T=x_T, guidance_scale=self.guidance_scale, uncond=uncond,
            )
        else:
            z = ddim_sample(
                eps_model, model.schedule, self.ddim, shape, cond, key,
                x_T=x_T, guidance_scale=self.guidance_scale, uncond=uncond,
            )
        if not self.decode:
            return z
        img = model.decode_first_stage(params, z)
        img = jnp.clip(img, -1.0, 1.0)
        if self.output_uint8:
            return jnp.round((img + 1.0) * 127.5).astype(jnp.uint8)
        return img

    def generate(
        self,
        params: Dict[str, Any],
        batch: Dict[str, jax.Array],
        key: jax.Array,
        *,
        shared_x_T: bool = False,
    ) -> jax.Array:
        """Returns decoded images in [-1, 1] NHWC (or latents if decode=False)."""
        return self._sample(params, batch, key, shared_x_T=shared_x_T)

    def generate_progressive(
        self,
        params: Dict[str, Any],
        batch: Dict[str, jax.Array],
        key: jax.Array,
        n_frames: int = 6,
    ) -> Tuple[jax.Array, jax.Array]:
        """(final images, progression) — the reference's denoise-row debug
        surface (ddpm.py:1395-1431 progressive_denoising / log_every_t
        intermediates): `progression` is (B, n_frames, H, W, C) of decoded
        intermediate x0 predictions, evenly spaced down the reverse
        process, final frame = the final x0 prediction. DDIM only (the
        reference's progressive rows are DDIM's too); one jitted program,
        intermediates stay latent-rate inside the scan and only n_frames
        rows are decoded.
        """
        if self.sampler != "ddim":
            raise ValueError("progressive rows are a DDIM debug surface")
        # actual table length, not the requested count (the karras grid can
        # dedupe to fewer steps after quantization)
        idx = np.linspace(
            0, self.ddim.num_steps - 1, n_frames).round().astype(int)
        return self._sample_progressive(params, batch, key, tuple(idx))

    def _sample_progressive(self, params, batch, key, idx):
        # jit cache keyed on the (static) frame indices
        if not hasattr(self, "_prog_jit"):
            self._prog_jit = jax.jit(
                self._progressive_impl, static_argnames=("idx",))
        return self._prog_jit(params, batch, key, idx=idx)

    def _progressive_impl(self, params, batch, key, *, idx):
        model = self.model
        cfg = model.config
        context = model.build_context(
            params, batch["text_emb"], batch.get("style_emb"),
            batch.get("smpl"))
        cond = {"c_crossattn": context, "c_concat": batch.get("person_mask")}
        if cfg.conditioning_key in ("hybrid", "crossattn"):
            from upgpt_tpu.models.unet import precompute_cross_kv

            cond["cross_kv"] = precompute_cross_kv(
                params["unet"], context, cfg.unet)
        b = batch["text_emb"].shape[0]
        h, w = cfg.latent_size
        shape = (b, h, w, cfg.latent_channels)

        def eps_model(x, t, c):
            return model.to_eps(model.apply_model(params, x, t, c), x, t)

        z, inter = ddim_sample(
            eps_model, model.schedule, self.ddim, shape, cond, key,
            guidance_scale=self.guidance_scale, return_pred_x0=True)
        frames = jnp.stack([inter[i] for i in idx], axis=1)  # (B, F, h, w, C)
        out = []
        for f in range(len(idx)):
            img = model.decode_first_stage(params, frames[:, f])
            out.append(jnp.clip(img, -1.0, 1.0))
        prog = jnp.stack(out, axis=1)
        final = jnp.clip(model.decode_first_stage(params, z), -1.0, 1.0)
        if self.output_uint8:
            to8 = lambda x: jnp.round((x + 1.0) * 127.5).astype(jnp.uint8)
            return to8(final), to8(prog)
        return final, prog


# ---------------- style mixing ----------------


def mix_style(
    style_image_emb: jax.Array,
    text_pooled_emb: Optional[jax.Array] = None,
    text_override: Optional[Sequence[bool]] = None,
    drop_slots: Optional[Sequence[int]] = None,
    empty_style_emb: Optional[jax.Array] = None,
) -> jax.Array:
    """Per-slot text<->image embedding swap (generate_utils.py:172-190).

    style_image_emb: (9, 768) or (B, 9, 768) CLIP image embeddings.
    text_pooled_emb: same shape, pooled CLIP text embeddings per slot.
    text_override[i]: replace slot i's image embedding with its text one.
    drop_slots: slot indices masked to the empty-style embedding.
    """
    out = style_image_emb
    if drop_slots and empty_style_emb is not None:
        for i in drop_slots:
            out = out.at[..., i, :].set(empty_style_emb)
    if text_pooled_emb is not None and text_override is not None:
        sel = jnp.asarray(text_override, bool).reshape(
            (1,) * (out.ndim - 2) + (-1, 1)
        )
        out = jnp.where(sel, text_pooled_emb, out)
    return out


# ---------------- pose / mask interpolation ----------------


def interpolate_smpl(
    smpl_src: jax.Array, smpl_dst: jax.Array, alphas: jax.Array
) -> jax.Array:
    """(85,)-vector lerp per frame: alpha*src + (1-alpha)*dst
    (reference app.py:298-300). alphas (F,) -> (F, 1, 85)."""
    a = alphas.reshape(-1, *([1] * smpl_src.ndim))
    return a * smpl_src[None] + (1.0 - a) * smpl_dst[None]


def _mask_bbox(mask: np.ndarray) -> np.ndarray:
    """bbox (rmin, rmax, cmin, cmax) of mask pixels above background
    (generate_utils.py:103-113: -1 is background)."""
    m = np.array(mask, dtype=np.float32)
    m[m == MASK_BG] = 0.0
    rows = np.nonzero(np.mean(m, axis=1))[0]
    cols = np.nonzero(np.mean(m, axis=0))[0]
    return np.array([rows[0], rows[-1], cols[0], cols[-1]], dtype=np.float64)


def interp_mask(
    src_mask: np.ndarray, dst_mask: np.ndarray, alpha: float
) -> np.ndarray:
    """bbox-corner lerp with the reference's fill constants
    (generate_utils.py:121-128). Host-side numpy; (h, w) or (h, w, 1)."""
    squeeze = src_mask.ndim == 3
    s = src_mask[..., 0] if squeeze else src_mask
    d = dst_mask[..., 0] if squeeze else dst_mask
    c1, c2 = _mask_bbox(s), _mask_bbox(d)
    rmin, rmax, cmin, cmax = (alpha * c1 + (1 - alpha) * c2).astype(np.int32)
    out = np.full_like(s, MASK_BG, dtype=np.float32)
    out[rmin : rmax + 1, cmin : cmax + 1] = MASK_BOX
    return out[..., None] if squeeze else out


def interpolate_masks(
    src_mask: np.ndarray, dst_mask: np.ndarray, alphas: Sequence[float]
) -> np.ndarray:
    """Stack of F interpolated masks for a batched sampler call."""
    return np.stack([interp_mask(src_mask, dst_mask, float(a)) for a in alphas])


# ---------------- 256 -> 512 upscale chain ----------------


def prepare_lr_condition(image_256: jax.Array, out_hw: Tuple[int, int] = (128, 96)) -> jax.Array:
    """256x192 sample -> low-res concat conditioning for the upscale stage.

    Matches app.py:93-97: edge-pad 4 px left/right, bilinear resize to the
    upscale stage's latent grid, values stay in [-1, 1]. NHWC in/out.
    """
    x = jnp.pad(image_256, ((0, 0), (0, 0), (4, 4), (0, 0)), mode="edge")
    b, _, _, c = x.shape
    return jax.image.resize(x, (b, out_hw[0], out_hw[1], c), method="bilinear")


class UpscalePipeline:
    """Chained 256->512: lr-concat conditioned diffusion in kl-f4 latent space
    (app.py:379-409, models/upgpt/upscale/config.yaml)."""

    def __init__(self, model: LatentDiffusion, num_steps: int = 200,
                 eta: float = 1.0, sampler: str = "ddim",
                 schedule_method: str = "uniform"):
        self.inner = GenerationPipeline(
            model, num_steps=num_steps, eta=eta, sampler=sampler,
            schedule_method=schedule_method)
        # lr concat grid = this stage's latent size (128x96 released;
        # follows the config so tiny CI geometries work too)
        self.lr_hw = model.config.latent_size

    def upscale(
        self,
        params: Dict[str, Any],
        image_256: jax.Array,
        text_emb: jax.Array,
        style_emb: Optional[jax.Array],
        key: jax.Array,
    ) -> jax.Array:
        lr = prepare_lr_condition(image_256, self.lr_hw)
        batch = {
            "text_emb": text_emb,
            "style_emb": style_emb,
            "person_mask": lr,  # c_concat slot carries the lr image (3ch)
        }
        return self.inner.generate(params, batch, key)


class ChainedUpscalePipeline:
    """End-to-end 256->512 generation as one serving surface.

    The app runs the chain interactively (generate, then upscale,
    app.py:262-278 + 379-409); production serving wants ONE submit per
    512px result. This pipeline exposes the ServingEngine contract
    (`generate(params, batch, key)`), so `ServingEngine(chained, params)`
    batches requests through BOTH stages: two jitted programs back to back,
    the intermediate 256px batch never leaving the device.

    `params` is {"base": <256-model params>, "up": <upscale-model params>}.
    `batch` is the 256-stage conditioning (text_emb, style_emb, smpl,
    person_mask); the upscale stage reuses text_emb/style_emb and takes its
    c_concat from the generated 256px image (lr resize on device).
    """

    def __init__(
        self,
        base_model: LatentDiffusion,
        upscale_model: LatentDiffusion,
        num_steps: int = 50,
        upscale_steps: Optional[int] = None,
        eta: float = 1.0,
        sampler: str = "ddim",
        output_uint8: bool = False,
        lr_hw: Optional[Tuple[int, int]] = None,
        schedule_method: str = "uniform",
    ):
        # the intermediate stays float [-1,1] on device; only the final
        # stage honors output_uint8
        self.base = GenerationPipeline(
            base_model, num_steps=num_steps, eta=eta, sampler=sampler,
            schedule_method=schedule_method)
        self.up = GenerationPipeline(
            upscale_model, num_steps=upscale_steps or num_steps, eta=eta,
            sampler=sampler, output_uint8=output_uint8,
            schedule_method=schedule_method)
        # upscale c_concat grid = the stage's latent size (128x96 released)
        self.lr_hw = lr_hw or upscale_model.config.latent_size

    def generate(
        self,
        params: Dict[str, Any],
        batch: Dict[str, jax.Array],
        key: jax.Array,
        *,
        shared_x_T: bool = False,
    ) -> jax.Array:
        k_base, k_up = jax.random.split(key)
        img256 = self.base.generate(
            params["base"], batch, k_base, shared_x_T=shared_x_T)
        up_batch = {
            "text_emb": batch["text_emb"],
            "style_emb": batch.get("style_emb"),
            "person_mask": prepare_lr_condition(img256, self.lr_hw),
        }
        return self.up.generate(params["up"], up_batch, k_up)

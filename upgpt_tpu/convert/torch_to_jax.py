"""Torch (Lightning .ckpt) -> JAX pytree weight conversion.

The released UPGPT checkpoints are Lightning pickles with NCHW torch tensors
(reference ddpm.py:194-210 `init_from_ckpt`). This module maps them onto the
NHWC flax parameter trees of upgpt_tpu's models:

- Linear `weight` (out, in)           -> Dense `kernel` (in, out)
- Conv2d `weight` (O, I, kH, kW)      -> Conv `kernel` (kH, kW, I, O)
- GroupNorm/LayerNorm `weight`/`bias` -> `scale`/`bias`

Key layout mapping is *structural*: torch module indices (input_blocks.7.1...)
are recomputed from the same config arithmetic the model builder uses, so any
UNet/VAE geometry the reference can express converts without a hand-written
key table.

Only numpy + (optionally) torch are used; tensors never touch a GPU. torch is
imported lazily so the framework itself has no torch dependency.
"""

from __future__ import annotations

from typing import Dict, Mapping

import numpy as np

from upgpt_tpu.models.unet import UNetConfig
from upgpt_tpu.models.vae import AutoencoderConfig

Array = np.ndarray
StateDict = Mapping[str, "np.ndarray"]


def _np(t) -> Array:
    if isinstance(t, np.ndarray):
        return t
    return t.detach().cpu().numpy()


def _dense(sd: StateDict, prefix: str) -> Dict[str, Array]:
    out = {"kernel": np.ascontiguousarray(_np(sd[f"{prefix}.weight"]).T)}
    if f"{prefix}.bias" in sd:
        out["bias"] = _np(sd[f"{prefix}.bias"])
    return out


def _conv(sd: StateDict, prefix: str) -> Dict[str, Array]:
    w = _np(sd[f"{prefix}.weight"])
    out = {"kernel": np.ascontiguousarray(w.transpose(2, 3, 1, 0))}
    if f"{prefix}.bias" in sd:
        out["bias"] = _np(sd[f"{prefix}.bias"])
    return out


def _norm(sd: StateDict, prefix: str) -> Dict[str, Array]:
    return {"scale": _np(sd[f"{prefix}.weight"]), "bias": _np(sd[f"{prefix}.bias"])}


def _resblock(sd: StateDict, p: str, has_skip: bool) -> Dict[str, Array]:
    """U-Net ResBlock (openaimodel.py:163-275) -> models.unet.ResBlock tree."""
    out = {
        "norm_in": _norm(sd, f"{p}.in_layers.0"),
        "conv_in": _conv(sd, f"{p}.in_layers.2"),
        "emb_proj": _dense(sd, f"{p}.emb_layers.1"),
        "norm_out": _norm(sd, f"{p}.out_layers.0"),
        "conv_out": _conv(sd, f"{p}.out_layers.3"),
    }
    if has_skip:
        out["skip"] = _conv(sd, f"{p}.skip_connection")
    return out


def _cross_attention(sd: StateDict, p: str) -> Dict[str, Array]:
    return {
        "to_q": _dense(sd, f"{p}.to_q"),
        "to_k": _dense(sd, f"{p}.to_k"),
        "to_v": _dense(sd, f"{p}.to_v"),
        "to_out": _dense(sd, f"{p}.to_out.0"),
    }


def _conv1x1_as_dense(sd: StateDict, prefix: str) -> Dict[str, Array]:
    """torch 1x1 Conv2d (O, I, 1, 1) -> Dense kernel (I, O)."""
    w = _np(sd[f"{prefix}.weight"])
    out = {"kernel": np.ascontiguousarray(w[:, :, 0, 0].T)}
    if f"{prefix}.bias" in sd:
        out["bias"] = _np(sd[f"{prefix}.bias"])
    return out


def _spatial_transformer(sd: StateDict, p: str, depth: int) -> Dict[str, Array]:
    out = {
        "norm": _norm(sd, f"{p}.norm"),
        "proj_in": _conv1x1_as_dense(sd, f"{p}.proj_in"),
        "proj_out": _conv1x1_as_dense(sd, f"{p}.proj_out"),
    }
    for d in range(depth):
        bp = f"{p}.transformer_blocks.{d}"
        out[f"block_{d}"] = {
            "attn1": _cross_attention(sd, f"{bp}.attn1"),
            "attn2": _cross_attention(sd, f"{bp}.attn2"),
            "ff": {
                "proj_in": _dense(sd, f"{bp}.ff.net.0.proj"),
                "proj_out": _dense(sd, f"{bp}.ff.net.2"),
            },
            "norm1": _norm(sd, f"{bp}.norm1"),
            "norm2": _norm(sd, f"{bp}.norm2"),
            "norm3": _norm(sd, f"{bp}.norm3"),
        }
    return out


def convert_unet_state_dict(sd: StateDict, cfg: UNetConfig) -> Dict:
    """Torch UNetModel state_dict -> flax params for models.unet.UNetModel.

    Walks the same (level, block) loops as both the reference constructor
    (openaimodel.py:516-692) and our module, keeping the torch running index
    in lockstep.
    """
    sd = {k: v for k, v in sd.items()}
    params: Dict = {
        "time_embed_0": _dense(sd, "time_embed.0"),
        "time_embed_2": _dense(sd, "time_embed.2"),
        "conv_in": _conv(sd, "input_blocks.0.0"),
        "out_norm": _norm(sd, "out.0"),
        "out_conv": _conv(sd, "out.2"),
    }
    n = 1
    ch = cfg.model_channels
    ds = 1
    for level, mult in enumerate(cfg.channel_mult):
        for i in range(cfg.num_res_blocks):
            out_ch = mult * cfg.model_channels
            params[f"down_{level}_{i}_res"] = _resblock(
                sd, f"input_blocks.{n}.0", has_skip=ch != out_ch
            )
            ch = out_ch
            if ds in cfg.attention_resolutions:
                params[f"down_{level}_{i}_attn"] = _spatial_transformer(
                    sd, f"input_blocks.{n}.1", cfg.transformer_depth
                )
            n += 1
        if level != len(cfg.channel_mult) - 1:
            params[f"down_{level}_downsample"] = {
                "conv": _conv(sd, f"input_blocks.{n}.0.op")
            }
            n += 1
            ds *= 2

    params["mid_res1"] = _resblock(sd, "middle_block.0", has_skip=False)
    params["mid_attn"] = _spatial_transformer(
        sd, "middle_block.1", cfg.transformer_depth
    )
    params["mid_res2"] = _resblock(sd, "middle_block.2", has_skip=False)

    # decoder: skip concat always changes channel count -> ResBlock has skip
    n = 0
    for level, mult in reversed(list(enumerate(cfg.channel_mult))):
        for i in range(cfg.num_res_blocks + 1):
            params[f"up_{level}_{i}_res"] = _resblock(
                sd, f"output_blocks.{n}.0", has_skip=True
            )
            ch = cfg.model_channels * mult
            layer = 1
            if ds in cfg.attention_resolutions:
                params[f"up_{level}_{i}_attn"] = _spatial_transformer(
                    sd, f"output_blocks.{n}.{layer}", cfg.transformer_depth
                )
                layer += 1
            if level and i == cfg.num_res_blocks:
                params[f"up_{level}_upsample"] = {
                    "conv": _conv(sd, f"output_blocks.{n}.{layer}.conv")
                }
                ds //= 2
            n += 1
    return params


def _vae_resblock(sd: StateDict, p: str, in_ch: int, out_ch: int) -> Dict:
    out = {
        "norm1": _norm(sd, f"{p}.norm1"),
        "conv1": _conv(sd, f"{p}.conv1"),
        "norm2": _norm(sd, f"{p}.norm2"),
        "conv2": _conv(sd, f"{p}.conv2"),
    }
    if in_ch != out_ch:
        out["nin_shortcut"] = _conv(sd, f"{p}.nin_shortcut")
    return out


def _vae_attn(sd: StateDict, p: str) -> Dict:
    return {
        "norm": _norm(sd, f"{p}.norm"),
        "q": _conv(sd, f"{p}.q"),
        "k": _conv(sd, f"{p}.k"),
        "v": _conv(sd, f"{p}.v"),
        "proj_out": _conv(sd, f"{p}.proj_out"),
    }


def convert_vae_state_dict(sd: StateDict, cfg: AutoencoderConfig) -> Dict:
    """Torch AutoencoderKL state_dict -> flax params for models.vae.

    Mirrors Encoder/Decoder construction (model.py:368-568) and
    AutoencoderKL's quant convs (autoencoder.py:285-333).
    """
    sd = {k: v for k, v in sd.items()}
    num_res = len(cfg.ch_mult)
    enc: Dict = {
        "conv_in": _conv(sd, "encoder.conv_in"),
        "norm_out": _norm(sd, "encoder.norm_out"),
        "conv_out": _conv(sd, "encoder.conv_out"),
    }
    curr_res = cfg.resolution
    block_in = cfg.ch
    for i, mult in enumerate(cfg.ch_mult):
        block_out = cfg.ch * mult
        for j in range(cfg.num_res_blocks):
            enc[f"down_{i}_block_{j}"] = _vae_resblock(
                sd, f"encoder.down.{i}.block.{j}", block_in, block_out
            )
            block_in = block_out
            if curr_res in cfg.attn_resolutions:
                enc[f"down_{i}_attn_{j}"] = _vae_attn(sd, f"encoder.down.{i}.attn.{j}")
        if i != num_res - 1:
            enc[f"down_{i}_downsample"] = {
                "conv": _conv(sd, f"encoder.down.{i}.downsample.conv")
            }
            curr_res //= 2
    mid = cfg.ch * cfg.ch_mult[-1]
    enc["mid_block_1"] = _vae_resblock(sd, "encoder.mid.block_1", mid, mid)
    enc["mid_attn_1"] = _vae_attn(sd, "encoder.mid.attn_1")
    enc["mid_block_2"] = _vae_resblock(sd, "encoder.mid.block_2", mid, mid)

    dec: Dict = {
        "conv_in": _conv(sd, "decoder.conv_in"),
        "norm_out": _norm(sd, "decoder.norm_out"),
        "conv_out": _conv(sd, "decoder.conv_out"),
    }
    block_in = cfg.ch * cfg.ch_mult[-1]
    dec["mid_block_1"] = _vae_resblock(sd, "decoder.mid.block_1", block_in, block_in)
    dec["mid_attn_1"] = _vae_attn(sd, "decoder.mid.attn_1")
    dec["mid_block_2"] = _vae_resblock(sd, "decoder.mid.block_2", block_in, block_in)
    curr_res = cfg.resolution // 2 ** (num_res - 1)
    for i in reversed(range(num_res)):
        block_out = cfg.ch * cfg.ch_mult[i]
        for j in range(cfg.num_res_blocks + 1):
            dec[f"up_{i}_block_{j}"] = _vae_resblock(
                sd, f"decoder.up.{i}.block.{j}", block_in, block_out
            )
            block_in = block_out
            if curr_res in cfg.attn_resolutions:
                dec[f"up_{i}_attn_{j}"] = _vae_attn(sd, f"decoder.up.{i}.attn.{j}")
        if i != 0:
            dec[f"up_{i}_upsample"] = {
                "conv": _conv(sd, f"decoder.up.{i}.upsample.conv")
            }
            curr_res *= 2

    return {
        "encoder": enc,
        "decoder": dec,
        "quant_conv": _conv(sd, "quant_conv"),
        "post_quant_conv": _conv(sd, "post_quant_conv"),
    }


def convert_linear_project_state_dict(sd: StateDict, prefix: str = "model") -> Dict:
    """LinearProject nn.Linear(85, 768) (poses.py:3-16) -> flax Dense tree."""
    return {"proj": _dense(sd, prefix)}


def convert_cond_fusion_state_dict(sd: StateDict, prefix: str = "cross_att") -> Dict:
    """CLIPTextImageCrossAtten's trainable cross_att
    (encoders/modules.py:274-278) -> models.cond_fusion.TextStyleCrossAttention
    params. The frozen laion CLIP towers in the same module convert via
    convert_clip_* (quick_gelu=False configs)."""
    return {"cross_att": _cross_attention(sd, prefix)}


def split_ldm_checkpoint(path: str) -> Dict[str, Dict[str, Array]]:
    """Load a Lightning .ckpt and split its state_dict by submodel prefix.

    Returns numpy state dicts keyed: 'unet', 'vae', 'cond_stage',
    'extra_cond_0', 'extra_cond_1', ... matching the reference's module tree
    (model.diffusion_model.*, first_stage_model.*, cond_stage_model.*,
    extra_cond_models.{i}.*; ddpm.py:433-494). EMA shadow weights
    (model_ema.*) are returned under 'ema' with their flattened names.
    """
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("state_dict", ckpt)
    buckets: Dict[str, Dict[str, Array]] = {}

    def put(bucket: str, key: str, val) -> None:
        buckets.setdefault(bucket, {})[key] = _np(val.float())

    for k, v in sd.items():
        if k.startswith("model.diffusion_model."):
            put("unet", k[len("model.diffusion_model."):], v)
        elif k.startswith("first_stage_model."):
            put("vae", k[len("first_stage_model."):], v)
        elif k.startswith("cond_stage_model."):
            put("cond_stage", k[len("cond_stage_model."):], v)
        elif k.startswith("extra_cond_models."):
            rest = k[len("extra_cond_models."):]
            idx, sub = rest.split(".", 1)
            put(f"extra_cond_{idx}", sub, v)
        elif k.startswith("model_ema."):
            put("ema", k[len("model_ema."):], v)
        else:
            put("other", k, v)
    return buckets


def ema_unet_state_dict(buckets: Dict[str, Dict[str, Array]]):
    """Recover the EMA U-Net weights from LitEma's flattened shadow names.

    LitEma registers shadow buffers under `name.replace('.', '')`
    (reference ema.py:13-15) relative to the DiffusionWrapper, i.e.
    `model_ema.diffusion_modelinput_blocks00weight`. Maps them back onto the
    `unet` bucket's dotted layout so convert_unet_state_dict can consume
    them (the released eval protocol runs under ema_scope, ddpm.py:179-192).
    Returns None when no EMA shadow is present.
    """
    ema = buckets.get("ema")
    unet = buckets.get("unet")
    if not ema or not unet:
        return None
    out = {}
    for k in unet:
        flat = ("diffusion_model." + k).replace(".", "")
        if flat in ema:
            out[k] = ema[flat]
        elif k.endswith("num_batches_tracked"):  # non-param buffers
            out[k] = unet[k]
    missing = set(unet) - set(out)
    if missing:
        # EMA tracks trainable params only; anything else falls back
        out.update({k: unet[k] for k in missing})
    return out

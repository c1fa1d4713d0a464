"""Weight-drop runbook rehearsal (VERDICT r3 item 3).

The real weight drop (HuggingFace soonyau/upgpt ckpts + CLIP + LPIPS +
pt_inception) cannot reach this sandbox, so the bring-up command is
rehearsed end-to-end with a synthesized Lightning ckpt in the reference's
exact key layout (ddpm.py:433-494): inventory -> convert (EMA preferred) ->
self-validating smoke checks -> report. The random-weight rehearsal MUST be
rejected by the acceptance gate — that is the point of the validators: a
trained kl-f8 reconstructs >20 dB and a trained denoiser's eps prediction
correlates with the injected noise; random weights do neither.
"""

import json
from pathlib import Path

import numpy as np
import pytest
import torch

from reference_loader import add_reference_to_path, reference_available

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference tree not present"
)


@pytest.fixture()
def drop_dir(tmp_path):
    add_reference_to_path()
    from ldm.models.autoencoder import AutoencoderKL as TorchVAE
    from ldm.modules.diffusionmodules.openaimodel import UNetModel as TorchUNet
    from ldm.modules.ema import LitEma

    torch.manual_seed(0)
    tunet = TorchUNet(
        image_size=32, in_channels=5, model_channels=32, out_channels=4,
        num_res_blocks=1, attention_resolutions=[1, 2], channel_mult=[1, 2],
        num_heads=4, use_spatial_transformer=True, transformer_depth=1,
        context_dim=768, use_checkpoint=False, legacy=False,
    )
    tvae = TorchVAE(
        ddconfig=dict(double_z=True, z_channels=4, resolution=64,
                      in_channels=3, out_ch=3, ch=32, ch_mult=[1, 2],
                      num_res_blocks=1, attn_resolutions=[], dropout=0.0),
        lossconfig={"target": "torch.nn.Identity"}, embed_dim=4,
    )
    tpose = torch.nn.Linear(85, 768)

    class _Wrapper(torch.nn.Module):
        def __init__(self, net):
            super().__init__()
            self.diffusion_model = net

    wrapper = _Wrapper(tunet)
    ema = LitEma(wrapper)
    sd = {}
    for k, v in wrapper.state_dict().items():
        sd[f"model.{k}"] = v
    for k, v in ema.state_dict().items():
        sd[f"model_ema.{k}"] = v
    for k, v in tvae.state_dict().items():
        sd[f"first_stage_model.{k}"] = v
    sd["extra_cond_models.1.model.weight"] = tpose.weight
    sd["extra_cond_models.1.model.bias"] = tpose.bias

    drop = tmp_path / "drop"
    drop.mkdir()
    torch.save({"state_dict": sd, "global_step": 7}, drop / "interp_256.ckpt")
    # metric/conditioning files present so the inventory is complete
    torch.save({"dummy": torch.zeros(1)}, drop / "vgg.pth")
    torch.save({"dummy": torch.zeros(1)}, drop / "pt_inception-2015.pth")
    clip = drop / "clip-vit-large-patch14"
    clip.mkdir()
    torch.save({"dummy": torch.zeros(1)}, clip / "pytorch_model.bin")
    (drop / "bpe_simple_vocab_16e6.txt").write_text("dummy\n")
    return drop


def test_bringup_rehearsal_rejects_random_weights(drop_dir, tmp_path):
    from upgpt_tpu.bringup import run_bringup

    out = tmp_path / "bringup"
    report = run_bringup(
        str(drop_dir), str(out),
        variants=("interp_256",), geometry_override="tiny",
        skip_bench=True, skip_eval=True,
    )
    # every step ran and reported
    assert (out / "REPORT.md").exists() and (out / "report.json").exists()
    inv = report["steps"]["inventory"]
    assert inv["found"] == {"interp_256": str(drop_dir / "interp_256.ckpt")}
    assert inv["missing"] == []

    conv = report["steps"]["convert"][0]
    assert conv["ema"] is True  # the shadow was found and preferred
    assert set(conv["submodels"]) == {"unet", "vae", "pose"}
    # converted weights restore and drive the model
    val = report["steps"]["validate"][0]
    assert "error" not in val, val
    assert val["unet_finite"] is True
    # self-validating gates: random weights MUST fail them
    assert val["vae_roundtrip_psnr_db"] < 20.0
    assert abs(val["eps_corr_mid_t"]) < 0.3
    assert report["accepted"] is False

    # sampler-quality ordering check ran on the converted weights and
    # produced the ddim50/unipc8k/dpmpp20-vs-DDIM-200 agreement fields
    sc = report["steps"]["sampler_check"][0]
    assert "error" not in sc, sc
    for k in ("ssim_ddim50_vs_ddim200", "ssim_unipc8k_vs_ddim200",
              "ssim_dpmpp20_vs_ddim200"):
        assert -1.0 <= sc[k] <= 1.0
    assert isinstance(sc["karras_guidance_holds"], bool)

    persisted = json.loads((out / "report.json").read_text())
    assert persisted["accepted"] is False


def test_bringup_inventory_reports_missing(tmp_path):
    from upgpt_tpu.bringup import find_drop_files

    empty = tmp_path / "empty"
    empty.mkdir()
    inv = find_drop_files(empty)
    assert set(inv.missing) >= {
        "ckpt:pt_256", "ckpt:interp_256", "ckpt:mm_512", "ckpt:upscale",
        "clip", "lpips", "pt_inception",
    }


def test_bringup_cli_entry(drop_dir, tmp_path, capsys):
    """`cli bringup` exits 3 on a rejected drop and prints the report path."""
    from upgpt_tpu.cli import main as cli_main

    out = tmp_path / "b2"
    with pytest.raises(SystemExit) as exc:
        cli_main(["bringup", "--drop", str(drop_dir), "--out", str(out),
                  "--variants", "interp_256", "--geometry", "tiny",
                  "--skip-bench", "--skip-eval", "--skip-sampler-check"])
    assert exc.value.code == 3
    assert (out / "REPORT.md").exists()
    assert "REPORT.md" in capsys.readouterr().out

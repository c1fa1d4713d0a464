"""CLI end-to-end: train 1 epoch on a tiny synthetic tree, then test+eval."""

import json
import os
import sys

import numpy as np
import pytest
from PIL import Image

import yaml

from upgpt_tpu.cli import main as cli_main


@pytest.fixture(scope="module")
def tiny_tree(tmp_path_factory):
    """64x48 image tree matching the zoo 'tiny' variant (f=2 -> 32x24)."""
    import csv
    import pickle

    root = tmp_path_factory.mktemp("tiny_fashion")
    for d in ("img_64", "smpl_256", "segm_256"):
        (root / d).mkdir()
    rng = np.random.default_rng(0)
    names = ["MEN/x_1_a.jpg", "WOMEN/y_1_b.jpg"]
    for i, name in enumerate(names):
        (root / "img_64" / name).parent.mkdir(parents=True, exist_ok=True)
        Image.fromarray(rng.integers(0, 255, (64, 48, 3), np.uint8)).save(
            root / "img_64" / name)
        Image.fromarray(rng.integers(0, 255, (64, 48, 3), np.uint8)).save(
            root / "smpl_256" / f"pose{i}.jpg")
        m = np.zeros((64, 48), np.uint8)
        m[10:50, 12:36] = 255
        Image.fromarray(m).save(root / "smpl_256" / f"pose{i}_mask.png")
        pickle.dump([{
            "pred_body_pose": rng.normal(size=(1, 72)).astype(np.float32),
            "pred_betas": rng.normal(size=(1, 10)).astype(np.float32),
            "pred_camera": rng.normal(size=(3,)).astype(np.float32),
        }], open(root / "smpl_256" / f"pose{i}.p", "wb"))
        sd = root / "styles" / f"s{i}"
        sd.mkdir(parents=True)
        Image.fromarray(rng.integers(0, 255, (224, 224, 3), np.uint8)).save(
            sd / "top.jpg")
    json.dump({"t0": "a", "t1": "b"}, open(root / "captions.json", "w"))
    with open(root / "map.csv", "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=["image", "text", "pose", "styles"])
        w.writeheader()
        for i, n in enumerate(names):
            w.writerow({"image": n, "text": f"t{i}", "pose": f"pose{i}",
                        "styles": f"s{i}"})
    with open(root / "pairs.csv", "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=["from", "to"])
        w.writeheader()
        w.writerow({"from": names[0], "to": names[1]})
        w.writerow({"from": names[1], "to": names[0]})
    return root


@pytest.fixture(scope="module")
def tiny_config_file(tiny_tree, tmp_path_factory):
    cfg_dir = tmp_path_factory.mktemp("cfg")
    logdir = str(cfg_dir / "logs")
    cfg = {
        "model": {"target": "upgpt_tpu.zoo.build_latent_diffusion",
                  "params": {"variant": "tiny", "use_flash_attention": False}},
        "trainer": {"base_learning_rate": 1e-4, "scale_lr": False,
                    "batch_size": 2, "max_epochs": 1, "log_every": 1,
                    "log_images_every": None, "logdir": logdir,
                    "early_stop_patience": None},
        "data": {
            "train": {"target": "upgpt_tpu.data.deepfashion.DeepFashionPair",
                      "params": {"folder": str(tiny_tree), "image_dir": "img_64",
                                 "pair_file": [str(tiny_tree / "pairs.csv")],
                                 "data_file": str(tiny_tree / "map.csv"),
                                 "input_mask_type": "bbox",
                                 "image_size": [64, 48], "f": 2}},
            "test": {"target": "upgpt_tpu.data.deepfashion.DeepFashionPair",
                     "params": {"folder": str(tiny_tree), "image_dir": "img_64",
                                "pair_file": [str(tiny_tree / "pairs.csv")],
                                "data_file": str(tiny_tree / "map.csv"),
                                "input_mask_type": "bbox",
                                "image_size": [64, 48], "f": 2}},
        },
        "sampling": {"ddim_steps": 4, "eta": 0.0},
    }
    path = cfg_dir / "tiny.yaml"
    with open(path, "w") as f:
        yaml.safe_dump(cfg, f)
    return path, logdir


def test_cli_train_then_test(tiny_config_file, capsys):
    path, logdir = tiny_config_file
    cli_main(["train", "--debug-encoder", "--base", str(path)])
    assert os.path.exists(f"{logdir}/checkpoints/last")
    assert os.path.exists(f"{logdir}/configs/merged.json")

    out_dir = f"{logdir}/results"
    cli_main(["test", "--debug-encoder", "--base", str(path), "--ckpt", f"{logdir}/checkpoints/last",
              "--out", out_dir, "--batch", "2", "--steps", "4",
              "--max-images", "2"])
    captured = capsys.readouterr().out.strip().split("\n")[-1]
    metrics = json.loads(captured)
    assert "ssim" in metrics and metrics["n_images"] == 2
    assert os.path.exists(f"{out_dir}/metrics.csv")
    # full test_step dump protocol (reference ddpm.py:1327-1377): all groups
    for group in ("samples", "gt", "recon", "src", "smpl", "concats", "styles"):
        files = os.listdir(f"{out_dir}/{group}")
        assert len(files) == 2, (group, files)
    # lpips column omitted when no weights are supplied
    header = open(f"{out_dir}/metrics.csv").readline()
    assert "lpips" not in header


def test_cli_sample_tensor_parallel(tiny_config_file):
    """`sample --tp 4`: (data=2, model=4) mesh over the 8 virtual devices."""
    path, logdir = tiny_config_file
    if not os.path.exists(f"{logdir}/checkpoints/last"):
        cli_main(["train", "--debug-encoder", "--base", str(path)])
    out_dir = f"{logdir}/tp_samples"
    cli_main(["sample", "--debug-encoder", "--base", str(path),
              "--ckpt", f"{logdir}/checkpoints/last", "--out", out_dir,
              "--batch", "2", "--steps", "4", "--tp", "4"])
    files = os.listdir(out_dir)
    assert len(files) == 2, files


def test_cli_dotlist_override(tiny_config_file):
    path, _ = tiny_config_file
    from upgpt_tpu.config import merge_configs

    cfg = merge_configs([str(path)], ["trainer.batch_size=7", "sampling.eta=0.5"])
    assert cfg["trainer"]["batch_size"] == 7 and cfg["sampling"]["eta"] == 0.5


def test_cli_train_vae(tiny_tree, tmp_path):
    cfg = {
        "model": {"target": "upgpt_tpu.zoo.build_autoencoder",
                  "params": {"kind": "kl_f8", "ch": 32, "ch_mult": [1, 2],
                             "num_res_blocks": 1, "resolution": 64}},
        "loss": {"disc_start": 0, "disc_weight": 0.5},
        "trainer": {"base_learning_rate": 1e-4, "scale_lr": False,
                    "batch_size": 2, "max_epochs": 1, "max_steps": 1,
                    "log_every": 1, "logdir": str(tmp_path / "vae")},
        "data": {"train": {
            "target": "upgpt_tpu.data.deepfashion.DeepFashionPair",
            "params": {"folder": str(tiny_tree), "image_dir": "img_64",
                       "pair_file": [str(tiny_tree / "pairs.csv")],
                       "data_file": str(tiny_tree / "map.csv"),
                       "input_mask_type": "bbox", "image_size": [64, 48],
                       "f": 2, "image_only": True}}},
    }
    path = tmp_path / "vae.yaml"
    with open(path, "w") as f:
        yaml.safe_dump(cfg, f)
    cli_main(["train-vae", "--base", str(path)])
    assert os.path.exists(str(tmp_path / "vae" / "last"))


@pytest.mark.slow
def test_acceptance_pipeline_dress_rehearsal(tiny_config_file, capsys):
    """The FULL acceptance pipeline in one pass (VERDICT r2 item 5):
    `cli test` -> dump_test_results (all six groups) -> evaluate_dirs with a
    random-weight CONVERTED InceptionV3 as the FID extractor (the exact
    object real runs use, minus real weights) -> metrics.csv + fid_inception.
    Mirrors reference main.py:797-801 + scripts/eval_metrics.py:90-136."""
    import orbax.checkpoint as ocp

    import jax

    from upgpt_tpu.eval.inception import InceptionV3Features, \
        convert_inception_state_dict
    from test_inception import _synthetic_torch_state_dict

    path, logdir = tiny_config_file
    if not os.path.exists(f"{logdir}/checkpoints/last"):
        cli_main(["train", "--debug-encoder", "--base", str(path)])

    # converted (torch-layout -> flax, BN folded) random InceptionV3 weights,
    # stored the way a real converted artifact would be
    import jax.numpy as jnp

    init = InceptionV3Features().init(
        jax.random.PRNGKey(0), jnp.zeros((1, 299, 299, 3)))["params"]
    params = convert_inception_state_dict(_synthetic_torch_state_dict(init))
    fid_dir = f"{logdir}/fid_weights"
    ocp.StandardCheckpointer().save(
        os.path.abspath(fid_dir), jax.device_get(params), force=True)

    out_dir = f"{logdir}/accept_results"
    cli_main(["test", "--debug-encoder", "--base", str(path),
              "--ckpt", f"{logdir}/checkpoints/last", "--out", out_dir,
              "--batch", "2", "--steps", "4", "--max-images", "2",
              "--fid-weights", fid_dir])
    metrics = json.loads(capsys.readouterr().out.strip().split("\n")[-1])
    assert "fid_inception" in metrics and np.isfinite(metrics["fid_inception"])
    # protocol-extractor runs also expose the compat 'fid' alias, equal to
    # fid_inception (harness.py:110-113; pinned in test_eval alongside the
    # guard that non-protocol extractors do NOT claim it)
    assert metrics["fid"] == metrics["fid_inception"]
    assert metrics["n_images"] == 2
    for group in ("samples", "gt", "recon", "src", "smpl", "concats", "styles"):
        assert len(os.listdir(f"{out_dir}/{group}")) == 2, group
    assert os.path.exists(f"{out_dir}/metrics.csv")
    assert "fid_inception" in open(f"{out_dir}/metrics.txt").read()


def test_cli_distill_then_sample(tiny_config_file):
    """`cli distill`: one 4->2 halving on the tiny geometry, then `sample`
    auto-detects the student sidecar (v-param + pinned grid) and decodes."""
    path, logdir = tiny_config_file
    if not os.path.exists(f"{logdir}/checkpoints/last"):
        cli_main(["train", "--debug-encoder", "--base", str(path)])
    student = f"{logdir}/student"
    cli_main(["distill", "--base", str(path),
              "--teacher-ckpt", f"{logdir}/checkpoints/last",
              "--out", student, "--synthetic",
              "--start-steps", "4", "--end-steps", "2",
              "--stage-steps", "3", "--adapt-steps", "2",
              "--batch", "2", "--lr", "1e-4"])
    sidecar = json.load(open(f"{student}.distill.json"))
    assert sidecar["parameterization"] == "v"
    assert len(sidecar["timesteps"]) == 2
    # adapt entry (eps->v fit) + one halving stage
    assert [h["steps"] for h in sidecar["history"]] == [4, 2]
    assert sidecar["history"][0].get("adapt") is True

    out_dir = f"{logdir}/distill_samples"
    cli_main(["sample", "--debug-encoder", "--base", str(path),
              "--ckpt", student, "--out", out_dir, "--batch", "2"])
    files = os.listdir(out_dir)
    assert len(files) == 2, files


def test_cli_train_fused_optimizer(tiny_config_file):
    """Trainer CLI with the fused AdamW+EMA state: full fit + checkpoint
    round-trip (opt_state is the {"mu","nu"} dict, saved transparently)."""
    path, logdir = tiny_config_file
    fused_logdir = f"{logdir}_fused"
    cli_main(["train", "--debug-encoder",
              f"trainer.logdir={fused_logdir}",
              "trainer.fused_optimizer=true",
              "trainer.moment_dtype=bfloat16",
              "--base", str(path)])
    assert os.path.exists(f"{fused_logdir}/checkpoints/last")

"""Smoke tests for the four product walkthroughs under `examples/`
(VERDICT r2 item 7) — the notebook equivalents of the reference's
inference*.ipynb must not rot. Each runs in-process at tiny geometry with
the debug encoder and random convert-layout checkpoints."""

import os
import sys

import numpy as np
import pytest
import yaml

import jax

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "examples"))

from test_cli import tiny_tree  # noqa: F401  (fixture reuse)


@pytest.fixture(scope="module")
def example_env(tiny_tree, tmp_path_factory):  # noqa: F811
    """Tiny configs + random convert-layout checkpoints for both stages."""
    import orbax.checkpoint as ocp

    from upgpt_tpu.config import instantiate_from_config

    root = tmp_path_factory.mktemp("examples")
    cfgs = {}
    for name, variant in (("base", "tiny"), ("up", "tiny_upscale")):
        cfg = {"model": {"target": "upgpt_tpu.zoo.build_latent_diffusion",
                         "params": {"variant": variant,
                                    "use_flash_attention": False}}}
        path = root / f"{name}.yaml"
        with open(path, "w") as f:
            yaml.safe_dump(cfg, f)
        model = instantiate_from_config(cfg["model"])
        params = model.init_params(jax.random.PRNGKey(0 if name == "base" else 1))
        ckpt = root / f"ckpt_{name}"
        ocp.StandardCheckpointer().save(
            ckpt.absolute(), jax.device_get(params), force=True)
        cfgs[name] = (str(path), str(ckpt))
    return cfgs


def _data_args(tiny_tree):  # noqa: F811
    return ["--folder", str(tiny_tree),
            "--data-file", str(tiny_tree / "map.csv"),
            "--image-dir", "img_64", "--image-size", "64", "48", "--f", "2",
            "--debug-encoder", "--steps", "2"]


def _run(module_name, argv, monkeypatch):
    import importlib

    mod = importlib.import_module(module_name)
    monkeypatch.setattr(sys, "argv", [module_name] + argv)
    mod.main()


def test_pose_transfer_example(example_env, tiny_tree, tmp_path, monkeypatch):  # noqa: F811
    base, ckpt = example_env["base"]
    out = tmp_path / "sample.jpg"
    _run("pose_transfer",
         ["--base", base, "--ckpt", ckpt,
          "--src", "MEN/x_1_a.jpg", "--pose-of", "WOMEN/y_1_b.jpg",
          "--out", str(out)] + _data_args(tiny_tree), monkeypatch)
    from PIL import Image

    assert Image.open(out).size == (48, 64)


def test_pose_interpolation_example(example_env, tiny_tree, tmp_path, monkeypatch):  # noqa: F811
    base, ckpt = example_env["base"]
    out = tmp_path / "interp"
    _run("pose_interpolation",
         ["--base", base, "--ckpt", ckpt,
          "--src", "MEN/x_1_a.jpg", "--pose-a", "MEN/x_1_a.jpg",
          "--pose-b", "WOMEN/y_1_b.jpg", "--frames", "3",
          "--out", str(out)] + _data_args(tiny_tree), monkeypatch)
    frames = [f"{out}_{i:03d}.jpg" for i in range(3)]
    assert all(os.path.exists(f) for f in frames)


def test_style_mixing_example(example_env, tiny_tree, tmp_path, monkeypatch):  # noqa: F811
    base, ckpt = example_env["base"]
    out = tmp_path / "mixed.jpg"
    _run("style_mixing",
         ["--base", base, "--ckpt", ckpt, "--src", "MEN/x_1_a.jpg",
          "--style-texts", '{"top": "red shirt"}', "--drop-slots", "outer",
          "--out", str(out)] + _data_args(tiny_tree), monkeypatch)
    assert os.path.exists(out)


def test_upscale_chain_example(example_env, tiny_tree, tmp_path, monkeypatch):  # noqa: F811
    base, ckpt_b = example_env["base"]
    up, ckpt_u = example_env["up"]
    out = tmp_path / "upscaled.jpg"
    _run("upscale_chain",
         ["--base-256", base, "--base-512", up,
          "--ckpt-256", ckpt_b, "--ckpt-512", ckpt_u,
          "--src", "MEN/x_1_a.jpg", "--pose-of", "WOMEN/y_1_b.jpg",
          "--out", str(out)] + _data_args(tiny_tree), monkeypatch)
    assert os.path.exists(out)

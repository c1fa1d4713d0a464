"""Golden-fixture pin of the conditioning transforms at the FULL 256x192
geometry (VERDICT r3 item 6): production transforms vs stored arrays
computed independently by golden/gen_transforms_golden.py (raw PIL/numpy
replication of the reference's torchvision chains,
deepfashion_inshop.py:137-172, 228-241). Bit-exact (atol 1e-6: float32
arithmetic only, identical PIL resize kernels by construction)."""

from pathlib import Path

import numpy as np
import pytest
from PIL import Image

from upgpt_tpu.data.transforms import (
    center_crop, clip_normalize_image, mask_transform_binary,
    mask_transform_smpl, silhouette_bbox, to_tensor_range,
)

GOLDEN = Path(__file__).resolve().parent / "golden" / "transforms_256.npz"
LATENT = (32, 24)


@pytest.fixture(scope="module")
def g():
    assert GOLDEN.exists(), "run tests/golden/gen_transforms_golden.py"
    return np.load(GOLDEN)


def test_mask_mode_full_geometry(g):
    out = mask_transform_binary(g["sil"], LATENT)
    assert out.shape == (32, 24, 1)
    np.testing.assert_allclose(out, g["mask_mode"], atol=1e-6)


def test_bbox_mode_full_geometry(g):
    out = mask_transform_binary(silhouette_bbox(g["sil"]), LATENT)
    np.testing.assert_allclose(out, g["bbox_mode"], atol=1e-6)
    # the /255 backward-compat bug value, at full geometry
    assert np.isclose(out.max(), -0.99215686, atol=1e-6)


def test_smpl_mode_full_geometry(g):
    img = center_crop(Image.fromarray(g["smpl"]), (256, 192))
    out = mask_transform_smpl(img, LATENT)
    assert out.shape == (32, 24, 1)
    np.testing.assert_allclose(out, g["smpl_mode"], atol=1e-6)


def test_image_and_style_normalization(g):
    np.testing.assert_allclose(
        to_tensor_range(Image.fromarray(g["image"])), g["image_range"],
        atol=1e-6)
    np.testing.assert_allclose(
        clip_normalize_image(Image.fromarray(g["style"])), g["style_clip"],
        atol=1e-5)

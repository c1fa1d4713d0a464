"""Native (C++/libjpeg) decode core: bit-exactness vs PIL + fallbacks.

The native path must be invisible to the rest of the pipeline: same bytes
out as PIL for every JPEG (both are libjpeg with the default ISLOW IDCT),
PIL fallback for non-JPEG files and malformed data, and a clean disable
via UPGPT_NATIVE_DECODE=0.
"""

import io
import os

import numpy as np
import pytest
from PIL import Image

from upgpt_tpu import native
from upgpt_tpu.data.transforms import open_rgb


def _jpeg_bytes(arr: np.ndarray, quality: int = 90) -> bytes:
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, "JPEG", quality=quality)
    return buf.getvalue()


needs_native = pytest.mark.skipif(
    not native.available(), reason="native decoder unavailable (no g++/libjpeg)"
)


@needs_native
def test_decode_bit_exact_vs_pil():
    rng = np.random.default_rng(0)
    cases = [
        ((256, 192, 3), 95),
        ((256, 192, 3), 75),
        ((224, 224, 3), 90),
        ((37, 53, 3), 90),  # odd dims: partial MCU blocks
    ]
    for shape, q in cases:
        data = _jpeg_bytes(rng.integers(0, 255, shape, np.uint8), q)
        pil = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
        nat = native.decode_jpeg(data)
        assert nat is not None
        assert nat.dtype == np.uint8 and nat.shape == pil.shape
        np.testing.assert_array_equal(nat, pil)


@needs_native
def test_decode_grayscale_jpeg_matches_pil_rgb():
    rng = np.random.default_rng(1)
    gray = rng.integers(0, 255, (64, 48), np.uint8)
    buf = io.BytesIO()
    Image.fromarray(gray, mode="L").save(buf, "JPEG", quality=92)
    data = buf.getvalue()
    pil = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
    nat = native.decode_jpeg(data)
    assert nat is not None
    np.testing.assert_array_equal(nat, pil)


@needs_native
def test_malformed_data_returns_none():
    assert native.decode_jpeg(b"not a jpeg") is None
    # valid header, truncated body
    rng = np.random.default_rng(2)
    data = _jpeg_bytes(rng.integers(0, 255, (64, 64, 3), np.uint8))
    # libjpeg pads truncated streams with EOI and emits a warning rather
    # than an error for mild truncation; chop hard enough to break the
    # header instead.
    assert native.decode_jpeg(data[:8]) is None


@needs_native
def test_open_rgb_jpeg_uses_native_and_matches_pil(tmp_path):
    rng = np.random.default_rng(3)
    arr = rng.integers(0, 255, (128, 96, 3), np.uint8)
    p = tmp_path / "img.jpg"
    Image.fromarray(arr).save(p, quality=88)
    via_open_rgb = np.asarray(open_rgb(p).convert("RGB"))
    via_pil = np.asarray(Image.open(p).convert("RGB"))
    np.testing.assert_array_equal(via_open_rgb, via_pil)


def test_open_rgb_png_falls_through_to_pil(tmp_path):
    arr = np.zeros((32, 24), np.uint8)
    arr[4:20, 3:17] = 255
    p = tmp_path / "mask.png"
    Image.fromarray(arr).save(p)
    img = open_rgb(p)
    # must preserve PIL single-channel semantics exactly (mask consumers
    # call np.asarray on the L-mode image)
    np.testing.assert_array_equal(np.asarray(img), arr)


def test_env_disable(tmp_path, monkeypatch):
    monkeypatch.setenv("UPGPT_NATIVE_DECODE", "0")
    assert native.available() is False
    # open_rgb still works (PIL path)
    rng = np.random.default_rng(4)
    arr = rng.integers(0, 255, (48, 32, 3), np.uint8)
    p = tmp_path / "img.jpg"
    Image.fromarray(arr).save(p, quality=90)
    out = np.asarray(open_rgb(p).convert("RGB"))
    assert out.shape == (48, 32, 3)


@needs_native
def test_thread_pool_decode_consistency():
    """Concurrent decodes (the PrefetchDataLoader pattern) are race-free:
    each call uses only stack-local libjpeg state."""
    from concurrent.futures import ThreadPoolExecutor

    rng = np.random.default_rng(5)
    datas = [_jpeg_bytes(rng.integers(0, 255, (96, 64, 3), np.uint8))
             for _ in range(16)]
    expect = [native.decode_jpeg(d) for d in datas]
    with ThreadPoolExecutor(8) as ex:
        got = list(ex.map(native.decode_jpeg, datas * 4))
    for i, g in enumerate(got):
        np.testing.assert_array_equal(g, expect[i % 16])

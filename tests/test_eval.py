"""Metric correctness: SSIM/MS-SSIM vs closed-form cases and torch golden;
FID math; eval harness protocol."""

import numpy as np
import pytest
import jax.numpy as jnp
from PIL import Image

from upgpt_tpu.eval.metrics import fid_from_features, frechet_distance, ms_ssim, ssim
from upgpt_tpu.eval.harness import dump_test_results, evaluate_dirs


def test_ssim_identical_is_one():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, 1, (2, 64, 64, 3)).astype(np.float32))
    assert float(ssim(x, x)) == pytest.approx(1.0, abs=1e-5)


def test_ssim_decreases_with_noise():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.uniform(0, 1, (1, 64, 64, 3)).astype(np.float32))
    small = x + 0.02 * jnp.asarray(rng.normal(size=x.shape).astype(np.float32))
    big = x + 0.2 * jnp.asarray(rng.normal(size=x.shape).astype(np.float32))
    s_small, s_big = float(ssim(x, small)), float(ssim(x, big))
    assert 1.0 > s_small > s_big > 0.0


def test_ssim_matches_skimage_like_reference():
    """Golden against an independent direct implementation."""
    rng = np.random.default_rng(2)
    a = rng.uniform(0, 1, (1, 32, 32, 1)).astype(np.float32)
    b = np.clip(a + rng.normal(0, 0.05, a.shape), 0, 1).astype(np.float32)

    # direct numpy SSIM with the same gaussian window
    from scipy.ndimage import correlate1d

    def blur(x):
        coords = np.arange(11) - 5.0
        g = np.exp(-(coords**2) / (2 * 1.5**2))
        g /= g.sum()
        y = correlate1d(x, g, axis=0)
        y = correlate1d(y, g, axis=1)
        return y[5:-5, 5:-5]

    xa, xb = a[0, ..., 0], b[0, ..., 0]
    C1, C2 = 0.01**2, 0.03**2
    mu_a, mu_b = blur(xa), blur(xb)
    va = blur(xa * xa) - mu_a**2
    vb = blur(xb * xb) - mu_b**2
    vab = blur(xa * xb) - mu_a * mu_b
    want = np.mean(((2 * mu_a * mu_b + C1) * (2 * vab + C2)) /
                   ((mu_a**2 + mu_b**2 + C1) * (va + vb + C2)))
    got = float(ssim(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_ms_ssim_identical_is_one():
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.uniform(0, 1, (1, 256, 176, 3)).astype(np.float32))
    assert float(ms_ssim(x, x)) == pytest.approx(1.0, abs=1e-4)


def test_frechet_distance_identities():
    d = 8
    mu = np.zeros(d)
    sigma = np.eye(d)
    assert frechet_distance(mu, sigma, mu, sigma) == pytest.approx(0.0, abs=1e-6)
    mu2 = np.ones(d)
    assert frechet_distance(mu, sigma, mu2, sigma) == pytest.approx(d, abs=1e-6)


def test_fid_from_features_separates_distributions():
    rng = np.random.default_rng(4)
    a = rng.normal(0, 1, (500, 16))
    b = rng.normal(0, 1, (500, 16))
    c = rng.normal(3, 2, (500, 16))
    assert fid_from_features(a, b) < 1.0
    assert fid_from_features(a, c) > 5.0


def test_eval_harness_protocol(tmp_path):
    rng = np.random.default_rng(5)
    fnames = [f"img{i}" for i in range(4)]
    gt = rng.uniform(-1, 1, (4, 256, 192, 3)).astype(np.float32)
    samples = np.clip(gt + rng.normal(0, 0.05, gt.shape), -1, 1).astype(np.float32)
    dump_test_results(str(tmp_path), fnames, samples, gt=gt)
    assert (tmp_path / "samples" / "img0.jpg").exists()
    # crop applied: 256x176
    assert Image.open(tmp_path / "samples" / "img0.jpg").size == (176, 256)

    feature_fn = lambda x: np.asarray(x).reshape(x.shape[0], -1)[:, :32]
    metrics = evaluate_dirs(str(tmp_path), fid_feature_fn=feature_fn,
                            fid_name="clip")
    assert 0.5 < metrics["ssim"] <= 1.0
    assert "fid_clip" in metrics and metrics["fid_clip"] >= 0
    assert (tmp_path / "metrics.csv").exists() and (tmp_path / "metrics.txt").exists()


def test_lpips_architecture_shapes():
    import jax
    from upgpt_tpu.eval.lpips import LPIPS

    m = LPIPS()
    a = jnp.zeros((1, 64, 64, 3))
    params = m.init(jax.random.PRNGKey(0), a, a)["params"]
    d = m.apply({"params": params}, a, a)
    assert d.shape == (1,) and float(d[0]) == pytest.approx(0.0, abs=1e-6)


def test_lpips_converter_key_walk():
    """The converter must cover the full lpips-vgg state dict layout."""
    import numpy as np
    from upgpt_tpu.eval.lpips import convert_lpips_weights, LPIPS_CHANNELS, _VGG16_PLAN

    sd = {}
    in_ch = 3
    plan_idx = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
    slices = [("net.slice1", [0, 2]), ("net.slice2", [5, 7]),
              ("net.slice3", [10, 12, 14]), ("net.slice4", [17, 19, 21]),
              ("net.slice5", [24, 26, 28])]
    chans = [64, 64, 128, 128, 256, 256, 256, 512, 512, 512, 512, 512, 512]
    k = 0
    for prefix, idxs in slices:
        for idx in idxs:
            out_ch = chans[k]
            sd[f"{prefix}.{idx}.weight"] = np.zeros((out_ch, in_ch, 3, 3), np.float32)
            sd[f"{prefix}.{idx}.bias"] = np.zeros((out_ch,), np.float32)
            in_ch = out_ch
            k += 1
    for i, ch in enumerate(LPIPS_CHANNELS):
        sd[f"lin{i}.model.1.weight"] = np.zeros((1, ch, 1, 1), np.float32)

    params = convert_lpips_weights(sd)
    assert len(params["vgg"]) == 13
    assert params["vgg"]["conv_0"]["kernel"].shape == (3, 3, 3, 64)
    assert params["lin_4"]["kernel"].shape == (1, 1, 512, 1)


def test_lpips_rehearsal_mode():
    """Fixed-random-extractor LPIPS (VERDICT r4 item 8): deterministic,
    ~zero on identical images, positive and monotone-ish in perturbation
    size — the in-sandbox perceptual column for the quality tables."""
    import jax.numpy as jnp

    from upgpt_tpu.eval.lpips import rehearsal_lpips_fn

    f = rehearsal_lpips_fn()
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.normal(size=(2, 64, 48, 3)).clip(-1, 1), jnp.float32)
    small = jnp.clip(a + 0.05 * jnp.asarray(
        rng.normal(size=a.shape), jnp.float32), -1, 1)
    big = jnp.clip(a + 0.5 * jnp.asarray(
        rng.normal(size=a.shape), jnp.float32), -1, 1)
    d0 = np.asarray(f(a, a))
    ds = np.asarray(f(a, small))
    db = np.asarray(f(a, big))
    assert np.all(d0 < 1e-6)
    assert np.all(ds > d0) and np.all(db > ds)
    # same seed -> same function
    np.testing.assert_allclose(
        np.asarray(rehearsal_lpips_fn()(a, big)), db, rtol=1e-6)

"""InceptionV3 FID extractor: architecture, pooling semantics, converter,
preprocessing, and harness integration (reference protocol:
pytorch_fid via scripts/eval_metrics.py:100-112)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from upgpt_tpu.eval.inception import (
    FID_FEATURE_DIM, InceptionFeatureFn, InceptionV3Features,
    _avg_pool_3x3_nopad_count, _max_pool, convert_inception_state_dict,
    preprocess_fid,
)


@pytest.fixture(scope="module")
def inception_params():
    model = InceptionV3Features()
    return model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 299, 299, 3))
    )["params"]


def test_pool3_feature_shape(inception_params):
    model = InceptionV3Features()
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 299, 299, 3)),
                    jnp.float32)
    feats = model.apply({"params": inception_params}, x)
    assert feats.shape == (2, FID_FEATURE_DIM)
    assert np.isfinite(np.asarray(feats)).all()


def test_avg_pool_count_include_pad_false():
    """avg_pool(count_include_pad=False): borders divide by the REAL window
    size, so pooling a constant image returns the constant exactly."""
    x = jnp.full((1, 5, 5, 2), 3.0)
    out = np.asarray(_avg_pool_3x3_nopad_count(x))
    np.testing.assert_allclose(out, 3.0, atol=1e-6)
    # naive (count_include_pad=True) pooling would give 3*4/9 at corners
    naive = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 3, 3, 1), (1, 1, 1, 1),
        [(0, 0), (1, 1), (1, 1), (0, 0)]) / 9.0
    assert abs(float(naive[0, 0, 0, 0]) - 3 * 4 / 9) < 1e-6


def test_max_pool_stride_window():
    x = jnp.arange(16.0).reshape(1, 4, 4, 1)
    out = np.asarray(_max_pool(x, 3, 2))
    assert out.shape == (1, 1, 1, 1) and out[0, 0, 0, 0] == 10.0


def test_preprocess_fid_resize_and_range():
    img = jnp.asarray(np.random.default_rng(1).uniform(size=(2, 64, 48, 3)),
                      jnp.float32)
    out = np.asarray(preprocess_fid(img))
    assert out.shape == (2, 299, 299, 3)
    assert out.min() >= -1.0 - 1e-6 and out.max() <= 1.0 + 1e-6
    # matches jax.image.resize bilinear (align_corners=False semantics) *2-1
    want = np.asarray(jax.image.resize(img, (2, 299, 299, 3), "bilinear")) * 2 - 1
    np.testing.assert_allclose(out, want, atol=1e-6)


def _synthetic_torch_state_dict(params):
    """Build a torch-layout (pt_inception naming) random state_dict whose
    shapes mirror the flax tree, incl. BN running stats and the unused fc."""
    rng = np.random.default_rng(0)
    sd = {}

    def walk(tree, path):
        for name, sub in tree.items():
            p = f"{path}.{name}" if path else name
            if "conv" in sub and "bn_scale" in sub:
                h, w, i, o = sub["conv"]["kernel"].shape
                sd[f"{p}.conv.weight"] = rng.normal(size=(o, i, h, w)).astype(
                    np.float32) * 0.05
                sd[f"{p}.bn.weight"] = rng.uniform(0.5, 1.5, o).astype(np.float32)
                sd[f"{p}.bn.bias"] = rng.normal(size=o).astype(np.float32) * 0.1
                sd[f"{p}.bn.running_mean"] = rng.normal(size=o).astype(np.float32) * 0.1
                sd[f"{p}.bn.running_var"] = rng.uniform(0.5, 1.5, o).astype(np.float32)
                sd[f"{p}.bn.num_batches_tracked"] = np.zeros((), np.int64)
            else:
                walk(sub, p)

    walk(jax.tree.map(lambda a: np.asarray(a), params), "")
    sd["fc.weight"] = rng.normal(size=(1008, 2048)).astype(np.float32)
    sd["fc.bias"] = np.zeros(1008, np.float32)
    return sd


def test_converter_roundtrip_and_bn_fold(inception_params):
    sd = _synthetic_torch_state_dict(inception_params)
    params = convert_inception_state_dict(sd)
    # shapes identical to a fresh init
    got = jax.tree.map(lambda a: np.shape(a), params)
    want = jax.tree.map(lambda a: a.shape, inception_params)
    assert got == want
    # BN fold: y = conv(x)*scale + bias with scale = gamma/sqrt(var+eps)
    g = sd["Conv2d_1a_3x3.bn.weight"]
    v = sd["Conv2d_1a_3x3.bn.running_var"]
    m = sd["Conv2d_1a_3x3.bn.running_mean"]
    b = sd["Conv2d_1a_3x3.bn.bias"]
    np.testing.assert_allclose(
        params["Conv2d_1a_3x3"]["bn_scale"], g / np.sqrt(v + 1e-3), rtol=1e-6)
    np.testing.assert_allclose(
        params["Conv2d_1a_3x3"]["bn_bias"], b - m * g / np.sqrt(v + 1e-3),
        rtol=1e-5, atol=1e-6)
    # converted params actually run
    model = InceptionV3Features()
    feats = model.apply(
        {"params": params},
        jnp.asarray(np.random.default_rng(2).normal(size=(1, 299, 299, 3)),
                    jnp.float32),
    )
    assert feats.shape == (1, FID_FEATURE_DIM)
    assert np.isfinite(np.asarray(feats)).all()


def test_fid_end_to_end_on_dirs(tmp_path, inception_params):
    """harness.evaluate_dirs computes a real FID with the Inception extractor
    (synthetic images; random-init weights — protocol plumbing test)."""
    from PIL import Image

    from upgpt_tpu.eval.harness import evaluate_dirs

    rng = np.random.default_rng(0)
    for d in ("samples", "gt"):
        (tmp_path / d).mkdir()
    for i in range(4):
        a = rng.integers(0, 255, (288, 192, 3), np.uint8)
        Image.fromarray(a).save(tmp_path / "samples" / f"{i}.jpg")
        Image.fromarray(np.roll(a, 5, axis=0)).save(tmp_path / "gt" / f"{i}.jpg")

    fid_fn = InceptionFeatureFn(inception_params)
    metrics = evaluate_dirs(str(tmp_path), crop_hw=(256, 176),
                            fid_feature_fn=fid_fn)
    # the key names the extractor: a CLIP-FID can't masquerade as protocol FID
    assert "fid_inception" in metrics and np.isfinite(metrics["fid_inception"])
    assert metrics["fid_inception"] >= 0.0
    # the protocol (inception) extractor ALSO emits the pre-rename 'fid'
    # compat alias for external metrics.csv consumers (harness.py); only
    # the inception extractor gets it (test_non_protocol_fid_gets_no_alias)
    assert metrics["fid"] == metrics["fid_inception"]


def test_non_protocol_fid_gets_no_alias(tmp_path):
    """A non-inception extractor (e.g. CLIP-FID) must NOT claim the bare
    'fid' key — external consumers keyed on 'fid' get the protocol number
    or nothing."""
    from PIL import Image

    from upgpt_tpu.eval.harness import evaluate_dirs

    rng = np.random.default_rng(0)
    for d in ("samples", "gt"):
        (tmp_path / d).mkdir()
    for i in range(3):
        a = rng.integers(0, 255, (288, 192, 3), np.uint8)
        Image.fromarray(a).save(tmp_path / "samples" / f"{i}.jpg")
        Image.fromarray(np.roll(a, 5, axis=0)).save(tmp_path / "gt" / f"{i}.jpg")

    def fake_features(x):
        return np.asarray(x).reshape(x.shape[0], -1)[:, :16]

    fake_features.fid_name = "clip"
    metrics = evaluate_dirs(str(tmp_path), crop_hw=(256, 176),
                            fid_feature_fn=fake_features)
    assert "fid_clip" in metrics
    assert "fid" not in metrics

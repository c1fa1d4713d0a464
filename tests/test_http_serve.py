"""HTTP serving endpoint: request building, batching, errors, stats."""

import base64
import io
import json
import threading
import urllib.request
import urllib.error

import numpy as np
import jax
import pytest

from upgpt_tpu.diffusion.latent_diffusion import LatentDiffusion
from upgpt_tpu.inference.http_serve import (
    RequestBuilder, default_person_mask, make_serve_handler,
)
from upgpt_tpu.inference.pipeline import GenerationPipeline
from upgpt_tpu.inference.serving import ServingEngine

from test_latent_diffusion import tiny_config


def _post(url, payload):
    req = urllib.request.Request(
        url, data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"}, method="POST")
    with urllib.request.urlopen(req, timeout=300) as r:
        return json.loads(r.read())


@pytest.fixture(scope="module")
def server_url():
    from http.server import ThreadingHTTPServer

    from upgpt_tpu.inference.encoders import DebugConditioningEncoder

    model = LatentDiffusion(tiny_config())
    params = model.init_params(jax.random.PRNGKey(0))
    pipe = GenerationPipeline(model, num_steps=4, eta=0.0, output_uint8=True)
    engine = ServingEngine(pipe, params, batch_size=2, max_delay_s=0.05)
    builder = RequestBuilder(
        DebugConditioningEncoder(context_dim=64, text_len=7),
        mask_hw=(8, 8), context_dim=64, text_len=7, pose_dim=85)
    engine.start()
    server = ThreadingHTTPServer(
        ("127.0.0.1", 0), make_serve_handler(engine, builder))
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{server.server_address[1]}"
    server.shutdown()
    engine.stop()


def test_healthz_and_unknown(server_url):
    with urllib.request.urlopen(server_url + "/healthz", timeout=30) as r:
        assert json.loads(r.read())["ok"] is True
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(server_url + "/nope", timeout=30)
    assert e.value.code == 404


def test_generate_text_contract_concurrent(server_url):
    """Two concurrent text requests pack into one device batch; both get a
    decodable PNG of the tiny model's output size."""
    from PIL import Image

    results = {}

    def call(i):
        results[i] = _post(server_url + "/v1/generate", {"txt": f"coat {i}"})

    ts = [threading.Thread(target=call, args=(i,)) for i in range(2)]
    [t.start() for t in ts]
    [t.join() for t in ts]
    for i in range(2):
        img = Image.open(io.BytesIO(base64.b64decode(results[i]["image_b64"])))
        assert img.size == (16, 16)  # tiny geometry: 8x8 latent, f2 VAE
        assert results[i]["latency_s"] > 0

    stats = json.loads(urllib.request.urlopen(
        server_url + "/v1/stats", timeout=30).read())
    assert stats["requests"] >= 2


def test_generate_raw_embedding_contract(server_url):
    rng = np.random.default_rng(0)
    out = _post(server_url + "/v1/generate", {
        "text_emb": rng.normal(size=(7, 64)).tolist(),
        "style_emb": rng.normal(size=(9, 64)).tolist(),
        "smpl": rng.normal(size=(1, 85)).tolist(),
        "person_mask": rng.normal(size=(8, 8, 1)).tolist(),
    })
    assert "image_b64" in out


def test_bad_shape_is_400(server_url):
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(server_url + "/v1/generate",
              {"text_emb": np.zeros((3, 64)).tolist()})
    assert e.value.code == 400


def test_bad_style_and_mask_shapes_are_400(server_url):
    """Wrong-shape per-sample arrays must be rejected per request, never
    reach the engine (they'd fail the whole device batch they pad into)."""
    for bad in (
        {"txt": "x", "style_emb": np.zeros((4, 64)).tolist()},
        {"txt": "x", "person_mask": np.zeros((8, 5, 1)).tolist()},
    ):
        with pytest.raises(urllib.error.HTTPError) as e:
            _post(server_url + "/v1/generate", bad)
        assert e.value.code == 400


def test_default_mask_constants():
    m = default_person_mask(8, 8)
    assert set(np.unique(m)) == {-1.0, np.float32(-0.99215686)}


def test_interpolate_endpoint(server_url):
    """N-frame pose interpolation: one request, one device batch, ONE
    shared initial noise. At random init the reference-faithful zero-init
    U-Net out-conv makes eps identically 0, so the sample depends ONLY on
    x_T — byte-identical frames are therefore the positive PROOF that the
    frames share their noise (independent per-frame draws would differ),
    and a different request seed must change the result."""
    from PIL import Image

    rng = np.random.default_rng(0)
    req = {
        "txt": "red coat",
        "smpl_src": rng.normal(size=(1, 85)).tolist(),
        "smpl_dst": rng.normal(size=(1, 85)).tolist(),
        "frames": 2,  # == engine batch: served as one batch
        "seed": 123,
    }
    out = _post(server_url + "/v1/interpolate", req)
    assert len(out["frames_b64"]) == 2
    frames = [np.asarray(Image.open(io.BytesIO(base64.b64decode(b))))
              for b in out["frames_b64"]]
    assert frames[0].shape == (16, 16, 3)  # tiny geometry: 8x8 latent, f2
    np.testing.assert_array_equal(frames[0], frames[1])  # shared x_T

    out2 = _post(server_url + "/v1/interpolate", dict(req, seed=321))
    f2 = np.asarray(Image.open(io.BytesIO(base64.b64decode(
        out2["frames_b64"][0]))))
    assert np.abs(frames[0].astype(int) - f2.astype(int)).max() > 0


def test_interpolate_validation(server_url):
    for bad in (
        {"txt": "x", "frames": 1},             # too few frames
        {"txt": "x", "frames": 3},             # exceeds engine batch (2)
        {"txt": "x", "frames": 2},             # missing smpl endpoints
    ):
        with pytest.raises(urllib.error.HTTPError) as e:
            _post(server_url + "/v1/interpolate", bad)
        assert e.value.code == 400


def test_style_texts_mixing(server_url):
    """Per-slot pooled-text override (the app's style mixing): overridden
    slots carry the pooled text embedding, the rest stay; wrong slot count
    is a 400; the daemon serves the mixed request end to end."""
    from upgpt_tpu.inference.encoders import DebugConditioningEncoder
    from upgpt_tpu.inference.http_serve import RequestBuilder

    enc = DebugConditioningEncoder(context_dim=64, text_len=7)
    builder = RequestBuilder(enc, mask_hw=(8, 8), context_dim=64,
                             text_len=7, pose_dim=85)
    texts = [None] * 9
    texts[4] = "blue denim jacket"
    cond = builder.build({"txt": "red coat", "style_texts": texts})
    np.testing.assert_array_equal(
        cond["style_emb"][4], np.asarray(enc.text_pooled([texts[4]]))[0])
    assert np.array_equal(cond["style_emb"][0], np.zeros(64))  # untouched

    ok = _post(server_url + "/v1/generate",
               {"txt": "red coat", "style_texts": texts})
    assert "image_b64" in ok
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(server_url + "/v1/generate",
              {"txt": "x", "style_texts": ["x"] * 4})  # wrong slot count
    assert e.value.code == 400

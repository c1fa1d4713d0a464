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

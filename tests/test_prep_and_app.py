"""Data-prep utilities + demo app surface tests."""

import json
import threading
import urllib.request

import numpy as np
import pytest
from PIL import Image

from upgpt_tpu.data.prep import (
    SEGM_COLOR_TABLE, convert_segm_image, resize_highres_file,
)


def test_convert_segm_roundtrip(tmp_path):
    rgb = np.zeros((16, 16, 3), np.uint8)
    rgb[:8] = (255, 0, 0)       # hair -> 13
    rgb[8:] = (144, 238, 144)   # skin -> 15
    out = convert_segm_image(rgb)
    labels = np.asarray(out)
    assert set(np.unique(labels)) == {13, 15}


def test_resize_highres(tmp_path):
    src = tmp_path / "in.jpg"
    Image.fromarray(np.zeros((1101, 750, 3), np.uint8)).save(src)
    dst = tmp_path / "out.jpg"
    resize_highres_file((str(src), str(dst), 512))
    assert Image.open(dst).size == (384, 512)


def test_style_extraction(tmp_path):
    from upgpt_tpu.data.prep import extract_styles_for

    rng = np.random.default_rng(0)
    img_p = tmp_path / "img.jpg"
    Image.fromarray(rng.integers(0, 255, (256, 192, 3), np.uint8)).save(img_p)
    segm = np.zeros((256, 192), np.uint8)
    segm[10:60, 60:120] = 14  # face
    segm[60:200, 50:140] = 1  # top
    segm_p = tmp_path / "segm.png"
    Image.fromarray(segm).save(segm_p)
    extract_styles_for((str(img_p), str(segm_p), str(tmp_path / "styles")))
    assert (tmp_path / "styles" / "face.jpg").exists()
    assert (tmp_path / "styles" / "top.jpg").exists()
    assert not (tmp_path / "styles" / "shoes.jpg").exists()


@pytest.fixture(scope="module")
def app_server():
    import jax

    from upgpt_tpu.app import DemoState, make_handler
    from upgpt_tpu.inference.encoders import DebugConditioningEncoder
    from upgpt_tpu.zoo import build_latent_diffusion
    from http.server import ThreadingHTTPServer

    model = build_latent_diffusion("tiny", use_flash_attention=False)
    params = model.init_params(jax.random.PRNGKey(0))
    enc = DebugConditioningEncoder(context_dim=768)
    state = DemoState(model, params, enc, pose_dir=None)
    server = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(state, "(test)"))
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{port}"
    server.shutdown()


def test_app_index(app_server):
    html = urllib.request.urlopen(app_server).read().decode()
    assert "upgpt-tpu" in html and "/api/generate" in html


def test_app_generate_and_errors(app_server):
    req = urllib.request.Request(
        app_server + "/api/generate",
        data=json.dumps({"txt": "a woman", "steps": 2, "frames": 2,
                         "style_texts": {"top": "red shirt"}}).encode(),
        method="POST",
    )
    resp = json.loads(urllib.request.urlopen(req).read())
    assert "images" in resp and len(resp["images"]) == 2
    # every sampler option the UI offers must round-trip
    for sampler in ("dpm++", "unipc"):
        req = urllib.request.Request(
            app_server + "/api/generate",
            data=json.dumps({"txt": "a woman", "steps": 2,
                             "sampler": sampler}).encode(),
            method="POST",
        )
        resp = json.loads(urllib.request.urlopen(req).read())
        assert "images" in resp and len(resp["images"]) == 1, sampler
    # bad endpoint -> structured error
    req = urllib.request.Request(app_server + "/api/nope", data=b"{}", method="POST")
    try:
        urllib.request.urlopen(req)
        raised = False
    except urllib.error.HTTPError as e:
        raised = True
        assert json.loads(e.read())["error"].startswith("unknown endpoint")
    assert raised

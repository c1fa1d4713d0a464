"""Data pipeline tests over a synthetic mini-DeepFashion tree."""

import json
import pickle

import numpy as np
import pytest
from PIL import Image

from upgpt_tpu.data.deepfashion import (
    DataLoader, DeepFashionPair, STYLE_NAMES, collate, convert_fname, get_name,
)
from upgpt_tpu.data.segm import DeepfashionMMSegmenter, DeepfashionMMStyleSegmenter
from upgpt_tpu.data.transforms import (
    CLIP_MEAN, CLIP_STD, empty_style, mask_transform_binary, silhouette_bbox,
)


@pytest.fixture(scope="module")
def fashion_tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("deepfashion")
    (root / "img_256").mkdir()
    (root / "smpl_256").mkdir()
    (root / "segm_256").mkdir()
    rng = np.random.default_rng(0)

    names = ["MEN/a_1_front.jpg", "WOMEN/b_1_front.jpg"]
    rows = []
    for i, name in enumerate(names):
        img = Image.fromarray(rng.integers(0, 255, (256, 192, 3), np.uint8))
        (root / "img_256" / name).parent.mkdir(exist_ok=True, parents=True)
        img.save(root / "img_256" / name)

        # smpl render + silhouette mask + pickle
        smpl_img = Image.fromarray(rng.integers(0, 255, (256, 192, 3), np.uint8))
        smpl_img.save(root / "smpl_256" / f"pose{i}.jpg")
        mask = np.zeros((256, 192), np.uint8)
        mask[40:200, 50:150] = 255
        Image.fromarray(mask).save(root / "smpl_256" / f"pose{i}_mask.png")
        with open(root / "smpl_256" / f"pose{i}.p", "wb") as f:
            pickle.dump([{
                "pred_body_pose": rng.normal(size=(1, 72)).astype(np.float32),
                "pred_betas": rng.normal(size=(1, 10)).astype(np.float32),
                "pred_camera": rng.normal(size=(3,)).astype(np.float32),
            }], f)

        # segm map (labels 0=background, 14=face, 15=skin)
        segm = np.zeros((256, 192), np.uint8)
        segm[10:60, 60:120] = 14
        segm[60:200, 50:140] = 15
        seg_path = root / "segm_256" / name.replace(".jpg", "_segm.png")
        seg_path.parent.mkdir(exist_ok=True, parents=True)
        Image.fromarray(segm).save(seg_path)

        # style crops for a few slots
        sd = root / "styles" / f"s{i}"
        sd.mkdir(parents=True)
        for slot in ("face", "top"):
            Image.fromarray(rng.integers(0, 255, (224, 224, 3), np.uint8)).save(
                sd / f"{slot}.jpg"
            )
        rows.append({"image": name, "text": f"t{i}", "pose": f"pose{i}",
                     "styles": f"s{i}"})

    with open(root / "captions.json", "w") as f:
        json.dump({"t0": "a man", "t1": "a woman"}, f)

    import csv
    with open(root / "map.csv", "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=["image", "text", "pose", "styles"])
        w.writeheader()
        for i, name in enumerate(names):
            w.writerow({"image": name, "text": f"t{i}",
                        "pose": f"pose{i}", "styles": f"s{i}"})
    # remap map keys to original names with slashes
    with open(root / "map.csv", "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=["image", "text", "pose", "styles"])
        w.writeheader()
        for i, name in enumerate(names):
            w.writerow({"image": name, "text": f"t{i}",
                        "pose": f"pose{i}", "styles": f"s{i}"})

    with open(root / "pairs.csv", "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=["from", "to"])
        w.writeheader()
        w.writerow({"from": names[0], "to": names[1]})
        w.writerow({"from": names[1], "to": names[0]})
    return root


def _make(root, **kw):
    return DeepFashionPair(
        folder=str(root), image_dir="img_256",
        pair_file=[str(root / "pairs.csv")], data_file=str(root / "map.csv"),
        image_size=(256, 192), f=8, input_mask_type="bbox", **kw,
    )


def test_pair_sample_contract(fashion_tree):
    ds = _make(fashion_tree, loss_weight={"face": 5.0, "background": 0.5})
    assert len(ds) == 2
    s = ds[0]
    assert s["image"].shape == (256, 192, 3)
    assert -1.0 <= s["image"].min() and s["image"].max() <= 1.0
    assert s["styles"].shape == (9, 224, 224, 3)
    assert s["smpl"].shape == (1, 85)
    assert s["person_mask"].shape == (32, 24, 1)
    assert s["loss_w"].shape == (32, 24, 1)
    assert isinstance(s["txt"], str) and s["txt"] in ("a man", "a woman")
    # per-part loss weights present
    vals = set(np.unique(s["loss_w"]))
    assert 5.0 in vals and 0.5 in vals and 1.0 in vals


def test_bbox_255_bug_value(fashion_tree):
    """The in-box mask value must be -0.99215686, NOT +1 — released weights
    were trained on this bug (deepfashion_inshop.py:232-239)."""
    ds = _make(fashion_tree)
    m = ds[0]["person_mask"]
    vals = np.unique(m)
    assert set(np.round(vals, 6)) <= {-1.0, np.float32(np.round(1 / 255 * 2 - 1, 6))}
    assert np.isclose(vals.max(), -0.99215686, atol=1e-6)


def test_empty_style_slot_is_clip_normalized_zeros(fashion_tree):
    ds = _make(fashion_tree)
    s = ds[0]
    # 'hair' slot has no file -> empty style
    idx = STYLE_NAMES.index("hair")
    want = (0.0 - CLIP_MEAN) / CLIP_STD
    np.testing.assert_allclose(s["styles"][idx][0, 0], want, rtol=1e-5)


def test_men_factor_oversampling(fashion_tree):
    ds = _make(fashion_tree, men_factor=4)
    # 2 rows + 4x the single MEN row
    assert len(ds) == 6


def test_skip_sample_on_broken_row(fashion_tree):
    ds = _make(fashion_tree)
    ds.rows = [{"from": "missing.jpg", "to": "missing.jpg"}] + ds.rows[:1]
    s = ds[0]  # falls through to index 1
    assert s["image"].shape == (256, 192, 3)


def test_dataloader_batching(fashion_tree):
    ds = _make(fashion_tree)
    dl = DataLoader(ds, batch_size=2, shuffle=True, seed=1)
    batch = next(dl.epoch(0))
    assert batch["image"].shape == (2, 256, 192, 3)
    assert batch["styles"].shape == (2, 9, 224, 224, 3)
    assert isinstance(batch["txt"], list) and len(batch["txt"]) == 2


def test_fname_conversion():
    assert convert_fname("MEN/Denim/id_00000080/01_7_additional.jpg") == \
        "fashionMENDenimid0000008001_7additional"
    n = get_name("MEN/a/id_00000001/01_1_front.jpg", "MEN/a/id_00000001/01_2_side.jpg")
    assert "___" in n


def test_segmenter_crops(fashion_tree):
    seg = DeepfashionMMStyleSegmenter()
    rng = np.random.default_rng(1)
    img = rng.uniform(0, 1, (256, 192, 3)).astype(np.float32)
    segm = np.zeros((256, 192), np.uint8)
    segm[10:60, 60:120] = 14  # face
    segm[60:200, 50:140] = 1  # top
    crops = seg(img, segm)
    assert crops["face"].shape == (224, 224, 3)
    assert crops["top"].shape == (224, 224, 3)
    # slots with no pixels are zeros
    assert crops["shoes"].sum() == 0
    # background fill: everything is mean background color where not bg
    assert crops["background"].shape == (224, 224, 3)


def test_face_crop_rejected_if_tall():
    seg = DeepfashionMMStyleSegmenter()
    img = np.ones((256, 192, 3), np.float32)
    segm = np.zeros((256, 192), np.uint8)
    segm[10:250, 60:120] = 14  # 240px tall face -> rejected
    crops = seg(img, segm)
    assert crops["face"].sum() == 0


def test_prefetch_loader_matches_sequential(fashion_tree):
    """PrefetchDataLoader yields byte-identical batches in identical order
    to the sequential DataLoader for the same seed/epoch."""
    from upgpt_tpu.data.deepfashion import DataLoader, PrefetchDataLoader

    ds = _make(fashion_tree)
    a = DataLoader(ds, 2, shuffle=True, seed=3, drop_last=False)
    b = PrefetchDataLoader(ds, 2, shuffle=True, seed=3, drop_last=False,
                           num_workers=4, prefetch_batches=2)
    for ba, bb in zip(a.epoch(5), b.epoch(5)):
        assert sorted(ba) == sorted(bb)
        for k in ba:
            if isinstance(ba[k], list):
                assert ba[k] == bb[k]
            else:
                np.testing.assert_array_equal(ba[k], bb[k])


def test_prefetch_loader_overlaps_decode():
    """With per-item decode latency, the parallel loader sustains >= 2x the
    sequential rate (VERDICT round-1: loader must outpace the train step)."""
    import time

    from upgpt_tpu.data.deepfashion import DataLoader, PrefetchDataLoader

    class SlowDs:
        def __len__(self):
            return 24

        def __getitem__(self, i):
            time.sleep(0.02)  # stand-in for PIL decode + transforms
            return {"image": np.full((4, 4, 3), i, np.float32)}

    seq = DataLoader(SlowDs(), 4, shuffle=False)
    par = PrefetchDataLoader(SlowDs(), 4, shuffle=False, num_workers=8)
    t0 = time.perf_counter()
    n_seq = sum(1 for _ in seq.epoch(0))
    t_seq = time.perf_counter() - t0
    t0 = time.perf_counter()
    n_par = sum(1 for _ in par.epoch(0))
    t_par = time.perf_counter() - t0
    assert n_seq == n_par == 6
    assert t_seq / t_par >= 2.0, (t_seq, t_par)


def test_prefetch_loader_propagates_errors():
    from upgpt_tpu.data.deepfashion import PrefetchDataLoader

    class BadDs:
        def __len__(self):
            return 4

        def __getitem__(self, i):
            if i == 2:
                raise ValueError("boom")
            return {"x": np.zeros(2, np.float32)}

    loader = PrefetchDataLoader(BadDs(), 2, shuffle=False, num_workers=2)
    import pytest as _pytest
    with _pytest.raises(ValueError, match="boom"):
        list(loader.epoch(0))


def test_compact_dataset_is_exact(fashion_tree):
    """compact=True emits uint8 tensors whose dequantized values match the
    f32 pipeline exactly (uint8-sourced pixels; empty style slot = black =
    normalize-exact zeros)."""
    ds_f = _make(fashion_tree)
    ds_c = _make(fashion_tree, compact=True)
    a, b = ds_f[0], ds_c[0]
    for k in ("image", "src_image", "smpl_image"):
        assert b[k].dtype == np.uint8
        np.testing.assert_array_equal(
            b[k].astype(np.float32) / 127.5 - 1.0, a[k])
    assert b["styles"].dtype == np.uint8
    np.testing.assert_array_equal(
        (b["styles"].astype(np.float32) / 255.0 - CLIP_MEAN) / CLIP_STD,
        a["styles"])
    # non-image fields unchanged
    np.testing.assert_array_equal(a["person_mask"], b["person_mask"])
    np.testing.assert_array_equal(a["smpl"], b["smpl"])


def test_clip_encoder_accepts_compact_styles(fashion_tree):
    """The jitted CLIP style encoder dequantizes uint8 crops on device and
    produces identical embeddings to the f32-normalized path."""
    import jax
    import jax.numpy as jnp
    from upgpt_tpu.models.clip import CLIPVisionConfig, StyleImageEncoder
    from upgpt_tpu.inference.encoders import _dequant_styles

    cfg = CLIPVisionConfig(hidden_size=32, num_layers=1, num_heads=2,
                           image_size=224, patch_size=56, projection_dim=16)
    enc = StyleImageEncoder(cfg)
    rng = np.random.default_rng(0)
    u8 = rng.integers(0, 256, (2, 9, 224, 224, 3), np.uint8)
    f32 = (u8.astype(np.float32) / 255.0 - CLIP_MEAN) / CLIP_STD
    params = enc.init(jax.random.PRNGKey(0), jnp.asarray(f32))["params"]
    out_f = enc.apply({"params": params}, jnp.asarray(f32))
    out_u = enc.apply({"params": params}, _dequant_styles(jnp.asarray(u8)))
    np.testing.assert_allclose(np.asarray(out_u), np.asarray(out_f),
                               atol=1e-6, rtol=1e-6)


def test_batch_transform_runs_in_producer(fashion_tree):
    """batch_transform output (and ordering) matches serial transform; it
    executes on the producer thread, not the consumer."""
    import threading

    from upgpt_tpu.data.deepfashion import DataLoader, PrefetchDataLoader

    ds = _make(fashion_tree)
    main_thread = threading.get_ident()
    seen_threads = []

    def tf(batch):
        seen_threads.append(threading.get_ident())
        return {"n": batch["image"].shape[0], "img": batch["image"]}

    serial = DataLoader(ds, 2, batch_transform=tf)
    pre = PrefetchDataLoader(ds, 2, batch_transform=tf)
    a_batches = list(serial.epoch(3))
    n_serial = len(seen_threads)
    b_batches = list(pre.epoch(3))
    assert len(a_batches) == len(b_batches)
    for a, b in zip(a_batches, b_batches):
        assert a["n"] == b["n"]
        np.testing.assert_array_equal(a["img"], b["img"])
    # the prefetch loader's transform calls happened off the main thread
    assert all(t != main_thread for t in seen_threads[n_serial:])


def test_process_loader_matches_serial(fashion_tree):
    """ProcessDataLoader: same deterministic batches as DataLoader, worker
    errors surface, pool survives multiple epochs."""
    from upgpt_tpu.data.deepfashion import DataLoader, ProcessDataLoader

    ds = _make(fashion_tree, compact=True)
    serial = DataLoader(ds, 2)
    proc = ProcessDataLoader(ds, 2, num_workers=2, prefetch_batches=2)
    try:
        for epoch in (0, 1):
            for a, b in zip(serial.epoch(epoch), proc.epoch(epoch)):
                assert a.keys() == b.keys()
                np.testing.assert_array_equal(a["image"], b["image"])
                np.testing.assert_array_equal(a["styles"], b["styles"])
    finally:
        proc.close()


def test_dropout_deterministic_across_loaders_and_fresh_per_epoch(fashion_tree):
    """Style dropout is a pure function of (seed, epoch, index): serial,
    thread, and worker-process loaders agree batch-for-batch even with
    dropout on, and decisions change across epochs (not frozen per item)."""
    from upgpt_tpu.data.deepfashion import (
        DataLoader, PrefetchDataLoader, ProcessDataLoader,
    )

    mk = lambda: _make(fashion_tree, dropout=0.5, compact=True)
    serial, threaded = DataLoader(mk(), 2), PrefetchDataLoader(mk(), 2)
    proc = ProcessDataLoader(mk(), 2, num_workers=2)
    per_epoch = []
    try:
        for ep in range(8):
            a = next(serial.epoch(ep))
            b = next(threaded.epoch(ep))
            c = next(proc.epoch(ep))
            np.testing.assert_array_equal(a["styles"], b["styles"])
            np.testing.assert_array_equal(a["styles"], c["styles"])
            # record which items were dropped (all-zero style stack)
            per_epoch.append(tuple(
                bool(a["styles"][i].any()) for i in range(2)))
    finally:
        proc.close()
    # freshness: with p=0.5 over 8 epochs x 2 items the decisions cannot
    # all be identical unless the RNG ignores the epoch (p ~ 2^-14)
    assert len(set(per_epoch)) > 1


def test_transfer_prefetch_early_break_stops_producer(fashion_tree):
    """Breaking out of a transfer_prefetch consumer must unwind the helper
    thread and close the upstream iterator (no parked threads)."""
    import threading
    import time as _time

    from upgpt_tpu.training.trainer import transfer_prefetch

    closed = {"flag": False}

    def src():
        try:
            i = 0
            while True:
                yield {"i": np.full((4,), i)}
                i += 1
        finally:
            closed["flag"] = True

    before = threading.active_count()
    it = transfer_prefetch(src(), lambda d: d, depth=2)
    got = [next(it), next(it)]
    assert got[0]["i"][0] == 0
    it.close()  # what a `break` in a for-loop does on GC
    deadline = _time.time() + 5
    while _time.time() < deadline and (
            threading.active_count() > before or not closed["flag"]):
        _time.sleep(0.05)
    assert closed["flag"], "upstream generator was not closed"
    assert threading.active_count() <= before

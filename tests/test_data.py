"""Data pipeline: natural sort, pairing, padding, crops, patches, prefetch."""

import os

import numpy as np
import pytest
from PIL import Image

from sunet_tf_tpu.data.patches import generate_patches
from sunet_tf_tpu.data.synth import generate_dataset, synth_image
from sunet_tf_tpu.data.pipeline import (
    PairDataset,
    Prefetcher,
    batch_iterator,
    list_image_pairs,
    natural_sorted,
    reflect_pad_to,
)


def _write(root, sub, names, size=(20, 24)):
    os.makedirs(os.path.join(root, sub), exist_ok=True)
    rng = np.random.default_rng(0)
    for n in names:
        img = rng.integers(0, 255, (size[0], size[1], 3), dtype=np.uint8)
        Image.fromarray(img).save(os.path.join(root, sub, n))


def test_natural_sorted():
    assert natural_sorted(["img_10.png", "img_2.png", "img_1.png"]) == [
        "img_1.png", "img_2.png", "img_10.png"]


def test_list_image_pairs(tmp_path):
    _write(str(tmp_path), "input", ["b_2.png", "a_1.png"])
    _write(str(tmp_path), "target", ["b_2.png", "a_1.png"])
    (tmp_path / "input" / "notes.txt").write_text("ignore me")
    pairs = list_image_pairs(str(tmp_path))
    assert len(pairs) == 2
    assert all(os.path.basename(a) == os.path.basename(b) for a, b in pairs)


def test_reflect_pad_small_images():
    img = np.arange(2 * 3 * 3, dtype=np.uint8).reshape(2, 3, 3)
    out = reflect_pad_to(img, 5)
    assert out.shape == (5, 5, 3)
    np.testing.assert_array_equal(out[:2, :3], img)


def test_train_crop_and_eval_centercrop(tmp_path):
    _write(str(tmp_path), "input", ["x_1.png"], size=(10, 12))
    _write(str(tmp_path), "target", ["x_1.png"], size=(10, 12))
    tr = PairDataset(str(tmp_path), patch_size=16, train=True)
    i, t, name = tr.get(0)
    assert i.shape == (16, 16, 3) and t.shape == (16, 16, 3)
    ev = PairDataset(str(tmp_path), patch_size=8, train=False)
    i, t, _ = ev.get(0)
    assert i.shape == (8, 8, 3)


def test_batch_iterator_shapes(tmp_path):
    _write(str(tmp_path), "input", [f"i_{k}.png" for k in range(5)])
    _write(str(tmp_path), "target", [f"i_{k}.png" for k in range(5)])
    ds = PairDataset(str(tmp_path), patch_size=16, train=True)
    batches = list(batch_iterator(ds, 2, shuffle=True, drop_last=True))
    assert len(batches) == 2
    assert batches[0]["input"].shape == (2, 16, 16, 3)
    assert batches[0]["input"].dtype == np.uint8
    full = list(batch_iterator(ds, 2, shuffle=False, drop_last=False))
    assert len(full) == 3 and full[-1]["input"].shape[0] == 1


def test_prefetcher_preserves_order_and_names(tmp_path):
    _write(str(tmp_path), "input", [f"i_{k}.png" for k in range(4)])
    _write(str(tmp_path), "target", [f"i_{k}.png" for k in range(4)])
    ds = PairDataset(str(tmp_path), patch_size=16, train=False)
    got = list(Prefetcher(batch_iterator(ds, 1, shuffle=False)))
    assert [n[0] for _, n in got] == [f"i_{k}" for k in range(4)]


def test_generate_patches_tagged(tmp_path):
    src = tmp_path / "src" / "scene"
    os.makedirs(src)
    rng = np.random.default_rng(1)
    for stem in ("001_GT", "001_hazy", "002_GT", "002_hazy"):
        img = rng.integers(0, 255, (40, 40, 3), dtype=np.uint8)
        Image.fromarray(img).save(src / f"{stem}.png")
    n = generate_patches(str(tmp_path / "src"), str(tmp_path / "out"),
                         ps=16, num_patches=3, num_workers=2)
    assert n == 6
    assert len(os.listdir(tmp_path / "out" / "input")) == 6
    assert len(os.listdir(tmp_path / "out" / "target")) == 6


def test_generate_patches_same_mode(tmp_path):
    src = tmp_path / "src" / "div2k"
    os.makedirs(src)
    img = np.random.default_rng(2).integers(0, 255, (30, 30, 3), dtype=np.uint8)
    Image.fromarray(img).save(src / "0001.png")
    n = generate_patches(str(tmp_path / "src"), str(tmp_path / "out"),
                         ps=16, num_patches=4, pair_mode="same")
    assert n == 4
    # input == target in 'same' mode (noise comes later, on device)
    a = np.asarray(Image.open(tmp_path / "out" / "input" / "0_1.png"))
    b = np.asarray(Image.open(tmp_path / "out" / "target" / "0_1.png"))
    np.testing.assert_array_equal(a, b)


def test_synth_dataset_properties(tmp_path):
    """Deterministic procedural corpus: natural-image-like statistics and
    exact AWGN pair semantics (sigma on the 0-255 scale)."""
    rng = np.random.default_rng(3)
    img = synth_image(rng, 128)
    assert img.shape == (128, 128, 3) and img.dtype == np.uint8
    a = img[:, :, 0].astype(np.float32) / 255.0
    corr = np.corrcoef(a[:-1].ravel(), a[1:].ravel())[0, 1]
    assert corr > 0.9, f"not natural-image-like (corr {corr})"
    # determinism by seed
    img2 = synth_image(np.random.default_rng(3), 128)
    np.testing.assert_array_equal(img, img2)

    generate_dataset(str(tmp_path / "same"), 2, 64, seed=0, pair_mode="same")
    ds = PairDataset(str(tmp_path / "same"), 64, train=False)
    i0, t0, _ = ds.get(0)
    np.testing.assert_array_equal(i0, t0)

    generate_dataset(str(tmp_path / "awgn"), 2, 64, seed=0,
                     pair_mode="awgn", sigma=50.0)
    ds = PairDataset(str(tmp_path / "awgn"), 64, train=False)
    i0, t0, _ = ds.get(0)
    resid = i0.astype(np.float32) - t0.astype(np.float32)
    assert resid.std() > 25.0  # sigma 50 minus clipping
    assert not np.array_equal(i0, t0)


def test_pair_dataset_lru_cache_bounded(tmp_path):
    """The decode cache evicts LRU entries past its byte budget instead of
    growing without bound (round-1 review weak #7)."""
    _write(str(tmp_path), "input", [f"c_{k}.png" for k in range(4)],
           size=(32, 32))
    _write(str(tmp_path), "target", [f"c_{k}.png" for k in range(4)],
           size=(32, 32))
    pair_bytes = 2 * 32 * 32 * 3
    ds = PairDataset(str(tmp_path), 16, train=False,
                     cache_bytes=2 * pair_bytes)  # room for 2 pairs
    for i in range(4):
        ds.get(i)
    assert set(ds._cache) == {2, 3}
    assert ds._cache_bytes == 2 * pair_bytes
    ds.get(2)  # touch 2 -> 3 becomes LRU
    ds.get(0)
    assert set(ds._cache) == {2, 0}


def test_grain_pipeline_matches_contract(tmp_path):
    """The optional grain multiprocess pipeline yields the same batch
    contract as batch_iterator (shapes/dtypes/valid), is deterministic
    given a seed, and center-crops in eval mode."""
    pytest.importorskip("grain")
    from sunet_tf_tpu.data.grain_pipeline import grain_batch_iterator

    _write(str(tmp_path), "input", [f"g_{k}.png" for k in range(5)],
           size=(20, 24))
    _write(str(tmp_path), "target", [f"g_{k}.png" for k in range(5)],
           size=(20, 24))
    kw = dict(patch_size=16, batch=2, train=True, shuffle=True,
              drop_last=True, seed=7, workers=0)
    b1 = list(grain_batch_iterator(str(tmp_path), **kw))
    assert len(b1) == 2  # 5 records, batch 2, drop_remainder
    assert b1[0]["input"].shape == (2, 16, 16, 3)
    assert b1[0]["input"].dtype == np.uint8
    assert b1[0]["valid"].tolist() == [1.0, 1.0]
    b2 = list(grain_batch_iterator(str(tmp_path), **kw))
    np.testing.assert_array_equal(b1[0]["input"], b2[0]["input"])
    b3 = list(grain_batch_iterator(str(tmp_path), **{**kw, "seed": 8}))
    assert not np.array_equal(b1[0]["input"], b3[0]["input"])

    ev = list(grain_batch_iterator(str(tmp_path), patch_size=16, batch=5,
                                   train=False, shuffle=False,
                                   drop_last=False, seed=0, workers=0))
    ds = PairDataset(str(tmp_path), 16, train=False)
    ref = np.stack([ds.get(i)[0] for i in range(5)])
    np.testing.assert_array_equal(ev[0]["input"], ref)
    # filenames are threaded through (round-2 weak #6: grain used to drop
    # them, forcing eval onto the single-threaded path)
    assert ev[0]["names"] == [ds.get(i)[2] for i in range(5)]


def test_grain_pipeline_pads_partial_batch(tmp_path):
    """pad_to pads the trailing partial batch with valid=0 rows (the
    batch_iterator contract mesh-sharded eval depends on)."""
    pytest.importorskip("grain")
    from sunet_tf_tpu.data.grain_pipeline import grain_batch_iterator

    _write(str(tmp_path), "input", [f"p_{k}.png" for k in range(5)],
           size=(20, 24))
    _write(str(tmp_path), "target", [f"p_{k}.png" for k in range(5)],
           size=(20, 24))
    bs = list(grain_batch_iterator(str(tmp_path), patch_size=16, batch=4,
                                   train=False, shuffle=False,
                                   drop_last=False, workers=0, pad_to=4))
    assert [b["input"].shape[0] for b in bs] == [4, 4]
    assert bs[0]["valid"].tolist() == [1.0] * 4
    assert bs[1]["valid"].tolist() == [1.0, 0.0, 0.0, 0.0]
    # pad rows repeat real rows of the partial batch (masked by valid=0)
    np.testing.assert_array_equal(bs[1]["input"][1], bs[1]["input"][0])
    assert len(bs[1]["names"]) == 4

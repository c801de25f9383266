"""Round-5 regression pins (VERDICT r4 items)."""

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx


def test_softmax_autoselect_shift_for_default_scaling(monkeypatch):
    """VERDICT r4 #5: qk_scale=None models default to the shift softmax
    on the fused inference path (provably exact band), while QK_SCALE=8
    models keep rowmax; SUNET_SOFTMAX still overrides both ways."""
    from sunet_tf_tpu.kernels.window_attention import (
        _softmax_mode,
        softmax_autoselect,
    )

    monkeypatch.delenv("SUNET_SOFTMAX", raising=False)
    assert _softmax_mode() == "rowmax"  # bare default unchanged
    with softmax_autoselect(scale=30 ** -0.5, head_dim=30):
        assert _softmax_mode() == "shift"
        with softmax_autoselect(scale=8.0, head_dim=12):  # reference recipe
            assert _softmax_mode() == "rowmax"
        assert _softmax_mode() == "shift"
    assert _softmax_mode() == "rowmax"
    # env overrides in BOTH directions
    monkeypatch.setenv("SUNET_SOFTMAX", "rowmax")
    with softmax_autoselect(scale=30 ** -0.5, head_dim=30):
        assert _softmax_mode() == "rowmax"
    monkeypatch.setenv("SUNET_SOFTMAX", "shift")
    with softmax_autoselect(scale=8.0, head_dim=12):
        assert _softmax_mode() == "shift"


def test_pair_fused_blocks_match_single_blocks(monkeypatch):
    """VERDICT r4 #1: the W->SW pair kernel (one Pallas program per block
    pair, no inter-block HBM crossing) must match the per-block kernels
    exactly, and must actually route (pairs trigger; shift-degraded
    low-res blocks fall back to singles)."""
    import sunet_tf_tpu.kernels.window_attention as wa
    from sunet_tf_tpu.config import tiny_config
    from sunet_tf_tpu.models.sunet import build_model

    calls = {"pair": 0}
    orig_chain = wa.fused_swin_block_chain

    def counting_chain(*a, **k):
        calls["pair"] += 1
        return orig_chain(*a, **k)

    monkeypatch.setattr(wa, "fused_swin_block_chain", counting_chain)

    cfg = tiny_config()
    cfg = cfg.replace(tpu=cfg.tpu.__class__(compute_dtype="float32",
                                            attention_backend="pallas"))
    x = jnp.asarray(np.random.default_rng(0).random((2, 64, 64, 3)),
                    jnp.float32)
    model = build_model(cfg, seed=0)
    gd, p = nnx.split(model, nnx.Param)
    # fresh lambdas per trace: jax's jit cache is keyed on the function
    # OBJECT — reusing one callable would silently skip the second trace
    # and compare a compiled function against itself
    # MIN_C=0: the shipping default (192) routes pairs only at the
    # C>=192 stages where they measured faster; the tiny test model's
    # dims are all smaller, so open the gate to exercise the kernel
    monkeypatch.setenv("SUNET_PAIR_MIN_C", "0")
    monkeypatch.setenv("SUNET_PAIR_FUSE", "0")
    ref = jax.jit(lambda pp, xx: nnx.merge(gd, pp)(xx))(p, x)
    assert calls["pair"] == 0
    monkeypatch.setenv("SUNET_PAIR_FUSE", "1")
    out = jax.jit(lambda pp, xx: nnx.merge(gd, pp)(xx))(p, x)
    assert calls["pair"] > 0, "pair kernel never routed"
    err = float(jnp.max(jnp.abs(out - ref)))
    assert err < 1e-5, err


def test_ssim_against_float64_scipy_oracle():
    """VERDICT r4 #3: ops/image.py::ssim vs an independent float64 scipy
    implementation of the skimage protocol (gaussian_weights=True,
    sigma=1.5, use_sample_covariance=False, data_range=1) at <=1e-4 on
    random AND natural-structure images. Guards k1/k2, kernel
    normalization and padding (reference eval protocol is half SSIM,
    evaluation.m:61-64)."""
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from tools.ssim_oracle import ssim_oracle

    from sunet_tf_tpu.ops.image import ssim_per_sample

    r = np.random.default_rng(0)
    t = r.random((2, 64, 96, 3)).astype(np.float32)
    p = np.clip(t + 0.1 * r.standard_normal(t.shape).astype(np.float32), 0, 1)
    ours = np.asarray(ssim_per_sample(jnp.asarray(t), jnp.asarray(p)))
    np.testing.assert_allclose(ours, ssim_oracle(t, p), atol=1e-4)

    # natural-structure image (gradients + periodic texture), light noise
    yy, xx = np.mgrid[0:128, 0:128] / 128.0
    img = np.stack([np.sin(6 * yy) * 0.5 + 0.5, xx, (xx + yy) / 2],
                   -1).astype(np.float32)[None]
    noisy = np.clip(
        img + 0.05 * r.standard_normal(img.shape).astype(np.float32), 0, 1)
    ours2 = np.asarray(ssim_per_sample(jnp.asarray(img), jnp.asarray(noisy)))
    np.testing.assert_allclose(ours2, ssim_oracle(img, noisy), atol=1e-4)
    # identical pair is exactly 1 under both
    same = np.asarray(ssim_per_sample(jnp.asarray(img), jnp.asarray(img)))
    np.testing.assert_allclose(same, 1.0, atol=1e-6)


def test_fp32_model_lowers_with_highest_matmul_precision():
    """round-5 fp64-oracle fix: compute_dtype float32 must mean FLOAT32.
    TPU XLA's default matmul/conv precision truncates fp32 operands to
    bf16 on the MXU — the whole 'fp32' parity forward ran at ~bf16 input
    precision (uniform 1.1e-3 off the torch-fp64 oracle; 3.5e-8 after
    the fix). Assert the fp32 model wraps its ops in HIGHEST precision
    while the bf16 shipping path stays untouched."""
    from sunet_tf_tpu.config import tiny_config
    from sunet_tf_tpu.models.sunet import build_model

    cfg = tiny_config()
    counts = {}
    for dt in ("float32", "bfloat16"):
        c = cfg.replace(tpu=cfg.tpu.__class__(compute_dtype=dt,
                                              attention_backend="xla"))
        m = build_model(c, seed=0)
        gd, p = nnx.split(m, nnx.Param)
        txt = jax.jit(lambda pp, xx: nnx.merge(gd, pp)(xx)).lower(
            p, jnp.zeros((1, 64, 64, 3), jnp.float32)).as_text()
        counts[dt] = txt.count("HIGHEST")
    assert counts["float32"] > 100, counts
    assert counts["bfloat16"] < counts["float32"] // 4, counts


def test_packed_pair_dataset_matches_png_pipeline(tmp_path):
    """VERDICT r4 #2: the packed uint8 memmap shard loader (decode-free
    epochs) must serve byte-identical pairs to the PNG PairDataset, honor
    the train random-crop contract, and feed batch_iterator unchanged."""
    from sunet_tf_tpu.data.packed import PackedPairDataset, pack_pair_dataset
    from sunet_tf_tpu.data.pipeline import PairDataset, batch_iterator
    from sunet_tf_tpu.data.synth import generate_dataset

    root = str(tmp_path / "imgs")
    generate_dataset(root, 6, 32, seed=3, pair_mode="awgn", sigma=25.0)
    packed = str(tmp_path / "packed")
    info = pack_pair_dataset(root, packed, 32)
    assert info["n"] == 6

    png = PairDataset(root, 32, train=False)
    mm = PackedPairDataset(packed, 32, train=False)
    assert len(mm) == len(png)
    for i in range(6):
        a, b, name = png.get(i)
        c, d, name2 = mm.get(i)
        assert name == name2
        np.testing.assert_array_equal(a, c)
        np.testing.assert_array_equal(b, d)

    # train mode with a smaller patch: aligned random crops within bounds
    mm_t = PackedPairDataset(packed, 16, train=True, seed=0)
    ci, ct, _ = mm_t.get(0)
    assert ci.shape == ct.shape == (16, 16, 3)

    # batch_iterator takes it unchanged
    batches = list(batch_iterator(mm, 4, shuffle=False))
    assert batches[0]["input"].shape == (4, 32, 32, 3)
    assert batches[0]["valid"].tolist() == [1.0] * 4


def test_softmax_autoselect_model_numerics(monkeypatch):
    """A qk_scale=None pallas model (auto-shift) matches its XLA forward;
    the default-recipe model is untouched by the autoselect (rowmax)."""
    from sunet_tf_tpu.config import tiny_config
    from sunet_tf_tpu.models.sunet import build_model

    monkeypatch.delenv("SUNET_SOFTMAX", raising=False)
    cfg = tiny_config(qk_scale=None)
    x = jnp.asarray(np.random.default_rng(5).random((2, 64, 64, 3)),
                    jnp.float32)
    outs = {}
    for backend in ("pallas", "xla"):
        c = cfg.replace(tpu=cfg.tpu.__class__(compute_dtype="float32",
                                              attention_backend=backend))
        model = build_model(c, seed=0)
        gd, params = nnx.split(model, nnx.Param)
        outs[backend] = jax.jit(lambda p, xx: nnx.merge(gd, p)(xx))(params, x)
    err = float(jnp.max(jnp.abs(outs["pallas"] - outs["xla"])))
    assert err < 1e-4, err

"""Round-3 fixes: input-only dataset, NaN/debug hook surface, and the
valid-mask-weighted training loss (round-2 advisor low finding)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import nnx


def _write_png(path, shape, seed):
    from PIL import Image

    rng = np.random.RandomState(seed)
    Image.fromarray(rng.randint(0, 255, shape, dtype=np.uint8)).save(path)


def test_input_dataset_lists_and_batches(tmp_path):
    """Library-level input-only dataset (reference DataLoaderTest,
    dataset_RGB.py:132-151): natural-sorted direct listing, (image, name)
    items, same-shape batch grouping."""
    from sunet_tf_tpu.data.pipeline import InputDataset

    d = str(tmp_path)
    for name, shape, seed in [("img10.png", (16, 20, 3), 0),
                              ("img2.png", (16, 20, 3), 1),
                              ("img1.png", (24, 16, 3), 2),
                              ("notes.txt", None, None)]:
        if shape is None:
            open(os.path.join(d, name), "w").write("not an image")
        else:
            _write_png(os.path.join(d, name), shape, seed)

    ds = InputDataset(d)
    assert len(ds) == 3  # non-images excluded (dataset_RGB.py:134-136)
    # natural sort: img1 < img2 < img10 (natsort semantics)
    names = [ds.get(i)[1] for i in range(len(ds))]
    assert names == ["img1", "img2", "img10"]
    img, name = ds.get(0)
    assert img.shape == (24, 16, 3) and img.dtype == np.uint8

    batches = list(ds.iter_batches(batch=8))
    shapes = sorted(b["input"].shape for b in batches)
    assert shapes == [(1, 24, 16, 3), (2, 16, 20, 3)]
    all_names = sorted(n for b in batches for n in b["names"])
    assert all_names == ["img1", "img10", "img2"]


def test_debug_nan_hooks(monkeypatch):
    from sunet_tf_tpu.train.trainer import (
        assert_finite_loss,
        maybe_enable_debug_nans,
    )

    monkeypatch.setenv("SUNET_DEBUG_NANS", "0")
    assert not maybe_enable_debug_nans()
    monkeypatch.setenv("SUNET_DEBUG_NANS", "1")
    try:
        assert maybe_enable_debug_nans()
        assert jax.config.jax_debug_nans
    finally:
        jax.config.update("jax_debug_nans", False)

    assert_finite_loss(0.5, epoch=1)  # no raise
    with pytest.raises(FloatingPointError, match="SUNET_DEBUG_NANS"):
        assert_finite_loss(float("nan"), epoch=3)
    with pytest.raises(FloatingPointError):
        assert_finite_loss(float("inf"), epoch=3, step=7)


def test_train_step_masks_padded_rows(tiny_cfg):
    """Advisor low finding (r2): batch_iterator pads trailing batches by
    wrapping to the epoch's first samples with valid=0; the training loss
    and gradients must ignore those duplicated rows — a padded batch must
    produce the same loss/grads as the unpadded one."""
    import optax

    from sunet_tf_tpu.models.sunet import build_model
    from sunet_tf_tpu.train.loop import build_steps

    model = build_model(tiny_cfg, seed=0)
    graphdef, params = nnx.split(model, nnx.Param)
    tx = optax.sgd(1e-2)
    opt = tx.init(params)
    fns = build_steps(tiny_cfg, graphdef, tx, task="mask", augment=False)

    rng = np.random.RandomState(0)
    inp = rng.randint(0, 255, (2, 64, 64, 3), np.uint8)
    tar = (rng.rand(2, 64, 64, 3) > 0.5).astype(np.uint8) * 255

    clean = {"input": jnp.asarray(inp), "target": jnp.asarray(tar),
             "valid": jnp.ones((2,), jnp.float32)}
    padded = {"input": jnp.asarray(np.concatenate([inp, inp])),
              "target": jnp.asarray(np.concatenate([tar, tar])),
              "valid": jnp.asarray([1.0, 1.0, 0.0, 0.0], jnp.float32)}

    key = jax.random.key(1)
    step = jax.jit(fns.train_step)
    p1, _, s1, _ = step(params, opt, clean, key, jnp.uint32(0),
                        fns.init_metrics())
    p2, _, s2, _ = step(params, opt, padded, key, jnp.uint32(0),
                        fns.init_metrics())
    np.testing.assert_allclose(float(s1["loss"]), float(s2["loss"]),
                               rtol=1e-6)
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-7)


def test_fused_conv_head_routing_matches_split(monkeypatch):
    """Full tiny model, pallas backend: the default inference routing
    (x4 head + output conv in one phase-space kernel,
    SUNET_UP4_CONV_FUSED=1) must match the split head + XLA conv path."""
    from sunet_tf_tpu.config import tiny_config
    from sunet_tf_tpu.models.sunet import build_model

    cfg = tiny_config()
    cfg = cfg.replace(tpu=cfg.tpu.__class__(compute_dtype="float32",
                                            attention_backend="pallas"))
    model = build_model(cfg, seed=0)
    x = jax.random.uniform(jax.random.key(2), (1, 64, 64, 3), jnp.float32)

    monkeypatch.setenv("SUNET_UP4_CONV_FUSED", "1")
    fused = np.asarray(jax.jit(model)(x))
    monkeypatch.setenv("SUNET_UP4_CONV_FUSED", "0")
    split = np.asarray(jax.jit(model)(x))
    np.testing.assert_allclose(fused, split, rtol=1e-4, atol=1e-4)


def test_fused_stem_matches_sequential(tiny_cfg, monkeypatch):
    """The composite-stem conv (conv_first 3x3 ⊛ patch_embed k=s=p fold,
    reference model/SUNet_detail.py:610,749-750 with no nonlinearity
    between — the :609 PReLU is a stray unused parameter) must match the
    sequential two-conv path. The fused form skips one intermediate
    rounding, so the bound is the activation-dtype class, not exact."""
    from sunet_tf_tpu.models.sunet import build_model

    model = build_model(tiny_cfg, seed=0)
    x = jax.random.uniform(
        jax.random.key(3),
        (2, tiny_cfg.swinunet.img_size, tiny_cfg.swinunet.img_size, 3),
        jnp.float32)
    xin = x.astype(model.compute_dtype) if model.compute_dtype else x

    monkeypatch.setenv("SUNET_FUSED_STEM", "1")
    fused = np.asarray(model._stem(xin), np.float32)
    monkeypatch.setenv("SUNET_FUSED_STEM", "0")
    seq = np.asarray(model._stem(xin), np.float32)
    assert fused.shape == seq.shape
    scale = max(float(np.mean(np.abs(seq))), 1e-3)
    assert float(np.mean(np.abs(fused - seq))) < 6e-3 * scale

    # constrained path (spatial sharding) must keep the sequential form
    monkeypatch.setenv("SUNET_FUSED_STEM", "1")
    seq2 = np.asarray(model._stem(xin, constrained=True), np.float32)
    np.testing.assert_allclose(seq2, seq, rtol=0, atol=0)


def test_bf16_train_step_compiles_and_runs(tiny_cfg):
    """Regression: the composite stem conv with preferred_element_type=
    fp32 failed under value_and_grad at bf16 compute dtype (JAX's conv
    transpose rule feeds the fp32 cotangent against the bf16 operand and
    conv_general_dilated rejects mixed dtypes). The rest of the suite
    pins compute_dtype=float32, so the production bf16 train path needs
    its own gradient-capable smoke test."""
    import optax

    from sunet_tf_tpu.models.sunet import build_model
    from sunet_tf_tpu.train.loop import build_steps

    cfg = tiny_cfg.replace(tpu=tiny_cfg.tpu.__class__(
        compute_dtype="bfloat16"))
    model = build_model(cfg, seed=0)
    graphdef, params = nnx.split(model)
    tx = optax.adam(1e-4)
    fns = build_steps(cfg, graphdef, tx, task="denoise", sigma=50.0)
    opt_state = tx.init(params)
    s = cfg.swinunet.img_size
    rng = np.random.default_rng(0)
    batch = {"input": rng.integers(0, 255, (2, s, s, 3), dtype=np.uint8),
             "target": rng.integers(0, 255, (2, s, s, 3), dtype=np.uint8)}
    p, o, scalars, _ = jax.jit(fns.train_step)(
        params, opt_state, batch, jax.random.key(0), jnp.uint32(0), {})
    jax.block_until_ready(p)
    assert np.isfinite(float(scalars["loss"]))


def test_dihedral_batch_factored_matches_switch():
    """The factored (transpose?/flipH?/flipW?) dihedral_batch must equal the
    per-op lax.switch reference for every op id 0..8, on uint8 and fp32
    (the train path now augments uint8 before normalizing)."""
    from sunet_tf_tpu.ops.image import dihedral, dihedral_batch

    rng = np.random.default_rng(0)
    imgs_u8 = rng.integers(0, 255, (9, 6, 6, 3), dtype=np.uint8)
    ops = jnp.arange(9)
    ref = jax.vmap(dihedral)(jnp.asarray(imgs_u8), ops)
    got = dihedral_batch(jnp.asarray(imgs_u8), ops)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))
    f = jnp.asarray(imgs_u8, jnp.float32) / 255.0
    np.testing.assert_array_equal(
        np.asarray(jax.vmap(dihedral)(f, ops)),
        np.asarray(dihedral_batch(f, ops)))


def test_train_conv_head_routing_matches_split(monkeypatch):
    """Full tiny model, pallas backend, TRAINING path (key given): the
    default routing (phase-space head+conv custom VJP,
    SUNET_UP4_CONV_FUSED_TRAIN=1) must match the split head + XLA conv
    path in value AND gradients."""
    from flax import nnx as _nnx

    from sunet_tf_tpu.config import tiny_config
    from sunet_tf_tpu.models.sunet import build_model

    cfg = tiny_config()
    cfg = cfg.replace(tpu=cfg.tpu.__class__(compute_dtype="float32",
                                            attention_backend="pallas"))
    model = build_model(cfg, seed=0)
    gd, params = _nnx.split(model, _nnx.Param)
    x = jax.random.uniform(jax.random.key(2), (1, 64, 64, 3), jnp.float32)
    k = jax.random.key(5)

    def loss(p):
        y = _nnx.merge(gd, p)(x, key=k)
        return jnp.mean(y * y), y

    monkeypatch.setenv("SUNET_UP4_CONV_FUSED_TRAIN", "1")
    (lf, yf), gf = jax.jit(jax.value_and_grad(loss, has_aux=True))(params)
    monkeypatch.setenv("SUNET_UP4_CONV_FUSED_TRAIN", "0")
    (ls, ys), gs = jax.jit(jax.value_and_grad(loss, has_aux=True))(params)
    np.testing.assert_allclose(np.asarray(yf), np.asarray(ys),
                               rtol=1e-4, atol=1e-4)
    for a, b in zip(jax.tree.leaves(gf), jax.tree.leaves(gs)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)


def test_tpu_yaml_keys_round_trip(tmp_path):
    """TPU.SPATIAL and TPU.OPT_MU_DTYPE must survive the YAML round trip —
    SPATIAL is the Trainer's spatial-mesh knob (it was readable from code
    but unreachable from training.yaml until round 3, third session)."""
    import yaml

    from sunet_tf_tpu.config import Config, config_to_dict, load_config

    cfg = Config()
    cfg = cfg.replace(tpu=cfg.tpu.__class__(
        **{**cfg.tpu.__dict__, "spatial": 2, "opt_mu_dtype": "bfloat16"}))
    p = tmp_path / "t.yaml"
    p.write_text(yaml.safe_dump(config_to_dict(cfg)))
    back = load_config(str(p))
    assert back.tpu.spatial == 2
    assert back.tpu.opt_mu_dtype == "bfloat16"


def test_adam_mu_dtype_knob():
    """TPU.OPT_MU_DTYPE=bfloat16 (the DEFAULT — the Adam update is
    HBM-bound, bf16 mu measured +3.6% train step on v5e) stores Adam's
    first moment in bf16; updates stay close to the reference-exact
    fp32-state optimizer on the first step (identical: mu is exact after
    step 1 up to one bf16 round of the gradient)."""
    import optax

    from sunet_tf_tpu.config import Config
    from sunet_tf_tpu.train.loop import make_optimizer

    base = Config()
    cfg = base.replace(tpu=base.tpu.__class__(
        **{**base.tpu.__dict__, "opt_mu_dtype": "float32"}))
    cfg_b = base.replace(tpu=base.tpu.__class__(
        **{**base.tpu.__dict__, "opt_mu_dtype": "bfloat16"}))
    assert base.tpu.opt_mu_dtype == "bfloat16"  # the default
    params = {"w": jnp.ones((8, 8), jnp.float32)}
    grads = {"w": jnp.full((8, 8), 0.125, jnp.float32)}
    tx32 = make_optimizer(cfg, steps_per_epoch=1)
    txbf = make_optimizer(cfg_b, steps_per_epoch=1)
    s32 = tx32.init(params)
    sbf = txbf.init(params)
    mu = jax.tree.leaves(sbf)[0]  # adam ScaleByAdamState.mu leaf
    assert any(l.dtype == jnp.bfloat16
               for l in jax.tree.leaves(sbf) if hasattr(l, "dtype")), sbf
    u32, _ = tx32.update(grads, s32, params)
    ubf, _ = txbf.update(grads, sbf, params)
    np.testing.assert_allclose(np.asarray(u32["w"]), np.asarray(ubf["w"]),
                               rtol=1e-2, atol=1e-8)


def test_opt_state_restores_across_mu_dtype(tmp_path):
    """Checkpoints restore across OPT_MU_DTYPE changes: orbax casts the
    saved opt_state to the fresh skeleton's dtypes, so a run checkpointed
    under fp32 mu resumes under the bf16-mu default (and vice versa) —
    the safety condition for flipping the default."""
    from sunet_tf_tpu.ckpt import restore_checkpoint, save_checkpoint

    params = {"w": jnp.ones((4, 4), jnp.float32)}
    opt = {"mu": jnp.full((4, 4), 0.5, jnp.float32),
           "count": jnp.zeros((), jnp.int32)}
    save_checkpoint(str(tmp_path), "latest", params, opt_state=opt, epoch=3)
    skel = {"mu": jnp.zeros((4, 4), jnp.bfloat16),
            "count": jnp.zeros((), jnp.int32)}
    out = restore_checkpoint(os.path.join(str(tmp_path), "latest"), params,
                             opt_state_like=skel)
    assert out["opt_state"]["mu"].dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(out["opt_state"]["mu"].astype(jnp.float32)), 0.5)
    assert out["epoch"] == 3


def test_adam_lp_fp32_matches_optax_bitwise():
    """scale_by_adam_lp with fp32 storage reproduces optax.adam BITWISE
    (same fp32 EMA + bias-correction math), so the low-precision
    optimizer path is a strict storage-dtype generalization of the
    reference optimizer (reference train.py:126-135)."""
    import optax

    from sunet_tf_tpu.train.adam import adam_lp

    params = {"a": jnp.linspace(-1.0, 1.0, 64).reshape(8, 8),
              "b": jnp.ones((5,), jnp.float32)}
    lr = lambda c: 1e-3 * (c + 1).astype(jnp.float32)  # noqa: E731
    ref, new = optax.adam(lr), adam_lp(lr)
    s1, s2 = ref.init(params), new.init(params)
    # identical chained state tree => checkpoints interchange
    assert jax.tree.structure(s1) == jax.tree.structure(s2)
    key = jax.random.key(42)
    p1 = p2 = params
    for i in range(5):
        g = jax.tree.map(
            lambda p: jax.random.normal(jax.random.fold_in(key, i), p.shape),
            params)
        u1, s1 = ref.update(g, s1, p1)
        u2, s2 = new.update(g, s2, p2)
        p1 = optax.apply_updates(p1, u1)
        p2 = optax.apply_updates(p2, u2)
    for x, y in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_adam_nu_bf16_sr_unbiased_ema():
    """TPU.OPT_NU_DTYPE=bfloat16_sr: nu's 0.999-EMA increments (~0.1%
    relative) sit below the bf16 ulp (2^-8), so DETERMINISTIC bf16
    rounding would freeze nu; stochastic rounding keeps the EMA unbiased
    in expectation. 50 constant-gradient steps must track the exact EMA
    closed form within 2%, and the single-value rounding mean must land
    between the two bf16 neighbors at the right split."""
    import optax

    from sunet_tf_tpu.train.adam import _stochastic_round_bf16, adam_lp

    # unbiasedness over independent dithers (the dither is a SCALAR per
    # array write — unbiased marginally, independent across steps)
    rs = jax.random.bits(jax.random.key(0), (4096,),
                         jnp.uint32) & jnp.uint32(0xFFFF)
    x = jnp.full((4096,), 1.0001e-3, jnp.float32)
    r = jax.vmap(_stochastic_round_bf16)(rs, x).astype(jnp.float32)
    assert abs(float(r.mean()) - 1.0001e-3) / 1.0001e-3 < 1e-3
    assert len(np.unique(np.asarray(r))) == 2  # the two bf16 neighbors

    # EMA tracking: 8 leaves = 8 independent dither streams to average
    params = {f"w{i}": jnp.ones((8, 8), jnp.float32) for i in range(8)}
    tx = adam_lp(lambda c: jnp.float32(1e-3), nu_dtype=jnp.bfloat16,
                 stochastic_round_nu=True)
    s = tx.init(params)
    assert all(l.dtype == jnp.bfloat16 for l in jax.tree.leaves(s[0].nu))
    p = params
    for _ in range(50):
        g = jax.tree.map(lambda q: jnp.full(q.shape, 0.1), p)
        u, s = tx.update(g, s, p)
        p = optax.apply_updates(p, u)
    nu = float(np.mean([np.asarray(v.astype(jnp.float32)).mean()
                        for v in jax.tree.leaves(s[0].nu)]))
    exact = 0.01 * (1.0 - 0.999 ** 50)
    assert abs(nu - exact) / exact < 0.02, (nu, exact)


def test_opt_nu_dtype_knob_and_restore(tmp_path):
    """TPU.OPT_NU_DTYPE wires through make_optimizer (state tree matches
    optax.adam's, first-step update close to fp32) and checkpoints
    restore across the dtype change (orbax casts to the skeleton)."""
    from sunet_tf_tpu.ckpt import restore_checkpoint, save_checkpoint
    from sunet_tf_tpu.config import Config, config_from_dict, config_to_dict
    from sunet_tf_tpu.train.loop import make_optimizer

    base = Config()
    # bf16+stochastic-rounding storage is the default (unbiased EMA,
    # ~1 HBM pass off the roofline-bound update; fp32 is the
    # reference-exact opt-out)
    assert base.tpu.opt_nu_dtype == "bfloat16_sr"
    rt = config_from_dict(config_to_dict(base.replace(tpu=base.tpu.__class__(
        **{**base.tpu.__dict__, "opt_nu_dtype": "float32"}))))
    assert rt.tpu.opt_nu_dtype == "float32"  # YAML round-trip

    cfg32 = base.replace(tpu=base.tpu.__class__(
        **{**base.tpu.__dict__, "opt_nu_dtype": "float32"}))
    cfgsr = base  # the default
    params = {"w": jnp.ones((8, 8), jnp.float32)}
    grads = {"w": jnp.full((8, 8), 0.125, jnp.float32)}
    tx32 = make_optimizer(cfg32, steps_per_epoch=1)
    txsr = make_optimizer(cfgsr, steps_per_epoch=1)
    s32, ssr = tx32.init(params), txsr.init(params)
    assert jax.tree.structure(s32) == jax.tree.structure(ssr)
    u32, _ = tx32.update(grads, s32, params)
    usr, _ = txsr.update(grads, ssr, params)
    np.testing.assert_allclose(np.asarray(u32["w"]), np.asarray(usr["w"]),
                               rtol=1e-2, atol=1e-8)

    opt = {"nu": jnp.full((4, 4), 0.25, jnp.float32),
           "count": jnp.zeros((), jnp.int32)}
    save_checkpoint(str(tmp_path), "latest", params, opt_state=opt, epoch=1)
    skel = {"nu": jnp.zeros((4, 4), jnp.bfloat16),
            "count": jnp.zeros((), jnp.int32)}
    out = restore_checkpoint(os.path.join(str(tmp_path), "latest"), params,
                             opt_state_like=skel)
    assert out["opt_state"]["nu"].dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(out["opt_state"]["nu"].astype(jnp.float32)), 0.25)

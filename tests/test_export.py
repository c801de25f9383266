"""AOT export/serving artifact tests (sunet_tf_tpu/infer/export.py).

The reference has no serving story (demo.py runs inside the training
checkout); the rebuild's jax.export artifact must replay the live model
bit-exactly and route request batches to the right bucket.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import nnx

from sunet_tf_tpu.config import tiny_config
from sunet_tf_tpu.infer.export import ServingModel, save_exported
from sunet_tf_tpu.models.sunet import build_model


@pytest.fixture(scope="module")
def exported(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("artifact"))
    model = build_model(tiny_config())
    graphdef, params = nnx.split(model, nnx.Param)
    meta = save_exported(out, graphdef, params, resolution=64,
                         batches=(1, 2))
    live = jax.jit(lambda p, x: nnx.merge(graphdef, p)(x))
    return out, params, live, meta


def test_export_reload_bit_parity(exported):
    out, params, live, _ = exported
    sm = ServingModel(out)
    x = jax.random.uniform(jax.random.key(0), (2, 64, 64, 3))
    np.testing.assert_array_equal(np.asarray(sm(params, x)),
                                  np.asarray(live(params, x)))


def test_export_bucket_routing(exported):
    """n=1 uses the b1 bucket, n=3 chunks through the b2 bucket with a
    padded tail — both must equal the live forward on the same rows."""
    out, params, live, _ = exported
    sm = ServingModel(out)
    x = jax.random.uniform(jax.random.key(1), (3, 64, 64, 3))
    got = sm(params, x)
    assert got.shape[0] == 3
    np.testing.assert_array_equal(np.asarray(got), np.asarray(live(params, x)))
    one = sm(params, x[:1])
    np.testing.assert_array_equal(np.asarray(one), np.asarray(live(params, x[:1])))


def test_export_leaf_count_guard(exported):
    """A checkpoint from a different architecture (wrong leaf count) is
    rejected up front instead of producing garbage."""
    out, params, _, meta = exported
    sm = ServingModel(out)
    assert meta["num_param_leaves"] == len(jax.tree.leaves(params))
    bad = jax.tree.leaves(params)[:-1]
    with pytest.raises(AssertionError, match="leaves"):
        sm(bad, jnp.zeros((1, 64, 64, 3)))


def test_export_weights_agnostic(exported):
    """One artifact serves ANY checkpoint of the architecture: calling with
    perturbed params must track the live model under the same params (the
    weights are call arguments, not baked constants)."""
    out, params, live, _ = exported
    sm = ServingModel(out)
    params2 = jax.tree.map(lambda a: a + 0.01, params)
    x = jax.random.uniform(jax.random.key(2), (1, 64, 64, 3))
    np.testing.assert_array_equal(np.asarray(sm(params2, x)),
                                  np.asarray(live(params2, x)))
    assert np.abs(np.asarray(sm(params2, x)) -
                  np.asarray(live(params, x))).max() > 0


def test_export_tiled_nonsquare_canvas(exported, tmp_path):
    """VERDICT r4 #8: the arbitrary-resolution tiled program exports as a
    per-canvas-bucket artifact (pad+tile+forward+fold in ONE exported fn)
    and replays the live TiledRunner bit-exactly on a non-square canvas."""
    from sunet_tf_tpu.infer.export import TiledServingModel, save_exported_tiled
    from sunet_tf_tpu.infer.tiled import TiledRunner

    _, params, _, _ = exported
    model = build_model(tiny_config())
    graphdef, _ = nnx.split(model, nnx.Param)
    out = str(tmp_path / "tiled_artifact")

    def model_fn(p, t):
        return nnx.merge(graphdef, p)(t)

    runner = TiledRunner(model_fn, params, kernel=64, stride=32)
    img = jax.random.uniform(jax.random.key(2), (1, 70, 130, 3))
    live = runner(img)

    bucket = runner.bucket(70, 130)
    assert bucket[0] != bucket[1]  # non-square canvas
    meta = save_exported_tiled(out, graphdef, params, [bucket],
                               kernel=64, stride=32)
    assert meta["buckets"] == [list(bucket)]
    sm = TiledServingModel(out)
    got = sm(params, img)
    assert got.shape == live.shape
    np.testing.assert_array_equal(np.asarray(got), np.asarray(live))

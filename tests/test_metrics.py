"""Metrics: exact numpy vs sklearn; streaming histograms vs exact."""

import jax.numpy as jnp
import numpy as np
import pytest

from sunet_tf_tpu.ops.metrics import (
    auprc_exact,
    auprc_from_histograms,
    auroc_exact,
    auroc_from_histograms,
    collect_scores,
    init_histograms,
    tpr_fpr,
    update_histograms,
)

RNG = np.random.default_rng(11)


def _labeled_scores(n=5000, sep=1.0):
    y = (RNG.random(n) > 0.7).astype(np.uint8)
    s = np.clip(RNG.normal(0.4 + sep * 0.2 * y, 0.15), 0, 1)
    return y, s.astype(np.float64)


def test_auroc_exact_vs_sklearn():
    sk = pytest.importorskip("sklearn.metrics")
    y, s = _labeled_scores()
    assert abs(auroc_exact(y, s) - sk.roc_auc_score(y, s)) < 1e-12


def test_auroc_exact_handles_ties():
    sk = pytest.importorskip("sklearn.metrics")
    y, s = _labeled_scores()
    s = np.round(s, 2)  # heavy ties
    assert abs(auroc_exact(y, s) - sk.roc_auc_score(y, s)) < 1e-12


def test_auprc_exact_vs_sklearn():
    sk = pytest.importorskip("sklearn.metrics")
    y, s = _labeled_scores()
    assert abs(auprc_exact(y, s) - sk.average_precision_score(y, s)) < 1e-12
    s = np.round(s, 2)
    assert abs(auprc_exact(y, s) - sk.average_precision_score(y, s)) < 1e-12


def test_histogram_streaming_close_to_exact():
    y, s = _labeled_scores(n=20000)
    h = init_histograms()
    # stream in 4 chunks, as an eval loop would
    for i in range(4):
        sl = slice(i * 5000, (i + 1) * 5000)
        h = update_histograms(h, jnp.asarray(s[sl]), jnp.asarray(y[sl]))
    assert abs(auroc_from_histograms(h) - auroc_exact(y, s)) < 2e-3
    assert abs(auprc_from_histograms(h) - auprc_exact(y, s)) < 5e-3


def test_histogram_degenerate_single_class():
    h = init_histograms(64)
    h = update_histograms(h, jnp.asarray([0.1, 0.9]), jnp.asarray([1.0, 1.0]))
    assert np.isnan(auroc_from_histograms(h))


def test_tpr_fpr_reference_thresholds():
    pred = np.array([[0, 128, 200, 255]], np.uint8)
    target = np.array([[0, 255, 100, 255]], np.uint8)
    # pred>127 -> [F,T,T,T]; gt>200 -> [F,T,F,T]
    tpr, fpr = tpr_fpr(pred, target)
    assert tpr == 1.0  # both positives hit
    assert fpr == 0.5  # 1 of 2 negatives predicted positive


def test_collect_scores_cap():
    rng = np.random.default_rng(0)
    bs, bt = [], []
    n = collect_scores(np.ones(150), np.ones(150), bs, bt, cap=100, collected=0, rng=rng)
    assert n == 100 and sum(x.size for x in bs) == 100
    n = collect_scores(np.ones(50), np.ones(50), bs, bt, cap=100, collected=n, rng=rng)
    assert n == 100 and sum(x.size for x in bs) == 100  # saturated
    # cap<=0 means unbounded
    bs2, bt2 = [], []
    n2 = collect_scores(np.ones(150), np.ones(150), bs2, bt2, cap=0, collected=0, rng=rng)
    assert n2 == 150

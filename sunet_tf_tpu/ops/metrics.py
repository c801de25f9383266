"""Classification metrics: AUROC / AUPRC / TPR-FPR.

Two implementations:

- Exact host-side AUROC (rank/Mann-Whitney with tie handling, identical to
  sklearn.roc_auc_score) and AUPRC (sklearn average_precision_score's
  step-sum definition) in pure numpy — the reference's eval math
  (train.py:384-385,491-492) without the sklearn dependency.
- On-device *streaming* histogram versions: fixed-bin positive/negative
  score histograms accumulate inside the jitted eval step (no per-batch
  device->host sync, unlike reference train.py:354-364), and AUROC/AUPRC
  are computed from the histograms in closed form. With 8192 bins the
  approximation error is < 1e-3 for continuous scores.

Plus the reference's pixel subsampling collector semantics
(_collect_scores, train.py:252-269) and demo TPR/FPR thresholds
(demo_any_resolution.py:59-69).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

DEFAULT_BINS = 8192


# ---------------------------------------------------------------------------
# Exact host-side versions (numpy)
# ---------------------------------------------------------------------------

def auroc_exact(y_true: np.ndarray, y_score: np.ndarray) -> float:
    """Area under ROC via the rank statistic; ties get average ranks
    (matches sklearn.roc_auc_score exactly)."""
    y_true = np.asarray(y_true).ravel().astype(bool)
    y_score = np.asarray(y_score).ravel().astype(np.float64)
    n_pos = int(y_true.sum())
    n_neg = y_true.size - n_pos
    if n_pos == 0 or n_neg == 0:
        return float("nan")
    order = np.argsort(y_score, kind="mergesort")
    s = y_score[order]
    ranks = np.empty(s.size, dtype=np.float64)
    i = 0
    while i < s.size:
        j = i
        while j + 1 < s.size and s[j + 1] == s[i]:
            j += 1
        ranks[i : j + 1] = 0.5 * (i + j) + 1.0
        i = j + 1
    pos_ranks = ranks[y_true[order]]
    u = pos_ranks.sum() - n_pos * (n_pos + 1) / 2.0
    return float(u / (n_pos * n_neg))


def auprc_exact(y_true: np.ndarray, y_score: np.ndarray) -> float:
    """Average precision, sum_n (R_n - R_{n-1}) * P_n over descending
    thresholds (matches sklearn.average_precision_score)."""
    y_true = np.asarray(y_true).ravel().astype(np.float64)
    y_score = np.asarray(y_score).ravel().astype(np.float64)
    n_pos = y_true.sum()
    if n_pos == 0:
        return float("nan")
    order = np.argsort(-y_score, kind="mergesort")
    yt = y_true[order]
    ys = y_score[order]
    tp = np.cumsum(yt)
    fp = np.cumsum(1.0 - yt)
    # threshold boundaries: last index of each distinct score
    distinct = np.where(np.diff(ys))[0]
    idx = np.concatenate([distinct, [ys.size - 1]])
    tp, fp = tp[idx], fp[idx]
    precision = tp / np.maximum(tp + fp, 1e-12)
    recall = tp / n_pos
    prev_recall = np.concatenate([[0.0], recall[:-1]])
    return float(np.sum((recall - prev_recall) * precision))


def tpr_fpr(pred_u8: np.ndarray, target_u8: np.ndarray,
            pred_thresh: int = 127, target_thresh: int = 200) -> tuple:
    """TPR/FPR at the reference demo thresholds (pred>127, gt>200)."""
    p = (np.asarray(pred_u8) > pred_thresh).ravel()
    t = (np.asarray(target_u8) > target_thresh).ravel()
    tp = int(np.sum(p & t))
    fn = int(np.sum(~p & t))
    fp = int(np.sum(p & ~t))
    tn = int(np.sum(~p & ~t))
    tpr = tp / (tp + fn) if (tp + fn) > 0 else 0.0
    fpr = fp / (fp + tn) if (fp + tn) > 0 else 0.0
    return tpr, fpr


def collect_scores(y_score, y_true, buf_scores, buf_trues, cap, collected,
                   rng: np.random.Generator):
    """Reference _collect_scores: append with a global cap; when the batch
    overflows the cap, subsample without replacement (train.py:252-269)."""
    y_score = np.asarray(y_score).ravel()
    y_true = np.asarray(y_true).ravel()
    if cap <= 0:
        buf_scores.append(y_score)
        buf_trues.append(y_true)
        return collected + y_score.size
    remaining = cap - collected
    if remaining <= 0:
        return cap
    if y_score.size > remaining:
        idx = rng.choice(y_score.size, remaining, replace=False)
        buf_scores.append(y_score[idx])
        buf_trues.append(y_true[idx])
        return cap
    buf_scores.append(y_score)
    buf_trues.append(y_true)
    return collected + y_score.size


# ---------------------------------------------------------------------------
# Streaming on-device versions (histogram sketches)
# ---------------------------------------------------------------------------

def init_histograms(bins: int = DEFAULT_BINS) -> dict:
    return {
        "pos": jnp.zeros((bins,), jnp.float32),
        "neg": jnp.zeros((bins,), jnp.float32),
    }


def update_histograms(hists: dict, scores: jnp.ndarray, labels: jnp.ndarray,
                      sample_weight=None) -> dict:
    """Accumulate scores in [0,1] into pos/neg histograms. jit-friendly;
    call inside the eval/train step. labels: {0,1} float or bool.

    sample_weight: optional (B,) per-sample weights (0 excludes a sample —
    used to mask batch padding on the sharded eval path)."""
    bins = hists["pos"].shape[0]
    s = jnp.clip(scores.reshape(-1), 0.0, 1.0)
    idx = jnp.minimum((s * bins).astype(jnp.int32), bins - 1)
    lab = labels.reshape(-1).astype(jnp.float32)
    if sample_weight is None:
        w = jnp.ones_like(lab)
    else:
        per = lab.size // sample_weight.shape[0]
        w = jnp.repeat(sample_weight.astype(jnp.float32), per)
    pos = jnp.zeros((bins,), jnp.float32).at[idx].add(lab * w)
    neg = jnp.zeros((bins,), jnp.float32).at[idx].add((1.0 - lab) * w)
    return {"pos": hists["pos"] + pos, "neg": hists["neg"] + neg}


def auroc_from_histograms(hists: dict) -> float:
    """AUROC from score histograms; ties within a bin contribute 0.5
    (mirrors average-rank tie handling at bin granularity)."""
    pos = np.asarray(hists["pos"], dtype=np.float64)
    neg = np.asarray(hists["neg"], dtype=np.float64)
    n_pos, n_neg = pos.sum(), neg.sum()
    if n_pos == 0 or n_neg == 0:
        return float("nan")
    # For each positive-score bin b: all negatives in lower bins count 1,
    # negatives in the same bin count 0.5.
    neg_below = np.concatenate([[0.0], np.cumsum(neg)[:-1]])
    wins = (pos * (neg_below + 0.5 * neg)).sum()
    return float(wins / (n_pos * n_neg))


def auprc_from_histograms(hists: dict) -> float:
    """Average precision from histograms, descending-threshold step sum."""
    pos = np.asarray(hists["pos"], dtype=np.float64)[::-1]  # high->low score
    neg = np.asarray(hists["neg"], dtype=np.float64)[::-1]
    n_pos = pos.sum()
    if n_pos == 0:
        return float("nan")
    tp = np.cumsum(pos)
    fp = np.cumsum(neg)
    nonempty = (pos + neg) > 0
    precision = tp / np.maximum(tp + fp, 1e-12)
    recall = tp / n_pos
    prev = np.concatenate([[0.0], recall[:-1]])
    return float(np.sum(((recall - prev) * precision)[nonempty]))


def roc_curve_from_histograms(hists: dict) -> tuple:
    """(fpr, tpr) arrays for plotting (descending-threshold sweep)."""
    pos = np.asarray(hists["pos"], dtype=np.float64)[::-1]
    neg = np.asarray(hists["neg"], dtype=np.float64)[::-1]
    tp = np.cumsum(pos)
    fp = np.cumsum(neg)
    tpr = tp / max(tp[-1], 1e-12)
    fpr = fp / max(fp[-1], 1e-12)
    return np.concatenate([[0.0], fpr]), np.concatenate([[0.0], tpr])


def pr_curve_from_histograms(hists: dict) -> tuple:
    """(recall, precision) arrays for plotting."""
    pos = np.asarray(hists["pos"], dtype=np.float64)[::-1]
    neg = np.asarray(hists["neg"], dtype=np.float64)[::-1]
    tp = np.cumsum(pos)
    fp = np.cumsum(neg)
    precision = tp / np.maximum(tp + fp, 1e-12)
    recall = tp / max(tp[-1], 1e-12)
    return recall, precision

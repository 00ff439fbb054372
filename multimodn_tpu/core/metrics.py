"""Metrics: on-device confusion grids + host-side end-of-training suite.

In-loop metrics (loss / correct-count / tp / tn / fp / fn per (E+1, D) cell)
are produced *inside the jitted step* as plain sums — the reference instead
constructs a fresh torchmetrics ConfusionMatrix object per cell per batch
(reference ``multimodn/multimodn.py:154,188``), a Python-side overhead this
framework eliminates entirely.

The end-of-training suite ``get_performance_metrics`` reproduces the
reference's 15-tuple (reference ``multimodn.py:22-49``): (f1, auroc, accuracy,
sensitivity, specificity, fpr, tpr, precision, recall, tn, fp, fn, tp,
roc thresholds, pr thresholds). It runs host-side on epoch-concatenated
final-state probabilities (numpy) since it is called once per epoch at most.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

performance_metrics = [
    "f1", "auc", "accuracy", "sensitivity", "specificity", "fpr", "tpr",
    "precision", "recall", "tn", "fp", "fn", "tp", "thr_roc", "thr_pr",
]


# --------------------------------------------------------------------------
# On-device (jit-traceable) helpers
# --------------------------------------------------------------------------

def binary_confusion_counts(pred: jnp.ndarray, target: jnp.ndarray,
                            mask: Optional[jnp.ndarray] = None):
    """(tp, tn, fp, fn) sums over the last axis. All inputs (..., B)."""
    pred = pred.astype(jnp.int32)
    target = target.astype(jnp.int32)
    m = jnp.ones_like(pred, dtype=jnp.float32) if mask is None else mask.astype(jnp.float32)
    p1, t1 = (pred == 1), (target == 1)
    tp = jnp.sum(jnp.where(p1 & t1, m, 0.0), axis=-1)
    tn = jnp.sum(jnp.where(~p1 & ~t1, m, 0.0), axis=-1)
    fp = jnp.sum(jnp.where(p1 & ~t1, m, 0.0), axis=-1)
    fn = jnp.sum(jnp.where(~p1 & t1, m, 0.0), axis=-1)
    return tp, tn, fp, fn


def safe_div(num, denom):
    """num/denom with 0 where denom == 0 (reference ``multimodn.py:234-242``)."""
    return jnp.where(denom == 0, 0.0, num / jnp.where(denom == 0, 1.0, denom))


def masked_binary_auroc(probs: jnp.ndarray, labels: jnp.ndarray,
                        valid: jnp.ndarray) -> jnp.ndarray:
    """Exact binary AUROC on device via the rank-sum (Mann-Whitney U)
    statistic with tie-averaged ranks — identical to trapezoidal ROC
    integration (ties count 0.5).

    O(N log N): one sort + two searchsorted passes, all jit/vmap friendly —
    checkpoint selection runs INSIDE the fused multi-epoch program with zero
    host round-trips even at real MIMIC validation sizes (~10^4-10^5 rows),
    where the previous pairwise O(N^2) formulation would materialize a
    multi-GB (N, N) matrix. Property-tested against sklearn up to N=10^5
    (tests/test_metrics.py).
    """
    probs = probs.astype(jnp.float32)
    v = valid.astype(jnp.float32) > 0
    pos = v & (labels == 1)
    neg = v & (labels == 0)
    # Invalid rows get +inf: they occupy the top ranks without perturbing
    # the relative (tie-averaged) ranks of the valid rows below them.
    x = jnp.where(v, probs, jnp.inf)
    sorted_x = jnp.sort(x)
    left = jnp.searchsorted(sorted_x, x, side="left")
    right = jnp.searchsorted(sorted_x, x, side="right")
    # Tie-averaged 1-based rank: values tied over sorted slots
    # [left+1, right] average to (left + right + 1) / 2.
    rank = 0.5 * (left + right + 1).astype(jnp.float32)
    n_pos = jnp.sum(pos.astype(jnp.float32))
    n_neg = jnp.sum(neg.astype(jnp.float32))
    sum_pos_ranks = jnp.sum(jnp.where(pos, rank, 0.0))
    u = sum_pos_ranks - n_pos * (n_pos + 1.0) / 2.0
    denom = n_pos * n_neg
    return jnp.where(denom > 0, u / jnp.maximum(denom, 1.0), 0.0)


# --------------------------------------------------------------------------
# Host-side end-of-training suite (numpy)
# --------------------------------------------------------------------------

def _roc_curve(y_true: np.ndarray, y_prob: np.ndarray):
    """ROC curve at thresholds = descending unique probabilities, prefixed by a
    (0,0) point at threshold 1.0 — matching torchmetrics.ROC(task='binary')."""
    if y_true.size == 0:
        z = np.zeros(1)
        return z, z, np.ones(1)
    order = np.argsort(-y_prob, kind="stable")
    y_true = y_true[order]
    y_prob = y_prob[order]
    distinct = np.where(np.diff(y_prob))[0]
    idx = np.r_[distinct, y_true.size - 1]
    tps = np.cumsum(y_true)[idx].astype(np.float64)
    fps = (idx + 1) - tps
    n_pos = max(float(tps[-1]) if tps.size else 0.0, 0.0)
    n_neg = max(float(fps[-1]) if fps.size else 0.0, 0.0)
    tpr = tps / n_pos if n_pos > 0 else np.zeros_like(tps)
    fpr = fps / n_neg if n_neg > 0 else np.zeros_like(fps)
    tpr = np.r_[0.0, tpr]
    fpr = np.r_[0.0, fpr]
    thresholds = np.r_[1.0, y_prob[idx]]
    return fpr, tpr, thresholds


def _pr_curve(y_true: np.ndarray, y_prob: np.ndarray):
    """Precision-recall curve matching torchmetrics.PrecisionRecallCurve
    (binary): points at descending unique thresholds, final (p=1, r=0) anchor."""
    if y_true.size == 0:
        return np.ones(1), np.zeros(1), np.zeros(0)
    order = np.argsort(-y_prob, kind="stable")
    y_true = y_true[order]
    y_prob = y_prob[order]
    distinct = np.where(np.diff(y_prob))[0]
    idx = np.r_[distinct, y_true.size - 1]
    tps = np.cumsum(y_true)[idx].astype(np.float64)
    fps = (idx + 1) - tps
    n_pos = float(tps[-1]) if tps.size else 0.0
    precision = np.where(tps + fps > 0, tps / np.maximum(tps + fps, 1), 0.0)
    recall = tps / n_pos if n_pos > 0 else np.zeros_like(tps)
    # torchmetrics reverses to ascending-threshold order and anchors (1, 0).
    precision = np.r_[precision[::-1], 1.0]
    recall = np.r_[recall[::-1], 0.0]
    thresholds = y_prob[idx][::-1]
    return precision, recall, thresholds


def _auc_trapezoid(x: np.ndarray, y: np.ndarray) -> float:
    if x.size < 2:
        return 0.0
    return float(np.trapezoid(y, x))


def compute_metrics(tp, tn, fp, fn, cm, enc_idx, dec_idx):
    """Reference-compat helper (``multimodn/multimodn.py:51-63``): scatter
    one (2, 2) confusion matrix into the (E+1, D) count grids in place, or
    NaN-fill the cell when the decoder is non-binary (cm None). The fused
    training path never calls this — grids come from on-device reductions
    (core/fusion.py) — but reference user code imports it."""
    if cm is not None:
        cm = np.asarray(cm)
        tp[enc_idx][dec_idx] += cm[1][1]
        tn[enc_idx][dec_idx] += cm[0][0]
        fp[enc_idx][dec_idx] += cm[0][1]
        fn[enc_idx][dec_idx] += cm[1][0]
    else:
        tp[enc_idx][dec_idx] = float("nan")
        tn[enc_idx][dec_idx] = float("nan")
        fp[enc_idx][dec_idx] = float("nan")
        fn[enc_idx][dec_idx] = float("nan")


def get_performance_metrics(y_true, y_pred, y_prob) -> Tuple:
    """Binary-classification suite; same 15-tuple as the reference
    (``multimodn/multimodn.py:22-49``).

    Args:
        y_true: (N,) 0/1 ground truth.
        y_pred: (N,) 0/1 hard predictions (used for accuracy & confusion).
        y_prob: (N,) positive-class probabilities (used for f1/auroc/curves —
            torchmetrics thresholds probabilities at 0.5 for binary F1).
    """
    y_true = np.asarray(y_true).astype(np.int64).reshape(-1)
    y_pred = np.asarray(y_pred).astype(np.int64).reshape(-1)
    y_prob = np.asarray(y_prob, dtype=np.float64).reshape(-1)

    # F1 on thresholded probabilities (torchmetrics F1Score(task='binary')
    # applied to probs thresholds at 0.5 — reference multimodn.py:48).
    # STRICT > like torchmetrics' _binary_stat_scores_format (preds >
    # threshold): probability exactly 0.5 classifies negative.
    pred_t = (y_prob > 0.5).astype(np.int64)
    tp_f = float(np.sum((pred_t == 1) & (y_true == 1)))
    fp_f = float(np.sum((pred_t == 1) & (y_true == 0)))
    fn_f = float(np.sum((pred_t == 0) & (y_true == 1)))
    f1 = 2 * tp_f / (2 * tp_f + fp_f + fn_f) if (2 * tp_f + fp_f + fn_f) > 0 else 0.0

    fpr, tpr, thr_roc = _roc_curve(y_true, y_prob)
    auroc = _auc_trapezoid(fpr, tpr)

    accuracy = float(np.mean(y_pred == y_true)) if y_true.size else 0.0

    tp = float(np.sum((y_pred == 1) & (y_true == 1)))
    tn = float(np.sum((y_pred == 0) & (y_true == 0)))
    fp = float(np.sum((y_pred == 1) & (y_true == 0)))
    fn = float(np.sum((y_pred == 0) & (y_true == 1)))
    sensitivity = tp / (tp + fn) if (tp + fn) != 0 else 0
    specificity = tn / (tn + fp) if (tn + fp) != 0 else 0

    precision, recall, thr_pr = _pr_curve(y_true, y_prob)

    return (f1, auroc, accuracy, sensitivity, specificity, fpr, tpr,
            precision, recall, tn, fp, fn, tp, thr_roc, thr_pr)

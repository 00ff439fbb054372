"""Metrics unit tier: ROC/PR/AUROC/F1 vs sklearn, on-device AUROC vs host,
confusion counts, safe division."""
import numpy as np
import pytest

import jax.numpy as jnp

from multimodn_tpu.core.metrics import (
    _pr_curve,
    _roc_curve,
    binary_confusion_counts,
    get_performance_metrics,
    masked_binary_auroc,
    safe_div,
)


def _case(n=200, seed=0):
    rng = np.random.default_rng(seed)
    y = rng.integers(0, 2, size=n)
    p = np.clip(0.5 * y + 0.4 * rng.random(n), 0, 1)
    return y, p


def test_auroc_matches_sklearn():
    from sklearn.metrics import roc_auc_score
    y, p = _case()
    suite = get_performance_metrics(y, (p >= 0.5).astype(int), p)
    assert suite[1] == pytest.approx(roc_auc_score(y, p), abs=1e-9)


def test_roc_curve_matches_sklearn():
    from sklearn.metrics import roc_curve
    y, p = _case(seed=1)
    fpr, tpr, thr = _roc_curve(y, p)
    sk_fpr, sk_tpr, sk_thr = roc_curve(y, p, drop_intermediate=False)
    np.testing.assert_allclose(fpr, sk_fpr, atol=1e-12)
    np.testing.assert_allclose(tpr, sk_tpr, atol=1e-12)
    np.testing.assert_allclose(thr[1:], sk_thr[1:], atol=1e-12)


def test_pr_curve_matches_sklearn():
    from sklearn.metrics import precision_recall_curve
    y, p = _case(seed=2)
    prec, rec, thr = _pr_curve(y, p)
    sk_p, sk_r, sk_t = precision_recall_curve(y, p)
    np.testing.assert_allclose(prec, sk_p, atol=1e-12)
    np.testing.assert_allclose(rec, sk_r, atol=1e-12)
    np.testing.assert_allclose(thr, sk_t, atol=1e-12)


def test_f1_matches_sklearn_thresholded():
    from sklearn.metrics import f1_score
    y, p = _case(seed=3)
    suite = get_performance_metrics(y, (p >= 0.5).astype(int), p)
    assert suite[0] == pytest.approx(f1_score(y, p >= 0.5), abs=1e-9)


def test_device_auroc_matches_host():
    from sklearn.metrics import roc_auc_score
    y, p = _case(seed=4)
    auc = float(masked_binary_auroc(jnp.asarray(p), jnp.asarray(y),
                                    jnp.ones_like(jnp.asarray(p))))
    assert auc == pytest.approx(roc_auc_score(y, p), abs=1e-6)


def test_device_auroc_respects_mask():
    from sklearn.metrics import roc_auc_score
    y, p = _case(seed=5)
    valid = np.zeros_like(p)
    valid[:120] = 1
    auc = float(masked_binary_auroc(jnp.asarray(p), jnp.asarray(y),
                                    jnp.asarray(valid)))
    assert auc == pytest.approx(roc_auc_score(y[:120], p[:120]), abs=1e-6)


def test_device_auroc_ties_count_half():
    p = jnp.asarray([0.5, 0.5, 0.5, 0.5])
    y = jnp.asarray([1, 0, 1, 0])
    auc = float(masked_binary_auroc(p, y, jnp.ones(4)))
    assert auc == pytest.approx(0.5)


def test_confusion_counts():
    pred = jnp.asarray([1, 0, 1, 0, 1])
    tgt = jnp.asarray([1, 0, 0, 1, 1])
    mask = jnp.asarray([1.0, 1.0, 1.0, 1.0, 0.0])
    tp, tn, fp, fn = binary_confusion_counts(pred, tgt, mask)
    assert (float(tp), float(tn), float(fp), float(fn)) == (1, 1, 1, 1)


def test_safe_div_zero_denominator():
    out = safe_div(jnp.asarray([1.0, 0.0]), jnp.asarray([0.0, 0.0]))
    np.testing.assert_array_equal(np.asarray(out), [0.0, 0.0])


def test_suite_sensitivity_specificity_zero_guard():
    # all-negative ground truth: sensitivity denominator 0 -> 0 (reference
    # multimodn.py:36-43).
    y = np.zeros(10, dtype=int)
    p = np.linspace(0.1, 0.4, 10)
    suite = get_performance_metrics(y, (p >= 0.5).astype(int), p)
    assert suite[3] == 0
    assert suite[4] == 1.0


def test_device_auroc_large_n_vs_sklearn():
    """Rank-based AUROC property check vs sklearn at N up to 1e5, with ties
    (quantized probs) and a validity mask."""
    from sklearn.metrics import roc_auc_score

    for n, q, seed in ((1_000, 50, 0), (20_000, 200, 1), (100_000, 1000, 2)):
        rng = np.random.default_rng(seed)
        y = (rng.random(n) < 0.3).astype(np.int32)
        # Quantize to force heavy ties.
        p = np.round(rng.random(n) * q) / q
        m = (rng.random(n) < 0.9).astype(np.float32)
        keep = m > 0
        expected = roc_auc_score(y[keep], p[keep])
        got = float(masked_binary_auroc(jnp.asarray(p.astype(np.float32)),
                                        jnp.asarray(y), jnp.asarray(m)))
        np.testing.assert_allclose(got, expected, rtol=2e-5, atol=2e-6)


def test_device_auroc_degenerate_classes():
    """All-positive or all-negative (or fully masked) inputs return 0."""
    p = jnp.asarray(np.random.default_rng(0).random(32).astype(np.float32))
    ones, zeros = jnp.ones(32, jnp.int32), jnp.zeros(32, jnp.int32)
    assert float(masked_binary_auroc(p, ones, jnp.ones(32))) == 0.0
    assert float(masked_binary_auroc(p, zeros, jnp.ones(32))) == 0.0
    assert float(masked_binary_auroc(p, ones, jnp.zeros(32))) == 0.0


def test_performance_metrics_empty_input_degenerate():
    """Zero-sample evaluation returns the degenerate tuple instead of
    IndexError (empty fold/class-filtered sets)."""
    t = get_performance_metrics(np.zeros(0), np.zeros(0), np.zeros(0))
    assert len(t) == 15
    assert t[0] == 0.0 and t[1] == 0.0 and t[2] == 0.0


def test_f1_threshold_strict_greater():
    """torchmetrics binarizes with STRICT > 0.5 (preds > threshold): a
    probability of exactly 0.5 classifies negative (review finding; the
    oracle stub previously shared the >= bug)."""
    from multimodn_tpu.core.metrics import get_performance_metrics

    y_true = np.array([1, 0, 1, 0])
    y_prob = np.array([0.5, 0.5, 0.9, 0.1])
    y_pred = (y_prob > 0.5).astype(np.int64)
    f1 = get_performance_metrics(y_true, y_pred, y_prob)[0]
    # Exactly-0.5 rows predicted negative: tp=1 (0.9), fn=1 (0.5-pos),
    # fp=0 -> f1 = 2*1 / (2*1 + 0 + 1) = 2/3.
    np.testing.assert_allclose(float(f1), 2.0 / 3.0, rtol=1e-6)

"""Load and run the ACTUAL reference implementation as a parity oracle.

The reference (``/root/reference/multimodn``) imports ``torchmetrics`` and
``torchsummary``, neither of which is installable here (no network). Both are
used only through a tiny surface — binary ConfusionMatrix / F1Score / ROC /
PrecisionRecallCurve / Accuracy / AUROC (reference ``multimodn/multimodn.py:
16,22-49,154``) and ``torchsummary.summary`` (``:14,494-507``) — so this
module registers minimal, semantics-faithful stubs in ``sys.modules`` and
then imports the reference package itself. Tests built on this execute the
reference's real ``train_epoch``/``test``/``predict``/``get_states`` code
paths, not a re-implementation.

Import isolation: the repo ships a ``multimodn`` compatibility shim with the
same package name as the reference. ``load_reference()`` temporarily swaps
``sys.modules`` entries so the reference package loads from
``/root/reference`` without disturbing the repo's packages; the loaded
reference modules are kept alive in ``_REF_MODULES``.
"""
from __future__ import annotations

import sys
import types

import numpy as np
import torch

_REF_PATH = "/root/reference"
_REF_MODULES: dict = {}


# ---------------------------------------------------------------------------
# torchmetrics / torchsummary stubs (binary task only — the only reachable
# configuration in the reference: every shipped pipeline uses n_classes == 2)
# ---------------------------------------------------------------------------

def _np(t):
    return t.detach().cpu().numpy() if isinstance(t, torch.Tensor) else np.asarray(t)


def _binarize(preds: np.ndarray) -> np.ndarray:
    """torchmetrics binary semantics: float inputs are probabilities
    thresholded at 0.5; integer inputs are hard labels."""
    if preds.dtype.kind == "f":
        return (preds > 0.5).astype(np.int64)   # torchmetrics: strict >
    return preds.astype(np.int64)


class _BinaryMetric:
    def __init__(self, *args, task="binary", **kwargs):
        if task != "binary":
            raise NotImplementedError(
                "stub torchmetrics supports task='binary' only")

    def to(self, device):
        return self

    @staticmethod
    def _check(preds, target):
        p, t = _np(preds), _np(target)
        if p.shape != t.shape:
            # torchmetrics raises on mismatched shapes; keeping the stub
            # shape-strict preserves the reference's reachable crash modes
            # (e.g. test() with a NaN-skipped last encoder).
            raise ValueError(
                f"preds shape {p.shape} != target shape {t.shape}")
        return p.reshape(-1), t.reshape(-1)


class ConfusionMatrix(_BinaryMetric):
    """2x2 count matrix, rows=true class, cols=predicted class
    (cm[0][0]=tn, cm[0][1]=fp, cm[1][0]=fn, cm[1][1]=tp) — the layout the
    reference's compute_metrics reads (multimodn.py:51-63)."""

    def __call__(self, preds, target):
        p, t = self._check(preds, target)
        p = _binarize(p)
        t = t.astype(np.int64)
        cm = np.zeros((2, 2), np.int64)
        np.add.at(cm, (t, p), 1)
        return torch.from_numpy(cm)


class Accuracy(_BinaryMetric):
    def __call__(self, preds, target):
        p, t = self._check(preds, target)
        p = _binarize(p)
        return torch.tensor(float(np.mean(p == t.astype(np.int64))))


class F1Score(_BinaryMetric):
    def __call__(self, preds, target):
        p, t = self._check(preds, target)
        p = _binarize(p)
        t = t.astype(np.int64)
        tp = float(np.sum((p == 1) & (t == 1)))
        fp = float(np.sum((p == 1) & (t == 0)))
        fn = float(np.sum((p == 0) & (t == 1)))
        denom = 2 * tp + fp + fn
        return torch.tensor(2 * tp / denom if denom > 0 else 0.0)


# The curve/AUROC stubs are implemented INDEPENDENTLY of
# multimodn_tpu.core.metrics (brute-force per-threshold sweeps and the
# pairwise Mann-Whitney statistic) so parity tests cannot pass circularly:
# a bug in the repo's fast curve code would show up against these.

def _brute_roc(y_true, y_prob):
    """torchmetrics binary ROC: points at descending unique thresholds,
    prefixed by the (0, 0) anchor at threshold 1.0 — each point computed by
    an O(N) sweep at that threshold."""
    thresholds = np.concatenate([[1.0], np.unique(y_prob)[::-1]])
    # torchmetrics dedups: if max prob == 1.0 the anchor merges. Copy to a
    # contiguous descending array (torch rejects negative strides).
    thresholds = np.ascontiguousarray(np.unique(thresholds)[::-1])
    n_pos = max(int((y_true == 1).sum()), 0)
    n_neg = max(int((y_true == 0).sum()), 0)
    fpr, tpr = [], []
    for t in thresholds:
        pred = y_prob >= t
        tp = int(np.sum(pred & (y_true == 1)))
        fp = int(np.sum(pred & (y_true == 0)))
        tpr.append(tp / n_pos if n_pos else 0.0)
        fpr.append(fp / n_neg if n_neg else 0.0)
    return (np.asarray(fpr, np.float64), np.asarray(tpr, np.float64),
            np.asarray(thresholds, np.float64))


class ROC(_BinaryMetric):
    def __call__(self, preds, target):
        p, t = self._check(preds, target)
        fpr, tpr, thr = _brute_roc(t.astype(np.int64), p.astype(np.float64))
        return (torch.from_numpy(fpr), torch.from_numpy(tpr),
                torch.from_numpy(thr))


class AUROC(_BinaryMetric):
    def __call__(self, preds, target):
        # Pairwise Mann-Whitney (ties 0.5) — algebraically equals the
        # trapezoidal ROC integral, computed by a different algorithm.
        p, t = self._check(preds, target)
        t = t.astype(np.int64)
        pos = p[t == 1]
        neg = p[t == 0]
        if pos.size == 0 or neg.size == 0:
            return torch.tensor(0.0)
        diff = pos[:, None] - neg[None, :]
        wins = (diff > 0).sum() + 0.5 * (diff == 0).sum()
        return torch.tensor(float(wins) / (pos.size * neg.size))


class PrecisionRecallCurve(_BinaryMetric):
    def __call__(self, preds, target):
        p, t = self._check(preds, target)
        t = t.astype(np.int64)
        thresholds = np.unique(p.astype(np.float64))        # ascending
        n_pos = int((t == 1).sum())
        prec, rec = [], []
        for thr in thresholds:
            pred = p >= thr
            tp = int(np.sum(pred & (t == 1)))
            fp = int(np.sum(pred & (t == 0)))
            prec.append(tp / (tp + fp) if (tp + fp) else 0.0)
            rec.append(tp / n_pos if n_pos else 0.0)
        # torchmetrics anchors (precision=1, recall=0) at the end.
        prec.append(1.0)
        rec.append(0.0)
        return (torch.from_numpy(np.asarray(prec, np.float64)),
                torch.from_numpy(np.asarray(rec, np.float64)),
                torch.from_numpy(np.asarray(thresholds, np.float64)))


def install_stubs():
    if "torchmetrics" not in sys.modules:
        tm = types.ModuleType("torchmetrics")
        tm.ConfusionMatrix = ConfusionMatrix
        tm.F1Score = F1Score
        tm.ROC = ROC
        tm.PrecisionRecallCurve = PrecisionRecallCurve
        tm.Accuracy = Accuracy
        tm.AUROC = AUROC
        sys.modules["torchmetrics"] = tm
    if "torchsummary" not in sys.modules:
        ts = types.ModuleType("torchsummary")
        ts.summary = lambda *a, **k: None
        sys.modules["torchsummary"] = ts


# ---------------------------------------------------------------------------
# Reference package loading (name-collision safe)
# ---------------------------------------------------------------------------

def load_reference():
    """Import and return the reference ``multimodn.multimodn`` module from
    /root/reference, leaving the repo's own ``multimodn`` shim untouched."""
    if _REF_MODULES:
        return _REF_MODULES["multimodn.multimodn"]
    install_stubs()
    saved = {}
    for name in list(sys.modules):
        if name == "multimodn" or name.startswith("multimodn."):
            saved[name] = sys.modules.pop(name)
    sys.path.insert(0, _REF_PATH)
    try:
        import multimodn.multimodn  # noqa: F401  (reference package)
        for name in list(sys.modules):
            if name == "multimodn" or name.startswith("multimodn."):
                _REF_MODULES[name] = sys.modules.pop(name)
    finally:
        sys.path.remove(_REF_PATH)
        sys.modules.update(saved)
    return _REF_MODULES["multimodn.multimodn"]


def ref_module(name: str):
    """Fetch a submodule of the loaded reference package, e.g.
    ``ref_module('multimodn.encoders.mlp_encoder')``."""
    load_reference()
    if name not in _REF_MODULES:
        # Import on demand inside the reference namespace.
        saved = {}
        for mod in list(sys.modules):
            if mod == "multimodn" or mod.startswith("multimodn."):
                saved[mod] = sys.modules.pop(mod)
        sys.modules.update(_REF_MODULES)
        sys.path.insert(0, _REF_PATH)
        try:
            __import__(name)
            for mod in list(sys.modules):
                if mod == "multimodn" or mod.startswith("multimodn."):
                    _REF_MODULES[mod] = sys.modules.pop(mod)
        finally:
            sys.path.remove(_REF_PATH)
            sys.modules.update(saved)
    return _REF_MODULES[name]


# ---------------------------------------------------------------------------
# Weight transplant: MultiModN-TPU param pytree -> reference torch modules
# ---------------------------------------------------------------------------

def _load_linears(linears, jax_layers):
    assert len(linears) == len(jax_layers), \
        f"layer count mismatch: {len(linears)} torch vs {len(jax_layers)} jax"
    for tl, jl in zip(linears, jax_layers):
        tl.weight.data = torch.from_numpy(np.asarray(jl["w"]).T.copy())
        tl.bias.data = torch.from_numpy(np.asarray(jl["b"]).copy())


def _load_recurrents(cells, jax_layers):
    for tl, jl in zip(cells, jax_layers):
        tl.weight_ih_l0.data = torch.from_numpy(np.asarray(jl["w_ih"]).T.copy())
        tl.weight_hh_l0.data = torch.from_numpy(np.asarray(jl["w_hh"]).T.copy())
        tl.bias_ih_l0.data = torch.from_numpy(np.asarray(jl["b_ih"]).copy())
        tl.bias_hh_l0.data = torch.from_numpy(np.asarray(jl["b_hh"]).copy())


def transplant_reference(ref_model, params: dict):
    """Copy a MultiModN-TPU ``state_dict()`` into a reference MultiModN."""
    ref_model.init_state.state_value.data = torch.from_numpy(
        np.asarray(params["init_state"]["value"]).copy())
    for enc, p in zip(ref_model.encoders, params["encoders"]):
        if isinstance(getattr(enc, "layers", None), torch.nn.ModuleList) and \
                any(isinstance(l, (torch.nn.LSTM, torch.nn.RNN))
                    for l in enc.layers):
            _load_recurrents(list(enc.layers), p["layers"])
        else:
            _load_linears(
                [l for l in enc.layers if isinstance(l, torch.nn.Linear)],
                p["layers"])
    for dec, p in zip(ref_model.decoders, params["decoders"]):
        if hasattr(dec, "fc"):
            _load_linears([dec.fc], p["layers"])
        else:
            _load_linears(
                [l for l in dec.layers if isinstance(l, torch.nn.Linear)],
                p["layers"])


# ---------------------------------------------------------------------------
# Batch adapters
# ---------------------------------------------------------------------------

def reference_batches(loader, encoder_sequence=None):
    """Materialize an ArrayLoader's epoch as reference-style batches:
    a list of (data_tensor_list, target_tensor[, sequence_tensor]) tuples
    with padded rows dropped. The reference's epoch loops only need
    ``len()`` and iteration, so a plain list stands in for a DataLoader."""
    out = []
    for data, targets, mask in loader.numpy_batches():
        keep = mask > 0
        item = [[torch.from_numpy(np.ascontiguousarray(d[keep]))
                 for d in data],
                torch.from_numpy(np.ascontiguousarray(targets[keep]))]
        if encoder_sequence is not None:
            seq = np.tile(np.asarray(encoder_sequence)[None, :],
                          (int(keep.sum()), 1))
            item.append(torch.from_numpy(seq))
        out.append(tuple(item))
    return out


def load_reference_haim():
    """Load the reference's HAIM baseline (pipelines/mimic/haim_api.py) —
    it imports the reference multimodn package, so the reference namespace
    is swapped in during exec. The module's own sys.path.append of the
    reference root is trimmed afterwards."""
    load_reference()
    import importlib.util
    saved = {}
    for name in list(sys.modules):
        if name == "multimodn" or name.startswith("multimodn."):
            saved[name] = sys.modules.pop(name)
    sys.modules.update(_REF_MODULES)
    path_before = list(sys.path)
    try:
        spec = importlib.util.spec_from_file_location(
            "_ref_haim_api", f"{_REF_PATH}/pipelines/mimic/haim_api.py")
        mod = importlib.util.module_from_spec(spec)
        # haim_api.py reads sys.modules[__name__] at import (line 4), so the
        # module must be registered before exec.
        sys.modules["_ref_haim_api"] = mod
        spec.loader.exec_module(mod)
    finally:
        for name in list(sys.modules):
            if name == "multimodn" or name.startswith("multimodn."):
                _REF_MODULES[name] = sys.modules.pop(name)
        sys.modules.update(saved)
        sys.path[:] = path_before
    return mod

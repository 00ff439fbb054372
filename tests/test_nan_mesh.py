"""Batch-granular NaN skip on multi-device meshes (VERDICT r3 next-#1).

The MNAR headline's REQUIRED granularity is ``nan_skip='batch'``
(RESULTS.md: robustness collapses under 'sample'); the reference makes the
any-NaN decision over the WHOLE batch (``multimodn.py:167-169``). These
tests pin that the decision stays GLOBAL when the batch axis is sharded:

- auto engine (GSPMD-partitioned ``jnp.any``) on DP and DP x TP meshes,
- the explicit shard_map engine (psum'd flag, ``fusion.global_any``),

each against single-device execution, with NaNs deliberately confined to
ONE shard's rows — the exact case where a per-shard decision would train
7 of 8 shards on the degraded modality and silently break the MNAR
protocol's semantics.
"""
import numpy as np
import pytest

import jax

from multimodn_tpu import Adam, MultiModN, MultiModNHistory
from multimodn_tpu.data import ArrayLoader, PartitionDataset
from multimodn_tpu.decoders import LogisticDecoder
from multimodn_tpu.encoders import MLPEncoder
from multimodn_tpu.parallel import make_mesh


def _nan_dataset(n=64, batch=16, seed=0, nan_modality=1, widths=(3, 3)):
    """Every batch gets NaNs in ``nan_modality`` confined to its FIRST two
    rows — one shard's slice under 8-way batch sharding (batch 16 -> 2
    rows/shard), so a shard-local any-NaN decision would differ from the
    reference's global one on every other shard."""
    rng = np.random.default_rng(seed)
    X = rng.normal(size=(n, sum(widths))).astype(np.float32)
    y = (X @ rng.normal(size=sum(widths)) > 0).astype(np.int64)[:, None]
    lo = sum(widths[:nan_modality])
    for b in range(n // batch):
        X[b * batch:b * batch + 2, lo:lo + widths[nan_modality]] = np.nan
    return PartitionDataset(X, y, list(widths))


def _build(mesh=None, engine="auto", seed=0):
    return MultiModN(3, [MLPEncoder(3, 3, (4,)), MLPEncoder(3, 3, (4,))],
                     [LogisticDecoder(3)], 0.7, 0.3, nan_skip="batch",
                     mesh=mesh, dp_engine=engine, seed=seed)


def _run_fit(model, ds, epochs=3):
    h = MultiModNHistory(["t"])
    model.fit(ArrayLoader(ds, 16), Adam(0.01), "cross_entropy",
              epochs=epochs, history=h)
    return h, model.state_dict()


def _assert_runs_equal(h1, p1, h2, p2, epochs=3, msg=""):
    for e in range(epochs):
        for k in ("loss", "accuracy", "sensitivity", "specificity"):
            np.testing.assert_allclose(
                getattr(h1, k)["train"][e], getattr(h2, k)["train"][e],
                rtol=1e-5, atol=1e-6, err_msg=f"{msg} epoch {e} {k}")
    for a, b in zip(jax.tree_util.tree_leaves(p1),
                    jax.tree_util.tree_leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6, err_msg=msg)


@pytest.mark.parametrize("mesh_shape", [((8,), ("data",)),
                                        ((4, 2), ("data", "model"))])
def test_auto_engine_batch_skip_matches_single_device(mesh_shape):
    """DP and DP x TP: batch-granular skip with single-shard NaNs equals
    single-device bit-for-tolerance — GSPMD reduces the any-NaN globally."""
    ds = _nan_dataset()
    mesh = make_mesh(*mesh_shape)
    h1, p1 = _run_fit(_build(), ds)
    h2, p2 = _run_fit(_build(mesh), ds)
    _assert_runs_equal(h1, p1, h2, p2, msg=str(mesh_shape))


def test_auto_engine_batch_skip_freezes_degraded_encoder_on_mesh():
    """The skip must actually ENGAGE on the mesh: with every batch NaN in
    modality 1, encoder 1 never trains (Adam on identically-zero grads is a
    no-op), exactly like single-device batch-skip."""
    ds = _nan_dataset()
    mesh = make_mesh((8,), ("data",))
    m = _build(mesh)
    before = np.asarray(m.params["encoders"][1]["layers"][0]["w"])
    before0 = np.asarray(m.params["encoders"][0]["layers"][0]["w"])
    _run_fit(m, ds)
    after = np.asarray(m.params["encoders"][1]["layers"][0]["w"])
    after0 = np.asarray(m.params["encoders"][0]["layers"][0]["w"])
    np.testing.assert_array_equal(before, after)       # skipped everywhere
    assert not np.allclose(before0, after0)            # clean modality trains


def test_shard_map_engine_batch_skip_matches_auto():
    """The explicit engine's psum'd any-NaN flag: train_epoch, fused fit,
    and fused fit_best under nan_skip='batch' all equal the auto engine on
    the same single-shard-NaN data."""
    n_dev = len(jax.devices())
    ds = _nan_dataset(n=8 * n_dev, batch=2 * n_dev)
    rng = np.random.default_rng(3)
    Xv = rng.normal(size=(16, 6)).astype(np.float32)
    yv = (Xv @ rng.normal(size=6) > 0).astype(np.int64)[:, None]
    va = PartitionDataset(Xv, yv, [3, 3])
    mesh = make_mesh((n_dev,), ("data",))

    # train_epoch (looped) equality
    m_auto, m_sm = _build(), _build(mesh, "shard_map")
    h_a, h_s = MultiModNHistory(["t"]), MultiModNHistory(["t"])
    oa, os_ = Adam(0.01), Adam(0.01)
    for _ in range(2):
        m_auto.train_epoch(ArrayLoader(ds, 2 * n_dev), oa, "cross_entropy",
                           h_a)
        m_sm.train_epoch(ArrayLoader(ds, 2 * n_dev), os_, "cross_entropy",
                         h_s)
    _assert_runs_equal(h_a, m_auto.state_dict(), h_s, m_sm.state_dict(),
                       epochs=2, msg="train_epoch")

    # fused fit_best equality (selection included)
    m_auto, m_sm = _build(), _build(mesh, "shard_map")
    ra = m_auto.fit_best(ArrayLoader(ds, 2 * n_dev), Adam(0.01),
                         "cross_entropy", epochs=3,
                         val_loader=ArrayLoader(va, 16))
    rs = m_sm.fit_best(ArrayLoader(ds, 2 * n_dev), Adam(0.01),
                       "cross_entropy", epochs=3,
                       val_loader=ArrayLoader(va, 16))
    assert ra["best_epoch"] == rs["best_epoch"]
    np.testing.assert_allclose(ra["scores"], rs["scores"], rtol=1e-5,
                               atol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(m_auto.state_dict()),
                    jax.tree_util.tree_leaves(m_sm.state_dict())):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_shard_map_engine_batch_skip_freezes_degraded_encoder():
    """Global-decision litmus on the explicit engine: NaNs live ONLY in
    shard 0's rows, yet encoder 1 must never update on ANY shard. A
    shard-local decision would let shards 1..7 push non-zero psum'd grads
    into encoder 1 and this equality would fail."""
    n_dev = len(jax.devices())
    ds = _nan_dataset(n=8 * n_dev, batch=2 * n_dev)
    mesh = make_mesh((n_dev,), ("data",))
    m = _build(mesh, "shard_map")
    before = np.asarray(m.params["encoders"][1]["layers"][0]["w"])
    opt = Adam(0.01)
    for _ in range(2):
        m.train_epoch(ArrayLoader(ds, 2 * n_dev), opt, "cross_entropy")
    after = np.asarray(m.params["encoders"][1]["layers"][0]["w"])
    np.testing.assert_array_equal(before, after)


def test_mixed_nan_batches_batch_skip_mesh_matches_single_device():
    """Some batches clean, some NaN-degraded (the realistic MNAR grid
    shape): per-batch skip decisions on the mesh equal single-device for
    both engines."""
    n_dev = len(jax.devices())
    batch = 2 * n_dev
    rng = np.random.default_rng(7)
    n = 6 * batch
    X = rng.normal(size=(n, 6)).astype(np.float32)
    y = (X @ rng.normal(size=6) > 0).astype(np.int64)[:, None]
    # NaN-degrade modality 1 in batches 1 and 4 only, single row each
    # (again: one shard's slice).
    for b in (1, 4):
        X[b * batch, 3:] = np.nan
    ds = PartitionDataset(X, y, [3, 3])

    h1, p1 = MultiModNHistory(["t"]), None
    m1 = _build()
    m1.fit(ArrayLoader(ds, batch), Adam(0.01), "cross_entropy", epochs=3,
           history=h1)
    p1 = m1.state_dict()
    for mesh, engine in ((make_mesh((n_dev,), ("data",)), "auto"),
                         (make_mesh((n_dev,), ("data",)), "shard_map")):
        m2 = _build(mesh, engine)
        h2 = MultiModNHistory(["t"])
        m2.fit(ArrayLoader(ds, batch), Adam(0.01), "cross_entropy",
               epochs=3, history=h2)
        _assert_runs_equal(h1, p1, h2, m2.state_dict(), msg=engine)

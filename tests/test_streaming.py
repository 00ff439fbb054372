"""Streaming training path (host-resident data, per-batch jitted steps):
must match the device-resident ArrayLoader epoch programs exactly."""
import numpy as np

import jax

from multimodn_tpu import Adam, MultiModN, MultiModNHistory
from multimodn_tpu.data import (
    ArrayLoader,
    PartitionDataset,
    StreamingLoader,
    train_epoch_streaming,
)
from multimodn_tpu.decoders import LogisticDecoder
from multimodn_tpu.encoders import MLPEncoder


def _setup(n=50, seed=0, nan_frac=0.0):
    rng = np.random.default_rng(seed)
    X = rng.normal(size=(n, 6)).astype(np.float32)
    y = (X @ rng.normal(size=6) > 0).astype(np.int64)[:, None]
    if nan_frac:
        rows = rng.random(n) < nan_frac
        X[rows, :3] = np.nan
    return PartitionDataset(X, y, [3, 3])


def _model(nan_skip="sample"):
    return MultiModN(3, [MLPEncoder(3, 3, (4,)), MLPEncoder(3, 3, (4,))],
                     [LogisticDecoder(3)], 0.7, 0.3, nan_skip=nan_skip)


def test_streaming_epoch_matches_array_loader():
    """Per-batch streaming steps == the fused whole-epoch program: metric
    grids and final params, including a padded tail batch (n=50, B=16)."""
    ds = _setup()
    epochs = 3

    m1, h1 = _model(), MultiModNHistory(["t"])
    opt1 = Adam(0.01)
    for _ in range(epochs):
        m1.train_epoch(ArrayLoader(ds, 16), opt1, "cross_entropy", h1)

    m2, h2 = _model(), MultiModNHistory(["t"])
    opt2 = Adam(0.01)
    loader = StreamingLoader(ds, 16)
    for _ in range(epochs):
        train_epoch_streaming(m2, loader, opt2, "cross_entropy", h2)

    for e in range(epochs):
        for k in ("loss", "accuracy", "sensitivity", "specificity"):
            np.testing.assert_allclose(
                getattr(h1, k)["train"][e], getattr(h2, k)["train"][e],
                rtol=1e-5, atol=1e-6, err_msg=f"epoch {e} {k}")
    for a, b in zip(jax.tree_util.tree_leaves(m1.state_dict()),
                    jax.tree_util.tree_leaves(m2.state_dict())):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_streaming_nan_skip_modes():
    ds = _setup(seed=1, nan_frac=0.3)
    for mode in ("sample", "batch"):
        m1, m2 = _model(mode), _model(mode)
        opt1, opt2 = Adam(0.01), Adam(0.01)
        h1, h2 = MultiModNHistory(["t"]), MultiModNHistory(["t"])
        m1.train_epoch(ArrayLoader(ds, 8), opt1, "cross_entropy", h1)
        train_epoch_streaming(m2, StreamingLoader(ds, 8), opt2,
                              "cross_entropy", h2)
        np.testing.assert_allclose(h1.loss["train"][0], h2.loss["train"][0],
                                   rtol=1e-5, atol=1e-6, err_msg=mode)


def test_streaming_shuffle_reshuffles():
    ds = _setup(n=48, seed=2)
    loader = StreamingLoader(ds, 16, shuffle=True, seed=3)
    loader.reshuffle()
    o1 = loader._order.copy()
    loader.reshuffle()
    assert not np.array_equal(o1, loader._order)
    # Batch geometry stable.
    batches = list(loader.iter_batches())
    assert len(batches) == 3
    assert all(b[2].sum() == 16 for b in batches)


def test_streaming_static_cycle_matches_train_epoch():
    """Regression (review finding): the streaming path must advance the
    StaticInitState shared cycle by SAMPLES, not batches — two streaming
    epochs equal two ArrayLoader train_epoch calls at bank=7, n=40, B=16."""
    from multimodn_tpu import Adam, MultiModN, MultiModNHistory, StaticInitState
    from multimodn_tpu.data import ArrayLoader, PartitionDataset
    from multimodn_tpu.data.streaming import StreamingLoader, train_epoch_streaming
    from multimodn_tpu.decoders import LogisticDecoder
    from multimodn_tpu.encoders import MLPEncoder

    rng = np.random.default_rng(3)
    bank = [rng.normal(size=3).astype(np.float32) for _ in range(7)]
    X = rng.normal(size=(40, 6)).astype(np.float32)
    y = (X @ rng.normal(size=6) > 0).astype(np.int64)[:, None]
    ds = PartitionDataset(X, y, [6])

    def build():
        return MultiModN(3, [MLPEncoder(3, 6, (5,))], [LogisticDecoder(3)],
                         0.7, 0.3, init_state=StaticInitState(bank))

    m_s, m_a = build(), build()
    opt_s, opt_a = Adam(0.01), Adam(0.01)
    h_a = MultiModNHistory(["t"])
    for _ in range(2):
        train_epoch_streaming(m_s, StreamingLoader(ds, 16), opt_s,
                              "cross_entropy")
        m_a.train_epoch(ArrayLoader(ds, 16), opt_a, "cross_entropy", h_a)
    assert m_s._cycle_offset == m_a._cycle_offset == (80 % 7)
    np.testing.assert_allclose(
        np.asarray(m_s.state_dict()["encoders"][0]["layers"][0]["w"]),
        np.asarray(m_a.state_dict()["encoders"][0]["layers"][0]["w"]),
        rtol=1e-5, atol=1e-6)


def test_streaming_eval_matches_array_loader_test():
    """Streamed evaluation (VERDICT r3 next-#5): test_epoch_streaming's
    15-tuples and history grids equal model.test on an ArrayLoader of the
    same data, including a padded tail and NaN rows."""
    from multimodn_tpu.data import test_epoch_streaming

    ds = _setup(n=50, seed=4, nan_frac=0.2)
    m = _model()
    # Train a little so the metrics are nontrivial.
    m.train_epoch(ArrayLoader(ds, 16), Adam(0.01), "cross_entropy")

    h1, h2 = MultiModNHistory(["t"]), MultiModNHistory(["t"])
    r_array = m.test(ArrayLoader(ds, 16), "cross_entropy", history=h1)
    r_stream = test_epoch_streaming(m, StreamingLoader(ds, 16),
                                    "cross_entropy", history=h2)
    for a, b in zip(r_array, r_stream):
        np.testing.assert_allclose(a[:4], b[:4], rtol=1e-6, atol=1e-7)
    for k in ("loss", "accuracy", "sensitivity", "specificity"):
        np.testing.assert_allclose(getattr(h1, k)["test"][0],
                                   getattr(h2, k)["test"][0],
                                   rtol=1e-6, atol=1e-7, err_msg=k)


def test_streaming_fit_best_matches_fused():
    """Streamed fused-selection training == the single-dispatch fit_best:
    scores, selection, best params, final params — same rng stream, same
    offset threading, device-resident best carry."""
    from multimodn_tpu.data import fit_best_streaming
    from multimodn_tpu.data.dataset import Subset

    ds = _setup(n=120, seed=5)
    tr_idx, va_idx = list(range(0, 80)), list(range(80, 120))
    m1, m2 = _model(), _model()

    r1 = m1.fit_best(ArrayLoader(Subset(ds, tr_idx), 16), Adam(0.01),
                     "cross_entropy", epochs=4,
                     val_loader=ArrayLoader(Subset(ds, va_idx), 16))
    r2 = fit_best_streaming(m2, StreamingLoader(Subset(ds, tr_idx), 16),
                            Adam(0.01), "cross_entropy", epochs=4,
                            val_loader=StreamingLoader(Subset(ds, va_idx),
                                                       16))
    assert r1["best_epoch"] == r2["best_epoch"]
    np.testing.assert_allclose(r1["scores"], r2["scores"], rtol=1e-6,
                               atol=1e-7)
    np.testing.assert_allclose(r1["best_score"], r2["best_score"],
                               rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(m1.state_dict()),
                    jax.tree_util.tree_leaves(m2.state_dict())):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)
    for a, b in zip(jax.tree_util.tree_leaves(r1["best_params"]),
                    jax.tree_util.tree_leaves(r2["best_params"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)


def test_streaming_fit_best_larger_than_memory_scale():
    """Synthetic at-scale smoke: a 60k-row stream (far beyond any single
    upload the test machine should need) trains + selects finitely with
    the epoch stacks never materialized on device."""
    from multimodn_tpu.data import fit_best_streaming

    rng = np.random.default_rng(6)
    n = 60_000
    X = rng.normal(size=(n, 6)).astype(np.float32)
    y = (X @ rng.normal(size=6) > 0).astype(np.int64)[:, None]
    tr = PartitionDataset(X[:50_000], y[:50_000], [3, 3])
    va = PartitionDataset(X[50_000:], y[50_000:], [3, 3])
    m = _model()
    r = fit_best_streaming(m, StreamingLoader(tr, 4096), Adam(0.01),
                           "cross_entropy", epochs=2,
                           val_loader=StreamingLoader(va, 4096))
    assert np.isfinite(r["best_score"]) and r["best_epoch"] >= 0
    assert np.isfinite(r["scores"]).all()


def test_streaming_fit_best_rejects_shuffle():
    import pytest

    from multimodn_tpu.data import fit_best_streaming

    ds = _setup(n=48, seed=7)
    m = _model()
    with pytest.raises(NotImplementedError, match="shuffle"):
        fit_best_streaming(m, StreamingLoader(ds, 16, shuffle=True),
                           Adam(0.01), "cross_entropy", epochs=1,
                           val_loader=StreamingLoader(ds, 16))


def _sm_model(mesh, nan_skip="sample"):
    return MultiModN(3, [MLPEncoder(3, 3, (4,)), MLPEncoder(3, 3, (4,))],
                     [LogisticDecoder(3)], 0.7, 0.3, nan_skip=nan_skip,
                     mesh=mesh, dp_engine="shard_map")


def test_shard_map_streaming_matches_single_device():
    """The explicit shard_map engine streams (round-4 continuation): the
    per-batch train step is ``_sm_batch_update`` inside a shard_map region
    — params and history must equal the mesh-free stream in BOTH nan
    granularities. 'batch' is the load-bearing case: with the NaN rows
    landing in only SOME shards, equality holds only if every shard takes
    the psum'd whole-batch skip decision (multimodn.py:167-169). A batch
    size the data axis cannot shard evenly stays rejected for every meshed
    engine."""
    import pytest

    from multimodn_tpu.parallel import make_mesh

    ds = _setup(n=50, seed=9, nan_frac=0.25)
    mesh = make_mesh(axis_names=("data",))
    for mode in ("sample", "batch"):
        m1, sm = _model(nan_skip=mode), _sm_model(mesh, nan_skip=mode)
        o1, o2 = Adam(0.01), Adam(0.01)
        h1, h2 = MultiModNHistory(["t"]), MultiModNHistory(["t"])
        for _ in range(2):
            train_epoch_streaming(m1, StreamingLoader(ds, 16), o1,
                                  "cross_entropy", h1)
            train_epoch_streaming(sm, StreamingLoader(ds, 16), o2,
                                  "cross_entropy", h2)
        for k in ("loss", "accuracy", "sensitivity", "specificity"):
            np.testing.assert_allclose(
                np.asarray(getattr(h1, k)["train"]),
                np.asarray(getattr(h2, k)["train"]),
                rtol=1e-5, atol=1e-6, err_msg=f"{mode} {k}")
        for a, b in zip(jax.tree_util.tree_leaves(m1.state_dict()),
                        jax.tree_util.tree_leaves(sm.state_dict())):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-6, err_msg=mode)
    for bad in (_sm_model(mesh),
                MultiModN(3, [MLPEncoder(3, 3, (4,)), MLPEncoder(3, 3, (4,))],
                          [LogisticDecoder(3)], 0.7, 0.3, mesh=mesh)):
        with pytest.raises(ValueError, match="divide the data mesh axis"):
            train_epoch_streaming(bad, StreamingLoader(ds, 12), Adam(0.01),
                                  "cross_entropy")


def test_shard_map_streaming_fit_best_and_eval():
    """The full streamed selection protocol under the explicit engine:
    train sweeps through the shard_map per-batch step, eval sweeps through
    the annotation-derived path (the split ``MultiModN.test`` uses) —
    scores, selected epoch and best/final params equal the mesh-free
    stream's."""
    from multimodn_tpu.data import fit_best_streaming, test_epoch_streaming
    from multimodn_tpu.data.dataset import Subset
    from multimodn_tpu.parallel import make_mesh

    ds = _setup(n=96, seed=22, nan_frac=0.2)
    mesh = make_mesh(axis_names=("data",))
    tr, va = Subset(ds, list(range(64))), Subset(ds, list(range(64, 96)))

    m1, sm = _model(), _sm_model(mesh)
    r1 = fit_best_streaming(m1, StreamingLoader(tr, 16), Adam(0.01),
                            "cross_entropy", epochs=3,
                            val_loader=StreamingLoader(va, 16))
    r2 = fit_best_streaming(sm, StreamingLoader(tr, 16), Adam(0.01),
                            "cross_entropy", epochs=3,
                            val_loader=StreamingLoader(va, 16))
    assert r1["best_epoch"] == r2["best_epoch"]
    np.testing.assert_allclose(r1["scores"], r2["scores"], rtol=1e-5,
                               atol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(m1.state_dict()),
                    jax.tree_util.tree_leaves(sm.state_dict())):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)
    e1 = test_epoch_streaming(m1, StreamingLoader(va, 16), "cross_entropy")
    e2 = test_epoch_streaming(sm, StreamingLoader(va, 16), "cross_entropy")
    for a, b in zip(e1, e2):
        np.testing.assert_allclose(a[:4], b[:4], rtol=1e-5, atol=1e-6)


def test_shard_map_streaming_static_cycle():
    """StaticInitState's lifetime round-robin under the streamed shard_map
    step: the per-shard axis_index offset correction must serve bank rows
    by GLOBAL position, so the streamed explicit engine equals the
    mesh-free stream across calls (bank phase carries over)."""
    from multimodn_tpu.core.state import StaticInitState
    from multimodn_tpu.parallel import make_mesh

    ds = _setup(n=48, seed=11)
    mesh = make_mesh(axis_names=("data",))
    bank = np.linspace(-1.0, 1.0, 3 * 3, dtype=np.float32).reshape(3, 3)

    def build(mesh_, engine):
        kw = dict(mesh=mesh_, dp_engine=engine) if mesh_ is not None else {}
        return MultiModN(3, [MLPEncoder(3, 3, (4,)), MLPEncoder(3, 3, (4,))],
                         [LogisticDecoder(3)], 0.7, 0.3,
                         init_state=StaticInitState(list(bank)), **kw)

    m1, sm = build(None, None), build(mesh, "shard_map")
    o1, o2 = Adam(0.01), Adam(0.01)
    for _ in range(2):
        train_epoch_streaming(m1, StreamingLoader(ds, 16), o1,
                              "cross_entropy")
        train_epoch_streaming(sm, StreamingLoader(ds, 16), o2,
                              "cross_entropy")
    for a, b in zip(jax.tree_util.tree_leaves(m1.state_dict()),
                    jax.tree_util.tree_leaves(sm.state_dict())):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def _meshed_pair(mesh, nan_skip="sample", **kw):
    def build(m):
        return MultiModN(3, [MLPEncoder(3, 3, (4,)), MLPEncoder(3, 3, (4,))],
                         [LogisticDecoder(3)], 0.7, 0.3, nan_skip=nan_skip,
                         mesh=m, **kw)
    return build(None), build(mesh)


def test_meshed_streaming_matches_single_device():
    """Meshed streaming (auto engine): per-batch device_puts shard over the
    data axis and GSPMD partitions the step — params and history must equal
    the mesh-free stream, in BOTH nan_skip granularities (batch is the MNAR
    headline's required mode: the any-NaN decision must stay global when
    the NaN rows land in only some shards — multimodn.py:167-169)."""
    from multimodn_tpu.parallel import make_mesh

    ds = _setup(n=50, seed=20, nan_frac=0.25)
    mesh = make_mesh(axis_names=("data",))
    for mode in ("sample", "batch"):
        m1, m2 = _meshed_pair(mesh, nan_skip=mode)
        o1, o2 = Adam(0.01), Adam(0.01)
        h1, h2 = MultiModNHistory(["t"]), MultiModNHistory(["t"])
        for _ in range(2):
            train_epoch_streaming(m1, StreamingLoader(ds, 16), o1,
                                  "cross_entropy", h1)
            train_epoch_streaming(m2, StreamingLoader(ds, 16), o2,
                                  "cross_entropy", h2)
        for k in ("loss", "accuracy", "sensitivity", "specificity"):
            np.testing.assert_allclose(
                np.asarray(getattr(h1, k)["train"]),
                np.asarray(getattr(h2, k)["train"]),
                rtol=1e-5, atol=1e-6, err_msg=f"{mode} {k}")
        for a, b in zip(jax.tree_util.tree_leaves(m1.state_dict()),
                        jax.tree_util.tree_leaves(m2.state_dict())):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-6, err_msg=mode)


def test_meshed_streaming_eval_and_fit_best():
    """Streamed eval 15-tuples and the full streamed selection protocol on
    a DP4xTP2 mesh equal the mesh-free stream (scores, selected epoch,
    best/final params)."""
    from multimodn_tpu.data import fit_best_streaming, test_epoch_streaming
    from multimodn_tpu.data.dataset import Subset
    from multimodn_tpu.parallel import make_mesh

    ds = _setup(n=96, seed=21, nan_frac=0.2)
    mesh = make_mesh((4, 2), ("data", "model"))
    tr, va = Subset(ds, list(range(64))), Subset(ds, list(range(64, 96)))

    m1, m2 = _meshed_pair(mesh)
    m1.train_epoch(ArrayLoader(tr, 16), Adam(0.01), "cross_entropy")
    # Same warm start for the meshed twin (state_dict is mesh-free numpy).
    m2.load_state_dict(m1.state_dict())
    r1 = test_epoch_streaming(m1, StreamingLoader(va, 16), "cross_entropy")
    r2 = test_epoch_streaming(m2, StreamingLoader(va, 16), "cross_entropy")
    for a, b in zip(r1, r2):
        np.testing.assert_allclose(a[:4], b[:4], rtol=1e-5, atol=1e-6)

    m3, m4 = _meshed_pair(mesh)
    r3 = fit_best_streaming(m3, StreamingLoader(tr, 16), Adam(0.01),
                            "cross_entropy", epochs=3,
                            val_loader=StreamingLoader(va, 16))
    r4 = fit_best_streaming(m4, StreamingLoader(tr, 16), Adam(0.01),
                            "cross_entropy", epochs=3,
                            val_loader=StreamingLoader(va, 16))
    assert r3["best_epoch"] == r4["best_epoch"]
    np.testing.assert_allclose(r3["scores"], r4["scores"], rtol=1e-5,
                               atol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(m3.state_dict()),
                    jax.tree_util.tree_leaves(m4.state_dict())):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_streaming_fit_best_rejects_unrolled_shuffle_mode():
    """Review finding: an unrolled-chain shuffle_mode model would freeze
    ONE order for every streamed epoch — reject like model.fit_best."""
    import pytest

    from multimodn_tpu.data import fit_best_streaming

    ds = _setup(n=48, seed=10)
    m = MultiModN(3, [MLPEncoder(3, 3, (4,)), MLPEncoder(3, 3, (6,))],
                  [LogisticDecoder(3)], 0.7, 0.3, shuffle_mode=True,
                  chain_mode="unrolled")
    with pytest.raises(NotImplementedError, match="shuffle"):
        fit_best_streaming(m, StreamingLoader(ds, 16), Adam(0.01),
                           "cross_entropy", epochs=1,
                           val_loader=StreamingLoader(ds, 16))


def test_streaming_validates_modality_widths():
    """Review finding: test_epoch_streaming must reject wrong-width
    (modality, encoder) pairings up front like model.test (StreamingLoader
    now exposes modality_widths)."""
    import pytest

    from multimodn_tpu.data import test_epoch_streaming

    rng = np.random.default_rng(11)
    X = rng.normal(size=(32, 5)).astype(np.float32)
    y = rng.integers(0, 2, size=(32, 1))
    bad = PartitionDataset(X, y, [3, 2])   # encoder 1 expects width 3
    m = _model()
    assert StreamingLoader(bad, 16).modality_widths == [3, 2]
    with pytest.raises(ValueError, match="width"):
        test_epoch_streaming(m, StreamingLoader(bad, 16), "cross_entropy")


def test_presence_dropout_layout_invariant_stream():
    """Review finding: the injected presence-dropout pattern must be
    identical whichever entry point shaped the batch — scan-chain models
    take the STACKED (B, E, F) layout through fused programs but the
    modality TUPLE through streaming; same seed must give same params."""
    from multimodn_tpu import MultiModNHistory
    from multimodn_tpu.data import FeatureWiseDataset
    from multimodn_tpu.encoders import MLPFeatureEncoder

    rng = np.random.default_rng(12)
    E = 16   # auto plan picks the scan chain at E >= 16
    X = rng.normal(size=(48, E)).astype(np.float32)
    y = (X @ rng.normal(size=E) > 0).astype(np.int64)[:, None]
    ds = FeatureWiseDataset(X, y)

    def build():
        return MultiModN(3, [MLPFeatureEncoder(3, 4) for _ in range(E)],
                         [LogisticDecoder(3)], 0.7, 0.3,
                         presence_dropout=0.4)

    m1, m2 = build(), build()
    assert m1._chain_plan()[0] == "scan"
    o1, o2 = Adam(0.01), Adam(0.01)
    for _ in range(2):
        m1.train_epoch(ArrayLoader(ds, 16), o1, "cross_entropy")
        train_epoch_streaming(m2, StreamingLoader(ds, 16), o2,
                              "cross_entropy")
    for a, b in zip(jax.tree_util.tree_leaves(m1.state_dict()),
                    jax.tree_util.tree_leaves(m2.state_dict())):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_streaming_fit_best_history_matches_fused():
    """fit_best_streaming(history=) appends the same per-epoch train/val
    grids as the fused fit_best."""
    from multimodn_tpu.data import fit_best_streaming
    from multimodn_tpu.data.dataset import Subset

    ds = _setup(n=96, seed=13)
    tr, va = Subset(ds, list(range(64))), Subset(ds, list(range(64, 96)))
    m1, m2 = _model(), _model()
    h1, h2 = MultiModNHistory(["t"]), MultiModNHistory(["t"])
    m1.fit_best(ArrayLoader(tr, 16), Adam(0.01), "cross_entropy", epochs=3,
                val_loader=ArrayLoader(va, 16), history=h1)
    fit_best_streaming(m2, StreamingLoader(tr, 16), Adam(0.01),
                       "cross_entropy", epochs=3,
                       val_loader=StreamingLoader(va, 16), history=h2)
    for tag in ("train", "val"):
        for k in ("loss", "accuracy", "sensitivity", "specificity"):
            np.testing.assert_allclose(
                np.asarray(getattr(h1, k)[tag]),
                np.asarray(getattr(h2, k)[tag]),
                rtol=1e-6, atol=1e-7, err_msg=f"{k}[{tag}]")


def test_presence_penalty_scan_chain_matches_unrolled():
    """presence_penalty under the scan chain's STACKED (B, E, F) layout
    equals the unrolled chain (the penalty indexes data[:, d_idx] there)."""
    from multimodn_tpu.data import FeatureWiseDataset
    from multimodn_tpu.encoders import MLPFeatureEncoder

    rng = np.random.default_rng(14)
    E = 6
    X = rng.normal(size=(48, E)).astype(np.float32)
    y = (X @ rng.normal(size=E) > 0).astype(np.int64)[:, None]
    X[rng.random(48) < 0.3, 2] = np.nan      # modality 2 partially missing
    ds = FeatureWiseDataset(X, y)

    outs = []
    for mode in ("scan", "unrolled"):
        m = MultiModN(3, [MLPFeatureEncoder(3, 4) for _ in range(E)],
                      [LogisticDecoder(3)], 0.7, 0.3, chain_mode=mode,
                      presence_penalty=10.0)
        opt = Adam(0.01)
        for _ in range(3):
            m.train_epoch(ArrayLoader(ds, 16), opt, "cross_entropy")
        p = m.state_dict()
        if not isinstance(p["encoders"], (list, tuple)):
            # scan mode stores STACKED encoder params (leading E axis);
            # unstack for a like-for-like comparison.
            p = dict(p)
            p["encoders"] = [
                jax.tree_util.tree_map(lambda s, i=i: s[i], p["encoders"])
                for i in range(E)]
        outs.append(p)
    for a, b in zip(jax.tree_util.tree_leaves(outs[0]),
                    jax.tree_util.tree_leaves(outs[1])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_fit_streaming_matches_fused_fit():
    """fit_streaming (train + per-epoch val sweeps over streams) produces
    the same history grids as the fused fit(val_loader=...)."""
    from multimodn_tpu.data import fit_streaming
    from multimodn_tpu.data.dataset import Subset

    ds = _setup(n=96, seed=15)
    tr, va = Subset(ds, list(range(64))), Subset(ds, list(range(64, 96)))
    m1, m2 = _model(), _model()
    h1, h2 = MultiModNHistory(["t"]), MultiModNHistory(["t"])
    m1.fit(ArrayLoader(tr, 16), Adam(0.01), "cross_entropy", epochs=3,
           history=h1, val_loader=ArrayLoader(va, 16))
    fit_streaming(m2, StreamingLoader(tr, 16), Adam(0.01), "cross_entropy",
                  epochs=3, history=h2, val_loader=StreamingLoader(va, 16))
    for tag in ("train", "val"):
        for k in ("loss", "accuracy"):
            np.testing.assert_allclose(
                np.asarray(getattr(h1, k)[tag]),
                np.asarray(getattr(h2, k)[tag]),
                rtol=1e-5, atol=1e-6, err_msg=f"{k}[{tag}]")


def test_streaming_fit_best_on_epoch():
    from multimodn_tpu.data import fit_best_streaming
    from multimodn_tpu.data.dataset import Subset

    ds = _setup(n=64, seed=16)
    tr, va = Subset(ds, list(range(48))), Subset(ds, list(range(48, 64)))
    m = _model()
    seen = []
    r = fit_best_streaming(m, StreamingLoader(tr, 16), Adam(0.01),
                           "cross_entropy", epochs=3,
                           val_loader=StreamingLoader(va, 16),
                           on_epoch=seen.append)
    assert [p["epoch"] for p in seen] == [0, 1, 2]
    np.testing.assert_allclose([p["score"] for p in seen], r["scores"],
                               rtol=1e-6)


def _torch_pair_loader(ds, batch, shuffle=False):
    """Reference-idiom torch DataLoader over a MultiMod dataset (items are
    ([modality arrays], target))."""
    import torch
    from torch.utils.data import DataLoader

    class _Wrap(torch.utils.data.Dataset):
        def __len__(self):
            return len(ds)

        def __getitem__(self, i):
            xs, y = ds[i][:2]
            return [torch.from_numpy(np.ascontiguousarray(x, np.float32))
                    for x in xs], torch.as_tensor(np.asarray(y))

    return DataLoader(_Wrap(), batch_size=batch, shuffle=shuffle)


def test_torch_streaming_loader_matches_array_loader():
    """TorchStreamingLoader streams a real torch DataLoader batch-by-batch
    (no materialization) and trains/evals equal to the ArrayLoader path,
    padded tail included."""
    from multimodn_tpu.data import (TorchStreamingLoader,
                                    test_epoch_streaming)

    ds = _setup(n=50, seed=17)
    tl = TorchStreamingLoader(_torch_pair_loader(ds, 16))
    assert (tl.n_samples, tl.batch_size, tl.n_batches) == (50, 16, 4)
    assert tl.modality_widths == [3, 3]

    m1, m2 = _model(), _model()
    o1, o2 = Adam(0.01), Adam(0.01)
    h1, h2 = MultiModNHistory(["t"]), MultiModNHistory(["t"])
    for _ in range(2):
        m1.train_epoch(ArrayLoader(ds, 16), o1, "cross_entropy", h1)
        train_epoch_streaming(m2, tl, o2, "cross_entropy", h2)
    for e in range(2):
        np.testing.assert_allclose(h1.loss["train"][e], h2.loss["train"][e],
                                   rtol=1e-5, atol=1e-6)
    r1 = m1.test(ArrayLoader(ds, 16), "cross_entropy")
    r2 = test_epoch_streaming(m2, tl, "cross_entropy")
    np.testing.assert_allclose(r1[0][:4], r2[0][:4], rtol=1e-6, atol=1e-7)


def test_torch_streaming_fit_best():
    """The full streamed selection protocol over torch DataLoaders equals
    the fused fit_best on the same data."""
    from multimodn_tpu.data import TorchStreamingLoader, fit_best_streaming
    from multimodn_tpu.data.dataset import Subset

    ds = _setup(n=96, seed=18)
    tr, va = Subset(ds, list(range(64))), Subset(ds, list(range(64, 96)))
    m1, m2 = _model(), _model()
    r1 = m1.fit_best(ArrayLoader(tr, 16), Adam(0.01), "cross_entropy",
                     epochs=3, val_loader=ArrayLoader(va, 16))
    r2 = fit_best_streaming(
        m2, TorchStreamingLoader(_torch_pair_loader(tr, 16)), Adam(0.01),
        "cross_entropy", epochs=3,
        val_loader=TorchStreamingLoader(_torch_pair_loader(va, 16)))
    assert r1["best_epoch"] == r2["best_epoch"]
    np.testing.assert_allclose(r1["scores"], r2["scores"], rtol=1e-6,
                               atol=1e-7)


def test_torch_streaming_loader_validation():
    import pytest

    from multimodn_tpu.data import TorchStreamingLoader

    ds = _setup(n=32, seed=19)
    with pytest.raises(TypeError, match="DataLoader"):
        TorchStreamingLoader(ds)
    import torch
    bad = _torch_pair_loader(ds, 16)
    drop = torch.utils.data.DataLoader(bad.dataset, batch_size=16,
                                       drop_last=True)
    with pytest.raises(NotImplementedError, match="drop_last"):
        TorchStreamingLoader(drop)
    # shuffle detection (fit_best_streaming then rejects it)
    sh = TorchStreamingLoader(_torch_pair_loader(ds, 16, shuffle=True))
    assert sh.shuffle


def test_torch_streaming_batch_sampler_geometry():
    """DataLoader(batch_sampler=...) has batch_size=None — geometry must
    come from the BatchSampler (review finding: the old fallback derived
    n_batches=1 and silently corrupted metrics and fit_best selection)."""
    import torch.utils.data as tud

    from multimodn_tpu.data import TorchStreamingLoader

    ds = _setup(n=50, seed=21)
    plain = _torch_pair_loader(ds, 16)
    bs_loader = tud.DataLoader(
        plain.dataset,
        batch_sampler=tud.BatchSampler(
            tud.SequentialSampler(plain.dataset), batch_size=16,
            drop_last=False))
    tl = TorchStreamingLoader(bs_loader)
    assert (tl.n_samples, tl.batch_size, tl.n_batches) == (50, 16, 4)
    assert not tl.shuffle

    # Trains and selects equal to the plain batch_size=16 loader.
    m1, m2 = _model(), _model()
    h1, h2 = MultiModNHistory(["t"]), MultiModNHistory(["t"])
    train_epoch_streaming(m1, TorchStreamingLoader(plain), Adam(0.01),
                          "cross_entropy", h1)
    train_epoch_streaming(m2, tl, Adam(0.01), "cross_entropy", h2)
    np.testing.assert_allclose(h1.loss["train"][0], h2.loss["train"][0],
                               rtol=1e-6, atol=1e-7)

    # A SUBSET sampler's geometry comes from the sampler, not the dataset.
    sub = tud.DataLoader(
        plain.dataset,
        sampler=tud.SequentialSampler(range(32)), batch_size=16)
    tsub = TorchStreamingLoader(sub)
    assert (tsub.n_samples, tsub.n_batches) == (32, 2)


def test_torch_streaming_iterable_dataset():
    """Iterable-style torch datasets (the larger-than-memory use case the
    docstring advertises) must construct and train — review finding: the
    old init crashed on len(dataset). Unsized geometry is counted during
    iteration; fit_best_streaming needs a sized val loader and says so."""
    import pytest
    import torch
    import torch.utils.data as tud

    from multimodn_tpu.data import (TorchStreamingLoader,
                                    fit_best_streaming,
                                    test_epoch_streaming)

    ds = _setup(n=50, seed=22)

    class _It(tud.IterableDataset):
        def __iter__(self):
            for i in range(len(ds)):
                xs, y = ds[i][:2]
                yield ([torch.from_numpy(np.ascontiguousarray(x,
                                                              np.float32))
                        for x in xs], torch.as_tensor(np.asarray(y)))

    it_loader = tud.DataLoader(_It(), batch_size=16)
    tl = TorchStreamingLoader(it_loader)
    assert tl.n_samples is None and tl.n_batches is None
    assert not tl.shuffle
    with pytest.raises(TypeError, match="unsized"):
        len(tl)

    # Streamed train/eval over the unsized loader == the map-style run.
    m1, m2 = _model(), _model()
    h1, h2 = MultiModNHistory(["t"]), MultiModNHistory(["t"])
    train_epoch_streaming(m1, TorchStreamingLoader(_torch_pair_loader(
        ds, 16)), Adam(0.01), "cross_entropy", h1)
    train_epoch_streaming(m2, tl, Adam(0.01), "cross_entropy", h2)
    np.testing.assert_allclose(h1.loss["train"][0], h2.loss["train"][0],
                               rtol=1e-6, atol=1e-7)
    r1 = m1.test(ArrayLoader(ds, 16), "cross_entropy")
    r2 = test_epoch_streaming(m2, tl, "cross_entropy")
    np.testing.assert_allclose(r1[0][:4], r2[0][:4], rtol=1e-6, atol=1e-7)

    # Selection needs sized val geometry (preallocated buffers).
    with pytest.raises(NotImplementedError, match="unsized iterable"):
        fit_best_streaming(_model(), tl, Adam(0.01), "cross_entropy",
                           epochs=1, val_loader=TorchStreamingLoader(
                               tud.DataLoader(_It(), batch_size=16)))


def test_torch_streaming_sampler_rejections_and_shuffle():
    """Conservative sampler handling (review findings): any non-sequential
    sampler counts as shuffled; unbatched loaders and custom
    batch_samplers (no static batch geometry) are rejected loudly."""
    import pytest
    import torch.utils.data as tud

    from multimodn_tpu.data import TorchStreamingLoader, fit_best_streaming

    ds = _setup(n=32, seed=23)
    plain = _torch_pair_loader(ds, 16)

    # SubsetRandomSampler reshuffles every epoch: must read as shuffled,
    # and fit_best_streaming must reject it (the old RandomSampler-only
    # check silently accepted it).
    srs = tud.DataLoader(plain.dataset,
                         sampler=tud.SubsetRandomSampler(list(range(32))),
                         batch_size=16)
    tl = TorchStreamingLoader(srs)
    assert tl.shuffle
    with pytest.raises(NotImplementedError, match="shuffle"):
        fit_best_streaming(_model(), tl, Adam(0.01), "cross_entropy",
                           epochs=1, val_loader=tl)

    # Unbatched mode (batch_size=None, no batch_sampler): no batch
    # geometry for the static-shape step.
    unbatched = tud.DataLoader(plain.dataset, batch_size=None)
    with pytest.raises(NotImplementedError, match="automatic batching"):
        TorchStreamingLoader(unbatched)

    # A custom (non-BatchSampler) batch_sampler may change batch shapes
    # per epoch: rejected rather than mis-derived.
    class _OddBatches:
        def __iter__(self):
            yield list(range(10))
            yield list(range(10, 32))

        def __len__(self):
            return 2

    custom = tud.DataLoader(plain.dataset, batch_sampler=_OddBatches())
    with pytest.raises(NotImplementedError, match="BatchSampler"):
        TorchStreamingLoader(custom)


def test_predict_streaming_matches_loader_predict(tmp_path):
    """Streamed inference == predict on an ArrayLoader of the same rows
    (NaNs flow through — quirk #9), from host-stream AND disk (.npy),
    including the StaticInitState cycle advancing across calls."""
    from multimodn_tpu.core.state import StaticInitState
    from multimodn_tpu.data import (NpyStreamingLoader,
                                    predict_proba_streaming,
                                    predict_streaming)

    ds = _setup(nan_frac=0.2)
    mat = np.concatenate(
        [np.concatenate(ds.arrays()[0], axis=1),
         ds.arrays()[1].astype(np.float32)], axis=1)
    np.save(tmp_path / "ds.npy", mat)

    for make in (lambda: _model(),
                 lambda: MultiModN(
                     3, [MLPEncoder(3, 3, (4,)), MLPEncoder(3, 3, (4,))],
                     [LogisticDecoder(3)], 0.7, 0.3,
                     init_state=StaticInitState(
                         np.arange(9, dtype=np.float32).reshape(3, 3)))):
        m_ref, m_host, m_disk = make(), make(), make()
        for _ in range(2):    # two calls: the cycle offset must track
            p_ref = m_ref.predict(ArrayLoader(ds, 16))
            o_ref = m_ref.predict_proba(ArrayLoader(ds, 16))
            # interleave: predict consumed the cycle; proba continues it
            p_h = predict_streaming(m_host, StreamingLoader(ds, 16))
            o_h = predict_proba_streaming(m_host, StreamingLoader(ds, 16))
            p_d = predict_streaming(
                m_disk, NpyStreamingLoader(str(tmp_path / "ds.npy"),
                                           [3, 3], 1, 16))
            o_d = predict_proba_streaming(
                m_disk, NpyStreamingLoader(str(tmp_path / "ds.npy"),
                                           [3, 3], 1, 16))
            np.testing.assert_array_equal(p_ref, p_h)
            np.testing.assert_array_equal(p_ref, p_d)
            for a, b, c in zip(o_ref, o_h, o_d):
                np.testing.assert_array_equal(a, b)
                np.testing.assert_array_equal(a, c)


def test_predict_streaming_rejects_shuffle():
    import pytest

    from multimodn_tpu.data import predict_streaming

    ds = _setup()
    with pytest.raises(ValueError, match="mapped back"):
        predict_streaming(_model(), StreamingLoader(ds, 16, shuffle=True))

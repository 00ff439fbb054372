"""on_epoch progress callbacks: per-epoch scalar payloads streamed from
INSIDE the fused programs via ordered jax.debug.callback — the fused
multi-epoch dispatch is otherwise opaque until it returns (the reference
prints per batch because its loop is host Python, multimodn.py:214-220)."""
import numpy as np
import pytest

from multimodn_tpu import Adam, MultiModN, MultiModNHistory
from multimodn_tpu.data import ArrayLoader, PartitionDataset
from multimodn_tpu.decoders import LogisticDecoder
from multimodn_tpu.encoders import MLPEncoder


def _setup(seed=0):
    rng = np.random.default_rng(seed)
    X = rng.normal(size=(80, 6)).astype(np.float32)
    y = (X @ rng.normal(size=6) > 0).astype(np.int64)[:, None]
    ds = PartitionDataset(X, y, [3, 3])
    tr, va, _ = ds.random_split((0.7, 0.3, 0), seed=0)
    return ArrayLoader(tr, 16), ArrayLoader(va, 16)


def _model(seed=0):
    return MultiModN(2, [MLPEncoder(2, 3, (4,)), MLPEncoder(2, 3, (4,))],
                     [LogisticDecoder(2)], 0.7, 0.3, seed=seed)


def test_fit_callback_streams_every_epoch_in_order():
    tl, vl = _setup()
    seen = []
    m = _model()
    h = MultiModNHistory(["t"])
    m.fit(tl, Adam(0.01), "cross_entropy", epochs=6, history=h,
          val_loader=vl, on_epoch=seen.append)
    # No effects_barrier here: fit guarantees delivery before returning.
    assert [p["epoch"] for p in seen] == list(range(6))
    assert all(np.isfinite(p["train_loss"]) and np.isfinite(p["val_loss"])
               for p in seen)
    # The streamed train loss equals the history's epoch grid mean.
    hist_means = [float(np.mean(l)) for l in h.loss["train"]]
    np.testing.assert_allclose([p["train_loss"] for p in seen], hist_means,
                               rtol=1e-5, atol=1e-6)


def test_fit_callback_without_val():
    tl, _ = _setup(1)
    seen = []
    m = _model(1)
    m.fit(tl, Adam(0.01), "cross_entropy", epochs=3, on_epoch=seen.append)
    assert len(seen) == 3
    assert "val_loss" not in seen[0] and "train_loss" in seen[0]


def test_fit_best_callback_includes_score():
    tl, vl = _setup(2)
    seen = []
    m = _model(2)
    r = m.fit_best(tl, Adam(0.01), "cross_entropy", epochs=4,
                   val_loader=vl, on_epoch=seen.append)
    assert len(seen) == 4
    np.testing.assert_allclose([p["score"] for p in seen], r["scores"],
                               rtol=1e-5, atol=1e-6)


def test_early_stop_callback_fires_only_for_ran_epochs():
    from multimodn_tpu import SGD
    tl, vl = _setup(3)
    seen = []
    m = _model(3)
    r = m.fit_best(tl, SGD(0.0), "cross_entropy", epochs=20, val_loader=vl,
                   patience=2, on_epoch=seen.append)
    assert r["epochs_ran"] == 3
    assert [p["epoch"] for p in seen] == [0, 1, 2]


def test_callback_does_not_change_training():
    tl, vl = _setup(4)
    m1, m2 = _model(4), _model(4)
    h1, h2 = MultiModNHistory(["t"]), MultiModNHistory(["t"])
    m1.fit(tl, Adam(0.01), "cross_entropy", epochs=5, history=h1,
           val_loader=vl)
    m2.fit(tl, Adam(0.01), "cross_entropy", epochs=5, history=h2,
           val_loader=vl, on_epoch=lambda p: None)
    for e in range(5):
        np.testing.assert_allclose(h1.loss["train"][e], h2.loss["train"][e],
                                   rtol=1e-6, atol=1e-7)
    import jax
    for a, b in zip(jax.tree_util.tree_leaves(m1.state_dict()),
                    jax.tree_util.tree_leaves(m2.state_dict())):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)


def test_fresh_callbacks_reuse_one_program():
    """Programs are cached on callback PRESENCE: per-call lambdas must not
    retrace the fused program (review finding — identity-keyed caching
    recompiled per closure and pinned it forever)."""
    tl, vl = _setup(6)
    m = _model(6)
    opt = Adam(0.01)
    m.fit(tl, opt, "cross_entropy", epochs=2, val_loader=vl,
          on_epoch=lambda p: None)
    n_programs = len(m._fn_cache)
    fit_fn = next(v for k, v in m._fn_cache.items()
                  if k[0] == "fit" and k[-1] is True)
    seen = []
    m.fit(tl, opt, "cross_entropy", epochs=2, val_loader=vl,
          on_epoch=seen.append)   # different callback object
    assert len(m._fn_cache) == n_programs
    assert fit_fn._cache_size() == 1
    assert [p["epoch"] for p in seen] == [0, 1]


def test_mesh_on_epoch_unordered_delivery():
    """Round 4 (VERDICT r3 next-#4): meshed auto-engine models stream
    per-epoch payloads via UNORDERED jax.debug.callback (XLA rejects
    ordered effects in multi-device executables). One payload per epoch
    with the GLOBAL scalars; order not guaranteed (the epoch id is in the
    payload); values equal the single-device ordered run's."""
    from multimodn_tpu.parallel import make_mesh
    tl, vl = _setup(7)
    mesh = make_mesh(axis_names=("data",))
    m_mesh = MultiModN(2, [MLPEncoder(2, 3, (4,)), MLPEncoder(2, 3, (4,))],
                       [LogisticDecoder(2)], 0.7, 0.3, mesh=mesh)
    m_single = _model()
    mesh_seen, single_seen = [], []
    m_mesh.fit(tl, Adam(0.01), "cross_entropy", epochs=5, val_loader=vl,
               on_epoch=mesh_seen.append)
    m_single.fit(_setup(7)[0], Adam(0.01), "cross_entropy", epochs=5,
                 val_loader=_setup(7)[1], on_epoch=single_seen.append)
    # Delivery guaranteed before fit returns; exactly one payload/epoch.
    assert sorted(p["epoch"] for p in mesh_seen) == list(range(5))
    by_epoch = {p["epoch"]: p for p in mesh_seen}
    for p in single_seen:
        np.testing.assert_allclose(by_epoch[p["epoch"]]["train_loss"],
                                   p["train_loss"], rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(by_epoch[p["epoch"]]["val_loss"],
                                   p["val_loss"], rtol=1e-5, atol=1e-6)


def test_mesh_on_epoch_fit_best_with_patience():
    """The while_loop early-stop program also streams unordered payloads on
    the mesh, only for epochs that actually ran."""
    from multimodn_tpu import SGD
    from multimodn_tpu.parallel import make_mesh
    tl, vl = _setup(3)
    mesh = make_mesh(axis_names=("data",))
    m = MultiModN(2, [MLPEncoder(2, 3, (4,)), MLPEncoder(2, 3, (4,))],
                  [LogisticDecoder(2)], 0.7, 0.3, seed=3, mesh=mesh)
    seen = []
    r = m.fit_best(tl, SGD(0.0), "cross_entropy", epochs=20, val_loader=vl,
                   patience=2, on_epoch=seen.append)
    assert r["epochs_ran"] == 3
    assert sorted(p["epoch"] for p in seen) == [0, 1, 2]
    np.testing.assert_allclose(
        sorted(p["score"] for p in seen), sorted(r["scores"]),
        rtol=1e-5, atol=1e-6)


def test_shard_map_on_epoch():
    """The explicit engine streams the same per-epoch payloads as the
    auto engine: emission happens inside the shard_map region but is
    gated to the mesh-origin shard (_sm_emit_epoch), so exactly one
    unordered payload per epoch arrives with the GLOBAL scalars (this
    used to be rejected; the mesh-level equality lives in
    test_shard_map.py)."""
    from multimodn_tpu.parallel import make_mesh
    tl, vl = _setup(5)
    mesh = make_mesh(axis_names=("data",))
    m = MultiModN(2, [MLPEncoder(2, 3, (4,)), MLPEncoder(2, 3, (4,))],
                  [LogisticDecoder(2)], 0.7, 0.3, mesh=mesh,
                  dp_engine="shard_map")
    seen = []
    m.fit(tl, Adam(0.01), "cross_entropy", epochs=2, on_epoch=seen.append)
    assert [p["epoch"] for p in sorted(seen, key=lambda p: p["epoch"])] \
        == [0, 1]
    seen2 = []
    r = m.fit_best(tl, Adam(0.01), "cross_entropy", epochs=2,
                   val_loader=vl, on_epoch=seen2.append)
    assert len(seen2) == 2
    np.testing.assert_allclose(sorted(p["score"] for p in seen2),
                               sorted(r["scores"]), rtol=1e-5, atol=1e-6)


def test_chunked_fit_resumable_progress_pattern():
    """The chunked-fit_resumable progress pattern: per-chunk host
    progress while matching one-shot training exactly (works under every
    engine, including ones with no in-program emission)."""
    import tempfile

    from multimodn_tpu import MultiModNHistory
    from multimodn_tpu.checkpoint import fit_resumable

    tl, _ = _setup(8)
    m1, m2 = _model(8), _model(8)
    h1, h2 = MultiModNHistory(["t"]), MultiModNHistory(["t"])
    m1.fit(tl, Adam(0.01), "cross_entropy", epochs=6, history=h1)
    progress = []
    with tempfile.TemporaryDirectory() as d:
        fit_resumable(m2, tl, Adam(0.01), "cross_entropy", epochs=6,
                      checkpoint_dir=d, chunk_epochs=2, history=h2,
                      on_chunk=lambda done, total: progress.append(done))
    assert progress == [2, 4, 6]
    for e in range(6):
        np.testing.assert_allclose(h1.loss["train"][e], h2.loss["train"][e],
                                   rtol=1e-6, atol=1e-7)

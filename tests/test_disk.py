"""Disk-backed streaming loaders (data/disk.py): native CSV random-access
reads, memmap streaming, batch equality vs the host-resident
StreamingLoader, and bounded host memory.

The reference's only data path copies the whole dataset through a per-batch
DataLoader (multimodn/multimodn.py:132-135); these tests pin the
larger-than-host-RAM capability it lacks.
"""
import numpy as np
import pytest

from multimodn_tpu.data import native
from multimodn_tpu.data.disk import CSVStreamingLoader, NpyStreamingLoader
from multimodn_tpu.data.streaming import StreamingLoader

WIDTHS = [3, 5, 2]
N_TARGETS = 2


def _write_csv(path, X, y, nan_cells=()):
    cols = [f"f{i}" for i in range(X.shape[1])] + \
        [f"t{j}" for j in range(y.shape[1])]
    with open(path, "w") as f:
        f.write(",".join(cols) + "\n")
        for i in range(X.shape[0]):
            cells = []
            for j, v in enumerate(X[i]):
                cells.append("" if (i, j) in nan_cells else repr(float(v)))
            cells += [str(int(t)) for t in y[i]]
            f.write(",".join(cells) + "\n")


@pytest.fixture(scope="module")
def small_data():
    rng = np.random.default_rng(0)
    X = rng.normal(size=(53, sum(WIDTHS))).astype(np.float32)
    y = rng.integers(0, 2, size=(53, N_TARGETS))
    return X, y


@pytest.fixture(scope="module")
def csv_path(tmp_path_factory, small_data):
    X, y = small_data
    path = tmp_path_factory.mktemp("disk") / "data.csv"
    _write_csv(str(path), X, y, nan_cells={(4, 1), (17, 9)})
    return str(path)


def _native_available():
    return native.get_lib() is not None and \
        hasattr(native.get_lib(), "csv_index")


# ---------------------------------------------------------------------------
# Native chunked reader
# ---------------------------------------------------------------------------

@pytest.mark.skipif(not _native_available(), reason="native lib unavailable")
def test_csv_index_spans_cover_rows(csv_path, small_data):
    X, y = small_data
    n_rows, n_cols, offsets = native.csv_index(csv_path)
    assert n_rows == X.shape[0]
    assert n_cols == X.shape[1] + N_TARGETS
    assert offsets.shape == (n_rows + 1,)
    assert bool(np.all(np.diff(offsets) > 0))
    # The whole-file reader is the oracle for contents.
    full, _ = native.read_csv_f64(csv_path, strict=True)
    blk = native.csv_read_block(csv_path, int(offsets[0]),
                                int(offsets[n_rows]), n_rows, n_cols)
    np.testing.assert_array_equal(np.isnan(full), np.isnan(blk))
    np.testing.assert_array_equal(full[~np.isnan(full)],
                                  blk[~np.isnan(blk)])


@pytest.mark.skipif(not _native_available(), reason="native lib unavailable")
def test_csv_read_rows_shuffled(csv_path):
    n_rows, n_cols, offsets = native.csv_index(csv_path)
    full, _ = native.read_csv_f64(csv_path, strict=True)
    idx = np.array([7, 0, 52, 31, 4])
    spans = np.stack([offsets[idx], offsets[idx + 1]], axis=1)
    got = native.csv_read_rows(csv_path, spans, n_cols)
    want = full[idx]
    np.testing.assert_array_equal(np.isnan(want), np.isnan(got))
    np.testing.assert_array_equal(want[~np.isnan(want)],
                                  got[~np.isnan(got)])


# ---------------------------------------------------------------------------
# Loader equality vs StreamingLoader (same rows -> identical batches)
# ---------------------------------------------------------------------------

def _assert_batches_equal(a, b):
    batches_a, batches_b = list(a.iter_batches()), list(b.iter_batches())
    assert len(batches_a) == len(batches_b)
    for (da, ta, ma), (db, tb, mb) in zip(batches_a, batches_b):
        assert len(da) == len(db)
        for xa, xb in zip(da, db):
            np.testing.assert_array_equal(np.isnan(xa), np.isnan(xb))
            np.testing.assert_array_equal(xa[~np.isnan(xa)],
                                          xb[~np.isnan(xb)])
        np.testing.assert_array_equal(ta, tb)
        np.testing.assert_array_equal(ma, mb)


def _ram_loader(small_data, batch, shuffle=False, seed=0):
    from multimodn_tpu.data import PartitionDataset
    X, y = small_data
    Xn = X.copy()
    Xn[4, 1] = np.nan
    Xn[17, 9] = np.nan
    ds = PartitionDataset(Xn, y, WIDTHS)
    return StreamingLoader(ds, batch, shuffle=shuffle, seed=seed)


@pytest.mark.quick
@pytest.mark.skipif(not _native_available(), reason="native lib unavailable")
@pytest.mark.parametrize("batch", [16, 53, 7])
def test_csv_loader_matches_streaming(csv_path, small_data, batch):
    ram = _ram_loader(small_data, batch)
    disk = CSVStreamingLoader(csv_path, WIDTHS, N_TARGETS, batch)
    assert disk.n_samples == ram.n_samples
    assert disk.n_batches == ram.n_batches
    assert disk.modality_widths == ram.modality_widths
    _assert_batches_equal(disk, ram)


@pytest.mark.skipif(not _native_available(), reason="native lib unavailable")
def test_csv_loader_shuffle_matches_streaming(csv_path, small_data):
    # Identical rng construction (default_rng(seed) permuting arange) ->
    # identical orders -> identical shuffled batches, epoch after epoch.
    ram = _ram_loader(small_data, 16, shuffle=True, seed=3)
    disk = CSVStreamingLoader(csv_path, WIDTHS, N_TARGETS, 16, shuffle=True,
                              seed=3)
    for _ in range(3):
        ram.reshuffle()
        disk.reshuffle()
        _assert_batches_equal(disk, ram)


@pytest.mark.quick
def test_npy_loader_matches_streaming(tmp_path, small_data):
    X, y = small_data
    Xn = X.copy()
    Xn[4, 1] = np.nan
    Xn[17, 9] = np.nan
    mat = np.concatenate([Xn, y.astype(np.float32)], axis=1)
    path = tmp_path / "data.npy"
    np.save(path, mat)
    ram = _ram_loader(small_data, 16, shuffle=True, seed=5)
    disk = NpyStreamingLoader(str(path), WIDTHS, N_TARGETS, 16,
                              shuffle=True, seed=5)
    assert isinstance(disk._m, np.memmap)
    for _ in range(2):
        ram.reshuffle()
        disk.reshuffle()
        _assert_batches_equal(disk, ram)


def test_pandas_fallback_sequential(csv_path, small_data, monkeypatch):
    monkeypatch.setattr(native, "csv_index", lambda path: None)
    ram = _ram_loader(small_data, 16)
    disk = CSVStreamingLoader(csv_path, WIDTHS, N_TARGETS, 16)
    assert disk._offsets is None
    assert disk.n_samples == ram.n_samples
    _assert_batches_equal(disk, ram)
    with pytest.raises(NotImplementedError, match="shuffle"):
        CSVStreamingLoader(csv_path, WIDTHS, N_TARGETS, 16, shuffle=True)


def test_layout_validation(csv_path):
    with pytest.raises(ValueError, match="columns"):
        CSVStreamingLoader(csv_path, [100, 100], 1, 16)
    with pytest.raises(ValueError, match="n_targets"):
        CSVStreamingLoader(csv_path, WIDTHS, 0, 16)


# ---------------------------------------------------------------------------
# Training equality: disk-backed loaders drive the streaming entry points
# bit-identically to host-resident streaming (hence to the fused programs,
# via tests/test_streaming.py's equalities).
# ---------------------------------------------------------------------------

def _model(seed=0):
    from multimodn_tpu import MultiModN
    from multimodn_tpu.decoders import MLPDecoder
    from multimodn_tpu.encoders import MIMICMLPEncoder
    return MultiModN(
        8, [MIMICMLPEncoder(8, w, (8,), dropout=0.0) for w in WIDTHS],
        [MLPDecoder(8, (8,), 2) for _ in range(N_TARGETS)], 1.0, 0.0,
        nan_skip="sample")


@pytest.mark.quick
@pytest.mark.skipif(not _native_available(), reason="native lib unavailable")
def test_train_epoch_streaming_from_csv(csv_path, small_data):
    from multimodn_tpu import Adam
    from multimodn_tpu.core.history import MultiModNHistory
    from multimodn_tpu.data.streaming import train_epoch_streaming

    runs = {}
    for name, ldr in {
            "ram": _ram_loader(small_data, 16),
            "csv": CSVStreamingLoader(csv_path, WIDTHS, N_TARGETS, 16)
    }.items():
        m = _model()
        h = MultiModNHistory([f"t{j}" for j in range(N_TARGETS)])
        for _ in range(2):
            train_epoch_streaming(m, ldr, Adam(1e-2), "cross_entropy", h)
        runs[name] = np.asarray(h.loss["train"])
    np.testing.assert_array_equal(runs["ram"], runs["csv"])


def test_fit_best_streaming_from_npy(tmp_path, small_data):
    from multimodn_tpu import Adam
    from multimodn_tpu.data.streaming import fit_best_streaming

    X, y = small_data
    mat = np.concatenate([X, y.astype(np.float32)], axis=1)
    np.save(tmp_path / "tr.npy", mat[:37])
    np.save(tmp_path / "va.npy", mat[37:])

    from multimodn_tpu.data import PartitionDataset
    ds_tr = PartitionDataset(X[:37], y[:37], WIDTHS)
    ds_va = PartitionDataset(X[37:], y[37:], WIDTHS)

    res = {}
    for name, (tr, va) in {
        "ram": (StreamingLoader(ds_tr, 16), StreamingLoader(ds_va, 16)),
        "npy": (NpyStreamingLoader(str(tmp_path / "tr.npy"), WIDTHS,
                                   N_TARGETS, 16),
                NpyStreamingLoader(str(tmp_path / "va.npy"), WIDTHS,
                                   N_TARGETS, 16)),
    }.items():
        m = _model()
        res[name] = fit_best_streaming(m, tr, Adam(1e-2), "cross_entropy",
                                       epochs=3, val_loader=va)
    assert res["ram"]["best_epoch"] == res["npy"]["best_epoch"]
    np.testing.assert_array_equal(res["ram"]["scores"], res["npy"]["scores"])


# ---------------------------------------------------------------------------
# Bounded host memory: iterating a CSV epoch must not pull the table into
# anonymous process memory (file-backed page cache is the kernel's).
# ---------------------------------------------------------------------------

def _anon_kb():
    with open("/proc/self/smaps_rollup") as f:
        for line in f:
            if line.startswith("Anonymous:"):
                return int(line.split()[1])
    return None  # pragma: no cover


@pytest.mark.skipif(not _native_available(), reason="native lib unavailable")
def test_csv_epoch_bounded_memory(tmp_path):
    rng = np.random.default_rng(0)
    n, width = 40000, 120   # ~90 MB of CSV text
    path = tmp_path / "big.csv"
    with open(path, "w") as f:
        f.write(",".join([f"f{i}" for i in range(width)] + ["t0"]) + "\n")
        for _ in range(40):
            block = rng.normal(size=(n // 40, width)).astype(np.float32)
            tgt = rng.integers(0, 2, size=(n // 40, 1))
            rows = np.concatenate([block, tgt.astype(np.float32)], axis=1)
            f.write("\n".join(",".join(repr(float(v)) for v in r)
                              for r in rows) + "\n")
    file_mb = path.stat().st_size / 1e6
    assert file_mb > 60
    loader = CSVStreamingLoader(str(path), [width], 1, batch_size=256)
    before = _anon_kb()
    peak = before
    for b, (data, targets, mask) in enumerate(loader.iter_batches()):
        if b % 16 == 0:
            peak = max(peak, _anon_kb())
    growth_mb = (peak - before) / 1024
    # One batch is 256*121*8 B ≈ 0.25 MB; allow generous allocator slack,
    # but the 90 MB table must never land in process memory.
    assert growth_mb < 20, f"anonymous RSS grew {growth_mb:.1f} MB"


# ---------------------------------------------------------------------------
# Failure honesty (round-5 review findings): a short read must error, not
# hand back uninitialized memory; a non-finite target cell must error, not
# cast to int32 garbage with mask 1.0.
# ---------------------------------------------------------------------------

@pytest.mark.skipif(not _native_available(), reason="native lib unavailable")
def test_csv_shrunk_after_indexing_errors(tmp_path, small_data):
    X, y = small_data
    path = tmp_path / "shrink.csv"
    _write_csv(str(path), X, y)
    loader = CSVStreamingLoader(str(path), WIDTHS, N_TARGETS, 16)
    _write_csv(str(path), X[:5], y[:5])   # file shrank since indexing
    with pytest.raises(ValueError, match="changed since"):
        list(loader.iter_batches())


def test_nan_target_cell_rejected(tmp_path, small_data):
    X, y = small_data
    # npy path: NaN in a target column
    mat = np.concatenate([X, y.astype(np.float32)], axis=1)
    mat[3, sum(WIDTHS) + 1] = np.nan
    np.save(tmp_path / "bad.npy", mat)
    ldr = NpyStreamingLoader(str(tmp_path / "bad.npy"), WIDTHS, N_TARGETS, 16)
    with pytest.raises(ValueError, match="non-finite target"):
        list(ldr.iter_batches())
    # csv path (native or pandas fallback alike): empty target cell
    path = tmp_path / "bad.csv"
    with open(path, "w") as f:
        cols = [f"f{i}" for i in range(sum(WIDTHS))] + \
            [f"t{j}" for j in range(N_TARGETS)]
        f.write(",".join(cols) + "\n")
        for i in range(8):
            cells = [repr(float(v)) for v in X[i]] + \
                [str(int(t)) for t in y[i]]
            if i == 5:
                cells[-1] = ""            # missing target
            f.write(",".join(cells) + "\n")
    ldr = CSVStreamingLoader(str(path), WIDTHS, N_TARGETS, 8)
    with pytest.raises(ValueError, match="non-finite target"):
        list(ldr.iter_batches())


# ---------------------------------------------------------------------------
# rows= subset views: ONE big file + per-fold index lists (the k-fold
# workflow) must equal per-fold file copies.
# ---------------------------------------------------------------------------

def test_rows_subset_equals_per_fold_files(tmp_path, small_data):
    X, y = small_data
    mat = np.concatenate([X, y.astype(np.float32)], axis=1)
    np.save(tmp_path / "all.npy", mat)
    fold = np.asarray([3, 7, 8, 11, 20, 21, 40, 52, 5, 33])
    np.save(tmp_path / "fold.npy", mat[fold])
    sub = NpyStreamingLoader(str(tmp_path / "all.npy"), WIDTHS, N_TARGETS,
                             4, rows=fold)
    per = NpyStreamingLoader(str(tmp_path / "fold.npy"), WIDTHS, N_TARGETS,
                             4)
    assert sub.n_samples == per.n_samples == fold.size
    _assert_batches_equal(sub, per)
    # shuffled subset views draw identical epochs for identical seeds
    s1 = NpyStreamingLoader(str(tmp_path / "all.npy"), WIDTHS, N_TARGETS,
                            4, shuffle=True, seed=5, rows=fold)
    s2 = NpyStreamingLoader(str(tmp_path / "fold.npy"), WIDTHS, N_TARGETS,
                            4, shuffle=True, seed=5)
    s1.reshuffle(); s2.reshuffle()
    _assert_batches_equal(s1, s2)

    if _native_available():
        _write_csv(str(tmp_path / "all.csv"), X, y)
        csub = CSVStreamingLoader(str(tmp_path / "all.csv"), WIDTHS,
                                  N_TARGETS, 4, rows=fold)
        _assert_batches_equal(csub, per)

    with pytest.raises(ValueError, match="out of range"):
        NpyStreamingLoader(str(tmp_path / "all.npy"), WIDTHS, N_TARGETS, 4,
                           rows=[0, 99])


def test_rows_subset_kfold_one_file(tmp_path, small_data):
    """Streamed kfold over ONE file with per-fold rows= — equal to the
    fused in-memory program on the same rows."""
    from multimodn_tpu import Adam, MultiModN
    from multimodn_tpu.data import ArrayLoader, PartitionDataset
    from multimodn_tpu.data.dataset import Subset
    from multimodn_tpu.decoders import MLPDecoder
    from multimodn_tpu.encoders import MIMICMLPEncoder
    from multimodn_tpu.experiments import kfold_fit_best

    X, y = small_data
    Xn = X.copy()
    Xn[4, 1] = np.nan
    Xn[17, 9] = np.nan
    mat = np.concatenate([Xn, y.astype(np.float32)], axis=1)
    np.save(tmp_path / "all.npy", mat)
    ds = PartitionDataset(Xn, y, WIDTHS)

    splits = [(list(range(0, 24)), list(range(24, 36))),
              (list(range(36, 52)), list(range(0, 12)))]
    disk_folds = [(NpyStreamingLoader(str(tmp_path / "all.npy"), WIDTHS,
                                      N_TARGETS, 8, rows=tr),
                   NpyStreamingLoader(str(tmp_path / "all.npy"), WIDTHS,
                                      N_TARGETS, 8, rows=va))
                  for tr, va in splits]
    ram_folds = [(ArrayLoader(Subset(ds, tr), 8),
                  ArrayLoader(Subset(ds, va), 8)) for tr, va in splits]

    def fac(seed):
        return MultiModN(
            4, [MIMICMLPEncoder(4, w, (6,), dropout=0.0) for w in WIDTHS],
            [MLPDecoder(4, (6,), 2) for _ in range(N_TARGETS)], 1.0, 0.0,
            seed=seed)

    fused = kfold_fit_best(fac, ram_folds, Adam(1e-2), "cross_entropy",
                           epochs=3)
    disk = kfold_fit_best(fac, disk_folds, Adam(1e-2), "cross_entropy",
                          epochs=3)
    for rf, rd in zip(fused, disk):
        assert rf["best_epoch"] == rd["best_epoch"]
        np.testing.assert_array_equal(rf["scores"], rd["scores"])


def test_export_streaming_matrix_roundtrip(tmp_path, small_data):
    """Dataset -> .npy bridge: exported matrix streams batches identical
    to the in-memory StreamingLoader over the same dataset (NaNs in
    feature cells preserved)."""
    from multimodn_tpu.data import PartitionDataset
    from multimodn_tpu.data.disk import export_streaming_matrix

    X, y = small_data
    Xn = X.copy()
    Xn[4, 1] = np.nan
    Xn[17, 9] = np.nan
    ds = PartitionDataset(Xn, y, WIDTHS)
    path, widths, n_targets = export_streaming_matrix(
        ds, str(tmp_path / "ds.npy"), chunk_rows=16)
    assert widths == WIDTHS and n_targets == N_TARGETS
    disk = NpyStreamingLoader(path, widths, n_targets, 16)
    ram = _ram_loader(small_data, 16)
    _assert_batches_equal(disk, ram)


def test_export_streaming_matrix_guards(tmp_path, small_data):
    from multimodn_tpu.data import PartitionDataset
    from multimodn_tpu.data.disk import export_streaming_matrix

    X, y = small_data
    ds = PartitionDataset(X, y, WIDTHS)
    with pytest.raises(ValueError, match="chunk_rows"):
        export_streaming_matrix(ds, str(tmp_path / "a.npy"), chunk_rows=0)

    class SeqDS(PartitionDataset):
        def __getitem__(self, i):
            xs, t = super().__getitem__(i)[:2]
            return xs, t, np.asarray([2, 1, 0], np.int64)

    with pytest.raises(NotImplementedError, match="encoding sequences"):
        export_streaming_matrix(SeqDS(X, y, WIDTHS),
                                str(tmp_path / "b.npy"))

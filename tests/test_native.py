"""Native C++ epoch packer: availability, equivalence with the numpy path,
and the NaN-aware standardizer vs sklearn."""
import numpy as np
import pytest

from multimodn_tpu.data import ArrayLoader, PartitionDataset
from multimodn_tpu.data import native
from multimodn_tpu.data.dataset import Subset


def test_native_library_builds():
    assert native.get_lib() is not None, \
        "g++ is in this image; the packer must compile"


def test_pack_epoch_matches_numpy_path():
    rng = np.random.default_rng(0)
    X = rng.normal(size=(37, 9)).astype(np.float32)
    X[5, 2] = np.nan
    y = rng.integers(0, 2, size=(37, 1))
    ds = PartitionDataset(X, y, [4, 5])

    fast = ArrayLoader(ds, 8, use_native=True)
    slow = ArrayLoader(ds, 8, use_native=False)
    assert fast._full_X is not None and slow._full_X is None
    for a, b in zip(fast.stacks()[0], slow.stacks()[0]):
        np.testing.assert_array_equal(np.nan_to_num(np.asarray(a), nan=-7),
                                      np.nan_to_num(np.asarray(b), nan=-7))
    np.testing.assert_array_equal(np.asarray(fast.stacks()[2]),
                                  np.asarray(slow.stacks()[2]))
    np.testing.assert_array_equal(np.asarray(fast.stacks()[1]),
                                  np.asarray(slow.stacks()[1]))


def test_pack_epoch_subset_and_validity():
    rng = np.random.default_rng(1)
    X = rng.normal(size=(20, 6)).astype(np.float32)
    X[3, 0] = np.nan   # modality 0 invalid for row 3
    y = rng.integers(0, 2, size=(20, 1))
    ds = PartitionDataset(X, y, [3, 3])
    sub = Subset(ds, [3, 7, 1])
    packed = native.pack_epoch(X, np.array([3, 7, 1]), [3, 3], 2, 2)
    assert packed is not None
    blocks, mask, valid = packed
    assert blocks[0].shape == (2, 2, 3)
    np.testing.assert_array_equal(mask, [[1, 1], [1, 0]])
    # Row 3 (first in order) has NaN in modality 0 only.
    np.testing.assert_array_equal(valid[0, 0], [0, 1])
    np.testing.assert_array_equal(valid[0, 1], [1, 1])
    np.testing.assert_array_equal(valid[1, 1], [0, 0])  # padding
    # Loader comparison through a Subset too.
    fast = ArrayLoader(sub, 2, use_native=True)
    slow = ArrayLoader(sub, 2, use_native=False)
    for a, b in zip(fast.stacks()[0], slow.stacks()[0]):
        np.testing.assert_array_equal(np.nan_to_num(np.asarray(a), nan=-7),
                                      np.nan_to_num(np.asarray(b), nan=-7))


def test_standardize_matches_sklearn():
    from sklearn.preprocessing import StandardScaler
    rng = np.random.default_rng(2)
    X = rng.normal(size=(50, 5)).astype(np.float32) * 3 + 1
    X[4, 1] = np.nan
    X[:, 3] = 2.0  # zero-variance column
    got = native.standardize_columns(X.copy())
    assert got is not None
    want = StandardScaler().fit_transform(X.astype(np.float64))
    np.testing.assert_allclose(got, want.astype(np.float32),
                               atol=1e-5, equal_nan=True)


def test_training_identical_with_and_without_native():
    from multimodn_tpu import Adam, MultiModN, MultiModNHistory
    from multimodn_tpu.decoders import LogisticDecoder
    from multimodn_tpu.encoders import MLPEncoder

    rng = np.random.default_rng(3)
    X = rng.normal(size=(30, 6)).astype(np.float32)
    y = rng.integers(0, 2, size=(30, 1))
    ds = PartitionDataset(X, y, [3, 3])
    results = []
    for use_native in (True, False):
        loader = ArrayLoader(ds, 8, use_native=use_native)
        m = MultiModN(2, [MLPEncoder(2, 3, (4,)), MLPEncoder(2, 3, (4,))],
                      [LogisticDecoder(2)], 0.7, 0.3)
        h = MultiModNHistory(["t"])
        m.fit(loader, Adam(0.01), "cross_entropy", epochs=3, history=h)
        results.append(h.loss["train"][-1])
    np.testing.assert_array_equal(results[0], results[1])


def test_native_csv_reader_matches_pandas(tmp_path):
    """Numeric CSVs (the MIMIC cache shape) parse identically to pandas:
    values, NaNs, and column names."""
    import pandas as pd

    from multimodn_tpu.data import native

    rng = np.random.default_rng(0)
    df = pd.DataFrame(rng.normal(size=(64, 12)).astype(np.float32),
                      columns=[f"c{i}" for i in range(12)])
    df.iloc[3, 5] = np.nan
    df.iloc[10, 0] = np.nan
    path = tmp_path / "numeric.csv"
    df.to_csv(path, index=False)

    result = native.read_csv_f64(str(path))
    if result is None:
        import pytest
        pytest.skip("native library unavailable")
    mat, cols = result
    assert mat.dtype == np.float64
    assert cols == list(df.columns)
    ref = pd.read_csv(path).to_numpy(np.float64)
    np.testing.assert_allclose(mat, ref, rtol=1e-12, equal_nan=True)


def test_native_csv_reader_rejects_non_numeric(tmp_path):
    """String cells / quoted fields make the reader bail (pandas fallback)."""
    from multimodn_tpu.data import native

    p1 = tmp_path / "strings.csv"
    p1.write_text("a,b\n1.5,hello\n2.0,3.0\n")
    p2 = tmp_path / "quoted.csv"
    p2.write_text('a,b\n"1,5",2\n')
    if native.get_lib() is None:
        import pytest
        pytest.skip("native library unavailable")
    assert native.read_csv_f64(str(p1)) is None
    assert native.read_csv_f64(str(p2)) is None


def test_mimic_cache_reads_through_native_path(tmp_path):
    """load_mimic_data round-trips through the native CSV fast path with
    values identical to a pure-pandas read."""
    import pandas as pd

    from multimodn_tpu.data.mimic import _read_numeric_csv, load_mimic_data

    data, labels, features, partitions = load_mimic_data(
        ["Fracture"], ["de", "ts_ce"], cache_root=str(tmp_path / "cache"),
        synthetic_kwargs={"n_patients": 12, "seed": 0})
    cache_dir = None
    for root, dirs, files in __import__("os").walk(str(tmp_path / "cache")):
        if "data.csv" in files:
            cache_dir = root
    assert cache_dir is not None
    fast = _read_numeric_csv(cache_dir + "/data.csv")
    slow = pd.read_csv(cache_dir + "/data.csv")
    assert list(fast.columns) == list(slow.columns)
    np.testing.assert_allclose(fast.to_numpy(np.float32),
                               slow.to_numpy(np.float32),
                               rtol=1e-6, equal_nan=True)

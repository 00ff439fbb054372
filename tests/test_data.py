"""Data-layer tests: split parity with the reference algorithm, partition
validation, loaders, datasets, checkpoints."""
from pathlib import Path

import numpy as np
import pytest

from multimodn_tpu.data import (
    ArrayLoader,
    FeatureWiseDataset,
    JointDatasets,
    MIMICDataset,
    PartitionDataset,
    TitanicDataset,
)
from multimodn_tpu.data.dataset import Subset


def _ds(n=50, f=6, seed=0, partitions=None):
    rng = np.random.default_rng(seed)
    X = rng.normal(size=(n, f)).astype(np.float32)
    y = rng.integers(0, 2, size=(n, 1))
    return PartitionDataset(X, y, partitions)


def test_random_split_matches_reference_algorithm():
    """Same seeded permutation + grouping + remainder-to-split-0 as the
    reference (multimod_dataset.py:14-52), verified against an independent
    torch-based replica."""
    import torch
    from itertools import accumulate

    ds = _ds(53)
    probs = (0.6, 0.3, 0.1)
    seed = 7
    splits = ds.random_split(probs, seed, balanced_target_idx=0)

    gen = torch.Generator().manual_seed(seed)
    shuffled = torch.randperm(len(ds), generator=gen).tolist()
    groups = {}
    for idx in shuffled:
        groups.setdefault(int(ds[idx][1][0]), []).append(idx)
    expected = [[] for _ in probs]
    for indices in groups.values():
        lengths = [int(len(indices) * p / sum(probs)) for p in probs]
        lengths[0] += len(indices) - sum(lengths)
        for i, (off, ln) in enumerate(zip(accumulate(lengths), lengths)):
            expected[i] += indices[off - ln:off]
    for got, want in zip(splits, expected):
        assert got.indices == want


def test_random_split_covers_all_indices():
    ds = _ds(41)
    splits = ds.random_split((0.5, 0.25, 0.25), seed=3)
    all_idx = sorted(i for s in splits for i in s.indices)
    assert all_idx == list(range(41))


def test_partition_dataset_validation_and_items():
    ds = _ds(10, 6, partitions=[2, 4])
    x, y = ds[3]
    assert len(x) == 2 and x[0].shape == (2,) and x[1].shape == (4,)
    with pytest.raises(ValueError):
        PartitionDataset(np.zeros((5, 6), np.float32), np.zeros(5), [2, 2])


def test_featurewise_dataset():
    ds = FeatureWiseDataset(np.zeros((7, 4), np.float32), np.zeros(7))
    x, _ = ds[0]
    assert len(x) == 4 and all(a.shape == (1,) for a in x)


def test_joint_datasets_concatenates():
    a = _ds(9, 4, partitions=[2, 2])
    b = _ds(9, 3, seed=1)
    joint = JointDatasets([a, b])
    x, y = joint[2]
    assert len(x) == 2
    assert x[0].shape == (4,) and x[1].shape == (3,)


def test_loader_generic_item_path():
    """Datasets without .arrays() go through the per-item loop."""

    class Custom:
        def __len__(self):
            return 8

        def __getitem__(self, i):
            return [np.full(3, i, np.float32), np.full(2, -i, np.float32)], \
                np.array([i % 2])

    loader = ArrayLoader(Custom(), 3)
    data, targets, mask = loader.stacks()
    assert data[0].shape == (3, 3, 3) and data[1].shape == (3, 3, 2)
    assert np.asarray(mask).sum() == 8  # 8 real rows, 1 padded


def test_loader_subset_fast_path_equals_generic():
    ds = _ds(20, 5, partitions=[2, 3])
    sub = Subset(ds, [3, 1, 4, 15, 9])
    loader = ArrayLoader(sub, 2)
    rows = [sub[i] for i in range(5)]
    data, targets, mask = (np.asarray(loader.stacks()[0][0]),
                           np.asarray(loader.stacks()[1]),
                           np.asarray(loader.stacks()[2]))
    flat = data.reshape(-1, 2)[mask.reshape(-1) > 0]
    np.testing.assert_allclose(flat, np.stack([r[0][0] for r in rows]))


def test_titanic_preprocessing_columns():
    ds = TitanicDataset(["Fare", "Pclass", "Age", "Sex_male", "Relatives",
                         "Embarked"], ["Survived"])
    assert ds.X.shape[1] == 6
    assert set(np.unique(ds.y)) <= {0, 1}
    # standardized features ~ zero mean
    assert abs(ds.X.mean()) < 0.1


def test_titanic_keep_missing():
    ds = TitanicDataset(["Cabin_num", "Fare", "Age"], ["Survived"],
                        dropna=False, std=True)
    assert np.isnan(ds.X).any()  # Cabin/Age NaNs preserved


def test_mimic_cache_roundtrip(tmp_path):
    kw = {"n_patients": 30}
    d1 = MIMICDataset(["de", "ts_ce"], ["Cardiomegaly"],
                      cache_root=str(tmp_path), synthetic_kwargs=kw)
    # Second construction must hit the cache (same data, no regeneration).
    d2 = MIMICDataset(["de", "ts_ce"], ["Cardiomegaly"],
                      cache_root=str(tmp_path), synthetic_kwargs=kw)
    np.testing.assert_allclose(d1.X, d2.X)
    assert d1.partitions == d2.partitions
    cache = Path(d1.cache_dir)
    assert cache.name == "de_ts_ce" and cache.parent.name == "Cardiomegaly"
    assert (cache / "data.csv").exists()
    assert (cache / "how_to_split.csv").exists()


def test_mimic_multi_target_agg_label(tmp_path):
    kw = {"n_patients": 30}
    d = MIMICDataset(["de", "ts_ce"], ["Enlarged Cardiomediastinum",
                                       "Cardiomegaly"],
                     cache_root=str(tmp_path), synthetic_kwargs=kw)
    assert d.y.shape[1] == 2


def test_checkpoint_roundtrip(tmp_path):
    from multimodn_tpu import Adam, MultiModN
    from multimodn_tpu.checkpoint import (CheckpointManager, load_checkpoint,
                                          save_checkpoint)
    from multimodn_tpu.decoders import LogisticDecoder
    from multimodn_tpu.encoders import MLPEncoder

    ds = _ds(20)
    loader = ArrayLoader(ds, 10)
    m = MultiModN(2, [MLPEncoder(2, 6, (4,))], [LogisticDecoder(2)], 0.7, 0.3)
    m.fit(loader, Adam(0.01), "cross_entropy", epochs=2)
    path = save_checkpoint(str(tmp_path / "ck.pkl"), m, epoch=2, score=1.5)
    m2 = MultiModN(2, [MLPEncoder(2, 6, (4,))], [LogisticDecoder(2)], 0.7, 0.3)
    payload = load_checkpoint(path, m2)
    assert payload["epoch"] == 2 and payload["auc_bac_val_cum"] == 1.5
    np.testing.assert_allclose(
        np.asarray(m.params["encoders"][0]["layers"][0]["w"]),
        np.asarray(m2.params["encoders"][0]["layers"][0]["w"]))

    mgr = CheckpointManager(str(tmp_path / "best"), keep=2)
    assert mgr.save(m, 1, 0.5)
    assert mgr.save(m, 2, 0.9)
    assert mgr.save(m, 3, 0.7)      # displaces nothing (keep=2, worst is 0.5)
    assert not mgr.save(m, 4, 0.1)  # below best-2
    assert "epoch2" in mgr.best_path


def test_loader_shuffle_reshuffles_per_epoch():
    ds = _ds(20, 4)
    loader = ArrayLoader(ds, 5, shuffle=True, seed=1)
    first = np.asarray(loader.stacks()[0][0]).copy()
    loader.reshuffle()
    second = np.asarray(loader.stacks()[0][0])
    assert not np.array_equal(first, second)
    # Same multiset of rows either way.
    np.testing.assert_allclose(np.sort(first.reshape(-1, 4), axis=0),
                               np.sort(second.reshape(-1, 4), axis=0))
    # shuffle=False is a no-op.
    stable = ArrayLoader(ds, 5, shuffle=False)
    a = np.asarray(stable.stacks()[0][0]).copy()
    stable.reshuffle()
    np.testing.assert_array_equal(a, np.asarray(stable.stacks()[0][0]))


def test_empty_loader_raises_clearly():
    import pytest

    from multimodn_tpu.data import ArrayLoader, PartitionDataset
    from multimodn_tpu.data.dataset import Subset

    ds = PartitionDataset(np.zeros((4, 4), np.float32),
                          np.zeros((4, 1), np.int64), [2, 2])
    with pytest.raises(ValueError, match="empty dataset"):
        ArrayLoader(Subset(ds, []))


def test_mimic_haim_ids_aligned_under_dropna(tmp_path):
    """haim_ids() must stay row-aligned with X/y after dropna removes
    NaN-injected rows (regression: it returned ids for ALL cache rows,
    leaking patients across folds)."""
    from multimodn_tpu.data import MIMICDataset

    full = MIMICDataset(["de", "ts_ce"], ["Fracture"],
                        cache_root=str(tmp_path),
                        synthetic_kwargs={"n_patients": 10, "seed": 0})
    n_full = len(full)
    dropped = MIMICDataset(["de", "ts_ce"], ["Fracture"], dropna=True,
                           put_none=True,
                           indices_to_nan=list(range(0, n_full, 3)),
                           features_to_nan="demo",
                           cache_root=str(tmp_path),
                           synthetic_kwargs={"n_patients": 10, "seed": 0})
    assert len(dropped) < n_full
    assert len(dropped.haim_ids()) == len(dropped)
    # The kept rows' ids are a subsequence of the full table's ids.
    assert set(dropped.haim_ids()) <= set(full.haim_ids())


def test_mimic_features_to_nan_single_string(tmp_path):
    from multimodn_tpu.data.mimic import load_mimic_data

    data, labels, features, partitions = load_mimic_data(
        ["Fracture"], ["de", "ts_ce"], put_none=True,
        indices_to_nan=[0, 1], features_to_nan=features_to_nan_name(),
        cache_root=str(tmp_path),
        synthetic_kwargs={"n_patients": 8, "seed": 0})
    col = features_to_nan_name()
    assert data[col].iloc[0] != data[col].iloc[0] or np.isnan(data[col].iloc[0])


def features_to_nan_name():
    return "ts_ce_0"


def test_single_target_cache_always_derives_from_canonical(tmp_path,
                                                           monkeypatch):
    """The reference's single-target loader reads the canonical
    two-pathology data.csv UNCONDITIONALLY (``mimic_get_nips_pathology_data``,
    mimic_dataset.py:96-99), so single-target row sets are the JOINT-filtered
    rows. A single-target cache built FIRST (no canonical on disk) must
    build the canonical cache and derive from it — not re-filter the raw
    embeddings per-target."""
    import os

    from multimodn_tpu.data.mimic import _read_numeric_csv, build_mimic_cache
    from multimodn_tpu.data.synth import (
        MIMIC_DEFAULT_TARGETS,
        synthetic_mimic_embeddings,
    )

    tgt0, tgt1 = MIMIC_DEFAULT_TARGETS
    df = synthetic_mimic_embeddings(n_patients=12, seed=3,
                                    sources=["de", "ts_ce"])
    # Corrupt one row's OTHER target to an invalid label: joint filtering
    # must drop the row even from single-target data.
    df.loc[df.index[2], tgt1] = 2
    csv = tmp_path / "cxr_ic_fusion_1103.csv"
    df.to_csv(csv, index=False)
    monkeypatch.setenv("MULTIMODN_MIMIC_EMBED_PATH", str(csv))

    root = str(tmp_path / "cache")
    single_dir = build_mimic_cache([tgt0], ["de", "ts_ce"], cache_root=root)
    canon_path = os.path.join(root, "_".join(MIMIC_DEFAULT_TARGETS),
                              "de_ts_ce", "data.csv")
    assert os.path.exists(canon_path), "canonical cache not auto-built"
    single = _read_numeric_csv(os.path.join(single_dir, "data.csv"))
    canon = _read_numeric_csv(canon_path)

    dedup = df.drop_duplicates(subset=["img_id", "img_charttime"])
    expect = dedup[dedup[tgt0].isin([0, 1]) & dedup[tgt1].isin([0, 1])]
    assert len(expect) < len(dedup)  # the corrupted row really was dropped
    assert len(single) == len(canon) == len(expect)
    np.testing.assert_array_equal(single["haim_id"].values,
                                  canon["haim_id"].values)


def test_mimic_synth_cache_tag_is_order_sensitive():
    """Round-5 review finding: synthetic generation draws per-source blocks
    in LIST ORDER, so differently-ordered GENERATOR `sources` kwargs must
    resolve to different cache roots. (The selection argument is already
    order-sensitive via build_mimic_cache's source_spec path segment; the
    old sorted tag aliased only generator-order differences under an
    identical selection.)"""
    from multimodn_tpu.data.mimic import _resolve_cache_root

    a = _resolve_cache_root("/root-x", {"sources": ["vd", "ts_ce"]})
    b = _resolve_cache_root("/root-x", {"sources": ["ts_ce", "vd"]})
    assert a != b


def test_mimic_features_to_nan_demo_without_demographics_raises(tmp_path):
    """features_to_nan='demo' with no de_* columns used to expand to [] and
    silently inject NOTHING — the MNAR experiment ran on clean data."""
    from multimodn_tpu.data.mimic import load_mimic_data

    with pytest.raises(KeyError, match="demographic"):
        load_mimic_data(["Cardiomegaly"], ["ts_ce"], put_none=True,
                        indices_to_nan=[0], features_to_nan="demo",
                        cache_root=str(tmp_path),
                        synthetic_kwargs={"n_patients": 20})


def test_mimic_split_matches_shared_helper(tmp_path):
    """MIMICDataset.random_split routes through dataset._split_indices —
    same arithmetic (incl. the remainder-to-split-0 quirk #13), index-list
    return (quirk #11)."""
    d = MIMICDataset(["de", "ts_ce"], ["Cardiomegaly"],
                     cache_root=str(tmp_path),
                     synthetic_kwargs={"n_patients": 30})
    splits = d.random_split((0.7, 0.2, 0.1), seed=3, balanced_target_idx=0)
    assert all(isinstance(s, list) for s in splits)
    allidx = sorted(i for s in splits for i in s)
    assert allidx == list(range(len(d)))  # partition of all rows
    # Balanced grouping: class proportions of split 1 mirror split 0's.
    y = d.y[:, 0]
    assert abs(np.mean(y[splits[0]]) - np.mean(y[splits[1]])) < 0.15

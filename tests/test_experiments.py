"""vmapped k-fold training: must match per-fold fit_best exactly, including
with unequal fold sizes (padded batches skipped via gated updates)."""
import numpy as np

from multimodn_tpu import Adam, MultiModN
from multimodn_tpu.data import ArrayLoader, PartitionDataset
from multimodn_tpu.data.dataset import Subset
from multimodn_tpu.decoders import LogisticDecoder
from multimodn_tpu.encoders import MLPEncoder
from multimodn_tpu.experiments import fold_history, kfold_fit_best


def _factory(seed):
    return MultiModN(3, [MLPEncoder(3, 3, (4,)), MLPEncoder(3, 3, (4,))],
                     [LogisticDecoder(3)], 1.0, 0.0, seed=seed)


def _folds(seed=0):
    rng = np.random.default_rng(seed)
    X = rng.normal(size=(90, 6)).astype(np.float32)
    y = (X @ rng.normal(size=6) > 0).astype(np.int64)[:, None]
    ds = PartitionDataset(X, y, [3, 3])
    # Unequal fold sizes on purpose: 40/12 vs 30/8 train/val rows ->
    # different batch counts, exercising the padded-batch gating.
    folds = [
        (ArrayLoader(Subset(ds, list(range(0, 40))), 16),
         ArrayLoader(Subset(ds, list(range(40, 52))), 16)),
        (ArrayLoader(Subset(ds, list(range(52, 82))), 16),
         ArrayLoader(Subset(ds, list(range(82, 90))), 16)),
    ]
    return folds


def test_kfold_vmap_matches_sequential():
    epochs = 5
    folds = _folds()
    results = kfold_fit_best(_factory, folds, Adam(0.01), "cross_entropy",
                             epochs=epochs)

    for f, (tr, va) in enumerate(_folds()):
        m = _factory(f)
        info = m.fit_best(tr, Adam(0.01), "cross_entropy", epochs=epochs,
                          val_loader=va)
        assert info["best_epoch"] == results[f]["best_epoch"]
        np.testing.assert_allclose(info["best_score"],
                                   results[f]["best_score"],
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(info["scores"], results[f]["scores"],
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(m.params["encoders"][0]["layers"][0]["w"]),
            np.asarray(results[f]["model"]
                       .params["encoders"][0]["layers"][0]["w"]),
            rtol=1e-5, atol=1e-6)


def test_fold_history_reconstruction():
    folds = _folds(1)
    results = kfold_fit_best(_factory, folds, Adam(0.01), "cross_entropy",
                             epochs=3)
    h = fold_history(results[0], ["t"])
    assert len(h.loss["train"]) == 3 and len(h.loss["val"]) == 3
    assert np.isfinite(h.loss["train"][-1]).all()
    # Padded batches must not dilute the epoch means: compare with the
    # sequential history for fold 1 (the shorter one).
    from multimodn_tpu import MultiModNHistory
    m = _factory(1)
    h_seq = MultiModNHistory(["t"])
    tr, va = _folds(1)[1]
    m.fit_best(tr, Adam(0.01), "cross_entropy", epochs=3, val_loader=va,
               history=h_seq)
    h1 = fold_history(results[1], ["t"])
    for e in range(3):
        np.testing.assert_allclose(h_seq.loss["train"][e],
                                   h1.loss["train"][e],
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(h_seq.accuracy["val"][e],
                                   h1.accuracy["val"][e],
                                   rtol=1e-5, atol=1e-6)


def test_kfold_supports_in_program_shuffle():
    """shuffle_mode with a homogeneous (scan) chain shuffles in-program and
    vmaps across folds; results match per-fold fit_best exactly."""
    from multimodn_tpu.encoders import MLPFeatureEncoder

    def factory(seed):
        return MultiModN(3, [MLPFeatureEncoder(3, 4) for _ in range(4)],
                         [LogisticDecoder(3)], 1.0, 0.0, seed=seed,
                         shuffle_mode=True)

    rng = np.random.default_rng(3)
    X = rng.normal(size=(64, 4)).astype(np.float32)
    y = (X @ rng.normal(size=4) > 0).astype(np.int64)[:, None]
    from multimodn_tpu.data import FeatureWiseDataset
    ds = FeatureWiseDataset(X, y)

    def folds():
        return [
            (ArrayLoader(Subset(ds, list(range(0, 32))), 16),
             ArrayLoader(Subset(ds, list(range(32, 48))), 16)),
            (ArrayLoader(Subset(ds, list(range(48, 64))), 16),
             ArrayLoader(Subset(ds, list(range(0, 16))), 16)),
        ]

    results = kfold_fit_best(factory, folds(), Adam(0.01), "cross_entropy",
                             epochs=3)
    for f, (tr, va) in enumerate(folds()):
        solo = factory(f)
        ref = solo.fit_best(tr, Adam(0.01), "cross_entropy", epochs=3,
                            val_loader=va)
        assert results[f]["best_epoch"] == ref["best_epoch"]
        np.testing.assert_allclose(results[f]["best_score"],
                                   ref["best_score"], rtol=1e-5, atol=1e-6)


def test_kfold_rejects_host_side_shuffle():
    import pytest

    def factory(seed):
        # Heterogeneous widths + shuffle off in-program path? force unrolled:
        return MultiModN(3, [MLPEncoder(3, 3, (4,)), MLPEncoder(3, 3, (4,))],
                         [LogisticDecoder(3)], 1.0, 0.0, seed=seed,
                         shuffle_mode=True, chain_mode="unrolled")

    with pytest.raises(NotImplementedError, match="in-program"):
        kfold_fit_best(factory, _folds(), Adam(0.01), "cross_entropy",
                       epochs=2)


def test_kfold_honors_uniform_encoding_sequence():
    """A dataset-supplied uniform non-identity sequence drives the vmapped
    k-fold program (regression: it was silently ignored before)."""
    class SeqDS(PartitionDataset):
        def __init__(self, X, y, parts):
            super().__init__(X, y, parts)
            self._seq = np.asarray([1, 0], np.int64)

        def __getitem__(self, i):
            xs, y = super().__getitem__(i)[:2]
            return xs, y, self._seq

        def arrays(self):
            xs, y = super().arrays()[:2]
            return xs, y, np.tile(self._seq[None, :], (len(self), 1))

    rng = np.random.default_rng(5)
    X = rng.normal(size=(64, 5)).astype(np.float32)
    y = (X @ rng.normal(size=5) > 0).astype(np.int64)[:, None]
    ds = SeqDS(X, y, [3, 2])

    def factory(seed):
        # Asymmetric widths: slot 0 (3 features) feeds encoder 1, slot 1
        # (2 features) feeds encoder 0 under sequence [1, 0].
        return MultiModN(3, [MLPEncoder(3, 2, (4,)), MLPEncoder(3, 3, (4,))],
                         [LogisticDecoder(3)], 1.0, 0.0, seed=seed)

    def folds():
        return [
            (ArrayLoader(Subset(ds, list(range(0, 32))), 16),
             ArrayLoader(Subset(ds, list(range(32, 48))), 16)),
            (ArrayLoader(Subset(ds, list(range(48, 64))), 16),
             ArrayLoader(Subset(ds, list(range(0, 16))), 16)),
        ]

    results = kfold_fit_best(factory, folds(), Adam(0.01), "cross_entropy",
                             epochs=3)
    for f, (tr, va) in enumerate(folds()):
        solo = factory(f)
        ref = solo.fit_best(tr, Adam(0.01), "cross_entropy", epochs=3,
                            val_loader=va)
        assert results[f]["best_epoch"] == ref["best_epoch"]
        np.testing.assert_allclose(results[f]["best_score"],
                                   ref["best_score"], rtol=1e-5, atol=1e-6)


def test_kfold_shuffle_true_matches_sequential():
    """shuffle=True fold loaders with EQUAL batch counts: the in-program
    per-epoch permutation acts on identically-shaped stacks as per-fold
    fit_best, so trajectories match exactly."""
    rng = np.random.default_rng(11)
    X = rng.normal(size=(96, 6)).astype(np.float32)
    y = (X @ rng.normal(size=6) > 0).astype(np.int64)[:, None]
    ds = PartitionDataset(X, y, [3, 3])

    def folds():
        return [
            (ArrayLoader(Subset(ds, list(range(0, 40))), 16, shuffle=True),
             ArrayLoader(Subset(ds, list(range(40, 56))), 16)),
            (ArrayLoader(Subset(ds, list(range(56, 96))), 16, shuffle=True),
             ArrayLoader(Subset(ds, list(range(0, 16))), 16)),
        ]

    results = kfold_fit_best(_factory, folds(), Adam(0.01), "cross_entropy",
                             epochs=4)
    for f, (tr, va) in enumerate(folds()):
        m = _factory(f)
        ref = m.fit_best(tr, Adam(0.01), "cross_entropy", epochs=4,
                         val_loader=va)
        assert ref["best_epoch"] == results[f]["best_epoch"]
        np.testing.assert_allclose(ref["scores"], results[f]["scores"],
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(m.params["encoders"][0]["layers"][0]["w"]),
            np.asarray(results[f]["model"]
                       .params["encoders"][0]["layers"][0]["w"]),
            rtol=1e-5, atol=1e-6)


def test_kfold_shuffle_guards():
    import pytest
    rng = np.random.default_rng(12)
    X = rng.normal(size=(90, 6)).astype(np.float32)
    y = (X @ rng.normal(size=6) > 0).astype(np.int64)[:, None]
    ds = PartitionDataset(X, y, [3, 3])
    mixed = [
        (ArrayLoader(Subset(ds, list(range(0, 40))), 16, shuffle=True),
         ArrayLoader(Subset(ds, list(range(40, 56))), 16)),
        (ArrayLoader(Subset(ds, list(range(50, 90))), 16),
         ArrayLoader(Subset(ds, list(range(0, 16))), 16)),
    ]
    with pytest.raises(ValueError, match="agree on shuffle"):
        kfold_fit_best(_factory, mixed, Adam(0.01), "cross_entropy", epochs=2)


def test_kfold_shuffle_unequal_folds():
    """shuffle=True with UNEQUAL fold batch counts (r4 composition corner):
    the masked per-fold permutation trains — and each fold's trajectory is
    a pure function of its own (loader, seed), independent of the co-folds
    sharing the padded program (the lane-isolation property that makes the
    padding exact)."""
    rng = np.random.default_rng(12)
    X = rng.normal(size=(120, 6)).astype(np.float32)
    y = (X @ rng.normal(size=6) > 0).astype(np.int64)[:, None]
    ds = PartitionDataset(X, y, [3, 3])

    def foldA():  # 40 rows -> 3 batches at bs=16 (sets max_tb=3)
        return (ArrayLoader(Subset(ds, list(range(0, 40))), 16, shuffle=True),
                ArrayLoader(Subset(ds, list(range(40, 56))), 16))

    def foldB():  # 24 rows -> 2 batches (the padded lane)
        return (ArrayLoader(Subset(ds, list(range(56, 80))), 16,
                            shuffle=True),
                ArrayLoader(Subset(ds, list(range(80, 90))), 16))

    def foldC():  # different 24-row lane
        return (ArrayLoader(Subset(ds, list(range(90, 114))), 16,
                            shuffle=True),
                ArrayLoader(Subset(ds, list(range(104, 120))), 16))

    r1 = kfold_fit_best(_factory, [foldA(), foldB()], Adam(0.01),
                        "cross_entropy", epochs=4, seeds=(0, 1))
    r2 = kfold_fit_best(_factory, [foldA(), foldC()], Adam(0.01),
                        "cross_entropy", epochs=4, seeds=(0, 1))
    for r in r1 + r2:
        assert np.isfinite(r["best_score"]) and r["epochs_ran"] == 4
    # fold A's lane must be IDENTICAL under either co-fold (same program
    # geometry, same lane inputs -> bit-equal).
    np.testing.assert_array_equal(r1[0]["scores"], r2[0]["scores"])
    np.testing.assert_array_equal(
        np.asarray(r1[0]["model"].params["encoders"][0]["layers"][0]["w"]),
        np.asarray(r2[0]["model"].params["encoders"][0]["layers"][0]["w"]))
    # shuffling must actually change the trajectory vs unshuffled loaders
    def foldA_ns():
        return (ArrayLoader(Subset(ds, list(range(0, 40))), 16),
                ArrayLoader(Subset(ds, list(range(40, 56))), 16))
    def foldB_ns():
        return (ArrayLoader(Subset(ds, list(range(56, 80))), 16),
                ArrayLoader(Subset(ds, list(range(80, 90))), 16))
    r3 = kfold_fit_best(_factory, [foldA_ns(), foldB_ns()], Adam(0.01),
                        "cross_entropy", epochs=4, seeds=(0, 1))
    assert not np.array_equal(r1[0]["scores"], r3[0]["scores"]) or \
        not np.array_equal(
            np.asarray(r1[0]["model"].params["encoders"][0]["layers"][0]["w"]),
            np.asarray(r3[0]["model"].params["encoders"][0]["layers"][0]["w"]))


def test_epoch_permute_masked_semantics():
    """Unit semantics of the masked permutation: the first n_real flattened
    slots are a uniform permutation of themselves, the padding tail is
    untouched, and the real-slot ORDER is independent of how much padding
    follows (the per-fold-domain property: a fold sees the same shuffle it
    would in its own unpadded program shape)."""
    import jax
    import jax.numpy as jnp
    from multimodn_tpu.core.step import epoch_permute_masked

    B, nb_real, nb_pad = 8, 3, 5
    n_real = nb_real * B
    rng = np.random.default_rng(0)
    base = np.arange(nb_real * B, dtype=np.float32).reshape(nb_real, B)
    padded = np.full((nb_pad, B), -1.0, np.float32)
    padded[:nb_real] = base
    erng = jax.random.PRNGKey(42)

    d_p, t_p, m_p = epoch_permute_masked(
        (jnp.asarray(padded)[..., None],), jnp.asarray(padded, jnp.int32)[..., None],
        jnp.asarray(padded), erng, jnp.asarray(n_real))
    flat = np.asarray(m_p).reshape(-1)
    # real slots: same multiset, tail: fixed in place
    assert sorted(flat[:n_real]) == sorted(base.reshape(-1).tolist())
    np.testing.assert_array_equal(flat[n_real:], -1.0)
    assert not np.array_equal(flat[:n_real], base.reshape(-1))  # it moved
    # data/targets/mask travel under ONE shared permutation
    np.testing.assert_array_equal(
        np.asarray(d_p[0]).reshape(-1), np.asarray(m_p).reshape(-1))
    np.testing.assert_array_equal(
        np.asarray(t_p).reshape(-1).astype(np.float32),
        np.asarray(m_p).reshape(-1))
    # padding-independence: the same fold with LESS padding shuffles its
    # real slots into the same order
    padded2 = np.full((nb_real + 1, B), -1.0, np.float32)
    padded2[:nb_real] = base
    _, _, m_q = epoch_permute_masked(
        (jnp.asarray(padded2)[..., None],),
        jnp.asarray(padded2, jnp.int32)[..., None],
        jnp.asarray(padded2), erng, jnp.asarray(n_real))
    np.testing.assert_array_equal(
        np.asarray(m_q).reshape(-1)[:n_real], flat[:n_real])


def test_kfold_per_fold_uniform_sequences():
    """Folds whose loaders carry DIFFERENT uniform encoding sequences (one
    fold fuses [1,0], the other [0,1]) thread per-fold traced orders and
    match per-fold fit_best exactly (previously rejected)."""
    class SeqDS(PartitionDataset):
        def __init__(self, X, y, parts, seq):
            super().__init__(X, y, parts)
            self._seq = np.asarray(seq, np.int64)

        def __getitem__(self, i):
            xs, y = super().__getitem__(i)[:2]
            return xs, y, self._seq

        def arrays(self):
            xs, y = super().arrays()[:2]
            return xs, y, np.tile(self._seq[None, :], (len(self), 1))

    rng = np.random.default_rng(21)
    X = rng.normal(size=(64, 6)).astype(np.float32)
    y = (X @ rng.normal(size=6) > 0).astype(np.int64)[:, None]
    ds_a = SeqDS(X, y, [3, 3], [1, 0])
    ds_b = SeqDS(X, y, [3, 3], [0, 1])

    def folds():
        return [
            (ArrayLoader(Subset(ds_a, list(range(0, 32))), 16),
             ArrayLoader(Subset(ds_a, list(range(32, 48))), 16)),
            (ArrayLoader(Subset(ds_b, list(range(32, 64))), 16),
             ArrayLoader(Subset(ds_b, list(range(0, 16))), 16)),
        ]

    results = kfold_fit_best(_factory, folds(), Adam(0.01), "cross_entropy",
                             epochs=3)
    for f, (tr, va) in enumerate(folds()):
        m = _factory(f)
        ref = m.fit_best(tr, Adam(0.01), "cross_entropy", epochs=3,
                         val_loader=va)
        assert ref["best_epoch"] == results[f]["best_epoch"], f"fold {f}"
        np.testing.assert_allclose(ref["scores"], results[f]["scores"],
                                   rtol=1e-5, atol=1e-6)


def test_kfold_per_batch_sequences():
    """True per-batch sequences (batch-uniform, varying across batches)
    thread through the vmapped program and match per-fold fit_best."""
    class BatchSeqDS(PartitionDataset):
        """Per-sample sequences constant within each 16-sample block."""
        def __init__(self, X, y, parts):
            super().__init__(X, y, parts)
            self._rows = np.asarray([[0, 1], [1, 0]], np.int64)

        def __getitem__(self, i):
            xs, y = super().__getitem__(i)[:2]
            return xs, y, self._rows[(i // 16) % 2]

        def arrays(self):
            xs, y = super().arrays()[:2]
            seq = np.stack([self._rows[(i // 16) % 2]
                            for i in range(len(self))])
            return xs, y, seq

    rng = np.random.default_rng(22)
    X = rng.normal(size=(64, 6)).astype(np.float32)
    y = (X @ rng.normal(size=6) > 0).astype(np.int64)[:, None]
    ds = BatchSeqDS(X, y, [3, 3])

    def folds():
        return [
            (ArrayLoader(Subset(ds, list(range(0, 32))), 16),
             ArrayLoader(Subset(ds, list(range(32, 48))), 16)),
            (ArrayLoader(Subset(ds, list(range(32, 64))), 16),
             ArrayLoader(Subset(ds, list(range(0, 16))), 16)),
        ]

    results = kfold_fit_best(_factory, folds(), Adam(0.01), "cross_entropy",
                             epochs=3)
    for f, (tr, va) in enumerate(folds()):
        m = _factory(f)
        ref = m.fit_best(tr, Adam(0.01), "cross_entropy", epochs=3,
                         val_loader=va)
        assert ref["best_epoch"] == results[f]["best_epoch"], f"fold {f}"
        np.testing.assert_allclose(ref["scores"], results[f]["scores"],
                                   rtol=1e-5, atol=1e-6)


def test_kfold_fold_models_carry_cycle_phase():
    """Regression (review finding): kfold-returned StaticInitState models
    must leave with the cycle phase their in-program training consumed, so a
    later test() matches per-fold fit_best exactly."""
    from multimodn_tpu import MultiModNHistory, StaticInitState

    rng = np.random.default_rng(31)
    bank = [rng.normal(size=3).astype(np.float32) for _ in range(5)]
    X = rng.normal(size=(56, 6)).astype(np.float32)
    y = (X @ rng.normal(size=6) > 0).astype(np.int64)[:, None]
    ds = PartitionDataset(X, y, [3, 3])

    def factory(seed):
        return MultiModN(3, [MLPEncoder(3, 3, (4,)), MLPEncoder(3, 3, (4,))],
                         [LogisticDecoder(3)], 1.0, 0.0, seed=seed,
                         init_state=StaticInitState(bank))

    def folds():
        return [(ArrayLoader(Subset(ds, list(range(0, 40))), 16),
                 ArrayLoader(Subset(ds, list(range(40, 56))), 16))]

    results = kfold_fit_best(factory, folds(), Adam(0.01), "cross_entropy",
                             epochs=3)
    tr, va = folds()[0]
    solo = factory(0)
    solo.fit_best(tr, Adam(0.01), "cross_entropy", epochs=3, val_loader=va)
    km = results[0]["model"]
    assert km._cycle_offset == solo._cycle_offset == (3 * 56) % 5
    h1, h2 = MultiModNHistory(["t"]), MultiModNHistory(["t"])
    r_solo = solo.test(va, "cross_entropy", h1)
    r_k = km.test(va, "cross_entropy", h2)
    np.testing.assert_allclose(np.asarray(h1.loss["test"][0]),
                               np.asarray(h2.loss["test"][0]),
                               rtol=1e-5, atol=1e-6)


def test_kfold_models_carry_trained_opt_state():
    """Review finding: kfold-returned models had opt_state=None, so
    continued training re-initialized Adam moments; now continuing equals
    per-fold fit_best + continued training exactly."""
    folds_a, folds_b = _folds(3), _folds(3)
    opt = Adam(0.01)
    results = kfold_fit_best(_factory, folds_a, opt, "cross_entropy",
                             epochs=3)
    km = results[0]["model"]
    assert km.opt_state is not None
    solo = _factory(0)
    opt_s = Adam(0.01)
    tr, va = folds_b[0]
    solo.fit_best(tr, opt_s, "cross_entropy", epochs=3, val_loader=va)
    # Continue training both for one epoch with their own optimizers.
    km.train_epoch(folds_a[0][0], opt, "cross_entropy")
    solo.train_epoch(tr, opt_s, "cross_entropy")
    np.testing.assert_allclose(
        np.asarray(km.params["encoders"][0]["layers"][0]["w"]),
        np.asarray(solo.params["encoders"][0]["layers"][0]["w"]),
        rtol=1e-5, atol=1e-6)


# ---------------------------------------------------------------------------
# sweep_fit_best: seed-replicate axis (VERDICT r2 next-#4)
# ---------------------------------------------------------------------------

def _one_pair(seed=0, n=72, shuffle=False):
    rng = np.random.default_rng(seed)
    X = rng.normal(size=(n, 6)).astype(np.float32)
    y = (X @ rng.normal(size=6) > 0).astype(np.int64)[:, None]
    ds = PartitionDataset(X, y, [3, 3])
    tr = ArrayLoader(Subset(ds, list(range(0, 56))), 16, shuffle=shuffle,
                     seed=7)
    va = ArrayLoader(Subset(ds, list(range(56, n))), 16)
    return tr, va


def test_sweep_matches_sequential_fit_best():
    """N seeds in one dispatch == N looped fit_best runs, bit-for-bit per
    seed (scores, best epoch, restored params, trained opt state)."""
    from multimodn_tpu.experiments import sweep_fit_best

    epochs, seeds = 4, [0, 3, 11]
    tr, va = _one_pair()
    results = sweep_fit_best(_factory, tr, va, Adam(0.01), "cross_entropy",
                             epochs=epochs, seeds=seeds)
    assert len(results) == len(seeds)
    for s, res in zip(seeds, results):
        tr2, va2 = _one_pair()
        m = _factory(s)
        info = m.fit_best(tr2, Adam(0.01), "cross_entropy", epochs=epochs,
                          val_loader=va2)
        assert info["best_epoch"] == res["best_epoch"]
        # Bit-equal: the in-program broadcast gives the sweep exactly the
        # kfold-shaped batched program (see sweep_fit_best internals).
        np.testing.assert_array_equal(info["scores"], res["scores"])
        np.testing.assert_allclose(
            np.asarray(m.params["encoders"][0]["layers"][0]["w"]),
            np.asarray(res["model"].params["encoders"][0]["layers"][0]["w"]),
            rtol=1e-5, atol=1e-6)
        # Trained optimizer moments ride along (continued training works).
        assert res["model"].opt_state is not None


def test_sweep_shuffle_true_matches_sequential():
    """shuffle=True loaders: each seed's in-program permutations derive from
    its own rng stream, exactly like per-seed fit_best."""
    from multimodn_tpu.experiments import sweep_fit_best

    epochs, seeds = 3, [2, 5]
    tr, va = _one_pair(shuffle=True)
    results = sweep_fit_best(_factory, tr, va, Adam(0.01), "cross_entropy",
                             epochs=epochs, seeds=seeds)
    for s, res in zip(seeds, results):
        tr2, va2 = _one_pair(shuffle=True)
        m = _factory(s)
        info = m.fit_best(tr2, Adam(0.01), "cross_entropy", epochs=epochs,
                          val_loader=va2)
        np.testing.assert_allclose(info["scores"], res["scores"],
                                   rtol=1e-5, atol=1e-6)


def test_sweep_mesh_sharded_matches_plain():
    """Seed axis sharded over a 4-device mesh == unsharded sweep, including
    the replicate-padding of a non-divisible seed count (3 -> 4)."""
    from multimodn_tpu.experiments import sweep_fit_best
    from multimodn_tpu.parallel import make_mesh

    seeds = [0, 1, 2]
    tr, va = _one_pair()
    plain = sweep_fit_best(_factory, tr, va, Adam(0.01), "cross_entropy",
                           epochs=3, seeds=seeds)
    tr2, va2 = _one_pair()
    mesh = make_mesh((4,), ("fold",))
    sharded = sweep_fit_best(_factory, tr2, va2, Adam(0.01),
                             "cross_entropy", epochs=3, seeds=seeds,
                             mesh=mesh)
    assert len(sharded) == len(seeds)
    for p, s in zip(plain, sharded):
        np.testing.assert_allclose(p["scores"], s["scores"],
                                   rtol=1e-5, atol=1e-6)
        assert p["best_epoch"] == s["best_epoch"]


def test_structural_program_cache(monkeypatch):
    """Protocol loops (e.g. the MNAR grid) rebuild models/optimizers per
    call; structurally identical calls must reuse ONE traced program, and
    any structural/hyperparameter change must miss."""
    from multimodn_tpu import experiments

    calls = []
    orig = experiments.make_select_fit_fn

    def counting(*a, **k):
        calls.append(1)
        return orig(*a, **k)

    monkeypatch.setattr(experiments, "make_select_fit_fn", counting)
    experiments._FIT_PROGRAM_CACHE.clear()

    r1 = kfold_fit_best(_factory, _folds(), Adam(0.01), "cross_entropy",
                        epochs=2)
    r2 = kfold_fit_best(_factory, _folds(), Adam(0.01), "cross_entropy",
                        epochs=2)
    assert len(calls) == 1, "second structurally-identical call re-traced"
    for a, b in zip(r1, r2):
        np.testing.assert_array_equal(a["scores"], b["scores"])

    def factory_wider(seed):
        return MultiModN(4, [MLPEncoder(4, 3, (4,)), MLPEncoder(4, 3, (4,))],
                         [LogisticDecoder(4)], 1.0, 0.0, seed=seed)

    rng = np.random.default_rng(0)
    X = rng.normal(size=(40, 6)).astype(np.float32)
    y = rng.integers(0, 2, size=(40, 1))
    ds = PartitionDataset(X, y, [3, 3])
    folds_w = [(ArrayLoader(Subset(ds, list(range(24))), 8),
                ArrayLoader(Subset(ds, list(range(24, 40))), 8))]
    kfold_fit_best(factory_wider, folds_w, Adam(0.01), "cross_entropy",
                   epochs=2)
    assert len(calls) == 2, "different structure must rebuild"

    kfold_fit_best(_factory, _folds(), Adam(0.02), "cross_entropy",
                   epochs=2)
    assert len(calls) == 3, "different optimizer hyperparameters must rebuild"


def test_sweep_program_cache_reused():
    """The jitted sweep wrapper is cached alongside the fit program: a
    second structurally-identical sweep call must NOT jit a fresh closure
    (review finding — that re-traced the whole fused program per call)."""
    from multimodn_tpu import experiments
    from multimodn_tpu.experiments import sweep_fit_best

    tr, va = _one_pair()
    experiments._FIT_PROGRAM_CACHE.clear()
    experiments._SWEEP_PROGRAM_CACHE.clear()
    r1 = sweep_fit_best(_factory, tr, va, Adam(0.01), "cross_entropy",
                        epochs=2, seeds=[0, 1])
    assert len(experiments._SWEEP_PROGRAM_CACHE) == 1
    wrapper = next(iter(experiments._SWEEP_PROGRAM_CACHE.values()))
    r2 = sweep_fit_best(_factory, tr, va, Adam(0.01), "cross_entropy",
                        epochs=2, seeds=[0, 1])
    assert len(experiments._SWEEP_PROGRAM_CACHE) == 1
    assert next(iter(experiments._SWEEP_PROGRAM_CACHE.values())) is wrapper
    for a, b in zip(r1, r2):
        np.testing.assert_array_equal(a["scores"], b["scores"])


def test_experiment_axes_accept_shard_map_engine():
    """Round 4 (VERDICT r3 next-#3): kfold/sweep run dp_engine='shard_map'
    factories through the explicit-collective fused program (fold/seed axis
    vmapped over the shard_map region) instead of rejecting them. The
    equality-vs-auto tests live in tests/test_shard_map.py; here: the
    2-device path runs, and the engine's envelope guards still fire
    (indivisible batch sizes rejected up front)."""
    import jax
    import pytest

    from multimodn_tpu.experiments import sweep_fit_best
    from multimodn_tpu.parallel import make_mesh

    mesh = make_mesh((2,), ("data",), devices=jax.devices("cpu")[:2])

    def sm_factory(seed):
        return MultiModN(3, [MLPEncoder(3, 3, (4,)), MLPEncoder(3, 3, (4,))],
                         [LogisticDecoder(3)], 1.0, 0.0, seed=seed,
                         mesh=mesh, dp_engine="shard_map",
                         nan_skip="sample")

    # _folds() uses batch 16 (divisible by the 2-device axis) -> runs.
    res = kfold_fit_best(sm_factory, _folds(), Adam(0.01), "cross_entropy",
                         epochs=2)
    assert len(res) == 2
    assert all(np.isfinite(r["best_score"]) for r in res)
    tr, va = _one_pair()
    res = sweep_fit_best(sm_factory, tr, va, Adam(0.01), "cross_entropy",
                         epochs=2, seeds=[0, 1])
    assert all(np.isfinite(r["best_score"]) for r in res)
    # Envelope guard: indivisible batch size -> the engine's loud error.
    rng = np.random.default_rng(0)
    X = rng.normal(size=(30, 6)).astype(np.float32)
    y = rng.integers(0, 2, size=(30, 1))
    odd = ArrayLoader(PartitionDataset(X, y, [3, 3]), 15)
    with pytest.raises(ValueError, match="divide the data mesh axis"):
        kfold_fit_best(sm_factory, [(odd, odd)], Adam(0.01),
                       "cross_entropy", epochs=1)


def test_kfold_on_epoch_progress():
    """Round 4: experiment-scale progress — kfold_fit_best(on_epoch=)
    streams one unordered payload PER FOLD per epoch from inside the
    vmapped program; values match the per-fold scores; delivery before
    return; no retrace across calls with fresh lambdas."""
    from multimodn_tpu import experiments

    folds = _folds()
    seen = []
    res = kfold_fit_best(_factory, folds, Adam(0.01), "cross_entropy",
                         epochs=3, on_epoch=seen.append)
    assert len(seen) == 3 * len(folds)
    by_epoch = {}
    for p in seen:
        by_epoch.setdefault(p["epoch"], []).append(p["score"])
    assert sorted(by_epoch) == [0, 1, 2]
    for e, scores in by_epoch.items():
        np.testing.assert_allclose(
            sorted(scores), sorted(float(r["scores"][e]) for r in res),
            rtol=1e-5, atol=1e-6)
    assert experiments._ON_EPOCH_CELL[0] is None
    # Callback-free calls unaffected; fresh lambdas reuse the program.
    n_cached = len(experiments._FIT_PROGRAM_CACHE)
    kfold_fit_best(_factory, folds, Adam(0.01), "cross_entropy", epochs=2,
                   on_epoch=lambda p: None)
    assert len(experiments._FIT_PROGRAM_CACHE) == n_cached


def test_sweep_on_epoch_progress():
    from multimodn_tpu.experiments import sweep_fit_best

    seen = []
    tr, va = _one_pair()
    res = sweep_fit_best(_factory, tr, va, Adam(0.01), "cross_entropy",
                         epochs=3, seeds=[0, 1], on_epoch=seen.append)
    assert len(seen) == 3 * 2
    assert {p["epoch"] for p in seen} == {0, 1, 2}
    assert all(np.isfinite(p["score"]) for p in seen)


def test_kfold_on_epoch_with_patience():
    """EXACT payload contract under the vmapped while_loop: once per fold
    per EXECUTED epoch — no phantom emissions from frozen lanes (the body
    keeps running for stopped folds; the program marks those payloads
    _active=0 and the dispatcher drops them — review finding: the old
    behavior delivered extra payloads carrying scores from discarded
    epochs)."""
    from multimodn_tpu import SGD

    folds = _folds()
    seen = []
    res = kfold_fit_best(_factory, folds, Adam(0.01), "cross_entropy",
                         epochs=10, patience=1, on_epoch=seen.append)
    ran = [r["epochs_ran"] for r in res]
    # The phantom scenario needs folds stopping at DIFFERENT epochs (the
    # while_loop keeps iterating frozen lanes until the last fold stops);
    # this configuration measures [2, 3] — guard so data drift cannot
    # silently weaken the test.
    assert len(set(ran)) > 1, ran
    assert len(seen) == sum(ran)
    expected = sorted((e, round(float(r["scores"][e]), 5))
                      for r in res for e in range(r["epochs_ran"]))
    got = sorted((p["epoch"], round(p["score"], 5)) for p in seen)
    assert expected == got
    # The internal liveness flag never reaches user callbacks.
    assert not any("_active" in p for p in seen)

    # Homogeneous stopping (SGD(0.0): every fold stops at the same epoch)
    # keeps the same exact-count contract.
    seen2 = []
    res2 = kfold_fit_best(_factory, folds, SGD(0.0), "cross_entropy",
                          epochs=10, patience=2, on_epoch=seen2.append)
    assert len(seen2) == sum(r["epochs_ran"] for r in res2)


def test_epoch_permute_masked_uniformity():
    """Distributional property of the masked permutation: over many epoch
    rngs, every real slot is (approximately) equally likely to land in
    every real position — the argsort-of-iid-uniforms construction is an
    unbiased shuffle, not just a fixed rotation."""
    import jax
    import jax.numpy as jnp
    from multimodn_tpu.core.step import epoch_permute_masked

    B, nb_real, nb_pad, trials = 4, 2, 3, 600
    n_real = nb_real * B
    base = np.arange(nb_pad * B, dtype=np.float32).reshape(nb_pad, B)

    def one(erng):
        _, _, m = epoch_permute_masked(
            (jnp.asarray(base)[..., None],),
            jnp.asarray(base, jnp.int32)[..., None],
            jnp.asarray(base), erng, jnp.asarray(n_real))
        return m.reshape(-1)[:n_real]

    outs = jax.jit(jax.vmap(one))(
        jax.vmap(jax.random.PRNGKey)(jnp.arange(trials)))
    outs = np.asarray(outs).astype(int)          # (trials, n_real)
    # occupancy[slot, position] counts; expect ~trials/n_real everywhere
    occ = np.zeros((n_real, n_real))
    for row in outs:
        occ[row, np.arange(n_real)] += 1
    expected = trials / n_real
    chi2 = ((occ - expected) ** 2 / expected).sum()
    # dof = (n-1)^2 = 49; P(chi2_49 > 85) ~ 0.001 — loose, deterministic.
    assert chi2 < 85, f"chi2={chi2:.1f} occupancy={occ}"
    # and the tail slots never moved in any trial
    assert (outs < n_real).all()

"""On-device early stopping: fit_best(patience=...) runs the fused epoch
loop as a lax.while_loop that exits once the validation AUROC+BAC score
has not improved for `patience` consecutive epochs (Keras semantics).
The reference has no early stopping (fixed 100-epoch MIMIC loop,
mimic_single_task_pipeline.py:137-158) — this is beyond-reference, built
so the stop DECISION also happens on device (zero host syncs)."""
import numpy as np
import pytest

from multimodn_tpu import Adam, MultiModN, MultiModNHistory, SGD
from multimodn_tpu.data import ArrayLoader, PartitionDataset
from multimodn_tpu.decoders import LogisticDecoder
from multimodn_tpu.encoders import MLPEncoder


def _setup(seed=0, n=80):
    rng = np.random.default_rng(seed)
    X = rng.normal(size=(n, 6)).astype(np.float32)
    y = (X @ rng.normal(size=6) > 0).astype(np.int64)[:, None]
    ds = PartitionDataset(X, y, [3, 3])
    tr, va, _ = ds.random_split((0.7, 0.3, 0), seed=0)
    return ArrayLoader(tr, 16), ArrayLoader(va, 16)


def _model(seed=0):
    return MultiModN(2, [MLPEncoder(2, 3, (4,)), MLPEncoder(2, 3, (4,))],
                     [LogisticDecoder(2)], 0.7, 0.3, seed=seed)


def test_large_patience_equals_plain_fit_best():
    """With patience >= epochs the while_loop runs all epochs and must
    reproduce the scan-based program exactly (params, history, scores)."""
    tl, vl = _setup()
    epochs = 6

    m1, m2 = _model(1), _model(1)
    h1, h2 = MultiModNHistory(["t"]), MultiModNHistory(["t"])
    r1 = m1.fit_best(tl, Adam(0.01), "cross_entropy", epochs=epochs,
                     val_loader=vl, history=h1)
    r2 = m2.fit_best(tl, Adam(0.01), "cross_entropy", epochs=epochs,
                     val_loader=vl, history=h2, patience=epochs)
    assert r2["epochs_ran"] == epochs
    assert r1["best_epoch"] == r2["best_epoch"]
    np.testing.assert_allclose(r1["best_score"], r2["best_score"],
                               rtol=1e-6)
    np.testing.assert_allclose(r1["scores"], r2["scores"], rtol=1e-6,
                               atol=1e-7)
    for e in range(epochs):
        np.testing.assert_allclose(h1.loss["train"][e], h2.loss["train"][e],
                                   rtol=1e-6, atol=1e-7)
        np.testing.assert_allclose(h1.loss["val"][e], h2.loss["val"][e],
                                   rtol=1e-6, atol=1e-7)
    import jax
    for a, b in zip(jax.tree_util.tree_leaves(m1.state_dict()),
                    jax.tree_util.tree_leaves(m2.state_dict())):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)


def test_plateau_stops_early():
    """lr=0 -> the score never changes after epoch 0 (which always improves
    over -inf), so with patience=p the loop runs exactly 1 + p epochs."""
    tl, vl = _setup(2)
    for patience in (1, 3):
        m = _model(2)
        h = MultiModNHistory(["t"])
        r = m.fit_best(tl, SGD(0.0), "cross_entropy", epochs=20,
                       val_loader=vl, history=h, patience=patience)
        assert r["epochs_ran"] == 1 + patience
        assert r["best_epoch"] == 0
        assert len(r["scores"]) == r["epochs_ran"]
        # Constant score per epoch (params frozen by lr=0).
        np.testing.assert_allclose(r["scores"], r["scores"][0], rtol=1e-6)
        # History covers only the epochs actually run.
        assert len(h.loss["train"]) == r["epochs_ran"]
        assert len(h.loss["val"]) == r["epochs_ran"]


def test_early_stop_prefix_matches_plain_run():
    """The epochs that DO run must be bit-identical to the same epochs of
    an un-stopped fit_best (the while body shares the scan program's epoch
    runners — core/step._make_epoch_runners)."""
    tl, vl = _setup(3)
    m_full = _model(3)
    r_full = m_full.fit_best(tl, Adam(0.05), "cross_entropy", epochs=12,
                             val_loader=vl)
    m_es = _model(3)
    r_es = m_es.fit_best(tl, Adam(0.05), "cross_entropy", epochs=12,
                         val_loader=vl, patience=2)
    k = r_es["epochs_ran"]
    assert 1 <= k <= 12
    np.testing.assert_allclose(r_es["scores"], r_full["scores"][:k],
                               rtol=1e-6, atol=1e-7)
    if 3 <= k < 12:
        # The stop is justified: the last `patience`=2 epochs didn't improve
        # on the running best within the prefix (guarded k>=3 so the slice
        # can't wrap into negative indexing).
        best_at = np.maximum.accumulate(r_full["scores"])
        assert np.all(r_full["scores"][k - 2:k] <= best_at[k - 3:k - 1])


def test_patience_change_reuses_program():
    """patience is a traced scalar: different values must hit the same
    cached program (no retrace)."""
    tl, vl = _setup(4)
    m = _model(4)
    opt = Adam(0.01)  # model programs key on the tx object — hold it fixed
    m.fit_best(tl, opt, "cross_entropy", epochs=4, val_loader=vl,
               patience=1)
    n_programs = len(m._fn_cache)
    fit_fn = next(v for k, v in m._fn_cache.items() if k[0] == "fit_best")
    compiles_before = fit_fn._cache_size()
    m.fit_best(tl, opt, "cross_entropy", epochs=4, val_loader=vl,
               patience=3)
    assert len(m._fn_cache) == n_programs
    # The jit cache itself must not grow: patience is traced, not static.
    assert fit_fn._cache_size() == compiles_before == 1


def test_validation():
    tl, vl = _setup(5)
    m = _model(5)
    with pytest.raises(ValueError, match="patience"):
        m.fit_best(tl, Adam(0.01), "cross_entropy", epochs=4,
                   val_loader=vl, patience=0)


def test_randomized_early_stop_equivalence_soak():
    """Randomized cross-program soak: across random geometries (E, widths,
    batch size incl. ragged tails, NaN injection, nan_skip mode,
    shuffle_mode, optimizer family), the while_loop program with
    patience >= epochs must reproduce the scan program bit-for-bit
    (scores AND final params), and a small patience must yield an exact
    executed prefix. Catches geometry-specific divergences the fixed-config
    tests can't."""
    import jax

    from multimodn_tpu import Adam8bit, SGD

    master = np.random.default_rng(20260817)
    for trial in range(6):
        rng = np.random.default_rng(master.integers(2**31))
        E = int(rng.integers(1, 4))
        widths = [int(rng.integers(2, 5)) for _ in range(E)]
        n = int(rng.integers(30, 70))
        batch = int(rng.choice([8, 16, 0]))  # 0 = full batch
        nan_skip = str(rng.choice(["sample", "batch"]))
        shuffle_mode = bool(rng.integers(0, 2)) and E > 1
        opt_kind = str(rng.choice(["adam", "adam8bit", "sgd"]))
        epochs = int(rng.integers(3, 6))

        X = rng.normal(size=(n, sum(widths))).astype(np.float32)
        if rng.integers(0, 2):
            X[:: int(rng.integers(2, 5)), : widths[0]] = np.nan
        y = (np.nansum(X, axis=1, keepdims=True) > 0).astype(np.int64)
        ds = PartitionDataset(X, y, widths)
        tr, va, _ = ds.random_split((0.7, 0.3, 0), seed=trial)
        tl, vl = ArrayLoader(tr, batch), ArrayLoader(va, batch)

        def build():
            return MultiModN(
                2, [MLPEncoder(2, w, (3,)) for w in widths],
                [LogisticDecoder(2)], 0.7, 0.3, seed=trial,
                nan_skip=nan_skip, shuffle_mode=shuffle_mode)

        def opt():
            return {"adam": lambda: Adam(0.02),
                    "adam8bit": lambda: Adam8bit(0.02),
                    "sgd": lambda: SGD(0.05)}[opt_kind]()

        cfg = (f"trial {trial}: E={E} widths={widths} n={n} batch={batch} "
               f"nan_skip={nan_skip} shuffle={shuffle_mode} opt={opt_kind}")

        m_scan = build()
        r_scan = m_scan.fit_best(tl, opt(), "cross_entropy", epochs=epochs,
                                 val_loader=vl)
        m_while = build()
        r_while = m_while.fit_best(tl, opt(), "cross_entropy", epochs=epochs,
                                   val_loader=vl, patience=epochs)
        assert r_while["epochs_ran"] == epochs, cfg
        np.testing.assert_allclose(r_while["scores"], r_scan["scores"],
                                   rtol=1e-6, atol=1e-7, err_msg=cfg)
        for a, b in zip(jax.tree_util.tree_leaves(m_scan.state_dict()),
                        jax.tree_util.tree_leaves(m_while.state_dict())):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-6, atol=1e-7, err_msg=cfg)

        m_es = build()
        r_es = m_es.fit_best(tl, opt(), "cross_entropy", epochs=epochs,
                             val_loader=vl, patience=1)
        k = r_es["epochs_ran"]
        assert 1 <= k <= epochs, cfg
        np.testing.assert_allclose(r_es["scores"], r_scan["scores"][:k],
                                   rtol=1e-6, atol=1e-7, err_msg=cfg)


def test_kfold_patience_matches_looped_fit_best():
    """Experiment-level early stopping: the vmapped while_loop program must
    reproduce looped per-fold fit_best(patience=...) exactly — per-fold
    epochs_ran, trimmed scores, and final params (vmap-of-while freezes
    finished folds via masking)."""
    import jax
    from multimodn_tpu.experiments import kfold_fit_best

    rng = np.random.default_rng(21)
    folds = []
    for k in range(3):
        n = 48 + 16 * k                     # unequal folds -> padded batches
        X = rng.normal(size=(n, 6)).astype(np.float32)
        y = (X @ rng.normal(size=6) > 0).astype(np.int64)[:, None]
        ds = PartitionDataset(X, y, [3, 3])
        tr, va, _ = ds.random_split((0.7, 0.3, 0), seed=k)
        folds.append((ArrayLoader(tr, 16), ArrayLoader(va, 16)))

    def factory(seed):
        return MultiModN(2, [MLPEncoder(2, 3, (4,)), MLPEncoder(2, 3, (4,))],
                         [LogisticDecoder(2)], 0.7, 0.3, seed=seed)

    epochs, patience = 8, 2
    kres = kfold_fit_best(factory, folds, Adam(0.02), "cross_entropy",
                          epochs=epochs, patience=patience)
    for f, (tl, vl) in enumerate(folds):
        m = factory(f)
        r = m.fit_best(tl, Adam(0.02), "cross_entropy", epochs=epochs,
                       val_loader=vl, patience=patience)
        assert kres[f]["epochs_ran"] == r["epochs_ran"], f"fold {f}"
        np.testing.assert_allclose(kres[f]["scores"], r["scores"],
                                   rtol=1e-5, atol=1e-6)
        assert kres[f]["best_epoch"] == r["best_epoch"]
        for a, b in zip(
                jax.tree_util.tree_leaves(kres[f]["model"].state_dict()),
                jax.tree_util.tree_leaves(m.state_dict())):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-6)


def test_kfold_large_patience_equals_plain_kfold():
    import jax
    from multimodn_tpu.experiments import kfold_fit_best

    rng = np.random.default_rng(22)
    folds = []
    for k in range(2):
        X = rng.normal(size=(48, 6)).astype(np.float32)
        y = (X @ rng.normal(size=6) > 0).astype(np.int64)[:, None]
        ds = PartitionDataset(X, y, [3, 3])
        tr, va, _ = ds.random_split((0.7, 0.3, 0), seed=k)
        folds.append((ArrayLoader(tr, 16), ArrayLoader(va, 16)))

    def factory(seed):
        return MultiModN(2, [MLPEncoder(2, 3, (4,)), MLPEncoder(2, 3, (4,))],
                         [LogisticDecoder(2)], 0.7, 0.3, seed=seed)

    plain = kfold_fit_best(factory, folds, Adam(0.02), "cross_entropy",
                           epochs=5)
    es = kfold_fit_best(factory, folds, Adam(0.02), "cross_entropy",
                        epochs=5, patience=5)
    for f in range(2):
        assert es[f]["epochs_ran"] == 5
        np.testing.assert_allclose(es[f]["scores"], plain[f]["scores"],
                                   rtol=1e-6, atol=1e-7)
        for a, b in zip(
                jax.tree_util.tree_leaves(es[f]["model"].state_dict()),
                jax.tree_util.tree_leaves(plain[f]["model"].state_dict())):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-6, atol=1e-7)


def test_sweep_patience_per_seed():
    from multimodn_tpu import SGD
    from multimodn_tpu.experiments import sweep_fit_best

    tl, vl = _setup(23)

    def factory(seed):
        return MultiModN(2, [MLPEncoder(2, 3, (4,)), MLPEncoder(2, 3, (4,))],
                         [LogisticDecoder(2)], 0.7, 0.3, seed=seed)

    # lr=0 plateau: every seed stops after exactly 1 + patience epochs.
    res = sweep_fit_best(factory, tl, vl, SGD(0.0), "cross_entropy",
                         epochs=12, seeds=[0, 1, 2], patience=2)
    for r in res:
        assert r["epochs_ran"] == 3
        assert len(r["scores"]) == 3
        assert r["best_epoch"] == 0


def test_kfold_and_sweep_patience_with_per_batch_sequences():
    """The per_batch (encoding-sequence) variants of the patience paths:
    the traced-patience arg splicing must survive the extra seqs/val_seqs
    arguments in both programs (review finding: this branch was untested)."""
    import jax
    from multimodn_tpu.data import Subset
    from multimodn_tpu.experiments import kfold_fit_best, sweep_fit_best

    class BatchSeqDS(PartitionDataset):
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

    rng = np.random.default_rng(24)
    X = rng.normal(size=(64, 6)).astype(np.float32)
    y = (X @ rng.normal(size=6) > 0).astype(np.int64)[:, None]
    ds = BatchSeqDS(X, y, [3, 3])

    def factory(seed):
        return MultiModN(2, [MLPEncoder(2, 3, (4,)), MLPEncoder(2, 3, (4,))],
                         [LogisticDecoder(2)], 0.7, 0.3, seed=seed)

    def folds():
        return [
            (ArrayLoader(Subset(ds, list(range(0, 32))), 16),
             ArrayLoader(Subset(ds, list(range(32, 48))), 16)),
            (ArrayLoader(Subset(ds, list(range(32, 64))), 16),
             ArrayLoader(Subset(ds, list(range(0, 16))), 16)),
        ]

    epochs, patience = 8, 2
    kres = kfold_fit_best(factory, folds(), Adam(0.02), "cross_entropy",
                          epochs=epochs, patience=patience)
    for f, (tr, va) in enumerate(folds()):
        m = factory(f)
        ref = m.fit_best(tr, Adam(0.02), "cross_entropy", epochs=epochs,
                         val_loader=va, patience=patience)
        assert kres[f]["epochs_ran"] == ref["epochs_ran"], f"fold {f}"
        np.testing.assert_allclose(kres[f]["scores"], ref["scores"],
                                   rtol=1e-5, atol=1e-6)

    tr, va = folds()[0]
    sres = sweep_fit_best(factory, tr, va, Adam(0.02), "cross_entropy",
                          epochs=epochs, seeds=[0, 1], patience=patience)
    for i, seed in enumerate([0, 1]):
        m = factory(seed)
        ref = m.fit_best(tr, Adam(0.02), "cross_entropy", epochs=epochs,
                         val_loader=va, patience=patience)
        assert sres[i]["epochs_ran"] == ref["epochs_ran"], f"seed {seed}"
        np.testing.assert_allclose(sres[i]["scores"], ref["scores"],
                                   rtol=1e-5, atol=1e-6)

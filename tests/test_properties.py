"""Property tier (SURVEY §7: 'property: NaN-mask ≡ skip, permutation
invariance'): structural equivalences that must hold for any data."""
import numpy as np
import pytest

import jax.numpy as jnp

from multimodn_tpu import Adam, MultiModN, MultiModNHistory
from multimodn_tpu.data import ArrayLoader, PartitionDataset
from multimodn_tpu.decoders import LogisticDecoder
from multimodn_tpu.encoders import MLPEncoder


def _data(n=30, widths=(3, 3, 3), seed=0, all_nan_modality=None):
    rng = np.random.default_rng(seed)
    X = rng.normal(size=(n, sum(widths))).astype(np.float32)
    if all_nan_modality is not None:
        lo = sum(widths[:all_nan_modality])
        X[:, lo:lo + widths[all_nan_modality]] = np.nan
    y = rng.integers(0, 2, size=(n, 1))
    return X, y


def test_all_nan_modality_equals_removed_encoder():
    """An always-NaN modality (skipped every step) must leave states exactly
    as if that encoder were never in the chain."""
    widths = (3, 3, 3)
    X_nan, y = _data(all_nan_modality=1)
    X_cut = np.concatenate([X_nan[:, :3], X_nan[:, 6:]], axis=1)

    full = MultiModN(2, [MLPEncoder(2, 3, (4,)) for _ in range(3)],
                     [LogisticDecoder(2)], 1.0, 0.0, nan_skip="sample")
    # Two-encoder model wired with encoders 0 and 2's params from `full`.
    cut = MultiModN(2, [MLPEncoder(2, 3, (4,)) for _ in range(2)],
                    [LogisticDecoder(2)], 1.0, 0.0, nan_skip="sample")
    state = full.state_dict()
    cut.load_state_dict({
        "init_state": state["init_state"],
        "encoders": [state["encoders"][0], state["encoders"][2]],
        "decoders": state["decoders"],
    })

    l_full = ArrayLoader(PartitionDataset(X_nan, y, [3, 3, 3]), 10)
    l_cut = ArrayLoader(PartitionDataset(X_cut, y, [3, 3]), 10)
    s_full = np.stack(full.get_states(l_full))
    s_cut = np.stack(cut.get_states(l_cut))
    np.testing.assert_allclose(s_full, s_cut, atol=1e-6)


def test_identity_sequence_equals_no_sequence():
    """An explicit encoding_sequence equal to identity must change nothing."""
    from tests.test_order import SeqDataset

    X, y = _data(seed=1)
    plain = PartitionDataset(X, y, [3, 3, 3])
    seq = SeqDataset(X, y, [3, 3, 3], [0, 1, 2])

    m1 = MultiModN(2, [MLPEncoder(2, 3, (4,)) for _ in range(3)],
                   [LogisticDecoder(2)], 1.0, 0.0)
    m2 = MultiModN(2, [MLPEncoder(2, 3, (4,)) for _ in range(3)],
                   [LogisticDecoder(2)], 1.0, 0.0)
    h1, h2 = MultiModNHistory(["t"]), MultiModNHistory(["t"])
    m1.fit(ArrayLoader(plain, 10), Adam(0.01), "cross_entropy", epochs=3,
           history=h1)
    m2.fit(ArrayLoader(seq, 10), Adam(0.01), "cross_entropy", epochs=3,
           history=h2)
    np.testing.assert_allclose(h1.loss["train"][-1], h2.loss["train"][-1],
                               atol=1e-6)


def test_batch_size_one_padding_invariance():
    """batch_size > n gives one padded batch whose metrics equal full-batch."""
    X, y = _data(n=10, seed=2)
    ds = PartitionDataset(X, y, [3, 3, 3])
    m1 = MultiModN(2, [MLPEncoder(2, 3, (4,)) for _ in range(3)],
                   [LogisticDecoder(2)], 1.0, 0.0)
    m2 = MultiModN(2, [MLPEncoder(2, 3, (4,)) for _ in range(3)],
                   [LogisticDecoder(2)], 1.0, 0.0)
    h1, h2 = MultiModNHistory(["t"]), MultiModNHistory(["t"])
    m1.fit(ArrayLoader(ds, 10), Adam(0.01), "cross_entropy", epochs=2,
           history=h1)   # exact full batch
    m2.fit(ArrayLoader(ds, 16), Adam(0.01), "cross_entropy", epochs=2,
           history=h2)   # padded to 16
    np.testing.assert_allclose(h1.loss["train"][-1], h2.loss["train"][-1],
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(h1.accuracy["train"][-1],
                               h2.accuracy["train"][-1],
                               rtol=1e-5, atol=1e-6)


def test_ctor_validation():
    with pytest.raises(ValueError, match="Encoder 0 .* state_size"):
        MultiModN(2, [MLPEncoder(3, 3, (4,))], [LogisticDecoder(2)], 1.0, 0.0)
    with pytest.raises(ValueError, match="Decoder 0 .* state_size"):
        MultiModN(2, [MLPEncoder(2, 3, (4,))], [LogisticDecoder(3)], 1.0, 0.0)
    with pytest.raises(ValueError, match="nan_skip"):
        MultiModN(2, [MLPEncoder(2, 3, (4,))], [LogisticDecoder(2)], 1.0,
                  0.0, nan_skip="bogus")


def test_randomized_fused_equals_looped_soak():
    """Cross-path consistency soak: for random configurations (encoder
    counts/widths/state sizes/batch sizes/NaN patterns/init states/chain
    modes), the fused multi-epoch fit() must reproduce looped train_epoch()
    + test() exactly — same rng-free trajectories, same final params."""
    from multimodn_tpu import (Adam, MultiModN, MultiModNHistory,
                               StaticInitState)
    from multimodn_tpu.data import ArrayLoader, PartitionDataset
    from multimodn_tpu.decoders import LogisticDecoder
    from multimodn_tpu.encoders import MIMICMLPEncoder, MLPEncoder

    rng = np.random.default_rng(515)
    for trial in range(6):
        E = int(rng.integers(1, 4))
        widths = [int(rng.integers(2, 6)) for _ in range(E)]
        state = int(rng.integers(1, 5))
        batch = int(rng.choice([8, 16, 13]))
        n = int(rng.integers(25, 60))
        nan_frac = float(rng.choice([0.0, 0.3]))
        nan_skip = str(rng.choice(["sample", "batch"]))
        chain = str(rng.choice(["auto", "unrolled"]))
        use_mimic = bool(rng.integers(0, 2))
        use_static = bool(rng.integers(0, 2))
        seed = int(rng.integers(0, 1000))

        X = rng.normal(size=(n, sum(widths))).astype(np.float32)
        y = (X @ rng.normal(size=sum(widths)) > 0).astype(np.int64)[:, None]
        if nan_frac > 0:
            rows = rng.random(n) < nan_frac
            X[rows, :widths[0]] = np.nan
        ds = PartitionDataset(X, y, widths)

        def build():
            enc_cls = (lambda s, w: MIMICMLPEncoder(s, w, (4,), dropout=0.0)) \
                if use_mimic else (lambda s, w: MLPEncoder(s, w, (4,)))
            init = StaticInitState(
                [np.arange(state, dtype=np.float32) + k for k in range(3)]) \
                if use_static else None
            return MultiModN(state, [enc_cls(state, w) for w in widths],
                             [LogisticDecoder(state)], 0.7, 0.3, seed=seed,
                             nan_skip=nan_skip, init_state=init,
                             chain_mode=chain)

        m_loop, m_fused = build(), build()
        h_loop, h_fused = MultiModNHistory(["t"]), MultiModNHistory(["t"])
        opt = Adam(0.01)
        for _ in range(3):
            m_loop.train_epoch(ArrayLoader(ds, batch), opt, "cross_entropy",
                               h_loop)
            m_loop.test(ArrayLoader(ds, batch), "cross_entropy", h_loop,
                        tag="val")
        m_fused.fit(ArrayLoader(ds, batch), Adam(0.01), "cross_entropy",
                    epochs=3, history=h_fused,
                    val_loader=ArrayLoader(ds, batch))
        try:
            for e in range(3):
                np.testing.assert_allclose(
                    np.asarray(h_loop.loss["train"][e]),
                    np.asarray(h_fused.loss["train"][e]),
                    rtol=1e-5, atol=1e-6)
                np.testing.assert_allclose(
                    np.asarray(h_loop.loss["val"][e]),
                    np.asarray(h_fused.loss["val"][e]),
                    rtol=1e-5, atol=1e-6)
            import jax
            for a, b in zip(jax.tree_util.tree_leaves(m_loop.state_dict()),
                            jax.tree_util.tree_leaves(m_fused.state_dict())):
                np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                           rtol=1e-5, atol=1e-6)
        except AssertionError as err:
            raise AssertionError(
                f"trial {trial}: E={E} widths={widths} state={state} "
                f"batch={batch} n={n} nan={nan_frac} skip={nan_skip} "
                f"chain={chain} mimic={use_mimic} static={use_static} "
                f"seed={seed}\n{err}") from err


def test_randomized_sweep_equals_looped_fit_best_soak():
    """Cross-path soak for the seed-sweep axis (round 3): for random
    configurations, ``experiments.sweep_fit_best`` (N seeds vmapped in one
    program, data broadcast in-program) must reproduce N looped
    ``MultiModN.fit_best`` runs — same per-epoch score trajectories, same
    best epoch/score, same selected parameters."""
    import jax

    from multimodn_tpu.data.dataset import Subset
    from multimodn_tpu.encoders import MIMICMLPEncoder
    from multimodn_tpu.experiments import sweep_fit_best

    rng = np.random.default_rng(777)
    for trial in range(4):
        E = int(rng.integers(1, 4))
        widths = [int(rng.integers(2, 6)) for _ in range(E)]
        state = int(rng.integers(2, 5))
        batch = int(rng.choice([8, 16, 11]))
        n = int(rng.integers(40, 70))
        nan_frac = float(rng.choice([0.0, 0.3]))
        nan_skip = str(rng.choice(["sample", "batch"]))
        use_mimic = bool(rng.integers(0, 2))
        n_seeds = int(rng.integers(2, 4))
        seeds = [int(s) for s in rng.integers(0, 1000, size=n_seeds)]
        epochs = int(rng.integers(2, 4))

        X = rng.normal(size=(n, sum(widths))).astype(np.float32)
        y = (X @ rng.normal(size=sum(widths)) > 0).astype(np.int64)[:, None]
        if nan_frac > 0:
            rows = rng.random(n) < nan_frac
            X[rows, :widths[0]] = np.nan
        ds = PartitionDataset(X, y, widths)
        n_tr = (n * 3) // 4
        tr = ArrayLoader(Subset(ds, list(range(n_tr))), batch)
        va = ArrayLoader(Subset(ds, list(range(n_tr, n))), batch)

        def factory(seed, _w=tuple(widths), _s=state, _m=use_mimic,
                    _k=nan_skip):
            enc = (lambda w: MIMICMLPEncoder(_s, w, (4,), dropout=0.0)) \
                if _m else (lambda w: MLPEncoder(_s, w, (4,)))
            return MultiModN(_s, [enc(w) for w in _w],
                             [LogisticDecoder(_s)], 0.7, 0.3, seed=seed,
                             nan_skip=_k)

        swept = sweep_fit_best(factory, tr, va, Adam(0.01), "cross_entropy",
                               epochs=epochs, seeds=seeds)
        try:
            assert len(swept) == n_seeds
            for seed, res in zip(seeds, swept):
                ref = factory(seed).fit_best(
                    ArrayLoader(Subset(ds, list(range(n_tr))), batch),
                    Adam(0.01), "cross_entropy", epochs=epochs,
                    val_loader=ArrayLoader(Subset(ds, list(range(n_tr, n))),
                                           batch))
                np.testing.assert_allclose(
                    np.asarray(res["scores"]), np.asarray(ref["scores"]),
                    rtol=1e-5, atol=1e-6)
                assert res["best_epoch"] == ref["best_epoch"]
                np.testing.assert_allclose(res["best_score"],
                                           np.asarray(ref["best_score"]),
                                           rtol=1e-5, atol=1e-6)
                # sweep results carry the model; fit_best returns the
                # selected params directly.
                for a, b in zip(
                        jax.tree_util.tree_leaves(res["model"].state_dict()),
                        jax.tree_util.tree_leaves(ref["best_params"])):
                    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                               rtol=1e-5, atol=1e-6)
        except AssertionError as err:
            raise AssertionError(
                f"trial {trial}: E={E} widths={widths} state={state} "
                f"batch={batch} n={n} nan={nan_frac} skip={nan_skip} "
                f"mimic={use_mimic} seeds={seeds} epochs={epochs}\n{err}"
            ) from err


def test_randomized_round4_cross_path_soak():
    """Round-4 interaction soak: random configurations across
    {nan_skip granularity, presence knobs, chain mode, mesh/engine,
    fused-vs-streamed paths} must agree wherever two paths claim
    equality. Catches interactions no single-feature test crosses."""
    import jax

    from multimodn_tpu import Adam, MultiModN, MultiModNHistory
    from multimodn_tpu.data import (ArrayLoader, PartitionDataset,
                                    StreamingLoader, fit_best_streaming)
    from multimodn_tpu.data.dataset import Subset
    from multimodn_tpu.decoders import LogisticDecoder
    from multimodn_tpu.encoders import MLPEncoder
    from multimodn_tpu.parallel import make_mesh

    n_dev = len(jax.devices())
    rng = np.random.default_rng(424242)
    for trial in range(4):
        E = int(rng.integers(2, 4))
        widths = [int(rng.integers(2, 5))] * E
        state = int(rng.integers(2, 5))
        batch = n_dev * 2
        nb = int(rng.integers(5, 8))
        n = batch * nb
        nan_mode = str(rng.choice(["sample", "batch"]))
        pp = float(rng.choice([0.0, 10.0])) if nan_mode == "sample" else 0.0
        pd = float(rng.choice([0.0, 0.3])) if nan_mode == "sample" else 0.0
        epochs = int(rng.integers(2, 4))
        seed = int(rng.integers(0, 99))

        X = rng.normal(size=(n, sum(widths))).astype(np.float32)
        y = (X @ rng.normal(size=sum(widths)) > 0).astype(np.int64)[:, None]
        nan_rows = rng.random(n) < 0.25
        X[nan_rows, :widths[0]] = np.nan
        ds = PartitionDataset(X, y, widths)
        n_tr = batch * int(rng.integers(3, nb))   # val keeps >= 1 batch
        tr, va = Subset(ds, list(range(n_tr))), \
            Subset(ds, list(range(n_tr, n)))

        def build(mesh=None, engine="auto"):
            return MultiModN(state,
                             [MLPEncoder(state, w, (4,)) for w in widths],
                             [LogisticDecoder(state)], 0.7, 0.3, seed=seed,
                             nan_skip=nan_mode, presence_penalty=pp,
                             presence_dropout=pd, mesh=mesh,
                             dp_engine=engine)

        ctx = (f"trial {trial}: E={E} state={state} nan={nan_mode} "
               f"pp={pp} pd={pd} epochs={epochs} seed={seed}")
        try:
            # Path A: single-device fused fit_best (the anchor).
            m0 = build()
            r0 = m0.fit_best(ArrayLoader(tr, batch), Adam(0.01),
                             "cross_entropy", epochs=epochs,
                             val_loader=ArrayLoader(va, batch))
            # Path B: auto engine on the full-device DP mesh.
            m1 = build(make_mesh(axis_names=("data",)))
            r1 = m1.fit_best(ArrayLoader(tr, batch), Adam(0.01),
                             "cross_entropy", epochs=epochs,
                             val_loader=ArrayLoader(va, batch))
            np.testing.assert_allclose(r0["scores"], r1["scores"],
                                       rtol=1e-5, atol=1e-6)
            assert r0["best_epoch"] == r1["best_epoch"]
            # Path C: explicit shard_map engine. Excluded when presence
            # knobs are active: the penalty is unsupported there by
            # design, and presence_dropout falls under the engine's
            # documented per-sample-rng caveat (draws see shard-LOCAL
            # rows, so patterns differ from single-device — same class as
            # encoder dropout, make_shard_map_epoch_fn docstring).
            if pp == 0.0 and pd == 0.0:
                m2 = build(make_mesh(axis_names=("data",)), "shard_map")
                r2 = m2.fit_best(ArrayLoader(tr, batch), Adam(0.01),
                                 "cross_entropy", epochs=epochs,
                                 val_loader=ArrayLoader(va, batch))
                np.testing.assert_allclose(r0["scores"], r2["scores"],
                                           rtol=1e-5, atol=1e-6)
            # Path D: streamed selection (single device).
            m3 = build()
            r3 = fit_best_streaming(
                m3, StreamingLoader(tr, batch), Adam(0.01),
                "cross_entropy", epochs=epochs,
                val_loader=StreamingLoader(va, batch))
            np.testing.assert_allclose(r0["scores"], r3["scores"],
                                       rtol=1e-5, atol=1e-6)
            for a, b in zip(jax.tree_util.tree_leaves(m0.state_dict()),
                            jax.tree_util.tree_leaves(m3.state_dict())):
                np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                           rtol=1e-5, atol=1e-6)
        except AssertionError as err:
            raise AssertionError(f"{ctx}\n{err}") from err


def test_randomized_round5_cross_path_soak():
    """Round-5 interaction soak: random kfold configurations across
    {unequal fold batch counts, shuffle (masked permutation) x engine,
    fused vs streamed vs disk-backed folds, patience} must agree wherever
    two paths claim equality."""
    import tempfile

    import jax

    from multimodn_tpu import Adam, MultiModN
    from multimodn_tpu.data import (ArrayLoader, PartitionDataset,
                                    StreamingLoader)
    from multimodn_tpu.data.dataset import Subset
    from multimodn_tpu.data.disk import NpyStreamingLoader
    from multimodn_tpu.decoders import LogisticDecoder
    from multimodn_tpu.encoders import MLPEncoder
    from multimodn_tpu.experiments import kfold_fit_best
    from multimodn_tpu.parallel import make_mesh

    n_dev = len(jax.devices())
    rng = np.random.default_rng(525252)
    tmp = tempfile.mkdtemp()
    for trial in range(3):
        E = int(rng.integers(2, 4))
        widths = [int(rng.integers(2, 5))] * E
        state = int(rng.integers(2, 5))
        batch = n_dev * 2
        nan_mode = str(rng.choice(["sample", "batch"]))
        shuffle = bool(rng.integers(0, 2))
        patience = None if rng.integers(0, 2) == 0 else 2
        epochs = int(rng.integers(2, 4))
        # unequal fold geometries on purpose (the padding+masked path);
        # a random tail makes some folds end in a partial batch.
        sizes = []
        for _ in range(int(rng.integers(2, 4))):
            tb = int(rng.integers(2, 5)) * batch + \
                (int(rng.integers(0, batch)) if not shuffle else 0)
            vb = batch + int(rng.integers(0, batch) if not shuffle else 0)
            sizes.append((tb, vb))
        n = sum(t + v for t, v in sizes)

        X = rng.normal(size=(n, sum(widths))).astype(np.float32)
        y = (X @ rng.normal(size=sum(widths)) > 0).astype(np.int64)[:, None]
        X[rng.random(n) < 0.2, :widths[0]] = np.nan
        ds = PartitionDataset(X, y, widths)

        def folds(cls, **kw):
            out, at = [], 0
            for tb, vb in sizes:
                out.append((cls(Subset(ds, list(range(at, at + tb))), batch,
                                **kw),
                            cls(Subset(ds, list(range(at + tb, at + tb + vb))),
                                batch)))
                at += tb + vb
            return out

        def disk_folds():
            out, at = [], 0
            for i, (tb, vb) in enumerate(sizes):
                pair = []
                for role, lo, hi in (("tr", at, at + tb),
                                     ("va", at + tb, at + tb + vb)):
                    mat = np.concatenate(
                        [X[lo:hi], y[lo:hi].astype(np.float32)], 1)
                    p = f"{tmp}/{trial}_{role}{i}.npy"
                    np.save(p, mat)
                    pair.append(NpyStreamingLoader(p, widths, 1, batch))
                out.append(tuple(pair))
                at += tb + vb
            return out

        def factory(mesh=None, engine="auto"):
            def make(seed):
                return MultiModN(state,
                                 [MLPEncoder(state, w, (4,))
                                  for w in widths],
                                 [LogisticDecoder(state)], 0.7, 0.3,
                                 seed=seed, nan_skip=nan_mode, mesh=mesh,
                                 dp_engine=engine)
            return make

        ctx = (f"trial {trial}: E={E} state={state} nan={nan_mode} "
               f"shuffle={shuffle} patience={patience} epochs={epochs} "
               f"sizes={sizes}")
        try:
            anchor = kfold_fit_best(
                factory(), folds(ArrayLoader,
                                 **({"shuffle": True} if shuffle else {})),
                Adam(0.01), "cross_entropy", epochs=epochs,
                patience=patience)
            if shuffle:
                # masked/equal shuffle: explicit engine == auto
                other = kfold_fit_best(
                    factory(make_mesh(axis_names=("data",)), "shard_map"),
                    folds(ArrayLoader, shuffle=True), Adam(0.01),
                    "cross_entropy", epochs=epochs, patience=patience)
                pairs = [(anchor, other)]
            else:
                host = kfold_fit_best(factory(), folds(StreamingLoader),
                                      Adam(0.01), "cross_entropy",
                                      epochs=epochs, patience=patience)
                disk = kfold_fit_best(factory(), disk_folds(), Adam(0.01),
                                      "cross_entropy", epochs=epochs,
                                      patience=patience)
                pairs = [(anchor, host), (host, disk)]
            for a, b in pairs:
                for ra, rb in zip(a, b):
                    assert ra["best_epoch"] == rb["best_epoch"]
                    assert ra["epochs_ran"] == rb["epochs_ran"]
                    np.testing.assert_allclose(ra["scores"], rb["scores"],
                                               rtol=1e-5, atol=1e-6)
        except AssertionError as err:
            raise AssertionError(f"{ctx}\n{err}") from err

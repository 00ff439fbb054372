"""Explicit-collective (shard_map + psum) DP step equals single-device
training exactly."""
import numpy as np

import jax
import jax.numpy as jnp

from multimodn_tpu import Adam, MultiModN
from multimodn_tpu.core.fusion import default_order
from multimodn_tpu.core.losses import resolve_criterion
from multimodn_tpu.core.step import make_batch_loss_fn
from multimodn_tpu.decoders import LogisticDecoder
from multimodn_tpu.encoders import MLPEncoder
from multimodn_tpu.parallel import make_mesh
from multimodn_tpu.parallel.shard_map_step import make_shard_map_train_step


def test_shard_map_step_matches_single_device():
    mesh = make_mesh(axis_names=("data",))
    n_dev = len(jax.devices())
    B = 8 * n_dev
    rng = np.random.default_rng(0)
    data = (rng.normal(size=(B, 3)).astype(np.float32),
            rng.normal(size=(B, 3)).astype(np.float32))
    targets = rng.integers(0, 2, size=(B, 1)).astype(np.int32)
    mask = np.ones((B,), np.float32)
    mask[-3:] = 0.0  # padded tail split across shards

    model = MultiModN(3, [MLPEncoder(3, 3, (4,)), MLPEncoder(3, 3, (4,))],
                      [LogisticDecoder(3)], 1.0, 0.0)
    opt = Adam(0.01)
    crit = resolve_criterion("cross_entropy")
    loss_fn = make_batch_loss_fn(model.encoders, model.decoders,
                                 model.init_state, crit, 1.0, 0.0,
                                 default_order(2), "sample")

    # Reference: plain single-device grad step.
    def single_step(params, opt_state):
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, tuple(jnp.asarray(d) for d in data),
            jnp.asarray(targets), jnp.asarray(mask),
            jax.random.PRNGKey(0), jnp.zeros(()), True)
        updates, opt_state = opt.tx.update(grads, opt_state, params)
        params = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)
        return params, {k: aux[k] for k in
                        ("err_loss", "n_correct", "tp", "tn", "fp", "fn")}

    p_ref, sums_ref = single_step(model.params, opt.init(model.params))

    step = make_shard_map_train_step(loss_fn, opt.tx, mesh, 2)
    p_sm, _, sums_sm = step(model.params, opt.init(model.params),
                            tuple(jnp.asarray(d) for d in data),
                            jnp.asarray(targets), jnp.asarray(mask),
                            jax.random.PRNGKey(0))

    np.testing.assert_allclose(
        np.asarray(p_ref["encoders"][0]["layers"][0]["w"]),
        np.asarray(p_sm["encoders"][0]["layers"][0]["w"]),
        rtol=1e-5, atol=1e-6)
    for k in ("n_correct", "tp", "tn", "fp", "fn"):
        np.testing.assert_allclose(np.asarray(sums_ref[k]),
                                   np.asarray(sums_sm[k]),
                                   rtol=1e-5, atol=1e-5, err_msg=k)


def test_shard_map_epoch_matches_auto_sharded_epoch():
    """The epoch-level explicit-collective program (scan-over-batches inside
    shard_map) equals the auto-sharded epoch program: per-epoch grids,
    batch logs, and final parameters (VERDICT r1 next #10)."""
    from multimodn_tpu import MultiModNHistory
    from multimodn_tpu.data import ArrayLoader, PartitionDataset

    rng = np.random.default_rng(1)
    n = 8 * len(jax.devices())
    X = rng.normal(size=(n, 6)).astype(np.float32)
    y = (X @ rng.normal(size=6) > 0).astype(np.int64)[:, None]
    ds = PartitionDataset(X, y, [3, 3])
    mesh = make_mesh(axis_names=("data",))

    def build(engine, m=None):
        return MultiModN(3, [MLPEncoder(3, 3, (4,)), MLPEncoder(3, 3, (4,))],
                         [LogisticDecoder(3)], 0.7, 0.3, mesh=m,
                         dp_engine=engine)

    m_auto = build("auto", mesh)
    m_expl = build("shard_map", mesh)
    h_auto, h_expl = MultiModNHistory(["t"]), MultiModNHistory(["t"])
    opt_a, opt_e = Adam(0.01), Adam(0.01)
    for _ in range(3):
        m_auto.train_epoch(ArrayLoader(ds, 16), opt_a, "cross_entropy",
                           h_auto)
        m_expl.train_epoch(ArrayLoader(ds, 16), opt_e, "cross_entropy",
                           h_expl)
    for e in range(3):
        for k in ("loss", "accuracy", "sensitivity", "specificity"):
            np.testing.assert_allclose(
                getattr(h_auto, k)["train"][e], getattr(h_expl, k)["train"][e],
                rtol=1e-5, atol=1e-6, err_msg=f"epoch {e} {k}")
    for a, b in zip(jax.tree_util.tree_leaves(m_auto.state_dict()),
                    jax.tree_util.tree_leaves(m_expl.state_dict())):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_shard_map_engine_validation():
    import pytest

    with pytest.raises(ValueError, match="requires a mesh"):
        MultiModN(3, [MLPEncoder(3, 3, (4,))], [LogisticDecoder(3)],
                  1.0, 0.0, dp_engine="shard_map")
    # nan_skip='batch' is SUPPORTED on the explicit engine since round 4
    # (psum'd any-NaN flag, fusion.global_any) — construction must succeed.
    m = MultiModN(3, [MLPEncoder(3, 3, (4,))], [LogisticDecoder(3)],
                  1.0, 0.0, mesh=make_mesh(axis_names=("data",)),
                  dp_engine="shard_map", nan_skip="batch")
    assert m._sm_nan_axis() == "data"


def _dp_pair(engine, seed=5, n_mult=8):
    """(model, train_loader, val_loader) on the full-device data mesh."""
    from multimodn_tpu.data import ArrayLoader, PartitionDataset
    from multimodn_tpu.data.dataset import Subset

    rng = np.random.default_rng(seed)
    n = n_mult * len(jax.devices())
    X = rng.normal(size=(n + 16, 6)).astype(np.float32)
    y = (X @ rng.normal(size=6) > 0).astype(np.int64)[:, None]
    ds = PartitionDataset(X, y, [3, 3])
    mesh = make_mesh(axis_names=("data",)) if engine == "shard_map" else None
    model = MultiModN(3, [MLPEncoder(3, 3, (4,)), MLPEncoder(3, 3, (4,))],
                      [LogisticDecoder(3)], 1.0, 0.0, seed=0,
                      mesh=mesh, dp_engine=engine)
    bs = len(jax.devices()) * 4
    tr = ArrayLoader(Subset(ds, list(range(n))), bs)
    va = ArrayLoader(Subset(ds, list(range(n, n + 16))), 16)
    return model, tr, va


def test_shard_map_fused_fit_matches_auto():
    """Fused multi-epoch fit through the explicit engine == auto engine:
    params and full train/val history grids (VERDICT r2 next-#6)."""
    from multimodn_tpu import MultiModNHistory

    hists, params = [], []
    for engine in ("auto", "shard_map"):
        model, tr, va = _dp_pair(engine)
        h = MultiModNHistory(["t"])
        model.fit(tr, Adam(0.01), "cross_entropy", epochs=4, history=h,
                  val_loader=va)
        hists.append(h)
        params.append(np.asarray(model.params["encoders"][0]["layers"][0]["w"]))
    np.testing.assert_allclose(params[0], params[1], rtol=1e-5, atol=1e-6)
    for field in ("loss", "accuracy", "sensitivity", "specificity"):
        for tag in ("train", "val"):
            np.testing.assert_allclose(
                np.asarray(getattr(hists[0], field)[tag]),
                np.asarray(getattr(hists[1], field)[tag]),
                rtol=1e-5, atol=1e-6, err_msg=f"{field}[{tag}]")


def test_shard_map_fused_fit_best_matches_auto():
    """Fused select-fit (train + val + AUROC/BAC best-checkpoint selection
    with the per-epoch val all_gather) == auto engine."""
    results = []
    for engine in ("auto", "shard_map"):
        model, tr, va = _dp_pair(engine, seed=6)
        res = model.fit_best(tr, Adam(0.01), "cross_entropy", epochs=4,
                             val_loader=va)
        results.append((res, np.asarray(
            model.params["encoders"][0]["layers"][0]["w"])))
    (a, pa), (b, pb) = results
    assert a["best_epoch"] == b["best_epoch"]
    np.testing.assert_allclose(a["scores"], b["scores"], rtol=1e-5,
                               atol=1e-6)
    np.testing.assert_allclose(a["best_score"], b["best_score"], rtol=1e-5)
    np.testing.assert_allclose(pa, pb, rtol=1e-5, atol=1e-6)


def test_shard_map_fused_guards():
    """The fused shard_map programs reject what they cannot express, before
    touching optimizer state."""
    import pytest

    from multimodn_tpu.data import ArrayLoader, PartitionDataset

    model, tr, va = _dp_pair("shard_map", seed=7)
    # Indivisible batch size.
    rng = np.random.default_rng(0)
    X = rng.normal(size=(30, 6)).astype(np.float32)
    y = rng.integers(0, 2, size=(30, 1))
    odd = ArrayLoader(PartitionDataset(X, y, [3, 3]),
                      len(jax.devices()) * 4 + 1)
    with pytest.raises(ValueError, match="divide the data mesh axis"):
        model.fit(odd, Adam(0.01), "cross_entropy", epochs=2)
    assert model.opt_state is None  # rejected call left no state behind


def test_shard_map_fused_shuffle_matches_auto():
    """shuffle=True fused programs under the explicit engine (round-4
    continuation): the in-region permutation (all_gather + the auto
    engine's exact epoch_permute + positional re-slice,
    _sm_epoch_permute) must make shuffled fit AND shuffled fit_best
    (patience included) equal the single-device auto runs bit-for-bit —
    same seed, same fold_in(erng, _PERM_FOLD) permutation stream, padded tail
    included."""
    from multimodn_tpu import MultiModNHistory
    from multimodn_tpu.data import ArrayLoader, PartitionDataset
    from multimodn_tpu.data.dataset import Subset

    rng = np.random.default_rng(13)
    n = 8 * len(jax.devices()) + 5     # padded tail batch
    X = rng.normal(size=(n + 16, 6)).astype(np.float32)
    y = (X @ rng.normal(size=6) > 0).astype(np.int64)[:, None]
    ds = PartitionDataset(X, y, [3, 3])
    mesh = make_mesh(axis_names=("data",))
    bs = len(jax.devices()) * 2

    def build(engine):
        m = mesh if engine == "shard_map" else None
        return MultiModN(3, [MLPEncoder(3, 3, (4,)), MLPEncoder(3, 3, (4,))],
                         [LogisticDecoder(3)], 1.0, 0.0, seed=0,
                         mesh=m, dp_engine=engine)

    def loaders():
        return (ArrayLoader(Subset(ds, list(range(n))), bs, shuffle=True),
                ArrayLoader(Subset(ds, list(range(n, n + 16))), 16))

    # fit: history grids + params equal across engines.
    hists, leaves = [], []
    for engine in ("auto", "shard_map"):
        m = build(engine)
        h = MultiModNHistory(["t"])
        tr, va = loaders()
        m.fit(tr, Adam(0.01), "cross_entropy", epochs=3, history=h,
              val_loader=va)
        hists.append(h)
        leaves.append(jax.tree_util.tree_leaves(m.state_dict()))
    for k in ("loss", "accuracy"):
        for tag in ("train", "val"):
            np.testing.assert_allclose(
                np.asarray(getattr(hists[0], k)[tag]),
                np.asarray(getattr(hists[1], k)[tag]),
                rtol=1e-5, atol=1e-6, err_msg=f"{tag} {k}")
    for a, b in zip(*leaves):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)

    # fit_best with patience: scores/selection equal across engines.
    results = []
    for engine in ("auto", "shard_map"):
        m = build(engine)
        tr, va = loaders()
        results.append(m.fit_best(tr, Adam(0.01), "cross_entropy",
                                  epochs=4, val_loader=va, patience=3))
    a, b = results
    assert a["best_epoch"] == b["best_epoch"]
    assert a["epochs_ran"] == b["epochs_ran"]
    np.testing.assert_allclose(a["scores"], b["scores"], rtol=1e-5,
                               atol=1e-6)


def test_randomized_shard_map_fused_soak():
    """Cross-engine soak: for random configurations (encoder counts/widths,
    state sizes, divisible batch sizes, NaN patterns, epochs), the fused
    fit_best through dp_engine='shard_map' must match the auto engine —
    score trajectories, selection, and final params."""
    import pytest

    from multimodn_tpu.data import ArrayLoader, PartitionDataset
    from multimodn_tpu.data.dataset import Subset

    n_dev = len(jax.devices())
    if n_dev < 2:
        pytest.skip("needs a multi-device mesh")
    rng = np.random.default_rng(31337)
    for trial in range(4):
        E = int(rng.integers(1, 4))
        widths = [int(rng.integers(2, 6)) for _ in range(E)]
        state = int(rng.integers(2, 5))
        batch = n_dev * int(rng.choice([1, 2, 4]))
        n = batch * int(rng.integers(3, 6)) + int(rng.integers(0, batch))
        nan_frac = float(rng.choice([0.0, 0.3]))
        nan_mode = str(rng.choice(["sample", "batch"]))
        epochs = int(rng.integers(2, 5))
        seed = int(rng.integers(0, 1000))

        X = rng.normal(size=(n, sum(widths))).astype(np.float32)
        y = (X @ rng.normal(size=sum(widths)) > 0).astype(np.int64)[:, None]
        if nan_frac > 0:
            rows = rng.random(n) < nan_frac
            X[rows, :widths[0]] = np.nan
        ds = PartitionDataset(X, y, widths)
        # Padded tail batches are fine under both engines (mask-weighted);
        # only batch_size % n_dev == 0 is required.
        n_tr = max(batch, n * 3 // 4)
        n_va = n - n_tr

        def build(engine):
            mesh = make_mesh(axis_names=("data",)) \
                if engine == "shard_map" else None
            return MultiModN(state, [MLPEncoder(state, w, (4,))
                                     for w in widths],
                             [LogisticDecoder(state)], 0.7, 0.3, seed=seed,
                             nan_skip=nan_mode, mesh=mesh, dp_engine=engine)

        results = {}
        for engine in ("auto", "shard_map"):
            m = build(engine)
            tr = ArrayLoader(Subset(ds, list(range(n_tr))), batch)
            va = ArrayLoader(Subset(ds, list(range(n_tr, n))), batch)
            res = m.fit_best(tr, Adam(0.01), "cross_entropy", epochs=epochs,
                             val_loader=va)
            results[engine] = (res, m.state_dict())
        (ra, pa), (rs, ps) = results["auto"], results["shard_map"]
        try:
            np.testing.assert_allclose(np.asarray(ra["scores"]),
                                       np.asarray(rs["scores"]),
                                       rtol=1e-5, atol=1e-6)
            assert ra["best_epoch"] == rs["best_epoch"]
            for a, b in zip(jax.tree_util.tree_leaves(pa),
                            jax.tree_util.tree_leaves(ps)):
                np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                           rtol=1e-5, atol=1e-6)
        except AssertionError as err:
            raise AssertionError(
                f"trial {trial}: E={E} widths={widths} state={state} "
                f"batch={batch} n={n} (tr={n_tr}, va={n_va}) "
                f"nan={nan_frac}/{nan_mode} epochs={epochs} seed={seed}\n"
                f"{err}"
            ) from err


def _sm_fold_setup(seed=21, folds_n=2):
    """Fold loaders with divisible batch sizes + unequal batch counts (the
    padded-fold case the gate_empty lax.cond exists for)."""
    from multimodn_tpu.data import ArrayLoader, PartitionDataset
    from multimodn_tpu.data.dataset import Subset

    n_dev = len(jax.devices())
    bs = n_dev * 2
    rng = np.random.default_rng(seed)
    n = bs * 7 + 4
    X = rng.normal(size=(n, 6)).astype(np.float32)
    y = (X @ rng.normal(size=6) > 0).astype(np.int64)[:, None]
    ds = PartitionDataset(X, y, [3, 3])
    folds = []
    for k in range(folds_n):
        # Unequal fold sizes -> unequal batch counts after stacking.
        cut = bs * (4 + k)
        tr = ArrayLoader(Subset(ds, list(range(cut))), bs)
        va = ArrayLoader(Subset(ds, list(range(cut, min(cut + bs, n)))), bs)
        folds.append((tr, va))
    return ds, folds, bs


def test_shard_map_kfold_matches_auto():
    """VERDICT r3 next-#3: kfold_fit_best accepts dp_engine='shard_map'
    models — the fold axis vmaps OVER the explicit-collective region — and
    equals the auto engine fold-for-fold (scores, selection, params),
    including fold-padded empty batches (global-psum'd gate)."""
    from multimodn_tpu.experiments import kfold_fit_best

    _, folds, _ = _sm_fold_setup()

    def factory(engine):
        def make(seed):
            mesh = make_mesh(axis_names=("data",)) \
                if engine == "shard_map" else None
            return MultiModN(3, [MLPEncoder(3, 3, (4,)),
                                 MLPEncoder(3, 3, (4,))],
                             [LogisticDecoder(3)], 0.7, 0.3, seed=seed,
                             mesh=mesh, dp_engine=engine)
        return make

    res_auto = kfold_fit_best(factory("auto"), folds, Adam(0.01),
                              "cross_entropy", epochs=3)
    res_sm = kfold_fit_best(factory("shard_map"), folds, Adam(0.01),
                            "cross_entropy", epochs=3)
    for ra, rs in zip(res_auto, res_sm):
        assert ra["best_epoch"] == rs["best_epoch"]
        np.testing.assert_allclose(ra["scores"], rs["scores"],
                                   rtol=1e-5, atol=1e-6)
        for a, b in zip(
                jax.tree_util.tree_leaves(ra["model"].state_dict()),
                jax.tree_util.tree_leaves(rs["model"].state_dict())):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-6)


def test_shard_map_kfold_shuffled_matches_auto():
    """shuffle=True fold loaders under the explicit engine: the in-region
    global permutation (_sm_epoch_permute) rides the fold vmap —
    shard_map's batching rule batches the all_gather — and equals the auto
    engine fold-for-fold (same per-fold rng stream)."""
    from multimodn_tpu.data import ArrayLoader, PartitionDataset
    from multimodn_tpu.data.dataset import Subset
    from multimodn_tpu.experiments import kfold_fit_best

    n_dev = len(jax.devices())
    bs = n_dev * 2
    rng = np.random.default_rng(29)
    n = bs * 8
    X = rng.normal(size=(n, 6)).astype(np.float32)
    y = (X @ rng.normal(size=6) > 0).astype(np.int64)[:, None]
    ds = PartitionDataset(X, y, [3, 3])

    def folds():
        # Equal train batch counts (the shuffle-stacking requirement).
        return [
            (ArrayLoader(Subset(ds, list(range(0, bs * 3))), bs,
                         shuffle=True),
             ArrayLoader(Subset(ds, list(range(bs * 3, bs * 4))), bs)),
            (ArrayLoader(Subset(ds, list(range(bs * 4, bs * 7))), bs,
                         shuffle=True),
             ArrayLoader(Subset(ds, list(range(bs * 7, bs * 8))), bs)),
        ]

    def factory(engine):
        def make(seed):
            mesh = make_mesh(axis_names=("data",)) \
                if engine == "shard_map" else None
            return MultiModN(3, [MLPEncoder(3, 3, (4,)),
                                 MLPEncoder(3, 3, (4,))],
                             [LogisticDecoder(3)], 0.7, 0.3, seed=seed,
                             mesh=mesh, dp_engine=engine)
        return make

    res_auto = kfold_fit_best(factory("auto"), folds(), Adam(0.01),
                              "cross_entropy", epochs=3)
    res_sm = kfold_fit_best(factory("shard_map"), folds(), Adam(0.01),
                            "cross_entropy", epochs=3)
    for ra, rs in zip(res_auto, res_sm):
        assert ra["best_epoch"] == rs["best_epoch"]
        np.testing.assert_allclose(ra["scores"], rs["scores"],
                                   rtol=1e-5, atol=1e-6)
        for a, b in zip(
                jax.tree_util.tree_leaves(ra["model"].state_dict()),
                jax.tree_util.tree_leaves(rs["model"].state_dict())):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-6)


def test_shard_map_sweep_matches_auto():
    """sweep_fit_best under the explicit engine: seed axis vmapped over the
    shard_map region, equal to the auto engine per seed."""
    from multimodn_tpu.data import ArrayLoader
    from multimodn_tpu.experiments import sweep_fit_best

    ds, folds, bs = _sm_fold_setup(seed=22, folds_n=1)
    tr, va = folds[0]

    def factory(engine):
        def make(seed):
            mesh = make_mesh(axis_names=("data",)) \
                if engine == "shard_map" else None
            return MultiModN(3, [MLPEncoder(3, 3, (4,)),
                                 MLPEncoder(3, 3, (4,))],
                             [LogisticDecoder(3)], 0.7, 0.3, seed=seed,
                             mesh=mesh, dp_engine=engine)
        return make

    res_auto = sweep_fit_best(factory("auto"), tr, va, Adam(0.01),
                              "cross_entropy", epochs=3, seeds=(0, 1, 2))
    res_sm = sweep_fit_best(factory("shard_map"), tr, va, Adam(0.01),
                            "cross_entropy", epochs=3, seeds=(0, 1, 2))
    for ra, rs in zip(res_auto, res_sm):
        assert ra["best_epoch"] == rs["best_epoch"]
        np.testing.assert_allclose(ra["scores"], rs["scores"],
                                   rtol=1e-5, atol=1e-6)


def test_shard_map_experiment_guards():
    """The experiment-level shard_map path rejects what the engine cannot
    express, with actionable errors."""
    import pytest

    from multimodn_tpu.experiments import kfold_fit_best, sweep_fit_best

    _, folds, _ = _sm_fold_setup(seed=23)

    def make(seed):
        return MultiModN(3, [MLPEncoder(3, 3, (4,)), MLPEncoder(3, 3, (4,))],
                         [LogisticDecoder(3)], 0.7, 0.3, seed=seed,
                         mesh=make_mesh(axis_names=("data",)),
                         dp_engine="shard_map")

    # patience is SUPPORTED since round 4 (the explicit engine's
    # while_loop program, vmapped over folds/seeds): runs and equals the
    # auto engine per fold.
    res_sm = kfold_fit_best(make, folds, Adam(0.01), "cross_entropy",
                            epochs=4, patience=2)

    def make_auto(seed):
        return MultiModN(3, [MLPEncoder(3, 3, (4,)), MLPEncoder(3, 3, (4,))],
                         [LogisticDecoder(3)], 0.7, 0.3, seed=seed)

    res_auto = kfold_fit_best(make_auto, folds, Adam(0.01), "cross_entropy",
                              epochs=4, patience=2)
    for rs, ra in zip(res_sm, res_auto):
        assert rs["epochs_ran"] == ra["epochs_ran"]
        assert rs["best_epoch"] == ra["best_epoch"]
        np.testing.assert_allclose(rs["scores"], ra["scores"],
                                   rtol=1e-5, atol=1e-6)
    tr, va = folds[0]
    res = sweep_fit_best(make, tr, va, Adam(0.01), "cross_entropy",
                         epochs=4, seeds=(0, 1), patience=2)
    assert all(np.isfinite(r["best_score"]) for r in res)


def test_shard_map_experiment_program_cached():
    """Review finding: repeated shard_map kfold calls (a protocol loop)
    must reuse the traced program via the structural cache, not re-trace
    per call."""
    from multimodn_tpu import experiments
    from multimodn_tpu.experiments import kfold_fit_best

    _, folds, _ = _sm_fold_setup(seed=31)

    def make(seed):
        return MultiModN(3, [MLPEncoder(3, 3, (4,)), MLPEncoder(3, 3, (4,))],
                         [LogisticDecoder(3)], 0.7, 0.3, seed=seed,
                         mesh=make_mesh(axis_names=("data",)),
                         dp_engine="shard_map")

    experiments._FIT_PROGRAM_CACHE.clear()
    r1 = kfold_fit_best(make, folds, Adam(0.01), "cross_entropy", epochs=2)
    n = len(experiments._FIT_PROGRAM_CACHE)
    assert n >= 1
    r2 = kfold_fit_best(make, folds, Adam(0.01), "cross_entropy", epochs=2)
    assert len(experiments._FIT_PROGRAM_CACHE) == n
    for a, b in zip(r1, r2):
        np.testing.assert_array_equal(a["scores"], b["scores"])


def test_shard_map_fit_best_patience_matches_auto():
    """Round 4: on-device early stopping under the EXPLICIT engine — the
    while_loop runs inside the shard_map region; the stop decision reads
    the replicated all_gather'd score, so every shard exits together.
    Epochs-ran, executed-prefix scores, and best selection equal the auto
    engine's while_loop program."""
    from multimodn_tpu import SGD

    results = {}
    for engine in ("auto", "shard_map"):
        model, tr, va = _dp_pair(engine, seed=41)
        # SGD(0.0): no improvement after epoch 0 -> stops at patience+1.
        res = model.fit_best(tr, SGD(0.0), "cross_entropy", epochs=20,
                             val_loader=va, patience=2)
        results[engine] = res
    ra, rs = results["auto"], results["shard_map"]
    assert ra["epochs_ran"] == rs["epochs_ran"] <= 4
    assert ra["best_epoch"] == rs["best_epoch"]
    np.testing.assert_allclose(ra["scores"], rs["scores"], rtol=1e-5,
                               atol=1e-6)

    # And with a real optimizer (scores vary; prefix equality vs the
    # fixed-epoch shard_map run of the same workload).
    m1, tr, va = _dp_pair("shard_map", seed=42)
    m2, tr2, va2 = _dp_pair("shard_map", seed=42)
    full = m1.fit_best(tr, Adam(0.01), "cross_entropy", epochs=6,
                       val_loader=va)
    es = m2.fit_best(tr2, Adam(0.01), "cross_entropy", epochs=6,
                     val_loader=va2, patience=6)
    np.testing.assert_allclose(np.asarray(es["scores"]),
                               np.asarray(full["scores"])[:es["epochs_ran"]],
                               rtol=1e-5, atol=1e-6)


def test_shard_map_on_epoch_matches_auto():
    """Round 4 (lifting the last progress guard): the explicit engine's
    fused programs stream on_epoch payloads from INSIDE the shard_map
    region — emission gated to the mesh-origin shard (_sm_emit_epoch), so
    exactly one unordered payload per epoch leaves, and every scalar
    equals the auto engine's (fit, fit_best, and the early-stop
    while_loop program)."""
    # fit: payload multiset equal across engines.
    payloads = {}
    for engine in ("auto", "shard_map"):
        model, tr, va = _dp_pair(engine)
        seen = []
        model.fit(tr, Adam(0.01), "cross_entropy", epochs=3,
                  val_loader=va, on_epoch=seen.append)
        assert len(seen) == 3, engine
        payloads[engine] = sorted(
            (p["epoch"], round(p["train_loss"], 6), round(p["val_loss"], 6))
            for p in seen)
    assert payloads["auto"] == payloads["shard_map"]

    # fit_best with patience: one payload per EXECUTED epoch, scores
    # matching the run's own, no internal liveness key leaking.
    for engine in ("auto", "shard_map"):
        model, tr, va = _dp_pair(engine, seed=6)
        seen = []
        r = model.fit_best(tr, Adam(0.01), "cross_entropy", epochs=10,
                           patience=2, val_loader=va, on_epoch=seen.append)
        assert len(seen) == r["epochs_ran"], engine
        np.testing.assert_allclose(sorted(p["score"] for p in seen),
                                   sorted(r["scores"]), rtol=1e-5,
                                   atol=1e-6)
        assert not any("_active" in p for p in seen)


def test_shard_map_experiment_on_epoch():
    """Experiment-scale progress under the explicit engine: the fold/seed
    vmap rides over the shard_map region, the origin-shard cond stays a
    real branch (its predicate is uniform across lanes), and one payload
    per fold per EXECUTED epoch arrives — including under patience, where
    frozen folds' phantom emissions are dropped via _active."""
    from multimodn_tpu.experiments import kfold_fit_best, sweep_fit_best

    _, folds, _ = _sm_fold_setup(seed=29)

    def make(seed):
        return MultiModN(3, [MLPEncoder(3, 3, (4,)), MLPEncoder(3, 3, (4,))],
                         [LogisticDecoder(3)], 1.0, 0.0, seed=seed,
                         mesh=make_mesh(axis_names=("data",)),
                         dp_engine="shard_map")

    seen = []
    res = kfold_fit_best(make, folds, Adam(0.01), "cross_entropy",
                         epochs=3, on_epoch=seen.append)
    expected = sorted((e, round(float(r["scores"][e]), 5))
                      for r in res for e in range(3))
    got = sorted((p["epoch"], round(p["score"], 5)) for p in seen)
    assert expected == got

    seen2 = []
    res2 = kfold_fit_best(make, folds, Adam(0.01), "cross_entropy",
                          epochs=10, patience=1, on_epoch=seen2.append)
    expected2 = sorted((e, round(float(r["scores"][e]), 5))
                       for r in res2 for e in range(r["epochs_ran"]))
    got2 = sorted((p["epoch"], round(p["score"], 5)) for p in seen2)
    assert expected2 == got2
    assert not any("_active" in p for p in seen2)

    seen3 = []
    tr, va = folds[0]
    sweep_fit_best(make, tr, va, Adam(0.01), "cross_entropy", epochs=2,
                   seeds=(0, 1), on_epoch=seen3.append)
    assert len(seen3) == 4


def test_shard_map_static_init_state_global_round_robin():
    """StaticInitState banks under the explicit engine: each shard adds
    axis_index * B_local to the carried cycle offset (_sm_local_offset),
    so bank indexing equals the auto engine's offset + arange(B_global) —
    the reference's lifetime itertools.cycle (state.py:41). Covered across
    looped train_epoch calls (host offset continuity), fused fit with a
    validation sweep (val consumes bank rows too), and fit_best with
    patience (offset carried through the while_loop) — with a bank size
    (5) coprime to batch (16), shard (2) and dataset (40) sizes, and a
    padded tail whose GLOBAL valid count (not batch size) must advance
    the cycle."""
    from multimodn_tpu import MultiModNHistory, StaticInitState
    from multimodn_tpu.data import ArrayLoader, PartitionDataset

    rng = np.random.default_rng(7)
    n = 40                       # 40 % 16 = 8 -> padded tail in every epoch
    X = rng.normal(size=(n, 6)).astype(np.float32)
    y = (X @ rng.normal(size=6) > 0).astype(np.int64)[:, None]
    ds = PartitionDataset(X, y, [3, 3])
    vds = PartitionDataset(X[:24], y[:24], [3, 3])
    mesh = make_mesh(axis_names=("data",))
    bank = [rng.normal(size=3).astype(np.float32) for _ in range(5)]

    def run(engine, m):
        model = MultiModN(
            3, [MLPEncoder(3, 3, (4,)), MLPEncoder(3, 3, (4,))],
            [LogisticDecoder(3)], 0.7, 0.3, mesh=m, dp_engine=engine,
            init_state=StaticInitState([b.copy() for b in bank]))
        h = MultiModNHistory(["t"])
        opt = Adam(0.01)
        model.train_epoch(ArrayLoader(ds, 16), opt, "cross_entropy", h)
        model.fit(ArrayLoader(ds, 16), opt, "cross_entropy", epochs=2,
                  history=h, val_loader=ArrayLoader(vds, 16))
        r = model.fit_best(ArrayLoader(ds, 16), opt, "cross_entropy",
                           epochs=4, val_loader=ArrayLoader(vds, 16),
                           patience=3)
        assert model._cycle_offset == (
            40 + 2 * (40 + 24) + r["epochs_ran"] * (40 + 24)) % 5
        return (np.asarray(h.loss["train"]), np.asarray(h.loss["val"]),
                np.asarray(r["scores"]), r["best_epoch"], model.state_dict())

    t0, v0, s0, b0, p0 = run("auto", None)
    t1, v1, s1, b1, p1 = run("shard_map", mesh)
    np.testing.assert_allclose(t0, t1, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(v0, v1, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(s0, s1, rtol=1e-5, atol=1e-6)
    assert b0 == b1
    for a, b in zip(jax.tree_util.tree_leaves(p0),
                    jax.tree_util.tree_leaves(p1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_shard_map_kfold_masked_shuffle_unequal_folds_matches_auto():
    """shuffle=True with UNEQUAL fold batch counts under the explicit
    engine (round-5 corner closure): the masked permutation is drawn over
    the all_gather'd global stack — the auto engine's exact fold-padded
    layout — so results equal the auto engine fold-for-fold."""
    from multimodn_tpu.data import ArrayLoader, PartitionDataset
    from multimodn_tpu.data.dataset import Subset
    from multimodn_tpu.experiments import kfold_fit_best

    n_dev = len(jax.devices())
    bs = n_dev * 2
    rng = np.random.default_rng(31)
    n = bs * 9
    X = rng.normal(size=(n, 6)).astype(np.float32)
    y = (X @ rng.normal(size=6) > 0).astype(np.int64)[:, None]
    ds = PartitionDataset(X, y, [3, 3])

    def folds():
        # 3 vs 2 train batches -> the masked-permutation path.
        return [
            (ArrayLoader(Subset(ds, list(range(0, bs * 3))), bs,
                         shuffle=True),
             ArrayLoader(Subset(ds, list(range(bs * 3, bs * 4))), bs)),
            (ArrayLoader(Subset(ds, list(range(bs * 4, bs * 6))), bs,
                         shuffle=True),
             ArrayLoader(Subset(ds, list(range(bs * 6, bs * 7))), bs)),
        ]

    def factory(engine):
        def make(seed):
            mesh = make_mesh(axis_names=("data",)) \
                if engine == "shard_map" else None
            return MultiModN(3, [MLPEncoder(3, 3, (4,)),
                                 MLPEncoder(3, 3, (4,))],
                             [LogisticDecoder(3)], 0.7, 0.3, seed=seed,
                             mesh=mesh, dp_engine=engine)
        return make

    res_auto = kfold_fit_best(factory("auto"), folds(), Adam(0.01),
                              "cross_entropy", epochs=3, patience=2)
    res_sm = kfold_fit_best(factory("shard_map"), folds(), Adam(0.01),
                            "cross_entropy", epochs=3, patience=2)
    for ra, rs in zip(res_auto, res_sm):
        assert ra["best_epoch"] == rs["best_epoch"]
        assert ra["epochs_ran"] == rs["epochs_ran"]
        np.testing.assert_allclose(ra["scores"], rs["scores"],
                                   rtol=1e-5, atol=1e-6)
        for a, b in zip(
                jax.tree_util.tree_leaves(ra["model"].state_dict()),
                jax.tree_util.tree_leaves(rs["model"].state_dict())):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-6)

"""Presence-channel MNAR mitigations (VERDICT r3 next-#2).

RESULTS.md measured that ``nan_skip='sample'`` (the default) collapses
under class-conditional MNAR on the flipped-class test (0.008 AUROC at
100% missingness) because per-sample skip exposes an exploitable
presence-of-modality channel. These tests pin the opt-in mitigation:
``presence_penalty`` (missingness-weighted state-update damping on present
rows) rescues the flip test; ``presence_dropout`` (label-independent skip
noise) is also covered — including the honest finding that dropout ALONE
does not fix adversarial MNAR (documented in RESULTS.md).
"""
import numpy as np
import pytest

from multimodn_tpu import Adam, MultiModN
from multimodn_tpu.data import ArrayLoader, PartitionDataset
from multimodn_tpu.decoders import LogisticDecoder
from multimodn_tpu.encoders import MLPEncoder


def _mnar_problem(n=384, seed=0):
    """Two modalities, B strongly informative; class-conditional missingness
    hides B for class 1 at train, class 0 at (flipped) test."""
    rng = np.random.default_rng(seed)
    XA = rng.normal(size=(n, 4)).astype(np.float32)
    XB = rng.normal(size=(n, 4)).astype(np.float32)
    logits = 0.8 * XA[:, 0] + 2.0 * XB[:, 0] + 0.3 * rng.normal(size=n)
    y = (logits > 0).astype(np.int64)[:, None]

    def degraded(miss_class):
        Xb = XB.copy()
        Xb[y[:, 0] == miss_class] = np.nan
        return PartitionDataset(np.concatenate([XA, Xb], 1), y, [4, 4])

    return degraded(1), degraded(0)


def _model(**kw):
    return MultiModN(8, [MLPEncoder(8, 4, (8,)), MLPEncoder(8, 4, (8,))],
                     [LogisticDecoder(8)], 1.0, 0.0, nan_skip="sample", **kw)


def test_presence_penalty_rescues_flipped_class_mnar():
    """The headline: bare 'sample' collapses on the flip test (AUROC ~0);
    presence_penalty recovers it to the degraded-modality-free ceiling."""
    train_ds, flip_ds = _mnar_problem()

    def flip_auc(**kw):
        m = _model(**kw)
        m.fit(ArrayLoader(train_ds, 32), Adam(0.01), "cross_entropy",
              epochs=40)
        return float(m.test(ArrayLoader(flip_ds, 32), "cross_entropy")[0][1])

    bare = flip_auc()
    mitigated = flip_auc(presence_penalty=50.0)
    assert bare < 0.2, f"collapse did not reproduce (auc={bare})"
    assert mitigated > 0.55, f"mitigation failed (auc={mitigated})"


def test_presence_penalty_noop_on_complete_data():
    """With zero missingness the penalty term is zero: trajectories equal
    the unpenalized model exactly."""
    rng = np.random.default_rng(3)
    X = rng.normal(size=(64, 8)).astype(np.float32)
    y = (X @ rng.normal(size=8) > 0).astype(np.int64)[:, None]
    ds = PartitionDataset(X, y, [4, 4])
    outs = []
    for pp in (0.0, 25.0):
        m = _model(presence_penalty=pp)
        m.fit(ArrayLoader(ds, 16), Adam(0.01), "cross_entropy", epochs=3)
        outs.append(np.asarray(m.params["encoders"][1]["layers"][0]["w"]))
    np.testing.assert_allclose(outs[0], outs[1], rtol=1e-6, atol=1e-7)


def test_presence_dropout_injects_label_independent_missingness():
    """Dropout changes TRAINING (different trajectory vs p=0) but never
    evaluation (test() identical before/after constructing with dropout)."""
    rng = np.random.default_rng(4)
    X = rng.normal(size=(64, 8)).astype(np.float32)
    y = (X @ rng.normal(size=8) > 0).astype(np.int64)[:, None]
    ds = PartitionDataset(X, y, [4, 4])
    ws = []
    for pd in (0.0, 0.5):
        m = _model(presence_dropout=pd)
        m.fit(ArrayLoader(ds, 16), Adam(0.01), "cross_entropy", epochs=3)
        ws.append(np.asarray(m.params["encoders"][1]["layers"][0]["w"]))
    assert not np.allclose(ws[0], ws[1])
    # Eval ignores dropout: two identical fresh models, one with dropout,
    # produce identical test() results (train=False path).
    m1, m2 = _model(), _model(presence_dropout=0.5)
    r1 = m1.test(ArrayLoader(ds, 16), "cross_entropy")
    r2 = m2.test(ArrayLoader(ds, 16), "cross_entropy")
    assert float(r1[0][1]) == float(r2[0][1])


def test_presence_knob_validation():
    enc = [MLPEncoder(3, 4, (4,))]
    dec = [LogisticDecoder(3)]
    with pytest.raises(ValueError, match="presence_dropout"):
        MultiModN(3, enc, dec, 1.0, 0.0, presence_dropout=1.0)
    with pytest.raises(ValueError, match="presence_penalty"):
        MultiModN(3, enc, dec, 1.0, 0.0, presence_penalty=-1.0)
    with pytest.raises(ValueError, match="nan_skip='sample'"):
        MultiModN(3, enc, dec, 1.0, 0.0, nan_skip="batch",
                  presence_penalty=1.0)
    with pytest.raises(ValueError, match="nan_skip='sample'"):
        MultiModN(3, enc, dec, 1.0, 0.0, nan_skip="none",
                  presence_dropout=0.5)
    # Static-order requirement for the penalty (in-program shuffle).
    m = MultiModN(3, [MLPEncoder(3, 4, (4,)), MLPEncoder(3, 4, (4,))],
                  dec, 1.0, 0.0, shuffle_mode=True, presence_penalty=1.0)
    rng = np.random.default_rng(0)
    X = rng.normal(size=(32, 8)).astype(np.float32)
    yy = rng.integers(0, 2, size=(32, 1))
    ds = PartitionDataset(X, yy, [4, 4])
    with pytest.raises(ValueError, match="STATIC"):
        m.train_epoch(ArrayLoader(ds, 16), Adam(0.01), "cross_entropy")


def test_presence_penalty_in_kfold_program_signature():
    """Two kfold runs differing only in presence_penalty must not share a
    cached fused program (the structural signature includes the knobs)."""
    from multimodn_tpu.experiments import _model_signature

    m0 = _model()
    m1 = _model(presence_penalty=10.0)
    m2 = _model(presence_dropout=0.25)
    sigs = {_model_signature(m) for m in (m0, m1, m2)}
    assert len(sigs) == 3


def test_presence_penalty_through_kfold_fit_best():
    """The experiment axis threads the knob: kfold with presence_penalty
    equals looping fit_best per fold with the same knob."""
    from multimodn_tpu.experiments import kfold_fit_best

    train_ds, _ = _mnar_problem(n=128, seed=9)
    folds = []
    for k in range(2):
        tr, va, _ = train_ds.random_split((0.7, 0.3, 0), seed=k)
        folds.append((ArrayLoader(tr, 16), ArrayLoader(va, 16)))

    res = kfold_fit_best(lambda s: _model(presence_penalty=10.0, seed=s),
                         folds, Adam(0.01), "cross_entropy", epochs=3)
    for f, (tr, va) in enumerate(folds):
        m = _model(presence_penalty=10.0, seed=f)
        r = m.fit_best(tr, Adam(0.01), "cross_entropy", epochs=3,
                       val_loader=va)
        assert r["best_epoch"] == res[f]["best_epoch"]
        np.testing.assert_allclose(r["scores"], res[f]["scores"],
                                   rtol=1e-5, atol=1e-6)


def test_presence_penalty_on_mesh_matches_single_device():
    """The penalty's reductions (missingness fractions, present-row
    deltas) are GSPMD-global on the auto engine: DP and DP x TP training
    with presence_penalty equals single-device."""
    import jax

    from multimodn_tpu import MultiModNHistory
    from multimodn_tpu.parallel import make_mesh

    train_ds, _ = _mnar_problem(n=128, seed=11)

    def run(mesh):
        m = _model(presence_penalty=10.0, mesh=mesh)
        h = MultiModNHistory(["t"])
        m.fit(ArrayLoader(train_ds, 16), Adam(0.01), "cross_entropy",
              epochs=3, history=h)
        return np.asarray(h.loss["train"]), m.state_dict()

    g0, p0 = run(None)
    for shape, names in (((8,), ("data",)), ((4, 2), ("data", "model"))):
        g, p = run(make_mesh(shape, names))
        np.testing.assert_allclose(g0, g, rtol=1e-5, atol=1e-6)
        for a, b in zip(jax.tree_util.tree_leaves(p0),
                        jax.tree_util.tree_leaves(p)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-6)


def test_presence_penalty_shard_map_matches_single_device():
    """The explicit shard_map engine computes the penalty GLOBALLY: the
    data-only missingness statistics psum over the data axis while the
    present-row delta numerator stays shard-local and is pre-divided by
    the engine's n_local/n_global loss scale, so the psum of scaled shard
    losses (and their gradients) equals the single-device penalty exactly
    (core.step._presence_penalty_term). The NaN layout below concentrates
    all missingness in a FEW shards' rows — the case where a shard-local
    missingness fraction would diverge hardest from the global one."""
    import jax

    from multimodn_tpu import MultiModNHistory
    from multimodn_tpu.parallel import make_mesh

    rng = np.random.default_rng(13)
    XA = rng.normal(size=(128, 4)).astype(np.float32)
    XB = rng.normal(size=(128, 4)).astype(np.float32)
    y = (0.8 * XA[:, 0] + 2.0 * XB[:, 0] > 0).astype(np.int64)[:, None]
    XB[:40] = np.nan     # contiguous: batch 0 shards 0-7 all-NaN..all-present
    train_ds = PartitionDataset(np.concatenate([XA, XB], 1), y, [4, 4])

    def run(mesh, engine):
        m = _model(presence_penalty=10.0, mesh=mesh, dp_engine=engine)
        h = MultiModNHistory(["t"])
        r = m.fit_best(ArrayLoader(train_ds, 32), Adam(0.01),
                       "cross_entropy", epochs=3, history=h,
                       val_loader=ArrayLoader(train_ds, 32))
        return np.asarray(h.loss["train"]), np.asarray(r["scores"]), \
            m.state_dict()

    g0, s0, p0 = run(None, "auto")
    mesh = make_mesh((8,), ("data",))
    for engine in ("auto", "shard_map"):
        g, s, p = run(mesh, engine)
        np.testing.assert_allclose(g0, g, rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(s0, s, rtol=1e-5, atol=1e-6)
        for a, b in zip(jax.tree_util.tree_leaves(p0),
                        jax.tree_util.tree_leaves(p)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-6)


def test_streamed_fit_best_with_nan_and_presence_penalty():
    """Streamed fused selection composes with the NaN machinery: NaN-laden
    data + presence_penalty streams bit-equal to the fused fit_best."""
    import jax

    from multimodn_tpu.data import StreamingLoader, fit_best_streaming
    from multimodn_tpu.data.dataset import Subset

    train_ds, _ = _mnar_problem(n=160, seed=12)
    tr, va = Subset(train_ds, list(range(120))), \
        Subset(train_ds, list(range(120, 160)))
    m1 = _model(presence_penalty=10.0)
    m2 = _model(presence_penalty=10.0)
    r1 = m1.fit_best(ArrayLoader(tr, 16), Adam(0.01), "cross_entropy",
                     epochs=3, val_loader=ArrayLoader(va, 16))
    r2 = fit_best_streaming(m2, StreamingLoader(tr, 16), Adam(0.01),
                            "cross_entropy", epochs=3,
                            val_loader=StreamingLoader(va, 16))
    assert r1["best_epoch"] == r2["best_epoch"]
    np.testing.assert_allclose(r1["scores"], r2["scores"], rtol=1e-6,
                               atol=1e-7)
    for a, b in zip(jax.tree_util.tree_leaves(m1.state_dict()),
                    jax.tree_util.tree_leaves(m2.state_dict())):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)

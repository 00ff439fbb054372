"""Sharding tier: DP/TP meshes on the 8-virtual-CPU-device farm (conftest),
including numerical equivalence of sharded vs single-device training."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from multimodn_tpu import Adam, MultiModN, MultiModNHistory
from multimodn_tpu.data import ArrayLoader, PartitionDataset
from multimodn_tpu.decoders import LogisticDecoder
from multimodn_tpu.encoders import MLPEncoder
from multimodn_tpu.parallel import batch_sharding, make_mesh, shard_params


def _dataset(n=64, f=6, seed=0):
    rng = np.random.default_rng(seed)
    X = rng.normal(size=(n, f)).astype(np.float32)
    y = (X @ rng.normal(size=f) > 0).astype(np.int64)[:, None]
    return PartitionDataset(X, y, [3, 3])


def test_make_mesh_shapes():
    assert len(jax.devices()) >= 8
    mesh = make_mesh()
    assert mesh.shape[mesh.axis_names[0]] == len(jax.devices())
    mesh2 = make_mesh((4, 2), ("data", "model"))
    assert dict(mesh2.shape) == {"data": 4, "model": 2}
    with pytest.raises(ValueError):
        make_mesh((16,))


def test_shard_params_specs():
    mesh = make_mesh((4, 2), ("data", "model"))
    m = MultiModN(4, [MLPEncoder(4, 6, (8,))], [LogisticDecoder(4)], 1.0, 0.0)
    sharded = shard_params(m.params, mesh)
    w = sharded["encoders"][0]["layers"][0]["w"]   # (6, 8): 8 % 2 == 0
    assert "model" in str(w.sharding.spec)
    b2 = sharded["decoders"][0]["layers"][0]["w"]  # (4, 2): shardable cols
    assert w.shape == (6, 8)


def test_dp_training_matches_single_device():
    """Batch sharding over 8 devices must not change the math."""
    ds = _dataset()
    mesh = make_mesh(axis_names=("data",))

    m_plain = MultiModN(3, [MLPEncoder(3, 3, (4,)), MLPEncoder(3, 3, (4,))],
                        [LogisticDecoder(3)], 0.7, 0.3)
    m_shard = MultiModN(3, [MLPEncoder(3, 3, (4,)), MLPEncoder(3, 3, (4,))],
                        [LogisticDecoder(3)], 0.7, 0.3, mesh=mesh)

    h1, h2 = MultiModNHistory(["t"]), MultiModNHistory(["t"])
    l1 = ArrayLoader(ds, 16)
    l2 = ArrayLoader(ds, 16)
    m_plain.fit(l1, Adam(0.01), "cross_entropy", epochs=3, history=h1)
    m_shard.fit(l2, Adam(0.01), "cross_entropy", epochs=3, history=h2)
    # Loader actually got the sharding attached.
    assert l2.sharding is not None
    data = l2.stacks()[0][0]
    assert len(data.sharding.device_set) == 8
    for e in range(3):
        np.testing.assert_allclose(h1.loss["train"][e], h2.loss["train"][e],
                                   rtol=1e-5, atol=1e-6)


def test_graft_dryrun_multichip():
    import __graft_entry__
    __graft_entry__.dryrun_multichip(8)


def _wide_model(mesh=None, seed=0):
    """Hidden width 8 divides the 2-way model axis, so TP actually shards."""
    return MultiModN(4, [MLPEncoder(4, 3, (8,)), MLPEncoder(4, 3, (8,))],
                     [LogisticDecoder(4)], 0.7, 0.3, mesh=mesh, seed=seed)


def test_tp_params_sharded_through_model_api():
    """MultiModN(mesh=DPxTP) applies shard_params to its live params."""
    mesh = make_mesh((4, 2), ("data", "model"))
    m = _wide_model(mesh)
    w = m.params["encoders"][0]["layers"][0]["w"]    # (3, 8): 8 % 2 == 0
    assert "model" in str(w.sharding.spec)
    init = m.params["init_state"]["value"]           # (1, 4): replicated
    assert len(init.sharding.device_set) == 8


def test_dp_tp_fit_matches_single_device():
    """Fused fit() on a DP4 x TP2 mesh == single-device, per-epoch grids and
    final parameters."""
    ds = _dataset(seed=3)
    mesh = make_mesh((4, 2), ("data", "model"))
    m1, m2 = _wide_model(), _wide_model(mesh)
    h1, h2 = MultiModNHistory(["t"]), MultiModNHistory(["t"])
    m1.fit(ArrayLoader(ds, 16), Adam(0.01), "cross_entropy", epochs=4,
           history=h1)
    m2.fit(ArrayLoader(ds, 16), Adam(0.01), "cross_entropy", epochs=4,
           history=h2)
    for e in range(4):
        np.testing.assert_allclose(h1.loss["train"][e], h2.loss["train"][e],
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(h1.accuracy["train"][e],
                                   h2.accuracy["train"][e],
                                   rtol=1e-5, atol=1e-6)
    p1 = m1.state_dict()
    p2 = m2.state_dict()
    for a, b in zip(jax.tree_util.tree_leaves(p1),
                    jax.tree_util.tree_leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_dp_tp_fit_best_matches_single_device():
    """Fused fit_best() (train + val + on-device AUROC/BAC selection) on the
    DP4 x TP2 mesh selects the same epoch with the same score."""
    ds = _dataset(n=96, seed=4)
    tr, va, _ = ds.random_split((0.7, 0.3, 0), seed=0)
    mesh = make_mesh((4, 2), ("data", "model"))
    m1, m2 = _wide_model(), _wide_model(mesh)
    r1 = m1.fit_best(ArrayLoader(tr, 16), Adam(0.01), "cross_entropy",
                     epochs=5, val_loader=ArrayLoader(va, 16))
    r2 = m2.fit_best(ArrayLoader(tr, 16), Adam(0.01), "cross_entropy",
                     epochs=5, val_loader=ArrayLoader(va, 16))
    assert r1["best_epoch"] == r2["best_epoch"]
    np.testing.assert_allclose(r1["best_score"], r2["best_score"],
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(r1["scores"], r2["scores"],
                               rtol=1e-5, atol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(r1["best_params"]),
                    jax.tree_util.tree_leaves(r2["best_params"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_kfold_on_mesh_matches_plain():
    """vmapped k-fold with mesh-constructed models == plain models."""
    from multimodn_tpu.experiments import kfold_fit_best

    ds = _dataset(n=96, seed=5)
    folds = []
    for k in range(2):
        tr, va, _ = ds.random_split((0.7, 0.3, 0), seed=k)
        folds.append((ArrayLoader(tr, 16), ArrayLoader(va, 16)))
    mesh = make_mesh((4, 2), ("data", "model"))

    res_plain = kfold_fit_best(lambda s: _wide_model(seed=s),
                               folds, Adam(0.01), "cross_entropy", epochs=3)
    res_mesh = kfold_fit_best(lambda s: _wide_model(mesh, seed=s),
                              folds, Adam(0.01), "cross_entropy", epochs=3)
    for rp, rm in zip(res_plain, res_mesh):
        assert rp["best_epoch"] == rm["best_epoch"]
        np.testing.assert_allclose(rp["best_score"], rm["best_score"],
                                   rtol=1e-5, atol=1e-6)


def test_dp_fit_reshuffle_matches_single_device():
    """The in-program per-epoch sample permutation (shuffle=True fused fit)
    crosses shard boundaries; it must not change the math under DP."""
    ds = _dataset(n=64, seed=6)
    mesh = make_mesh(axis_names=("data",))
    m1, m2 = _wide_model(), _wide_model(mesh)
    h1, h2 = MultiModNHistory(["t"]), MultiModNHistory(["t"])
    m1.fit(ArrayLoader(ds, 16, shuffle=True), Adam(0.01), "cross_entropy",
           epochs=3, history=h1)
    m2.fit(ArrayLoader(ds, 16, shuffle=True), Adam(0.01), "cross_entropy",
           epochs=3, history=h2)
    for e in range(3):
        np.testing.assert_allclose(h1.loss["train"][e], h2.loss["train"][e],
                                   rtol=1e-5, atol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(m1.state_dict()),
                    jax.tree_util.tree_leaves(m2.state_dict())):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_kfold_fold_axis_sharding_matches_plain():
    """SCALING.md fold-axis plan: kfold_fit_best(mesh=) shards the vmapped
    fold dimension over a 'fold' mesh axis — zero cross-fold collectives.
    2 real folds on a 4-device axis exercises the replicate-pad path too."""
    from multimodn_tpu.experiments import kfold_fit_best

    ds = _dataset(n=96, seed=7)
    folds = []
    for k in range(2):
        tr, va, _ = ds.random_split((0.7, 0.3, 0), seed=k)
        folds.append((ArrayLoader(tr, 16), ArrayLoader(va, 16)))
    mesh = make_mesh((4,), ("fold",), devices=jax.devices()[:4])

    res_plain = kfold_fit_best(lambda s: _wide_model(seed=s),
                               folds, Adam(0.01), "cross_entropy", epochs=3)
    res_fold = kfold_fit_best(lambda s: _wide_model(seed=s),
                              folds, Adam(0.01), "cross_entropy", epochs=3,
                              mesh=mesh)
    assert len(res_fold) == 2   # padded folds discarded
    for rp, rf in zip(res_plain, res_fold):
        assert rp["best_epoch"] == rf["best_epoch"]
        np.testing.assert_allclose(rp["best_score"], rf["best_score"],
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(rp["scores"], rf["scores"],
                                   rtol=1e-5, atol=1e-6)
        for a, b in zip(
                jax.tree_util.tree_leaves(rp["model"].state_dict()),
                jax.tree_util.tree_leaves(rf["model"].state_dict())):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-6)


def test_kfold_fold_axis_sharding_validation():
    import pytest
    from multimodn_tpu.experiments import kfold_fit_best

    ds = _dataset(n=64, seed=8)
    tr, va, _ = ds.random_split((0.7, 0.3, 0), seed=0)
    folds = [(ArrayLoader(tr, 16), ArrayLoader(va, 16))]
    bad = make_mesh((4,), ("data",), devices=jax.devices()[:4])
    with pytest.raises(ValueError, match="fold"):
        kfold_fit_best(lambda s: _wide_model(seed=s), folds, Adam(0.01),
                       "cross_entropy", epochs=2, mesh=bad)
    fold_mesh = make_mesh((4,), ("fold",), devices=jax.devices()[:4])
    model_mesh = make_mesh((4, 2), ("data", "model"))
    with pytest.raises(ValueError, match="mutually exclusive"):
        kfold_fit_best(lambda s: _wide_model(model_mesh, seed=s), folds,
                       Adam(0.01), "cross_entropy", epochs=2, mesh=fold_mesh)

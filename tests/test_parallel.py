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

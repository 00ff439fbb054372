"""TransformerEncoder: the beyond-reference large-encoder path the TP
sharding layer was designed for (no reference counterpart — SURVEY §2.4
notes attention is absent by construction)."""
import numpy as np
import pytest

import jax

from multimodn_tpu import Adam, MultiModN, MultiModNHistory
from multimodn_tpu.data import ArrayLoader, PartitionDataset
from multimodn_tpu.decoders import LogisticDecoder
from multimodn_tpu.encoders import MLPEncoder, TransformerEncoder
from multimodn_tpu.parallel import make_mesh


def _dataset(n=48, f=100, seed=0):
    rng = np.random.default_rng(seed)
    X = rng.normal(size=(n, f + 3)).astype(np.float32)
    y = (X @ rng.normal(size=f + 3) > 0).astype(np.int64)[:, None]
    return PartitionDataset(X, y, [f, 3])


def _model(mesh=None, dropout=0.0, seed=0):
    return MultiModN(
        4,
        [TransformerEncoder(4, 100, embed_dim=32, n_heads=2, n_layers=2,
                            chunk=16, dropout_rate=dropout),
         MLPEncoder(4, 3, (8,))],
        [LogisticDecoder(4)], 1.0, 0.0, mesh=mesh, seed=seed)


def test_forward_shapes_and_padding():
    """100 features, chunk 16 -> 7 tokens with 12 zero-padded tail features."""
    enc = TransformerEncoder(4, 100, embed_dim=32, n_heads=2, n_layers=2,
                             chunk=16)
    assert enc.n_tokens == 7 and enc.pad == 12
    params = enc.init(jax.random.PRNGKey(0))
    x = np.random.default_rng(0).normal(size=(6, 100)).astype(np.float32)
    state = np.zeros((6, 4), np.float32)
    out = enc.apply(params, state, x)
    assert out.shape == (6, 4)
    assert np.isfinite(np.asarray(out)).all()
    # Eval-mode determinism.
    out2 = enc.apply(params, state, x)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))


def test_token_sequence_input():
    """(B, T, F) inputs skip chunking: a real token sequence path."""
    enc = TransformerEncoder(4, 16, embed_dim=32, n_heads=4, n_layers=1,
                             chunk=16)
    params = enc.init(jax.random.PRNGKey(1))
    x = np.random.default_rng(1).normal(size=(5, 1, 16)).astype(np.float32)
    out = enc.apply(params, np.zeros((5, 4), np.float32), x)
    assert out.shape == (5, 4)


def test_trains_through_fused_fit():
    ds = _dataset()
    model = _model()
    h = MultiModNHistory(["t"])
    model.fit(ArrayLoader(ds, 16), Adam(1e-3), "cross_entropy", epochs=3,
              history=h)
    losses = np.asarray(h.loss["train"])[:, -1, 0]
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]          # it actually learns


def test_dropout_is_stochastic_in_train_deterministic_in_eval():
    ds = _dataset(seed=1)
    model = _model(dropout=0.3)
    loader = ArrayLoader(ds, 16)
    opt = Adam(1e-3)
    model.train_epoch(loader, opt, "cross_entropy")
    r1 = model.test(loader, "cross_entropy")
    r2 = model.test(loader, "cross_entropy")
    assert float(r1[0][1]) == float(r2[0][1])


def test_dp_tp_fit_matches_single_device():
    """embed_dim 32 / mlp 128 / qkv 96 all divide the 2-way model axis: TP
    sharding engages on the attention weights and must not change the math."""
    ds = _dataset(seed=2)
    mesh = make_mesh((4, 2), ("data", "model"))
    m1, m2 = _model(seed=3), _model(mesh, seed=3)
    qkv = m2.params["encoders"][0]["blocks"][0]["qkv"]["w"]
    assert "model" in str(qkv.sharding.spec)
    h1, h2 = MultiModNHistory(["t"]), MultiModNHistory(["t"])
    m1.fit(ArrayLoader(ds, 16), Adam(1e-3), "cross_entropy", epochs=3,
           history=h1)
    m2.fit(ArrayLoader(ds, 16), Adam(1e-3), "cross_entropy", epochs=3,
           history=h2)
    for e in range(3):
        np.testing.assert_allclose(h1.loss["train"][e], h2.loss["train"][e],
                                   rtol=1e-5, atol=1e-6)
    # TP splits the attention/MLP contractions across devices, so fp32
    # reduction order differs by a few ulps after 3 Adam epochs.
    for a, b in zip(jax.tree_util.tree_leaves(m1.state_dict()),
                    jax.tree_util.tree_leaves(m2.state_dict())):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-5)


def test_activation_argument_is_honored():
    """activation='relu' must actually change the MLP (regression: the
    argument was accepted and ignored)."""
    import jax.numpy as jnp

    a = TransformerEncoder(4, 32, embed_dim=16, n_heads=2, n_layers=1,
                           chunk=16, activation="gelu")
    b = TransformerEncoder(4, 32, embed_dim=16, n_heads=2, n_layers=1,
                           chunk=16, activation="relu")
    params = a.init(jax.random.PRNGKey(0))
    x = np.random.default_rng(0).normal(size=(4, 32)).astype(np.float32)
    state = np.zeros((4, 4), np.float32)
    out_gelu = np.asarray(a.apply(params, state, x))
    out_relu = np.asarray(b.apply(params, state, x))
    assert not np.allclose(out_gelu, out_relu)

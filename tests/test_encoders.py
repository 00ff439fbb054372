"""Unit parity: every encoder/decoder forward matches the torch topology with
transplanted weights (SURVEY §7 test pyramid, unit tier)."""
import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from multimodn_tpu.encoders import (
    LinearEncoder,
    LogisticEncoder,
    LSTMEncoder,
    MIMICMLPEncoder,
    MLPEncoder,
    MLPFeatureEncoder,
    RNNEncoder,
    SLPEncoder,
)
from multimodn_tpu.decoders import ClassDecoder, LogisticDecoder, MLPDecoder
from tests.torch_ref import (
    TorchClassDecoder,
    TorchLSTMEncoder,
    TorchMIMICMLPEncoder,
    TorchMLPDecoder,
    TorchMLPEncoder,
    TorchRNNEncoder,
    load_dense_stack,
    load_recurrent_stack,
)

B, S, F = 7, 4, 6
RTOL = 1e-5


def _data(seed=0):
    rng = np.random.default_rng(seed)
    state = rng.normal(size=(B, S)).astype(np.float32)
    x = rng.normal(size=(B, F)).astype(np.float32)
    return state, x


def test_mlp_encoder_matches_torch():
    enc = MLPEncoder(S, F, (5, 3))
    params = enc.init(jax.random.PRNGKey(0))
    tenc = TorchMLPEncoder(S, F, (5, 3))
    load_dense_stack(tenc.layers, params["layers"])
    state, x = _data()
    ours = enc.apply(params, jnp.asarray(state), jnp.asarray(x))
    theirs = tenc(torch.from_numpy(state), torch.from_numpy(x))
    np.testing.assert_allclose(np.asarray(ours), theirs.detach().numpy(),
                               rtol=RTOL, atol=1e-6)


def test_mimic_mlp_encoder_matches_torch():
    enc = MIMICMLPEncoder(S, F, (8, 8), dropout=0.0)
    params = enc.init(jax.random.PRNGKey(1))
    tenc = TorchMIMICMLPEncoder(S, F, (8, 8), dropout=0.0)
    load_dense_stack([l for l in tenc.layers], params["layers"])
    state, x = _data(1)
    ours = enc.apply(params, jnp.asarray(state), jnp.asarray(x))
    tenc.eval()
    theirs = tenc(torch.from_numpy(state), torch.from_numpy(x))
    np.testing.assert_allclose(np.asarray(ours), theirs.detach().numpy(),
                               rtol=RTOL, atol=1e-6)


@pytest.mark.parametrize("cls", [SLPEncoder, LinearEncoder, LogisticEncoder])
def test_slp_encoders_single_unactivated_layer(cls):
    """With no hidden layers the single layer takes [x, state] and applies NO
    activation (the reference's inert-activation quirk)."""
    enc = cls(S, F)
    params = enc.init(jax.random.PRNGKey(2))
    state, x = _data(2)
    ours = np.asarray(enc.apply(params, jnp.asarray(state), jnp.asarray(x)))
    w = np.asarray(params["layers"][0]["w"])
    b = np.asarray(params["layers"][0]["b"])
    expected = np.concatenate([x, state], axis=1) @ w + b
    np.testing.assert_allclose(ours, expected, rtol=RTOL, atol=1e-6)


def test_lstm_encoder_unbatched_quirk_matches_torch():
    enc = LSTMEncoder(S, F, (5,), unbatched_compat=True)
    params = enc.init(jax.random.PRNGKey(3))
    tenc = TorchLSTMEncoder(S, F, (5,))
    load_recurrent_stack(tenc.layers, params["layers"])
    state, x = _data(3)
    ours = enc.apply(params, jnp.asarray(state), jnp.asarray(x))
    theirs = tenc(torch.from_numpy(state), torch.from_numpy(x))
    np.testing.assert_allclose(np.asarray(ours), theirs.detach().numpy(),
                               rtol=1e-4, atol=1e-5)


def test_rnn_encoder_unbatched_quirk_matches_torch():
    enc = RNNEncoder(S, F, (5,), unbatched_compat=True)
    params = enc.init(jax.random.PRNGKey(4))
    tenc = TorchRNNEncoder(S, F, (5,))
    load_recurrent_stack(tenc.layers, params["layers"])
    state, x = _data(4)
    ours = enc.apply(params, jnp.asarray(state), jnp.asarray(x))
    theirs = tenc(torch.from_numpy(state), torch.from_numpy(x))
    np.testing.assert_allclose(np.asarray(ours), theirs.detach().numpy(),
                               rtol=1e-4, atol=1e-5)


def test_lstm_batched_mode_is_per_sample():
    """Batched (sane) mode: each sample independent — permuting the batch
    permutes the output."""
    enc = LSTMEncoder(S, F, (5,), unbatched_compat=False)
    params = enc.init(jax.random.PRNGKey(5))
    state, x = _data(5)
    out = np.asarray(enc.apply(params, jnp.asarray(state), jnp.asarray(x)))
    perm = np.array([3, 1, 0, 2, 6, 5, 4])
    out_p = np.asarray(enc.apply(params, jnp.asarray(state[perm]),
                                 jnp.asarray(x[perm])))
    np.testing.assert_allclose(out[perm], out_p, rtol=1e-5, atol=1e-6)


def test_feature_encoder_shape():
    enc = MLPFeatureEncoder(S, 5)
    params = enc.init(jax.random.PRNGKey(6))
    state, _ = _data(6)
    x = np.random.default_rng(6).normal(size=(B, 1)).astype(np.float32)
    out = enc.apply(params, jnp.asarray(state), jnp.asarray(x))
    assert out.shape == (B, S)


def test_class_decoder_matches_torch():
    dec = LogisticDecoder(S)
    params = dec.init(jax.random.PRNGKey(7))
    tdec = TorchClassDecoder(S, 2)
    load_dense_stack([tdec.fc], params["layers"])
    state, _ = _data(7)
    ours = dec.apply(params, jnp.asarray(state))
    theirs = tdec(torch.from_numpy(state))
    np.testing.assert_allclose(np.asarray(ours), theirs.detach().numpy(),
                               rtol=RTOL, atol=1e-6)
    assert dec.n_classes == 2


def test_mlp_decoder_matches_torch():
    dec = MLPDecoder(S, (8, 4), n_classes=3)
    params = dec.init(jax.random.PRNGKey(8))
    tdec = TorchMLPDecoder(S, (8, 4), n_classes=3)
    load_dense_stack(list(tdec.layers), params["layers"])
    state, _ = _data(8)
    ours = dec.apply(params, jnp.asarray(state))
    theirs = tdec(torch.from_numpy(state))
    np.testing.assert_allclose(np.asarray(ours), theirs.detach().numpy(),
                               rtol=RTOL, atol=1e-6)


def test_decoder_evaluates_state_stack():
    """Decoders must accept (E+1, B, S) stacks — the grid fusion contract."""
    dec = ClassDecoder(S, 2, "sigmoid")
    params = dec.init(jax.random.PRNGKey(9))
    stack = jnp.asarray(np.random.default_rng(9)
                        .normal(size=(5, B, S)).astype(np.float32))
    out = dec.apply(params, stack)
    assert out.shape == (5, B, 2)
    row = dec.apply(params, stack[2])
    np.testing.assert_allclose(np.asarray(out[2]), np.asarray(row),
                               rtol=RTOL, atol=1e-6)

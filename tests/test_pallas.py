"""Pallas fused-chain kernel: parity with the XLA fusion core (interpret mode
on CPU; the same kernel compiles on TPU where it was validated bit-exact)."""
import numpy as np
import pytest

import jax.numpy as jnp

from multimodn_tpu import MultiModN
from multimodn_tpu.core.fusion import default_order, forward_chain
from multimodn_tpu.decoders import LogisticDecoder, MLPDecoder
from multimodn_tpu.encoders import MIMICMLPEncoder, MLPEncoder, RNNEncoder
from multimodn_tpu.ops.fused_chain import make_fused_chain_forward


def _case(encoders, decoders, S, B=16, seed=0):
    model = MultiModN(S, encoders, decoders, 1.0, 0.0)
    rng = np.random.default_rng(seed)
    data = tuple(jnp.asarray(rng.normal(size=(B, e.n_features))
                             .astype(np.float32)) for e in encoders)
    valid = jnp.asarray((rng.random((B, len(encoders))) > 0.3)
                        .astype(np.float32))
    return model, data, valid


@pytest.mark.parametrize("enc_cls,kwargs", [
    (MIMICMLPEncoder, {"hidden_layers": (16, 16), "dropout": 0.0}),
    (MLPEncoder, {"hidden_layers": (16,)}),
])
def test_fused_chain_matches_xla(enc_cls, kwargs):
    S = 8
    widths = [12, 20]
    encoders = [enc_cls(S, w, **kwargs) for w in widths]
    decoders = [MLPDecoder(S, (16,), 2), LogisticDecoder(S)]
    model, data, valid = _case(encoders, decoders, S)

    fwd = make_fused_chain_forward(encoders, decoders, S, interpret=True)
    states_k, outs_k = fwd(model.params, data, valid,
                           model.params["init_state"]["value"][0])

    data_nan = tuple(jnp.where(valid[:, e:e + 1] > 0, data[e], jnp.nan)
                     for e in range(2))
    states_x, _, _, _, _ = forward_chain(
        encoders, model.init_state, model.params, data_nan,
        jnp.ones((16,), jnp.float32), order=default_order(2),
        nan_skip="sample")
    np.testing.assert_allclose(np.asarray(states_k), np.asarray(states_x),
                               atol=1e-5)
    for d, dec in enumerate(decoders):
        out_x = dec.apply(model.params["decoders"][d], states_x)
        np.testing.assert_allclose(np.asarray(outs_k[d]), np.asarray(out_x),
                                   atol=1e-5)


def test_fused_forward_model_api():
    S = 4
    encoders = [MLPEncoder(S, 6, (5,))]
    decoders = [LogisticDecoder(S)]
    model = MultiModN(S, encoders, decoders, 0.7, 0.3)
    x = np.random.default_rng(0).normal(size=(10, 6)).astype(np.float32)
    x[3, 0] = np.nan  # per-sample skip
    states, outs = model.fused_forward([x], use_interpret=True)
    assert states.shape == (2, 10, S)
    assert outs[0].shape == (2, 10, 2)
    # skipped sample's state stays at init
    np.testing.assert_allclose(states[1, 3], states[0, 3])
    assert np.isfinite(outs[0]).all()


def test_fused_chain_rejects_recurrent():
    with pytest.raises(TypeError):
        make_fused_chain_forward([RNNEncoder(4, 6, (5,))],
                                 [LogisticDecoder(4)], 4)


def test_fused_chain_vjp_gradients_match_xla():
    """The custom-VJP kernel path (Pallas forward + rematerialized XLA
    backward) produces the same loss and parameter gradients as
    differentiating the plain XLA chain."""
    import jax

    from multimodn_tpu import MultiModN
    from multimodn_tpu.decoders import MLPDecoder
    from multimodn_tpu.encoders import MIMICMLPEncoder
    from multimodn_tpu.ops.fused_chain import (
        make_fused_chain_vjp,
        make_xla_chain_forward,
    )

    S = 6
    widths = [5, 9]
    model = MultiModN(S, [MIMICMLPEncoder(S, w, (8,), dropout=0.0)
                          for w in widths],
                      [MLPDecoder(S, (8,), 2)], 1.0, 0.0)
    rng = np.random.default_rng(3)
    data = tuple(jnp.asarray(rng.normal(size=(12, w)).astype(np.float32))
                 for w in widths)
    valid = jnp.asarray((rng.random((12, 2)) > 0.3).astype(np.float32))
    init_row = model.init_state.apply(model.params["init_state"], 1, 0)[0]

    vjp_fwd = make_fused_chain_vjp(model.encoders, model.decoders, S,
                                   interpret=True)
    xla_fwd = make_xla_chain_forward(model.encoders, model.decoders, S)

    def loss(fwd):
        def f(params):
            states, outs = fwd(params, data, valid, init_row)
            return jnp.mean(states ** 2) + sum(jnp.mean(o) for o in outs)
        return f

    l1, g1 = jax.value_and_grad(loss(vjp_fwd))(model.params)
    l2, g2 = jax.value_and_grad(loss(xla_fwd))(model.params)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(g1),
                    jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)

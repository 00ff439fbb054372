"""Mixed precision (compute_dtype='bfloat16'): finite training close to fp32,
fp32 master params, fp32 metric reductions."""
import numpy as np

import jax.numpy as jnp

from multimodn_tpu import Adam, MultiModN, MultiModNHistory
from multimodn_tpu.data import ArrayLoader, PartitionDataset
from multimodn_tpu.decoders import LogisticDecoder
from multimodn_tpu.encoders import MLPEncoder


def _setup(compute_dtype):
    rng = np.random.default_rng(0)
    X = rng.normal(size=(64, 8)).astype(np.float32)
    y = (X @ rng.normal(size=8) > 0).astype(np.int64)[:, None]
    loader = ArrayLoader(PartitionDataset(X, y, [4, 4]), 16)
    model = MultiModN(4, [MLPEncoder(4, 4, (8,)), MLPEncoder(4, 4, (8,))],
                      [LogisticDecoder(4)], 1.0, 0.0,
                      compute_dtype=compute_dtype)
    return loader, model


def test_bf16_training_tracks_fp32():
    histories = {}
    for dtype in (None, "bfloat16"):
        loader, model = _setup(dtype)
        h = MultiModNHistory(["t"])
        model.fit(loader, Adam(0.01), "cross_entropy", epochs=5, history=h)
        histories[dtype] = h
        # Master params stay fp32 either way.
        assert model.params["encoders"][0]["layers"][0]["w"].dtype == \
            jnp.float32
        assert np.isfinite(h.loss["train"][-1]).all()
    # bf16 trajectory tracks fp32 loosely (bf16 has ~3 decimal digits).
    np.testing.assert_allclose(histories[None].loss["train"][-1],
                               histories["bfloat16"].loss["train"][-1],
                               rtol=0.05, atol=0.02)


def test_bf16_eval_and_suite():
    loader, model = _setup("bfloat16")
    model.fit(loader, Adam(0.01), "cross_entropy", epochs=3)
    res = model.test(loader, "cross_entropy")
    assert len(res[0]) == 15
    assert np.isfinite(res[0][1])


def test_static_bank_respects_compute_dtype():
    """Review finding: the StaticInitState bank lives outside params, so
    the mixed-precision cast never reached it and the whole chain silently
    promoted to fp32. The chain now casts the initial state to the data's
    compute dtype."""
    import jax.numpy as jnp
    from multimodn_tpu import MultiModN, StaticInitState
    from multimodn_tpu.core.fusion import forward_chain

    bank = [np.ones(3, np.float32), np.zeros(3, np.float32)]
    m = MultiModN(3, [MLPEncoder(3, 4, (5,))], [LogisticDecoder(3)],
                  0.7, 0.3, init_state=StaticInitState(bank),
                  compute_dtype=jnp.bfloat16)
    x = np.random.default_rng(0).normal(size=(4, 4)).astype(np.float32)
    loss_fn = m._loss_fn("cross_entropy", ((0, 0),), "sample")
    # Trace the states through the chain directly at bf16 inputs.
    states, *_ = forward_chain(
        m.encoders, m.init_state, m.params,
        (jnp.asarray(x, jnp.bfloat16),), jnp.ones((4,), jnp.float32),
        order=((0, 0),), nan_skip="sample")
    assert states.dtype == jnp.bfloat16

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

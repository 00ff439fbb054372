"""Loss-function unit tier: torch-semantics CE, BCE, MSE, masking, wrapping."""
import numpy as np
import pytest
import torch

import jax.numpy as jnp

from multimodn_tpu.core.losses import (
    CrossEntropyLoss,
    bce_loss,
    cross_entropy_loss,
    mse_loss,
    resolve_criterion,
)


def _case(seed=0, b=12, c=3):
    rng = np.random.default_rng(seed)
    out = rng.normal(size=(b, c)).astype(np.float32)
    tgt = rng.integers(0, c, size=(b,))
    return out, tgt


def test_cross_entropy_matches_torch():
    out, tgt = _case()
    ours = float(cross_entropy_loss(jnp.asarray(out), jnp.asarray(tgt)))
    theirs = float(torch.nn.CrossEntropyLoss()(torch.from_numpy(out),
                                               torch.from_numpy(tgt)))
    assert ours == pytest.approx(theirs, abs=1e-6)


def test_cross_entropy_mask_excludes_samples():
    out, tgt = _case(1)
    mask = np.ones(12, np.float32)
    mask[6:] = 0
    masked = float(cross_entropy_loss(jnp.asarray(out), jnp.asarray(tgt),
                                      jnp.asarray(mask)))
    head = float(cross_entropy_loss(jnp.asarray(out[:6]),
                                    jnp.asarray(tgt[:6])))
    assert masked == pytest.approx(head, abs=1e-6)


def test_bce_matches_torch():
    out, _ = _case(2, c=2)
    p = 1 / (1 + np.exp(-out))  # valid probabilities
    tgt = np.random.default_rng(2).integers(0, 2, size=(12,))
    ours = float(bce_loss(jnp.asarray(p), jnp.asarray(tgt)))
    theirs = float(torch.nn.BCELoss()(torch.from_numpy(p[:, 1]),
                                      torch.from_numpy(tgt.astype(np.float32))))
    assert ours == pytest.approx(theirs, abs=1e-5)


def test_mse_one_hot():
    out = np.array([[1.0, 0.0], [0.0, 1.0]], np.float32)
    tgt = np.array([0, 1])
    assert float(mse_loss(jnp.asarray(out), jnp.asarray(tgt))) == 0.0
    tgt2 = np.array([1, 0])
    assert float(mse_loss(jnp.asarray(out), jnp.asarray(tgt2))) == 1.0


def test_resolve_criterion_wraps_two_arg_callables():
    def naive(outputs, targets):
        return jnp.mean(outputs.sum(axis=-1) * 0 + 1.0)

    wrapped = resolve_criterion(naive)
    assert wrapped._accepts_mask is False
    out, tgt = _case(3)
    assert float(wrapped(jnp.asarray(out), jnp.asarray(tgt), None)) == 1.0
    # Mask-aware callables pass through.
    assert resolve_criterion(cross_entropy_loss) is cross_entropy_loss
    assert resolve_criterion(CrossEntropyLoss())._accepts_mask
    with pytest.raises(ValueError):
        resolve_criterion("not-a-loss")


def test_criterion_leading_dims():
    """Built-in losses reduce over the LAST axis only — the grid path feeds
    (E+1, B, C) stacks."""
    out, tgt = _case(4)
    stacked = jnp.stack([jnp.asarray(out)] * 5)
    tgts = jnp.broadcast_to(jnp.asarray(tgt), (5, 12))
    per_row = cross_entropy_loss(stacked, tgts)
    assert per_row.shape == (5,)
    np.testing.assert_allclose(np.asarray(per_row),
                               [float(cross_entropy_loss(jnp.asarray(out),
                                                         jnp.asarray(tgt)))] * 5,
                               rtol=1e-6)


def test_two_arg_scalar_criterion_applies_per_row():
    """A reference-style 2-arg criterion that reduces to a SCALAR (like
    torch.nn.CrossEntropyLoss on one batch) must produce per-row grid losses
    identical to the built-in mask-aware CE — not one global mean broadcast
    into every cell."""
    import jax
    import numpy as np

    from multimodn_tpu import MultiModN, MultiModNHistory
    from multimodn_tpu.data import ArrayLoader, PartitionDataset
    from multimodn_tpu.decoders import LogisticDecoder
    from multimodn_tpu.encoders import MLPEncoder

    def scalar_ce(outputs, targets):
        logz = jax.scipy.special.logsumexp(outputs, axis=-1)
        picked = jnp.take_along_axis(
            outputs, targets[..., None].astype(jnp.int32), axis=-1)[..., 0]
        return jnp.mean(logz - picked)   # scalar, torch-CE style

    rng = np.random.default_rng(0)
    X = rng.normal(size=(32, 6)).astype(np.float32)  # 32 % 16 == 0: no padding
    y = (X @ rng.normal(size=6) > 0).astype(np.int64)[:, None]
    ds = PartitionDataset(X, y, [3, 3])
    loader = ArrayLoader(ds, 16)

    model = MultiModN(2, [MLPEncoder(2, 3, (4,)), MLPEncoder(2, 3, (4,))],
                      [LogisticDecoder(2)], 0.7, 0.3)
    h_builtin = MultiModNHistory(["t"])
    model.test(loader, "cross_entropy", h_builtin, tag="val")
    h_user = MultiModNHistory(["t"])
    model.test(loader, scalar_ce, h_user, tag="val")
    ours = np.asarray(h_user.loss["val"][0])
    ref = np.asarray(h_builtin.loss["val"][0])
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)
    # Rows must actually differ from each other (a broadcast mean would not).
    assert np.ptp(ref) > 1e-6


def test_two_arg_criterion_with_defaulted_knob():
    """Review finding: a torch-style criterion with a defaulted extra
    parameter (reduction='mean') must be treated as 2-arg — previously the
    row mask was silently passed as the knob."""
    import jax
    import jax.numpy as jnp
    from multimodn_tpu.core.losses import resolve_criterion

    calls = {}

    def my_loss(outputs, targets, reduction="mean"):
        calls["reduction"] = reduction
        per = -jax.nn.log_softmax(outputs)[
            jnp.arange(targets.shape[0]), targets]
        return jnp.mean(per)

    crit = resolve_criterion(my_loss)
    assert crit._accepts_mask is False
    out = jnp.zeros((4, 2))
    tgt = jnp.zeros((4,), jnp.int32)
    float(crit(out, tgt, jnp.ones((4,))))   # mask consumed by wrapper
    assert calls["reduction"] == "mean"     # knob untouched


def test_three_arg_non_mask_criterion_rejected():
    """Review finding (round 5): a third REQUIRED parameter that is not
    mask-named (a loss knob like focal gamma) must be refused loudly —
    previously the 0/1 row mask was silently passed as the knob."""
    from multimodn_tpu.core.losses import resolve_criterion

    def focal_loss(outputs, targets, gamma):
        return outputs.sum() * 0.0 + gamma

    with pytest.raises(ValueError, match="mask"):
        resolve_criterion(focal_loss)

    # Mask-named third parameters keep working.
    def masked(outputs, targets, mask):
        return outputs.sum() * 0.0

    assert resolve_criterion(masked)._accepts_mask is True

    # Explicit opt-out overrides the name heuristic entirely.
    focal_loss._accepts_mask = False
    assert resolve_criterion(focal_loss) is focal_loss

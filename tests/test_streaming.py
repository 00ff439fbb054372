"""Streaming training path (host-resident data, per-batch jitted steps):
must match the device-resident ArrayLoader epoch programs exactly."""
import numpy as np

import jax

from multimodn_tpu import Adam, MultiModN, MultiModNHistory
from multimodn_tpu.data import (
    ArrayLoader,
    PartitionDataset,
    StreamingLoader,
    train_epoch_streaming,
)
from multimodn_tpu.decoders import LogisticDecoder
from multimodn_tpu.encoders import MLPEncoder


def _setup(n=50, seed=0, nan_frac=0.0):
    rng = np.random.default_rng(seed)
    X = rng.normal(size=(n, 6)).astype(np.float32)
    y = (X @ rng.normal(size=6) > 0).astype(np.int64)[:, None]
    if nan_frac:
        rows = rng.random(n) < nan_frac
        X[rows, :3] = np.nan
    return PartitionDataset(X, y, [3, 3])


def _model(nan_skip="sample"):
    return MultiModN(3, [MLPEncoder(3, 3, (4,)), MLPEncoder(3, 3, (4,))],
                     [LogisticDecoder(3)], 0.7, 0.3, nan_skip=nan_skip)


def test_streaming_epoch_matches_array_loader():
    """Per-batch streaming steps == the fused whole-epoch program: metric
    grids and final params, including a padded tail batch (n=50, B=16)."""
    ds = _setup()
    epochs = 3

    m1, h1 = _model(), MultiModNHistory(["t"])
    opt1 = Adam(0.01)
    for _ in range(epochs):
        m1.train_epoch(ArrayLoader(ds, 16), opt1, "cross_entropy", h1)

    m2, h2 = _model(), MultiModNHistory(["t"])
    opt2 = Adam(0.01)
    loader = StreamingLoader(ds, 16)
    for _ in range(epochs):
        train_epoch_streaming(m2, loader, opt2, "cross_entropy", h2)

    for e in range(epochs):
        for k in ("loss", "accuracy", "sensitivity", "specificity"):
            np.testing.assert_allclose(
                getattr(h1, k)["train"][e], getattr(h2, k)["train"][e],
                rtol=1e-5, atol=1e-6, err_msg=f"epoch {e} {k}")
    for a, b in zip(jax.tree_util.tree_leaves(m1.state_dict()),
                    jax.tree_util.tree_leaves(m2.state_dict())):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_streaming_nan_skip_modes():
    ds = _setup(seed=1, nan_frac=0.3)
    for mode in ("sample", "batch"):
        m1, m2 = _model(mode), _model(mode)
        opt1, opt2 = Adam(0.01), Adam(0.01)
        h1, h2 = MultiModNHistory(["t"]), MultiModNHistory(["t"])
        m1.train_epoch(ArrayLoader(ds, 8), opt1, "cross_entropy", h1)
        train_epoch_streaming(m2, StreamingLoader(ds, 8), opt2,
                              "cross_entropy", h2)
        np.testing.assert_allclose(h1.loss["train"][0], h2.loss["train"][0],
                                   rtol=1e-5, atol=1e-6, err_msg=mode)


def test_streaming_shuffle_reshuffles():
    ds = _setup(n=48, seed=2)
    loader = StreamingLoader(ds, 16, shuffle=True, seed=3)
    loader.reshuffle()
    o1 = loader._order.copy()
    loader.reshuffle()
    assert not np.array_equal(o1, loader._order)
    # Batch geometry stable.
    batches = list(loader.iter_batches())
    assert len(batches) == 3
    assert all(b[2].sum() == 16 for b in batches)

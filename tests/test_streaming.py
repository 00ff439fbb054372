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


def test_streaming_static_cycle_matches_train_epoch():
    """Regression (review finding): the streaming path must advance the
    StaticInitState shared cycle by SAMPLES, not batches — two streaming
    epochs equal two ArrayLoader train_epoch calls at bank=7, n=40, B=16."""
    from multimodn_tpu import Adam, MultiModN, MultiModNHistory, StaticInitState
    from multimodn_tpu.data import ArrayLoader, PartitionDataset
    from multimodn_tpu.data.streaming import StreamingLoader, train_epoch_streaming
    from multimodn_tpu.decoders import LogisticDecoder
    from multimodn_tpu.encoders import MLPEncoder

    rng = np.random.default_rng(3)
    bank = [rng.normal(size=3).astype(np.float32) for _ in range(7)]
    X = rng.normal(size=(40, 6)).astype(np.float32)
    y = (X @ rng.normal(size=6) > 0).astype(np.int64)[:, None]
    ds = PartitionDataset(X, y, [6])

    def build():
        return MultiModN(3, [MLPEncoder(3, 6, (5,))], [LogisticDecoder(3)],
                         0.7, 0.3, init_state=StaticInitState(bank))

    m_s, m_a = build(), build()
    opt_s, opt_a = Adam(0.01), Adam(0.01)
    h_a = MultiModNHistory(["t"])
    for _ in range(2):
        train_epoch_streaming(m_s, StreamingLoader(ds, 16), opt_s,
                              "cross_entropy")
        m_a.train_epoch(ArrayLoader(ds, 16), opt_a, "cross_entropy", h_a)
    assert m_s._cycle_offset == m_a._cycle_offset == (80 % 7)
    np.testing.assert_allclose(
        np.asarray(m_s.state_dict()["encoders"][0]["layers"][0]["w"]),
        np.asarray(m_a.state_dict()["encoders"][0]["layers"][0]["w"]),
        rtol=1e-5, atol=1e-6)

"""The fused multi-epoch fit() must reproduce looped train_epoch()/test()
exactly (dropout-free models; dropout draws differ by construction)."""
import numpy as np

from multimodn_tpu import Adam, MultiModN, MultiModNHistory
from multimodn_tpu.data import ArrayLoader, PartitionDataset
from multimodn_tpu.decoders import LogisticDecoder
from multimodn_tpu.encoders import MLPEncoder


def _setup(seed=0):
    rng = np.random.default_rng(seed)
    X = rng.normal(size=(60, 6)).astype(np.float32)
    y = (X @ rng.normal(size=6) > 0).astype(np.int64)[:, None]
    ds = PartitionDataset(X, y, [3, 3])
    tr, va, _ = ds.random_split((0.7, 0.3, 0), seed=0)
    return ArrayLoader(tr, 16), ArrayLoader(va, 16)


def _model():
    return MultiModN(2, [MLPEncoder(2, 3, (4,)), MLPEncoder(2, 3, (4,))],
                     [LogisticDecoder(2)], 0.7, 0.3)


def test_fit_matches_looped_epochs():
    tl, vl = _setup()
    epochs = 8

    m1 = _model()
    h1 = MultiModNHistory(["t"])
    opt1 = Adam(0.01)
    for _ in range(epochs):
        m1.train_epoch(tl, opt1, "cross_entropy", h1)
        m1.test(vl, "cross_entropy", h1, tag="val")

    m2 = _model()
    h2 = MultiModNHistory(["t"])
    m2.fit(tl, Adam(0.01), "cross_entropy", epochs=epochs, history=h2,
           val_loader=vl, val_tag="val")

    assert len(h2.loss["train"]) == epochs
    assert len(h2.loss["val"]) == epochs
    for e in range(epochs):
        np.testing.assert_allclose(h1.loss["train"][e], h2.loss["train"][e],
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(h1.loss["val"][e], h2.loss["val"][e],
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(h1.accuracy["val"][e], h2.accuracy["val"][e],
                                   rtol=1e-5, atol=1e-6)
    # Final params agree too.
    p1, p2 = m1.state_dict(), m2.state_dict()
    np.testing.assert_allclose(p1["init_state"]["value"],
                               p2["init_state"]["value"], rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(p1["encoders"][0]["layers"][0]["w"],
                               p2["encoders"][0]["layers"][0]["w"],
                               rtol=1e-5, atol=1e-6)


def test_fit_without_val():
    tl, _ = _setup(1)
    m = _model()
    h = MultiModNHistory(["t"])
    m.fit(tl, Adam(0.01), "cross_entropy", epochs=5, history=h)
    assert len(h.loss["train"]) == 5
    assert np.isfinite(h.loss["train"][-1]).all()

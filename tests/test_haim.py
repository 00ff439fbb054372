"""HAIM parallel-fusion baseline: training, the 15-tuple suite, and the
fused fit_best matching the host-loop selection rule exactly."""
import numpy as np

from multimodn_tpu import Adam
from multimodn_tpu.baselines.haim import HAIM, HAIMDecoder
from multimodn_tpu.data import ArrayLoader, PartitionDataset


def _loaders(seed=0):
    rng = np.random.default_rng(seed)
    X = rng.normal(size=(80, 10)).astype(np.float32)
    y = (X @ rng.normal(size=10) > 0).astype(np.int64)[:, None]
    tr = ArrayLoader(PartitionDataset(X[:60], y[:60]), 16)
    va = ArrayLoader(PartitionDataset(X[60:], y[60:]), 16)
    return tr, va


def test_haim_trains_and_tests():
    tr, va = _loaders()
    m = HAIM(HAIMDecoder(10, (8,)), seed=0)
    opt = Adam(0.01)
    for _ in range(5):
        m.train_epoch(tr, opt, "cross_entropy")
    res = m.test(va, "cross_entropy")
    assert len(res) == 15
    assert 0.5 <= res[1] <= 1.0  # learnable signal -> AUROC above chance
    out, t = m.predict(va)
    assert out.shape[0] == t.shape[0] == 20


def test_haim_last_epoch_returns_test():
    tr, _ = _loaders(1)
    m = HAIM(HAIMDecoder(10, (8,)), seed=0)
    res = m.train_epoch(tr, Adam(0.01), "cross_entropy", last_epoch=True)
    assert res is not None and len(res) == 15


def test_haim_fit_best_matches_host_loop():
    tr, va = _loaders(2)
    epochs = 8

    m1 = HAIM(HAIMDecoder(10, (8,)), seed=0)
    opt1 = Adam(0.01)
    best_score, best_params, best_epoch = 0.0, None, -1
    for e in range(epochs):
        m1.train_epoch(tr, opt1, "cross_entropy")
        val = m1.test(va, "cross_entropy")
        s = val[1] + (val[3] + val[4]) / 2
        if s > best_score:
            best_score, best_params, best_epoch = s, m1.state_dict(), e

    m2 = HAIM(HAIMDecoder(10, (8,)), seed=0)
    info = m2.fit_best(tr, Adam(0.01), "cross_entropy", epochs=epochs,
                       val_loader=va)
    assert info["best_epoch"] == best_epoch
    np.testing.assert_allclose(info["best_score"], best_score,
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(best_params["layers"][0]["w"],
                               info["best_params"]["layers"][0]["w"],
                               rtol=1e-5, atol=1e-6)


def test_haim_multi_modality_concat():
    """HAIM over a multi-partition loader concatenates modalities."""
    rng = np.random.default_rng(3)
    X = rng.normal(size=(32, 10)).astype(np.float32)
    y = rng.integers(0, 2, size=(32, 1))
    loader = ArrayLoader(PartitionDataset(X, y, [4, 6]), 8)
    m = HAIM(HAIMDecoder(10, (8,)), seed=0)
    m.train_epoch(loader, Adam(0.01), "cross_entropy")
    res = m.test(loader, "cross_entropy")
    assert np.isfinite(res[1])


def test_haim_fit_honors_loader_shuffle():
    """Review finding: shuffle=True loaders were silently trained on the
    fixed initial order. The fused fit now permutes per epoch in-program:
    shuffled != unshuffled trajectories, and same-seed runs reproduce."""
    rng = np.random.default_rng(5)
    X = rng.normal(size=(48, 6)).astype(np.float32)
    y = (X @ rng.normal(size=6) > 0).astype(np.int64)[:, None]
    ds = PartitionDataset(X, y, [6])

    def run(shuffle):
        m = HAIM(HAIMDecoder(6, (8,)))
        m.fit(ArrayLoader(ds, 16, shuffle=shuffle), Adam(0.05),
              "cross_entropy", epochs=4)
        return np.asarray(m.params["layers"][0]["w"])

    w_plain, w_shuf1, w_shuf2 = run(False), run(True), run(True)
    assert not np.allclose(w_plain, w_shuf1)          # shuffle changed math
    np.testing.assert_array_equal(w_shuf1, w_shuf2)   # but deterministically


def test_haim_fit_best_skip_last_val_quirk():
    """skip_last_val reproduces the reference MNAR script's HAIM loop: the
    last epoch's val is never evaluated (the call is indented into the
    non-last-epoch branch, mnar_missingness_pipeline.py:300-303), so
    selection runs over the first epochs-1 epochs only."""
    def run(skip):
        tr, va = _loaders(3)
        m = HAIM(HAIMDecoder(10, (8,)), seed=0)
        info = m.fit_best(tr, Adam(0.01), "cross_entropy", epochs=6,
                          val_loader=va, skip_last_val=skip)
        return m, info

    _, full = run(False)
    _, quirk = run(True)
    np.testing.assert_allclose(full["scores"], quirk["scores"])  # same math
    scores = full["scores"]
    # Strictly-greater selection == first argmax.
    assert full["best_epoch"] == int(np.argmax(scores))
    assert quirk["best_epoch"] == int(np.argmax(scores[:-1]))
    assert quirk["best_epoch"] <= 4

    # epochs=1: no epoch is eligible; initial params restored (the
    # reference NameErrors here — divergence documented in fit_best).
    tr, va = _loaders(3)
    m = HAIM(HAIMDecoder(10, (8,)), seed=0)
    w0 = np.asarray(m.params["layers"][0]["w"]).copy()
    info = m.fit_best(tr, Adam(0.01), "cross_entropy", epochs=1,
                      val_loader=va, skip_last_val=True)
    assert info["best_epoch"] == -1
    np.testing.assert_array_equal(np.asarray(m.params["layers"][0]["w"]), w0)

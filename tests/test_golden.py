"""Golden-trajectory snapshot: fixed-seed training must reproduce recorded
values exactly (CPU fp32). Catches any semantic drift in init, loss, masking,
optimizer wiring, or rng threading without needing the torch oracle.

Regenerate (only after an INTENTIONAL semantic change) with the script in
this file's docstring history: seed 42 data, model seed 7, 2x MLP(3->(4,)->2),
LogisticDecoder, err 0.7 / sc 0.3, batch 16, 4 fused epochs.
"""
import numpy as np

from multimodn_tpu import Adam, MultiModN, MultiModNHistory
from multimodn_tpu.data import ArrayLoader, PartitionDataset
from multimodn_tpu.decoders import LogisticDecoder
from multimodn_tpu.encoders import MLPEncoder

GOLDEN_LOSS = np.array([
    [0.70849895, 0.69472504, 0.69542164],
    [0.70569277, 0.69384962, 0.69259804],
    [0.70322961, 0.69304228, 0.68997425],
    [0.70110863, 0.69219232, 0.68733042],
])
GOLDEN_ACC_LAST = np.array([0.46938777, 0.46938777, 0.46938777])
GOLDEN_SC_LAST = np.array([0.64164835, 0.07361561])


def test_golden_trajectory():
    rng = np.random.default_rng(42)
    X = rng.normal(size=(48, 6)).astype(np.float32)
    y = (X @ rng.normal(size=6) > 0).astype(np.int64)[:, None]
    loader = ArrayLoader(PartitionDataset(X, y, [3, 3]), 16)
    m = MultiModN(2, [MLPEncoder(2, 3, (4,)), MLPEncoder(2, 3, (4,))],
                  [LogisticDecoder(2)], 0.7, 0.3, seed=7)
    h = MultiModNHistory(["t"])
    m.fit(loader, Adam(0.01), "cross_entropy", epochs=4, history=h)
    got_loss = np.stack([row.ravel() for row in h.loss["train"]])
    np.testing.assert_allclose(got_loss, GOLDEN_LOSS, atol=1e-6)
    np.testing.assert_allclose(h.accuracy["train"][-1].ravel(),
                               GOLDEN_ACC_LAST, atol=1e-6)
    np.testing.assert_allclose(h.state_change_loss[-1].ravel(),
                               GOLDEN_SC_LAST, atol=1e-6)

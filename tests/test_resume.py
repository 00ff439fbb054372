"""Mid-training resume: checkpoints with optimizer state restore the exact
trajectory (capability the reference lacks — it never saves optimizer state,
SURVEY §5 checkpoint/resume)."""
import numpy as np

import jax

from multimodn_tpu import Adam, MultiModN, MultiModNHistory
from multimodn_tpu.checkpoint import load_checkpoint, save_checkpoint
from multimodn_tpu.data import ArrayLoader, PartitionDataset
from multimodn_tpu.decoders import LogisticDecoder
from multimodn_tpu.encoders import MLPEncoder


def _make(seed=0):
    return MultiModN(2, [MLPEncoder(2, 6, (4,))], [LogisticDecoder(2)],
                     0.7, 0.3, seed=seed)


def test_resume_with_optimizer_state_matches_uninterrupted(tmp_path):
    rng = np.random.default_rng(0)
    X = rng.normal(size=(40, 6)).astype(np.float32)
    y = rng.integers(0, 2, size=(40, 1))
    loader = ArrayLoader(PartitionDataset(X, y), 10)

    # Uninterrupted: 6 epochs.
    m_full = _make()
    opt = Adam(0.01)
    h_full = MultiModNHistory(["t"])
    m_full.fit(loader, opt, "cross_entropy", epochs=6, history=h_full)

    # Interrupted: 3 epochs, checkpoint (with opt state), restore, 3 more.
    m_a = _make()
    opt_a = Adam(0.01)
    h_a = MultiModNHistory(["t"])
    m_a.fit(loader, opt_a, "cross_entropy", epochs=3, history=h_a)
    path = save_checkpoint(str(tmp_path / "resume.pkl"), m_a, epoch=3,
                           include_opt_state=True)

    m_b = _make(seed=99)  # different init — must be fully overwritten
    payload = load_checkpoint(path, m_b)
    opt_b = Adam(0.01)
    m_b._opt = opt_b
    m_b.opt_state = jax.tree_util.tree_map(
        np.asarray, payload["opt_state"])
    m_b._epoch_counter = 3  # rng stream continuity
    h_b = MultiModNHistory(["t"])
    m_b.fit(loader, opt_b, "cross_entropy", epochs=3, history=h_b)

    np.testing.assert_allclose(h_full.loss["train"][5], h_b.loss["train"][2],
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(m_full.params["encoders"][0]["layers"][0]["w"]),
        np.asarray(m_b.params["encoders"][0]["layers"][0]["w"]),
        rtol=1e-5, atol=1e-6)

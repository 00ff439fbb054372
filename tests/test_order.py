"""Encoder-ordering semantics: dataset-supplied encoding_sequence, shuffle
mode, and StaticInitState cycling (reference ``multimodn.py:509-531``,
``state.py:34-47``)."""
import numpy as np
import pytest

import jax.numpy as jnp

from multimodn_tpu import Adam, MultiModN, MultiModNHistory, StaticInitState
from multimodn_tpu.data import ArrayLoader, PartitionDataset
from multimodn_tpu.decoders import LogisticDecoder
from multimodn_tpu.encoders import MLPEncoder


class SeqDataset(PartitionDataset):
    """PartitionDataset that also yields a per-sample encoding sequence."""

    def __init__(self, X, y, partitions, seq):
        super().__init__(X, y, partitions)
        self.seq = np.asarray(seq)

    def __getitem__(self, idx):
        x, y = super().__getitem__(idx)
        return x, y, self.seq

    def arrays(self):
        xs, y, _ = super().arrays()
        return xs, y, np.tile(self.seq, (len(y), 1))


def _setup(seq=None, seed=0):
    rng = np.random.default_rng(seed)
    X = rng.normal(size=(24, 6)).astype(np.float32)
    y = rng.integers(0, 2, size=(24, 1))
    if seq is None:
        return PartitionDataset(X, y, [3, 3])
    return SeqDataset(X, y, [3, 3], seq)


def test_encoding_sequence_reference_semantics():
    """With sequence [1, 0]: step k applies encoder seq[k] to data[k]
    (reference get_encoder_iterable: enumerate(sequence))."""
    ds = _setup(seq=[1, 0])
    loader = ArrayLoader(ds, 24)
    model = MultiModN(2, [MLPEncoder(2, 3, (4,)), MLPEncoder(2, 3, (4,))],
                      [LogisticDecoder(2)], 0.7, 0.3)
    order = model._resolve_order(loader)
    assert order == ((0, 1), (1, 0))

    # Manual composition: state -> enc1(state, data0) -> enc0(state, data1).
    X0 = jnp.asarray(ds.X[0][:24])
    X1 = jnp.asarray(ds.X[1][:24])
    p = model.params
    s0 = model.init_state.apply(p["init_state"], 24, 0)
    s1 = model.encoders[1].apply(p["encoders"][1], s0, X0)
    s2 = model.encoders[0].apply(p["encoders"][0], s1, X1)

    states = model.get_states(loader)
    np.testing.assert_allclose(np.stack(states), np.asarray(s2), atol=1e-6)


def test_nonuniform_sequence_rejected_per_batch():
    """Uniformity is validated PER BATCH (after batching), exactly like the
    reference (multimodn.py:520-523): a batch mixing sequences raises, but
    batch_size=1 makes per-sample sequences legal."""

    class NonUniform(SeqDataset):
        def arrays(self):
            xs, y, seq = super().arrays()
            seq = seq.copy()
            seq[0] = [0, 1]
            seq[1] = [1, 0]
            return xs, y, seq

    bad = NonUniform(np.zeros((4, 6), np.float32), np.zeros((4, 1)), [3, 3],
                     [0, 1])
    loader = ArrayLoader(bad, 2)        # constructing is fine...
    with pytest.raises(ValueError, match="different values across the batch"):
        loader.batch_sequences()        # ...using a mixed batch is not
    # The reference's documented escape hatch: batch_size=1.
    loader1 = ArrayLoader(NonUniform(np.zeros((4, 6), np.float32),
                                     np.zeros((4, 1)), [3, 3], [0, 1]), 1)
    seqs = loader1.batch_sequences()
    assert seqs.shape == (4, 2)
    np.testing.assert_array_equal(seqs[0], [0, 1])
    np.testing.assert_array_equal(seqs[1], [1, 0])


def test_shuffle_mode_draws_new_orders_and_trains():
    """Host-side per-epoch shuffle (the unrolled-chain fallback; homogeneous
    chains shuffle in-program instead — see test_scan_chain)."""
    ds = _setup()
    loader = ArrayLoader(ds, 12)
    model = MultiModN(2, [MLPEncoder(2, 3, (4,)), MLPEncoder(2, 3, (4,))],
                      [LogisticDecoder(2)], 0.7, 0.3, shuffle_mode=True,
                      seed=0, chain_mode="unrolled")
    orders = {model._resolve_order(loader, train=True) for _ in range(16)}
    assert len(orders) == 2  # both permutations of 2 encoders appear
    # Eval never shuffles.
    assert model._resolve_order(loader, train=False) == ((0, 0), (1, 1))
    # Training with shuffle on runs fine.
    h = MultiModNHistory(["t"])
    for _ in range(3):
        model.train_epoch(loader, Adam(0.01), "cross_entropy", h)
    assert np.isfinite(h.loss["train"][-1]).all()


def test_static_init_state_cycles_per_sample():
    bank = [np.array([1.0, 2.0]), np.array([3.0, 4.0]),
            np.array([5.0, 6.0])]
    init = StaticInitState(bank)
    out = np.asarray(init.apply({}, 5, 0))
    np.testing.assert_allclose(out, [bank[0], bank[1], bank[2],
                                     bank[0], bank[1]])
    # Offset continues the cycle (deterministic reformulation of the
    # reference's itertools.cycle).
    out2 = np.asarray(init.apply({}, 2, 5))
    np.testing.assert_allclose(out2, [bank[2], bank[0]])


def test_static_init_state_in_model():
    ds = _setup()
    loader = ArrayLoader(ds, 8)
    init = StaticInitState([np.zeros(2, np.float32),
                            np.ones(2, np.float32)])
    model = MultiModN(2, [MLPEncoder(2, 3, (4,)), MLPEncoder(2, 3, (4,))],
                      [LogisticDecoder(2)], 0.7, 0.3, init_state=init)
    h = MultiModNHistory(["t"])
    model.train_epoch(loader, Adam(0.01), "cross_entropy", h)
    assert np.isfinite(h.loss["train"][-1]).all()

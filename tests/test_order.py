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


def _static_model(seed=0):
    rng = np.random.default_rng(9)
    bank = [rng.normal(size=3).astype(np.float32) for _ in range(3)]
    return MultiModN(3, [MLPEncoder(3, 6, (5,))], [LogisticDecoder(3)],
                     0.7, 0.3, seed=seed, init_state=StaticInitState(bank))


def _static_data(n=40):
    rng = np.random.default_rng(10)
    X = rng.normal(size=(n, 6)).astype(np.float32)
    y = (X @ rng.normal(size=6) > 0).astype(np.int64)[:, None]
    return PartitionDataset(X, y, [6])


def test_static_cycle_fused_fit_matches_looped_epochs():
    """Shared-cycle phase (reference state.py:41): fused fit must continue
    the StaticInitState phase across epochs exactly like looped train_epoch
    calls — n=40, bank=3 so the phase wraps differently every epoch."""
    ds = _static_data()
    m_loop, m_fused = _static_model(), _static_model()
    h_loop, h_fused = MultiModNHistory(["t"]), MultiModNHistory(["t"])
    opt = Adam(0.01)
    for _ in range(3):
        m_loop.train_epoch(ArrayLoader(ds, 16), opt, "cross_entropy",
                           h_loop)
    m_fused.fit(ArrayLoader(ds, 16), Adam(0.01), "cross_entropy", epochs=3,
                history=h_fused)
    for e in range(3):
        np.testing.assert_allclose(h_loop.loss["train"][e],
                                   h_fused.loss["train"][e],
                                   rtol=1e-5, atol=1e-6)
    for a, b in zip(np.asarray(m_loop.state_dict()["encoders"][0]["layers"][0]["w"]).ravel(),
                    np.asarray(m_fused.state_dict()["encoders"][0]["layers"][0]["w"]).ravel()):
        np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-7)


def test_static_cycle_continues_across_calls():
    """A second fit() call starts where the first left off (40 % 3 == 1, so
    the second call begins at phase 1, not 0); two fit(3)+fit(2) calls equal
    one fit(5)."""
    ds = _static_data()
    m_split, m_whole = _static_model(), _static_model()
    opt = Adam(0.01)
    m_split.fit(ArrayLoader(ds, 16), opt, "cross_entropy", epochs=3)
    m_split.fit(ArrayLoader(ds, 16), opt, "cross_entropy", epochs=2)
    m_whole.fit(ArrayLoader(ds, 16), Adam(0.01), "cross_entropy", epochs=5)
    np.testing.assert_allclose(
        np.asarray(m_split.state_dict()["encoders"][0]["layers"][0]["w"]),
        np.asarray(m_whole.state_dict()["encoders"][0]["layers"][0]["w"]),
        rtol=1e-5, atol=1e-6)


def test_static_cycle_fused_shuffle_padded_tail_rejected():
    """Position-indexed bank rows + in-program permutation + padded tail
    would serve shifted states (review finding) — rejected up front."""
    ds = _static_data(n=40)   # 40 % 16 != 0 -> padded tail
    m = _static_model()
    with pytest.raises(ValueError, match="StaticInitState"):
        m.fit(ArrayLoader(ds, 16, shuffle=True), Adam(0.01),
              "cross_entropy", epochs=2)
    # Divisible batch size stays allowed.
    m2 = _static_model()
    m2.fit(ArrayLoader(_static_data(n=32), 16, shuffle=True), Adam(0.01),
           "cross_entropy", epochs=2)

"""Parity against the ACTUAL reference implementation.

Unlike tests/test_parity.py (whose oracle is a torch re-implementation of the
reference's documented semantics), these tests import and execute the real
``/root/reference/multimodn/multimodn.py`` code — with torchmetrics /
torchsummary replaced by the minimal stubs in tests/ref_oracle.py — transplant
identical weights, feed identical batches, and assert the training/eval
trajectories, the 15-tuple performance suite, predict() grids, and
get_states() match. This closes the "self-referential oracle" gap: a shared
misreading of the reference cannot pass here, because the right-hand side IS
reference code.
"""
import numpy as np
import pytest
import torch

from multimodn_tpu import Adam, MultiModN, MultiModNHistory
from multimodn_tpu.data import ArrayLoader, PartitionDataset
from multimodn_tpu.decoders import LogisticDecoder, MLPDecoder
from multimodn_tpu.encoders import MIMICMLPEncoder, MLPEncoder
from tests.ref_oracle import (
    load_reference,
    ref_module,
    reference_batches,
    transplant_reference,
)

GRID_KEYS = ("loss", "accuracy", "sensitivity", "specificity",
             "balanced_accuracy")


@pytest.fixture(scope="module")
def ref():
    return load_reference()


@pytest.fixture(scope="module")
def ref_enc():
    return ref_module("multimodn.encoders.mlp_encoder")


@pytest.fixture(scope="module")
def ref_dec():
    return ref_module("multimodn.decoders.decoders")


def make_dataset(n=90, partitions=(3, 3), seed=0, nan_frac=0.0, n_targets=1,
                 nan_modality=0):
    rng = np.random.default_rng(seed)
    f = sum(partitions)
    X = rng.normal(size=(n, f)).astype(np.float32)
    w = rng.normal(size=(f, n_targets))
    y = (X @ w > 0).astype(np.int64)
    if nan_frac > 0:
        rows = rng.random(n) < nan_frac
        start = int(sum(partitions[:nan_modality]))
        X[rows, start:start + partitions[nan_modality]] = np.nan
    return PartitionDataset(X, y, list(partitions))


def run_pair(ref, encoders, decoders, ref_encoders, ref_decoders, dataset,
             epochs=4, batch_size=16, lr=0.01, err_p=0.7, sc_p=0.3,
             nan_skip="batch", encoder_sequence=None):
    """Train the JAX model and the real reference side by side on identical
    data/weights; return (model, ref_model, histories, batches, loader)."""
    state_size = encoders[0].state_size
    loader = ArrayLoader(dataset, batch_size=batch_size)
    model = MultiModN(state_size, encoders, decoders, err_p, sc_p,
                      nan_skip=nan_skip)
    ref_model = ref.MultiModN(state_size, ref_encoders, ref_decoders,
                              err_p, sc_p, device=torch.device("cpu"))
    transplant_reference(ref_model, model.state_dict())

    opt = Adam(lr)
    ref_opt = torch.optim.Adam(ref_model.parameters(), lr)
    criterion = torch.nn.CrossEntropyLoss()
    batches = reference_batches(loader, encoder_sequence)

    hist = MultiModNHistory([f"t{i}" for i in range(len(decoders))])
    ref_hist = ref.MultiModNHistory([f"t{i}" for i in range(len(decoders))])
    for _ in range(epochs):
        model.train_epoch(loader, opt, "cross_entropy", hist)
        ref_model.train_epoch(batches, ref_opt, criterion, ref_hist)
    return model, ref_model, (hist, ref_hist), batches, loader


def assert_history_matches(hist, ref_hist, tag="train", rtol=2e-4, atol=2e-5):
    for key in GRID_KEYS:
        ours = np.asarray(getattr(hist, key)[tag])
        theirs = np.asarray(getattr(ref_hist, key)[tag])
        assert ours.shape == theirs.shape, \
            f"{key}: shape {ours.shape} vs reference {theirs.shape}"
        np.testing.assert_allclose(ours, theirs, rtol=rtol, atol=atol,
                                   err_msg=f"trajectory mismatch: {key}")
    if tag == "train":
        np.testing.assert_allclose(
            np.asarray(hist.state_change_loss),
            np.asarray(ref_hist.state_change_loss),
            rtol=rtol, atol=atol, err_msg="trajectory mismatch: state_change")


# ---------------------------------------------------------------------------
# Training-trajectory parity (reference multimodn.py:89-252)
# ---------------------------------------------------------------------------

def test_titanic_mlp_config_matches_reference(ref, ref_enc, ref_dec):
    """The canonical quick-start config (titanic_mlp_pipeline.py:69-76):
    state_size 1, one MLPEncoder(6, (5,5)), one LogisticDecoder."""
    ds = make_dataset(n=96, partitions=(6,))
    _, _, (hist, ref_hist), _, _ = run_pair(
        ref,
        [MLPEncoder(1, 6, (5, 5))], [LogisticDecoder(1)],
        [ref_enc.MLPEncoder(1, 6, (5, 5))], [ref_dec.LogisticDecoder(1)],
        ds, epochs=4, batch_size=32, lr=0.01)
    assert_history_matches(hist, ref_hist)


def test_partitioned_config_matches_reference(ref, ref_enc, ref_dec):
    """Multi-encoder fusion (titanic_partitioned_pipeline.py: partitions
    [3,2], state_size 5, two MLPEncoders)."""
    ds = make_dataset(n=80, partitions=(3, 2), seed=1)
    _, _, (hist, ref_hist), _, _ = run_pair(
        ref,
        [MLPEncoder(5, 3, (5, 5)), MLPEncoder(5, 2, (5, 5))],
        [LogisticDecoder(5)],
        [ref_enc.MLPEncoder(5, 3, (5, 5)), ref_enc.MLPEncoder(5, 2, (5, 5))],
        [ref_dec.LogisticDecoder(5)],
        ds, epochs=4, batch_size=16)
    assert_history_matches(hist, ref_hist)


def test_mimic_config_matches_reference(ref, ref_enc, ref_dec):
    """MIMIC-shaped config (mimic_single_task_pipeline.py:123-124):
    MIMIC_MLPEncoders + MLPDecoder, err 1.0 / sc 0.0 (dropout 0 for
    rng-free determinism)."""
    ds = make_dataset(n=64, partitions=(8, 4), seed=2)
    _, _, (hist, ref_hist), _, _ = run_pair(
        ref,
        [MIMICMLPEncoder(5, 8, (8, 8), dropout=0.0),
         MIMICMLPEncoder(5, 4, (8, 8), dropout=0.0)],
        [MLPDecoder(5, (8, 8), 2)],
        [ref_enc.MIMIC_MLPEncoder(5, 8, (8, 8), dropout=0.0),
         ref_enc.MIMIC_MLPEncoder(5, 4, (8, 8), dropout=0.0)],
        [ref_dec.MLPDecoder(5, (8, 8), 2)],
        ds, epochs=4, batch_size=16, lr=0.001, err_p=1.0, sc_p=0.0)
    assert_history_matches(hist, ref_hist)


def test_multi_decoder_matches_reference(ref, ref_enc, ref_dec):
    ds = make_dataset(n=80, partitions=(3, 3), seed=3, n_targets=2)
    _, _, (hist, ref_hist), _, _ = run_pair(
        ref,
        [MLPEncoder(4, 3, (5,)), MLPEncoder(4, 3, (5,))],
        [LogisticDecoder(4), MLPDecoder(4, (6,), 2)],
        [ref_enc.MLPEncoder(4, 3, (5,)), ref_enc.MLPEncoder(4, 3, (5,))],
        [ref_dec.LogisticDecoder(4), ref_dec.MLPDecoder(4, (6,), 2)],
        ds, epochs=3)
    assert_history_matches(hist, ref_hist)


def test_batch_nan_skip_matches_reference(ref, ref_enc, ref_dec):
    """NaN batches skip the encoder wholesale (multimodn.py:167-169) —
    including the reference's ones-initialized per-row sample counters
    (quirk #3) interacting with skipped rows."""
    ds = make_dataset(n=60, partitions=(3, 3), seed=4, nan_frac=0.35)
    _, _, (hist, ref_hist), _, _ = run_pair(
        ref,
        [MLPEncoder(3, 3, (4,)), MLPEncoder(3, 3, (4,))],
        [LogisticDecoder(3)],
        [ref_enc.MLPEncoder(3, 3, (4,)), ref_enc.MLPEncoder(3, 3, (4,))],
        [ref_dec.LogisticDecoder(3)],
        ds, epochs=3, batch_size=8, nan_skip="batch")
    assert_history_matches(hist, ref_hist)


class _SeqPartitionDataset(PartitionDataset):
    """PartitionDataset carrying a fixed per-sample encoding sequence."""

    def __init__(self, X, y, partitions, seq):
        super().__init__(X, y, partitions)
        self._enc_seq = np.asarray(seq, np.int64)

    def __getitem__(self, i):
        xs, y = super().__getitem__(i)[:2]
        return xs, y, self._enc_seq

    def arrays(self):
        xs, y = super().arrays()[:2]
        return xs, y, np.tile(self._enc_seq[None, :], (len(self), 1))


def test_encoder_sequence_matches_reference(ref, ref_enc, ref_dec):
    """A batch-uniform dataset-supplied encoding sequence drives the same
    (data_idx, enc_idx) iteration as the reference's get_encoder_iterable
    (multimodn.py:509-531). Asymmetric encoder widths (3 vs 2 features)
    ensure an order mix-up cannot silently pass."""
    seq = np.asarray([1, 0], np.int64)  # visit encoder 1 first
    rng = np.random.default_rng(6)
    X = rng.normal(size=(48, 5)).astype(np.float32)
    y = (X @ rng.normal(size=(5, 1)) > 0).astype(np.int64)
    ds = _SeqPartitionDataset(X, y, [3, 2], seq)
    loader = ArrayLoader(ds, batch_size=16)
    assert loader.encoding_sequence is not None

    # data slot 0 (3 features) feeds encoder 1; slot 1 (2 features) feeds
    # encoder 0 — so encoder 1 takes 3 inputs and encoder 0 takes 2.
    model = MultiModN(3, [MLPEncoder(3, 2, (4,)), MLPEncoder(3, 3, (4,))],
                      [LogisticDecoder(3)], 0.7, 0.3, nan_skip="batch")
    ref_model = ref.MultiModN(
        3, [ref_enc.MLPEncoder(3, 2, (4,)), ref_enc.MLPEncoder(3, 3, (4,))],
        [ref_dec.LogisticDecoder(3)], 0.7, 0.3, device=torch.device("cpu"))
    transplant_reference(ref_model, model.state_dict())
    opt = Adam(0.01)
    ref_opt = torch.optim.Adam(ref_model.parameters(), 0.01)
    batches = reference_batches(loader, encoder_sequence=seq)
    hist, ref_hist = MultiModNHistory(["t0"]), ref.MultiModNHistory(["t0"])
    for _ in range(3):
        model.train_epoch(loader, opt, "cross_entropy", hist)
        ref_model.train_epoch(batches, ref_opt,
                              torch.nn.CrossEntropyLoss(), ref_hist)
    assert_history_matches(hist, ref_hist)


# ---------------------------------------------------------------------------
# test() parity: history grids + the 15-tuple suite (multimodn.py:255-419)
# ---------------------------------------------------------------------------

def test_eval_and_metric_suite_match_reference(ref, ref_enc, ref_dec):
    ds = make_dataset(n=70, partitions=(6,), seed=7)
    loader = ArrayLoader(ds, batch_size=32)
    model = MultiModN(2, [MLPEncoder(2, 6, (5,))], [LogisticDecoder(2)],
                      0.7, 0.3, nan_skip="batch")
    ref_model = ref.MultiModN(
        2, [ref_enc.MLPEncoder(2, 6, (5,))], [ref_dec.LogisticDecoder(2)],
        0.7, 0.3, device=torch.device("cpu"))
    transplant_reference(ref_model, model.state_dict())

    hist, ref_hist = MultiModNHistory(["t0"]), ref.MultiModNHistory(["t0"])
    ours = model.test(loader, "cross_entropy", hist, tag="val")
    theirs = ref_model.test(reference_batches(loader),
                            torch.nn.CrossEntropyLoss(), ref_hist, tag="val")
    assert_history_matches(hist, ref_hist, tag="val")

    assert len(ours) == len(theirs) == 1
    ours15, theirs15 = ours[0], theirs[0]
    assert len(ours15) == len(theirs15) == 15
    # Scalars: f1, auc, accuracy, sensitivity, specificity (+ counts 9-12).
    for i in (0, 1, 2, 3, 4, 9, 10, 11, 12):
        np.testing.assert_allclose(
            float(np.asarray(ours15[i])), float(np.asarray(theirs15[i])),
            rtol=1e-5, atol=1e-6, err_msg=f"metric tuple index {i}")
    # Curves: fpr/tpr/precision/recall/thresholds.
    for i in (5, 6, 7, 8, 13, 14):
        np.testing.assert_allclose(
            np.asarray(ours15[i], np.float64),
            np.asarray(theirs15[i], np.float64),
            rtol=1e-5, atol=1e-6, err_msg=f"metric curve index {i}")


def test_last_epoch_flag_matches_reference(ref, ref_enc, ref_dec):
    """train_epoch(last_epoch=True) returns test() on the train loader
    (quirk #16, multimodn.py:251-252)."""
    ds = make_dataset(n=48, partitions=(6,), seed=8)
    loader = ArrayLoader(ds, batch_size=16)
    model = MultiModN(2, [MLPEncoder(2, 6, (5,))], [LogisticDecoder(2)],
                      0.7, 0.3, nan_skip="batch")
    ref_model = ref.MultiModN(
        2, [ref_enc.MLPEncoder(2, 6, (5,))], [ref_dec.LogisticDecoder(2)],
        0.7, 0.3, device=torch.device("cpu"))
    transplant_reference(ref_model, model.state_dict())
    opt, ref_opt = Adam(0.01), torch.optim.Adam(ref_model.parameters(), 0.01)
    res = model.train_epoch(loader, opt, "cross_entropy", None,
                            last_epoch=True)
    ref_res = ref_model.train_epoch(reference_batches(loader), ref_opt,
                                    torch.nn.CrossEntropyLoss(), None,
                                    last_epoch=True)
    assert res is not None and ref_res is not None
    for i in (0, 1, 2, 3, 4):
        np.testing.assert_allclose(
            float(np.asarray(res[0][i])), float(np.asarray(ref_res[0][i])),
            rtol=2e-4, atol=2e-5, err_msg=f"last_epoch tuple index {i}")


# ---------------------------------------------------------------------------
# predict() / get_states() parity (multimodn.py:422-492)
# ---------------------------------------------------------------------------

def test_predict_matches_reference(ref, ref_enc, ref_dec):
    ds = make_dataset(n=40, partitions=(3, 3), seed=9)
    model = MultiModN(3, [MLPEncoder(3, 3, (4,)), MLPEncoder(3, 3, (4,))],
                      [LogisticDecoder(3)], 0.7, 0.3)
    ref_model = ref.MultiModN(
        3, [ref_enc.MLPEncoder(3, 3, (4,)), ref_enc.MLPEncoder(3, 3, (4,))],
        [ref_dec.LogisticDecoder(3)], 0.7, 0.3, device=torch.device("cpu"))
    transplant_reference(ref_model, model.state_dict())
    xs, _, _ = ds.arrays()
    ours = model.predict([x[:10] for x in xs])
    theirs = ref_model.predict([torch.from_numpy(x[:10]) for x in xs])
    np.testing.assert_array_equal(ours, theirs)


def test_get_states_matches_reference(ref, ref_enc, ref_dec):
    ds = make_dataset(n=40, partitions=(3, 3), seed=10, nan_frac=0.3)
    loader = ArrayLoader(ds, batch_size=8)
    model = MultiModN(3, [MLPEncoder(3, 3, (4,)), MLPEncoder(3, 3, (4,))],
                      [LogisticDecoder(3)], 0.7, 0.3, nan_skip="batch")
    ref_model = ref.MultiModN(
        3, [ref_enc.MLPEncoder(3, 3, (4,)), ref_enc.MLPEncoder(3, 3, (4,))],
        [ref_dec.LogisticDecoder(3)], 0.7, 0.3, device=torch.device("cpu"))
    transplant_reference(ref_model, model.state_dict())
    ours = np.stack(model.get_states(loader))
    theirs = np.stack([s.numpy() for s in
                       ref_model.get_states(reference_batches(loader))])
    np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-6)


# ---------------------------------------------------------------------------
# The test()-collection corner (VERDICT missing #4): a batch that NaN-skips
# the LAST encoder is dropped from the reference's output collection while
# its targets are kept, so get_performance_metrics receives misaligned
# arrays and crashes (multimodn.py:354-357 keyed on enc_idx == E-1 inside
# the skip-guarded loop). Reachable-behavior decision, documented in
# model.py: the rebuild always emits metric-row E outputs for every sample
# (aligned, non-crashing); this test pins BOTH facts.
# ---------------------------------------------------------------------------

def test_nan_skipped_last_encoder_corner(ref, ref_enc, ref_dec):
    ds = make_dataset(n=32, partitions=(3, 3), seed=11, nan_frac=0.4,
                      nan_modality=1)  # NaNs in the LAST encoder's modality
    loader = ArrayLoader(ds, batch_size=4)
    model = MultiModN(3, [MLPEncoder(3, 3, (4,)), MLPEncoder(3, 3, (4,))],
                      [LogisticDecoder(3)], 0.7, 0.3, nan_skip="batch")
    ref_model = ref.MultiModN(
        3, [ref_enc.MLPEncoder(3, 3, (4,)), ref_enc.MLPEncoder(3, 3, (4,))],
        [ref_dec.LogisticDecoder(3)], 0.7, 0.3, device=torch.device("cpu"))
    transplant_reference(ref_model, model.state_dict())

    # The reference crashes: misaligned outputs vs targets.
    with pytest.raises(Exception):
        ref_model.test(reference_batches(loader),
                       torch.nn.CrossEntropyLoss(), None)

    # The rebuild returns aligned, finite metrics for every sample.
    results = model.test(loader, "cross_entropy", None)
    assert len(results) == 1 and len(results[0]) == 15
    assert np.isfinite(float(np.asarray(results[0][1])))  # auroc


# ---------------------------------------------------------------------------
# Per-sample / per-batch encoding sequences (reference multimodn.py:509-523:
# sequences may differ across batches; within a batch they must be uniform —
# "set batch size to 1 to avoid this error")
# ---------------------------------------------------------------------------

class _PerSampleSeqDataset(PartitionDataset):
    """Each sample carries its own encoder order (alternating [0,1]/[1,0])."""

    def __init__(self, X, y, partitions):
        super().__init__(X, y, partitions)
        n = len(self)
        self._seqs = np.stack([np.asarray([0, 1]) if i % 2 == 0
                               else np.asarray([1, 0])
                               for i in range(n)]).astype(np.int64)

    def __getitem__(self, i):
        xs, y = super().__getitem__(i)[:2]
        return xs, y, self._seqs[i]

    def arrays(self):
        xs, y = super().arrays()[:2]
        return xs, y, self._seqs


def _per_sample_ref_batches(loader):
    """Reference-style batches including each batch's sequence rows."""
    seqs = loader.batch_sequences()
    out = []
    for b, (data, targets, mask) in enumerate(loader.numpy_batches()):
        keep = mask > 0
        seq = np.tile(seqs[b][None, :], (int(keep.sum()), 1)).astype(np.int64)
        out.append(([torch.from_numpy(np.ascontiguousarray(d[keep]))
                     for d in data],
                    torch.from_numpy(np.ascontiguousarray(targets[keep])),
                    torch.from_numpy(seq)))
    return out


def test_per_sample_sequences_batch1_match_reference(ref, ref_enc, ref_dec):
    """batch_size=1 with per-SAMPLE sequences — the reference's documented
    escape hatch — must reproduce its trajectory exactly (exercises the
    traced-order chain driven by a per-batch sequence array)."""
    rng = np.random.default_rng(12)
    X = rng.normal(size=(24, 6)).astype(np.float32)
    y = (X @ rng.normal(size=(6, 1)) > 0).astype(np.int64)
    ds = _PerSampleSeqDataset(X, y, [3, 3])
    loader = ArrayLoader(ds, batch_size=1)
    assert loader.encoding_sequence is None          # not globally uniform
    assert loader.batch_sequences().shape == (24, 2)

    model = MultiModN(3, [MLPEncoder(3, 3, (4,)), MLPEncoder(3, 3, (4,))],
                      [LogisticDecoder(3)], 0.7, 0.3, nan_skip="batch")
    ref_model = ref.MultiModN(
        3, [ref_enc.MLPEncoder(3, 3, (4,)), ref_enc.MLPEncoder(3, 3, (4,))],
        [ref_dec.LogisticDecoder(3)], 0.7, 0.3, device=torch.device("cpu"))
    transplant_reference(ref_model, model.state_dict())
    opt = Adam(0.01)
    ref_opt = torch.optim.Adam(ref_model.parameters(), 0.01)
    batches = _per_sample_ref_batches(loader)
    hist, ref_hist = MultiModNHistory(["t0"]), ref.MultiModNHistory(["t0"])
    for _ in range(2):
        model.train_epoch(loader, opt, "cross_entropy", hist)
        ref_model.train_epoch(batches, ref_opt,
                              torch.nn.CrossEntropyLoss(), ref_hist)
    assert_history_matches(hist, ref_hist)
    # Eval path threads the same per-batch sequences.
    h2, rh2 = MultiModNHistory(["t0"]), ref.MultiModNHistory(["t0"])
    model.test(loader, "cross_entropy", h2, tag="val")
    ref_model.test(batches, torch.nn.CrossEntropyLoss(), rh2, tag="val")
    assert_history_matches(h2, rh2, tag="val")


def test_mixed_sequence_batch_raises_like_reference(ref, ref_enc, ref_dec):
    """A batch mixing different sequences raises the reference's error."""
    rng = np.random.default_rng(13)
    X = rng.normal(size=(8, 6)).astype(np.float32)
    y = (X[:, :1] > 0).astype(np.int64)
    ds = _PerSampleSeqDataset(X, y, [3, 3])
    loader = ArrayLoader(ds, batch_size=4)   # alternating seqs -> mixed batch
    with pytest.raises(ValueError, match="different values across the batch"):
        loader.batch_sequences()


def test_per_sample_sequences_heterogeneous_switch_chain(ref, ref_enc,
                                                         ref_dec):
    """Per-batch sequences with MIXED encoder classes (equal widths) take the
    lax.switch chain; trajectory must still match the reference."""
    rng = np.random.default_rng(14)
    X = rng.normal(size=(16, 6)).astype(np.float32)
    y = (X @ rng.normal(size=(6, 1)) > 0).astype(np.int64)
    ds = _PerSampleSeqDataset(X, y, [3, 3])
    loader = ArrayLoader(ds, batch_size=1)

    model = MultiModN(3, [MLPEncoder(3, 3, (4,)),
                          MIMICMLPEncoder(3, 3, (4,), dropout=0.0)],
                      [LogisticDecoder(3)], 0.7, 0.3, nan_skip="batch")
    ref_model = ref.MultiModN(
        3, [ref_enc.MLPEncoder(3, 3, (4,)),
            ref_enc.MIMIC_MLPEncoder(3, 3, (4,), dropout=0.0)],
        [ref_dec.LogisticDecoder(3)], 0.7, 0.3, device=torch.device("cpu"))
    transplant_reference(ref_model, model.state_dict())
    opt = Adam(0.01)
    ref_opt = torch.optim.Adam(ref_model.parameters(), 0.01)
    batches = _per_sample_ref_batches(loader)
    hist, ref_hist = MultiModNHistory(["t0"]), ref.MultiModNHistory(["t0"])
    for _ in range(2):
        model.train_epoch(loader, opt, "cross_entropy", hist)
        ref_model.train_epoch(batches, ref_opt,
                              torch.nn.CrossEntropyLoss(), ref_hist)
    assert_history_matches(hist, ref_hist)


# ---------------------------------------------------------------------------
# Recurrent encoders (quirk #8: 2-D inputs -> torch unbatched recurrence
# ACROSS batch elements; unbatched_compat=True replicates it) vs the real
# reference lstm_encoder.py / rnn_encoder.py
# ---------------------------------------------------------------------------

def test_lstm_encoder_matches_reference():
    from multimodn_tpu.encoders import LSTMEncoder
    ref = load_reference()
    ref_lstm = ref_module("multimodn.encoders.lstm_encoder")
    ref_dec_m = ref_module("multimodn.decoders.decoders")

    ds = make_dataset(n=48, partitions=(6,), seed=20)
    loader = ArrayLoader(ds, batch_size=16)
    model = MultiModN(2, [LSTMEncoder(2, 6, (5, 5))], [LogisticDecoder(2)],
                      0.7, 0.3, nan_skip="batch")
    ref_model = ref.MultiModN(
        2, [ref_lstm.LSTMEncoder(2, 6, (5, 5))],
        [ref_dec_m.LogisticDecoder(2)], 0.7, 0.3,
        device=torch.device("cpu"))
    transplant_reference(ref_model, model.state_dict())
    opt = Adam(0.01)
    ref_opt = torch.optim.Adam(ref_model.parameters(), 0.01)
    batches = reference_batches(loader)
    hist, ref_hist = MultiModNHistory(["t0"]), ref.MultiModNHistory(["t0"])
    for _ in range(3):
        model.train_epoch(loader, opt, "cross_entropy", hist)
        ref_model.train_epoch(batches, ref_opt,
                              torch.nn.CrossEntropyLoss(), ref_hist)
    assert_history_matches(hist, ref_hist)


def test_rnn_encoder_matches_reference():
    from multimodn_tpu.encoders import RNNEncoder
    ref = load_reference()
    ref_rnn = ref_module("multimodn.encoders.rnn_encoder")
    ref_dec_m = ref_module("multimodn.decoders.decoders")

    ds = make_dataset(n=48, partitions=(6,), seed=21)
    loader = ArrayLoader(ds, batch_size=16)
    model = MultiModN(2, [RNNEncoder(2, 6, (5,))], [LogisticDecoder(2)],
                      0.7, 0.3, nan_skip="batch")
    ref_model = ref.MultiModN(
        2, [ref_rnn.RNNEncoder(2, 6, (5,))],
        [ref_dec_m.LogisticDecoder(2)], 0.7, 0.3,
        device=torch.device("cpu"))
    transplant_reference(ref_model, model.state_dict())
    opt = Adam(0.01)
    ref_opt = torch.optim.Adam(ref_model.parameters(), 0.01)
    batches = reference_batches(loader)
    hist, ref_hist = MultiModNHistory(["t0"]), ref.MultiModNHistory(["t0"])
    for _ in range(3):
        model.train_epoch(loader, opt, "cross_entropy", hist)
        ref_model.train_epoch(batches, ref_opt,
                              torch.nn.CrossEntropyLoss(), ref_hist)
    assert_history_matches(hist, ref_hist)


# ---------------------------------------------------------------------------
# StaticInitState (reference state.py:34-47: itertools.cycle advancing one
# state per SAMPLE; mine is a modular (offset + arange) gather)
# ---------------------------------------------------------------------------

def test_static_init_state_matches_reference(ref, ref_enc, ref_dec):
    """Training with a cycled static init-state bank matches the reference
    (n_samples a multiple of the bank size: phase returns to 0 each epoch —
    the easy case; the non-divisible shared-cycle case is the next test)."""
    from multimodn_tpu.core.state import StaticInitState

    ref_state_mod = ref_module("multimodn.state")
    rng = np.random.default_rng(22)
    bank = [rng.normal(size=3).astype(np.float32) for _ in range(4)]
    ds = make_dataset(n=48, partitions=(6,), seed=22)   # 48 % 4 == 0
    loader = ArrayLoader(ds, batch_size=16)             # 16 % 4 == 0 per batch

    model = MultiModN(3, [MLPEncoder(3, 6, (5,))], [LogisticDecoder(3)],
                      0.7, 0.3, nan_skip="batch",
                      init_state=StaticInitState(bank))
    ref_model = ref.MultiModN(
        3, [ref_enc.MLPEncoder(3, 6, (5,))], [ref_dec.LogisticDecoder(3)],
        0.7, 0.3,
        init_state=ref_state_mod.StaticInitState(
            [torch.from_numpy(b.copy()) for b in bank]),
        device=torch.device("cpu"))
    # StaticInitState has no trainable value; transplant encoder/decoders only.
    sd = model.state_dict()
    for enc, p in zip(ref_model.encoders, sd["encoders"]):
        linears = [l for l in enc.layers if isinstance(l, torch.nn.Linear)]
        for tl, jl in zip(linears, p["layers"]):
            tl.weight.data = torch.from_numpy(np.asarray(jl["w"]).T.copy())
            tl.bias.data = torch.from_numpy(np.asarray(jl["b"]).copy())
    for dec, p in zip(ref_model.decoders, sd["decoders"]):
        dec.fc.weight.data = torch.from_numpy(
            np.asarray(p["layers"][0]["w"]).T.copy())
        dec.fc.bias.data = torch.from_numpy(
            np.asarray(p["layers"][0]["b"]).copy())

    opt = Adam(0.01)
    ref_opt = torch.optim.Adam(ref_model.parameters(), 0.01)
    batches = reference_batches(loader)
    hist, ref_hist = MultiModNHistory(["t0"]), ref.MultiModNHistory(["t0"])
    for _ in range(3):
        model.train_epoch(loader, opt, "cross_entropy", hist)
        ref_model.train_epoch(batches, ref_opt,
                              torch.nn.CrossEntropyLoss(), ref_hist)
    assert_history_matches(hist, ref_hist)


def test_static_cycle_phase_matches_reference_nondivisible(ref, ref_enc,
                                                           ref_dec):
    """The reference's StaticInitState keeps ONE itertools.cycle for the
    model's lifetime (state.py:41): with n_samples % bank_size != 0 its
    phase wraps mid-batch and carries across epochs and interleaved test()
    calls. The model's cumulative _cycle_offset reproduces that exactly."""
    from multimodn_tpu.core.state import StaticInitState

    ref_state_mod = ref_module("multimodn.state")
    rng = np.random.default_rng(31)
    bank = [rng.normal(size=3).astype(np.float32) for _ in range(3)]
    ds = make_dataset(n=40, partitions=(6,), seed=31)   # 40 % 3 == 1
    loader = ArrayLoader(ds, batch_size=16)             # 16 % 3 == 1

    model = MultiModN(3, [MLPEncoder(3, 6, (5,))], [LogisticDecoder(3)],
                      0.7, 0.3, nan_skip="batch",
                      init_state=StaticInitState(bank))
    ref_model = ref.MultiModN(
        3, [ref_enc.MLPEncoder(3, 6, (5,))], [ref_dec.LogisticDecoder(3)],
        0.7, 0.3,
        init_state=ref_state_mod.StaticInitState(
            [torch.from_numpy(b.copy()) for b in bank]),
        device=torch.device("cpu"))
    sd = model.state_dict()
    for enc, p in zip(ref_model.encoders, sd["encoders"]):
        linears = [l for l in enc.layers if isinstance(l, torch.nn.Linear)]
        for tl, jl in zip(linears, p["layers"]):
            tl.weight.data = torch.from_numpy(np.asarray(jl["w"]).T.copy())
            tl.bias.data = torch.from_numpy(np.asarray(jl["b"]).copy())
    for dec, p in zip(ref_model.decoders, sd["decoders"]):
        dec.fc.weight.data = torch.from_numpy(
            np.asarray(p["layers"][0]["w"]).T.copy())
        dec.fc.bias.data = torch.from_numpy(
            np.asarray(p["layers"][0]["b"]).copy())

    opt = Adam(0.01)
    ref_opt = torch.optim.Adam(ref_model.parameters(), 0.01)
    batches = reference_batches(loader)
    hist, ref_hist = MultiModNHistory(["t0"]), ref.MultiModNHistory(["t0"])
    for _ in range(3):
        # Interleave test() like the reference pipelines do — it draws from
        # the SAME shared cycle, shifting the next epoch's phase.
        model.train_epoch(loader, opt, "cross_entropy", hist)
        ref_model.train_epoch(batches, ref_opt,
                              torch.nn.CrossEntropyLoss(), ref_hist)
        model.test(loader, "cross_entropy", hist, tag="val")
        ref_model.test(batches, torch.nn.CrossEntropyLoss(), ref_hist,
                       tag="val")
    assert_history_matches(hist, ref_hist)


def test_history_artifacts_match_reference(ref, ref_enc, ref_dec, tmp_path):
    """get_results() DataFrames and save_results() CSVs produced from paired
    training match the real reference's history byte-for-byte in structure
    (columns, index) and numerically in values (history.py:98-161)."""
    import pandas as pd

    ds = make_dataset(n=64, partitions=(3, 3), seed=23, n_targets=2)
    model, ref_model, (hist, ref_hist), batches, loader = run_pair(
        ref,
        [MLPEncoder(4, 3, (5,)), MLPEncoder(4, 3, (5,))],
        [LogisticDecoder(4), MLPDecoder(4, (6,), 2)],
        [ref_enc.MLPEncoder(4, 3, (5,)), ref_enc.MLPEncoder(4, 3, (5,))],
        [ref_dec.LogisticDecoder(4), ref_dec.MLPDecoder(4, (6,), 2)],
        ds, epochs=3)
    # Add a val tag on both so multi-tag columns are exercised.
    model.test(loader, "cross_entropy", hist, tag="val")
    ref_model.test(batches, torch.nn.CrossEntropyLoss(), ref_hist, tag="val")

    df = hist.get_results()
    ref_df = ref_hist.get_results()
    assert list(df.columns) == list(ref_df.columns)
    assert list(df.index) == list(ref_df.index)
    np.testing.assert_allclose(df.to_numpy(), ref_df.to_numpy(),
                               rtol=2e-4, atol=2e-5)

    ours_csv = tmp_path / "ours.csv"
    ref_csv = tmp_path / "ref.csv"
    hist.save_results(str(ours_csv))
    ref_hist.save_results(str(ref_csv))
    a = pd.read_csv(ours_csv)
    b = pd.read_csv(ref_csv)
    assert list(a.columns) == list(b.columns)
    np.testing.assert_allclose(a.iloc[:, 1:].to_numpy(),
                               b.iloc[:, 1:].to_numpy(),
                               rtol=2e-4, atol=2e-5)


def test_predict_with_sequence_matches_reference(ref, ref_enc, ref_dec):
    """predict(x, encoder_sequence) drives the same non-identity traversal
    as the reference (multimodn.py:422-458 with get_encoder_iterable)."""
    ds = make_dataset(n=20, partitions=(3, 3), seed=30)
    model = MultiModN(3, [MLPEncoder(3, 3, (4,)), MLPEncoder(3, 3, (4,))],
                      [LogisticDecoder(3)], 0.7, 0.3)
    ref_model = ref.MultiModN(
        3, [ref_enc.MLPEncoder(3, 3, (4,)), ref_enc.MLPEncoder(3, 3, (4,))],
        [ref_dec.LogisticDecoder(3)], 0.7, 0.3, device=torch.device("cpu"))
    transplant_reference(ref_model, model.state_dict())
    xs, _, _ = ds.arrays()
    seq = np.asarray([[1, 0]] * 20, np.int64)
    ours = model.predict([x[:20] for x in xs], encoder_sequence=seq[0])
    theirs = ref_model.predict([torch.from_numpy(x[:20]) for x in xs],
                               encoder_sequence=torch.from_numpy(seq))
    np.testing.assert_array_equal(ours, theirs)


def test_featurewise_config_matches_reference(ref, ref_enc, ref_dec):
    """Featurewise fusion (titanic_featurewise_pipeline.py: one
    MLPFeatureEncoder per feature, E = n_features)."""
    from multimodn_tpu.encoders import MLPFeatureEncoder

    ds = make_dataset(n=64, partitions=(1, 1, 1, 1, 1), seed=31)
    _, _, (hist, ref_hist), _, _ = run_pair(
        ref,
        [MLPFeatureEncoder(5, 5) for _ in range(5)],
        [LogisticDecoder(5)],
        [ref_enc.MLPFeatureEncoder(5, 5) for _ in range(5)],
        [ref_dec.LogisticDecoder(5)],
        ds, epochs=3, batch_size=16)
    assert_history_matches(hist, ref_hist)


def test_slp_encoders_match_reference(ref, ref_dec):
    """SLP family (slp_encoders.py): empty hidden tuple means the activation
    argument is INERT (last-layer-concat topology applies no activation to
    the only layer, quirk preserved) — all three classes must match."""
    from multimodn_tpu.encoders import (
        LinearEncoder,
        LogisticEncoder,
        SLPEncoder,
    )

    ref_slp = ref_module("multimodn.encoders.slp_encoders")
    configs = [
        (SLPEncoder(3, 4), ref_slp.SLPEncoder(3, 4)),
        (LinearEncoder(3, 4), ref_slp.LinearEncoder(3, 4)),
        (LogisticEncoder(3, 4), ref_slp.LogisticEncoder(3, 4)),
    ]
    for ours, theirs in configs:
        ds = make_dataset(n=48, partitions=(4,), seed=32)
        _, _, (hist, ref_hist), _, _ = run_pair(
            ref, [ours], [LogisticDecoder(3)],
            [theirs], [ref_dec.LogisticDecoder(3)],
            ds, epochs=2, batch_size=16)
        assert_history_matches(hist, ref_hist)


def test_haim_baseline_matches_reference():
    """The HAIM parallel-fusion baseline vs the reference's actual
    haim_api.py: transplanted weights, identical batches, matching training
    trajectory (via per-epoch test tuples) and final 15-tuple."""
    from multimodn_tpu import Adam
    from multimodn_tpu.baselines.haim import HAIM, HAIMDecoder
    from multimodn_tpu.data import ArrayLoader
    from tests.ref_oracle import load_reference_haim

    ref_haim = load_reference_haim()
    rng = np.random.default_rng(40)
    n, f = 64, 12
    X = rng.normal(size=(n, f)).astype(np.float32)
    y = (X @ rng.normal(size=(f, 1)) > 0).astype(np.int64)
    ds = PartitionDataset(X, y, [f])
    loader = ArrayLoader(ds, 16)

    model = HAIM(HAIMDecoder(f, (8, 8)))
    ref_model = ref_haim.HAIM(
        ref_haim.HAIMDecoder(f, (8, 8)), device=torch.device("cpu"))
    # Transplant decoder weights.
    for tl, jl in zip(ref_model.decoder.layers,
                      model.params["layers"]):
        tl.weight.data = torch.from_numpy(np.asarray(jl["w"]).T.copy())
        tl.bias.data = torch.from_numpy(np.asarray(jl["b"]).copy())

    # Reference batches: (data (B, F) tensor, target (B, 1)).
    batches = []
    for data, targets, mask in loader.numpy_batches():
        keep = mask > 0
        batches.append((torch.from_numpy(np.ascontiguousarray(data[0][keep])),
                        torch.from_numpy(np.ascontiguousarray(targets[keep]))))

    opt = Adam(0.01)
    ref_opt = torch.optim.Adam(ref_model.parameters(), 0.01)
    crit = torch.nn.CrossEntropyLoss()
    for e in range(3):
        model.train_epoch(loader, opt, "cross_entropy")
        ref_model.train_epoch(batches, ref_opt, crit)
        ours = model.test(loader, "cross_entropy")
        theirs = ref_model.test(batches, crit)
        for i in (0, 1, 2, 3, 4, 9, 10, 11, 12):
            np.testing.assert_allclose(
                float(np.asarray(ours[i])), float(np.asarray(theirs[i])),
                rtol=2e-4, atol=2e-5, err_msg=f"epoch {e} tuple index {i}")


def test_randomized_configs_soak(ref, ref_enc, ref_dec):
    """Randomized configuration soak vs the REAL reference: random encoder
    counts/widths/hidden sizes/batch sizes/NaN patterns/penalties, 2 Adam
    epochs each — any divergence in the (E+1)xD trajectories fails."""
    rng = np.random.default_rng(2026)
    for trial in range(8):
        E = int(rng.integers(1, 4))
        widths = [int(rng.integers(2, 7)) for _ in range(E)]
        state = int(rng.integers(1, 6))
        hidden = tuple(int(rng.integers(2, 7))
                       for _ in range(int(rng.integers(0, 3))))
        batch = int(rng.choice([4, 8, 16, 31]))   # incl. odd (padded tails)
        n = int(rng.integers(33, 70))
        nan_frac = float(rng.choice([0.0, 0.0, 0.3]))
        err_p = float(rng.uniform(0.3, 1.0))
        sc_p = float(rng.uniform(0.0, 0.5))
        use_mimic = bool(rng.integers(0, 2))
        seed = int(rng.integers(0, 1000))

        ds = make_dataset(n=n, partitions=tuple(widths), seed=seed,
                          nan_frac=nan_frac,
                          nan_modality=int(rng.integers(0, E)))
        if use_mimic:
            encs = [MIMICMLPEncoder(state, w, hidden, dropout=0.0)
                    for w in widths]
            ref_encs = [ref_enc.MIMIC_MLPEncoder(state, w, hidden,
                                                 dropout=0.0)
                        for w in widths]
        else:
            encs = [MLPEncoder(state, w, hidden) for w in widths]
            ref_encs = [ref_enc.MLPEncoder(state, w, hidden) for w in widths]
        _, _, (hist, ref_hist), _, _ = run_pair(
            ref, encs, [LogisticDecoder(state)],
            ref_encs, [ref_dec.LogisticDecoder(state)],
            ds, epochs=2, batch_size=batch, err_p=err_p, sc_p=sc_p,
            lr=0.01)
        try:
            assert_history_matches(hist, ref_hist)
        except AssertionError as e:
            raise AssertionError(
                f"trial {trial}: E={E} widths={widths} state={state} "
                f"hidden={hidden} batch={batch} n={n} nan={nan_frac} "
                f"err_p={err_p:.3f} sc_p={sc_p:.3f} mimic={use_mimic} "
                f"seed={seed}\n{e}") from e


def test_static_cycle_randomized_soak(ref, ref_enc, ref_dec):
    """Randomized StaticInitState soak vs the REAL reference: random bank
    sizes (mostly non-divisible into n), batch sizes, and randomly
    interleaved test() calls — all drawing from the shared lifetime cycle.
    Any phase drift diverges the trajectories and fails."""
    from multimodn_tpu.core.state import StaticInitState

    ref_state_mod = ref_module("multimodn.state")
    rng = np.random.default_rng(77)
    for trial in range(4):
        bank_n = int(rng.integers(2, 6))
        state = int(rng.integers(2, 5))
        width = int(rng.integers(3, 7))
        batch = int(rng.choice([8, 16, 13]))
        n = int(rng.integers(30, 60))
        seed = int(rng.integers(0, 1000))
        bank = [rng.normal(size=state).astype(np.float32)
                for _ in range(bank_n)]
        ds = make_dataset(n=n, partitions=(width,), seed=seed)
        loader = ArrayLoader(ds, batch_size=batch)

        model = MultiModN(state, [MLPEncoder(state, width, (5,))],
                          [LogisticDecoder(state)], 0.7, 0.3,
                          nan_skip="batch",
                          init_state=StaticInitState(bank))
        ref_model = ref.MultiModN(
            state, [ref_enc.MLPEncoder(state, width, (5,))],
            [ref_dec.LogisticDecoder(state)], 0.7, 0.3,
            init_state=ref_state_mod.StaticInitState(
                [torch.from_numpy(b.copy()) for b in bank]),
            device=torch.device("cpu"))
        sd = model.state_dict()
        for enc, p in zip(ref_model.encoders, sd["encoders"]):
            linears = [l for l in enc.layers
                       if isinstance(l, torch.nn.Linear)]
            for tl, jl in zip(linears, p["layers"]):
                tl.weight.data = torch.from_numpy(
                    np.asarray(jl["w"]).T.copy())
                tl.bias.data = torch.from_numpy(np.asarray(jl["b"]).copy())
        for dec, p in zip(ref_model.decoders, sd["decoders"]):
            dec.fc.weight.data = torch.from_numpy(
                np.asarray(p["layers"][0]["w"]).T.copy())
            dec.fc.bias.data = torch.from_numpy(
                np.asarray(p["layers"][0]["b"]).copy())

        opt = Adam(0.01)
        ref_opt = torch.optim.Adam(ref_model.parameters(), 0.01)
        batches = reference_batches(loader)
        hist = MultiModNHistory(["t0"])
        ref_hist = ref.MultiModNHistory(["t0"])
        crit = torch.nn.CrossEntropyLoss()
        for e in range(3):
            model.train_epoch(loader, opt, "cross_entropy", hist)
            ref_model.train_epoch(batches, ref_opt, crit, ref_hist)
            if rng.random() < 0.5:   # random cycle-consuming interleave
                model.test(loader, "cross_entropy", hist, tag="val")
                ref_model.test(batches, crit, ref_hist, tag="val")
        try:
            assert_history_matches(hist, ref_hist)
        except AssertionError as err:
            raise AssertionError(
                f"trial {trial}: bank={bank_n} state={state} width={width} "
                f"batch={batch} n={n} seed={seed}\n{err}") from err


def test_repeated_encoder_sequence_matches_reference(ref, ref_enc, ref_dec):
    """Sequence [1, 0, 0] — encoder 0 executes TWICE per batch. The
    reference accumulates n_correct/confusion counts and n_samples per
    EXECUTION into the encoder-indexed row ('+=', multimodn.py:171-192)
    while err_loss/state_change take the last execution (assignment); the
    per-execution fold (fusion.combine_executions) must reproduce all of
    it, including a NaN-skipped second execution keeping the first
    execution's counts."""
    seq = np.asarray([1, 0, 0], np.int64)
    rng = np.random.default_rng(41)
    X = rng.normal(size=(48, 8)).astype(np.float32)
    y = (X @ rng.normal(size=(8, 1)) > 0).astype(np.int64)
    ds = _SeqPartitionDataset(X, y, [2, 3, 3], seq)
    loader = ArrayLoader(ds, batch_size=16)

    # slot 0 (2 features) -> encoder 1; slots 1 and 2 (3 features each) ->
    # encoder 0 twice.
    model = MultiModN(3, [MLPEncoder(3, 3, (4,)), MLPEncoder(3, 2, (4,))],
                      [LogisticDecoder(3)], 0.7, 0.3, nan_skip="batch")
    ref_model = ref.MultiModN(
        3, [ref_enc.MLPEncoder(3, 3, (4,)), ref_enc.MLPEncoder(3, 2, (4,))],
        [ref_dec.LogisticDecoder(3)], 0.7, 0.3, device=torch.device("cpu"))
    transplant_reference(ref_model, model.state_dict())
    opt = Adam(0.01)
    ref_opt = torch.optim.Adam(ref_model.parameters(), 0.01)
    batches = reference_batches(loader, encoder_sequence=seq)
    hist, ref_hist = MultiModNHistory(["t0"]), ref.MultiModNHistory(["t0"])
    for _ in range(3):
        model.train_epoch(loader, opt, "cross_entropy", hist)
        ref_model.train_epoch(batches, ref_opt,
                              torch.nn.CrossEntropyLoss(), ref_hist)
        model.test(loader, "cross_entropy", hist, tag="val")
        ref_model.test(batches, torch.nn.CrossEntropyLoss(), ref_hist,
                       tag="val")
    assert_history_matches(hist, ref_hist)
    assert_history_matches(hist, ref_hist, tag="val")


def test_repeated_encoder_nan_second_execution_matches_reference(
        ref, ref_enc, ref_dec):
    """NaN in the SECOND execution's data slot (nan_skip='batch'): the
    reference 'continue's past it, keeping the first execution's counts and
    err_loss assignment for that encoder row."""
    seq = np.asarray([1, 0, 0], np.int64)
    rng = np.random.default_rng(42)
    X = rng.normal(size=(32, 8)).astype(np.float32)
    X[5, 5:8] = np.nan          # slot 2 = the SECOND execution of encoder 0
    y = (np.nan_to_num(X) @ rng.normal(size=(8, 1)) > 0).astype(np.int64)
    ds = _SeqPartitionDataset(X, y, [2, 3, 3], seq)
    loader = ArrayLoader(ds, batch_size=16)

    model = MultiModN(3, [MLPEncoder(3, 3, (4,)), MLPEncoder(3, 2, (4,))],
                      [LogisticDecoder(3)], 0.7, 0.3, nan_skip="batch")
    ref_model = ref.MultiModN(
        3, [ref_enc.MLPEncoder(3, 3, (4,)), ref_enc.MLPEncoder(3, 2, (4,))],
        [ref_dec.LogisticDecoder(3)], 0.7, 0.3, device=torch.device("cpu"))
    transplant_reference(ref_model, model.state_dict())
    opt = Adam(0.01)
    ref_opt = torch.optim.Adam(ref_model.parameters(), 0.01)
    batches = reference_batches(loader, encoder_sequence=seq)
    hist, ref_hist = MultiModNHistory(["t0"]), ref.MultiModNHistory(["t0"])
    for _ in range(3):
        model.train_epoch(loader, opt, "cross_entropy", hist)
        ref_model.train_epoch(batches, ref_opt,
                              torch.nn.CrossEntropyLoss(), ref_hist)
    assert_history_matches(hist, ref_hist)

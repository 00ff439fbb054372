"""Golden parity: full training/eval trajectories vs a torch oracle that
implements the reference's documented semantics (SURVEY §3.1-3.2), with
transplanted weights and identical batches. This is the round-1 parity gate
(SURVEY §7 build order, milestone 2)."""
import numpy as np
import pytest
import torch

from multimodn_tpu import Adam, MultiModN, MultiModNHistory
from multimodn_tpu.data import ArrayLoader, PartitionDataset
from multimodn_tpu.decoders import LogisticDecoder, MLPDecoder
from multimodn_tpu.encoders import MIMICMLPEncoder, MLPEncoder
from tests.torch_ref import (
    TorchClassDecoder,
    TorchMIMICMLPEncoder,
    TorchMLPDecoder,
    TorchMLPEncoder,
    TorchOracle,
    transplant,
)


def make_dataset(n=90, partitions=(3, 3), seed=0, nan_frac=0.0, n_targets=1):
    rng = np.random.default_rng(seed)
    f = sum(partitions)
    X = rng.normal(size=(n, f)).astype(np.float32)
    w = rng.normal(size=(f, n_targets))
    y = (X @ w > 0).astype(np.int64)
    if nan_frac > 0:
        # NaN out the first modality block for a fraction of the rows.
        rows = rng.random(n) < nan_frac
        X[rows, :partitions[0]] = np.nan
    return PartitionDataset(X, y, list(partitions))


def torch_batches(loader):
    """Reference-style batches (real rows only) from an ArrayLoader."""
    out = []
    for data, targets, mask in loader.numpy_batches():
        keep = mask > 0
        out.append(([torch.from_numpy(d[keep]) for d in data],
                    torch.from_numpy(targets[keep])))
    return out


def assert_grids_close(ours, theirs, keys=("loss", "state_change_loss",
                                           "accuracy", "sensitivity",
                                           "specificity", "balanced_accuracy"),
                       rtol=2e-4, atol=2e-5):
    for k in keys:
        np.testing.assert_allclose(
            np.asarray(ours[k]), np.asarray(theirs[k]), rtol=rtol, atol=atol,
            err_msg=f"grid mismatch: {k}")


def run_both(dataset, encoders, decoders, torch_encoders, torch_decoders,
             epochs=3, batch_size=16, lr=0.01, err_p=0.7, sc_p=0.3,
             nan_skip="batch"):
    loader = ArrayLoader(dataset, batch_size=batch_size)
    model = MultiModN(encoders[0].state_size, encoders, decoders, err_p, sc_p,
                      nan_skip=nan_skip)
    oracle = TorchOracle(encoders[0].state_size, torch_encoders,
                         torch_decoders, err_p, sc_p)
    transplant(oracle, model.state_dict())
    opt = Adam(lr)
    topt = torch.optim.Adam(oracle.parameters(), lr)
    criterion = torch.nn.CrossEntropyLoss()
    batches = torch_batches(loader)

    hist = MultiModNHistory([f"t{i}" for i in range(len(decoders))])
    torch_stats = None
    for _ in range(epochs):
        model.train_epoch(loader, opt, "cross_entropy", hist)
        torch_stats = oracle.run_epoch(batches, criterion, topt)
    ours = {
        "loss": hist.loss["train"][-1],
        "state_change_loss": hist.state_change_loss[-1],
        "accuracy": hist.accuracy["train"][-1],
        "sensitivity": hist.sensitivity["train"][-1],
        "specificity": hist.specificity["train"][-1],
        "balanced_accuracy": hist.balanced_accuracy["train"][-1],
    }
    return model, oracle, loader, batches, ours, torch_stats


def test_single_encoder_training_trajectory_matches_torch():
    ds = make_dataset(n=90, partitions=(6,))
    model, oracle, loader, batches, ours, theirs = run_both(
        ds,
        [MLPEncoder(2, 6, (5, 5))], [LogisticDecoder(2)],
        [TorchMLPEncoder(2, 6, (5, 5))], [TorchClassDecoder(2, 2)],
        epochs=3)
    assert_grids_close(ours, theirs)


def test_multi_encoder_multi_decoder_trajectory_matches_torch():
    ds = make_dataset(n=80, partitions=(3, 3), n_targets=2, seed=1)
    model, oracle, loader, batches, ours, theirs = run_both(
        ds,
        [MLPEncoder(4, 3, (5,)), MLPEncoder(4, 3, (5,))],
        [LogisticDecoder(4), MLPDecoder(4, (6,), 2)],
        [TorchMLPEncoder(4, 3, (5,)), TorchMLPEncoder(4, 3, (5,))],
        [TorchClassDecoder(4, 2), TorchMLPDecoder(4, (6,), 2)],
        epochs=3)
    assert_grids_close(ours, theirs)


def test_mimic_encoder_trajectory_matches_torch():
    ds = make_dataset(n=64, partitions=(8, 4), seed=2)
    model, oracle, loader, batches, ours, theirs = run_both(
        ds,
        [MIMICMLPEncoder(5, 8, (8, 8), dropout=0.0),
         MIMICMLPEncoder(5, 4, (8, 8), dropout=0.0)],
        [MLPDecoder(5, (8, 8), 2)],
        [TorchMIMICMLPEncoder(5, 8, (8, 8), dropout=0.0),
         TorchMIMICMLPEncoder(5, 4, (8, 8), dropout=0.0)],
        [TorchMLPDecoder(5, (8, 8), 2)],
        epochs=3, batch_size=16, lr=0.001, err_p=1.0, sc_p=0.0)
    assert_grids_close(ours, theirs)


def test_batch_granular_nan_skip_matches_torch():
    """Batches containing NaN in a modality skip that encoder wholesale
    (reference multimodn.py:167-169, quirk #2)."""
    ds = make_dataset(n=60, partitions=(3, 3), seed=3, nan_frac=0.35)
    model, oracle, loader, batches, ours, theirs = run_both(
        ds,
        [MLPEncoder(3, 3, (4,)), MLPEncoder(3, 3, (4,))],
        [LogisticDecoder(3)],
        [TorchMLPEncoder(3, 3, (4,)), TorchMLPEncoder(3, 3, (4,))],
        [TorchClassDecoder(3, 2)],
        epochs=3, batch_size=8, nan_skip="batch")
    assert_grids_close(ours, theirs)


def test_eval_matches_torch():
    ds = make_dataset(n=70, partitions=(6,), seed=4)
    loader = ArrayLoader(ds, batch_size=32)
    enc, dec = [MLPEncoder(2, 6, (5,))], [LogisticDecoder(2)]
    model = MultiModN(2, enc, dec, 0.7, 0.3, nan_skip="batch")
    oracle = TorchOracle(2, [TorchMLPEncoder(2, 6, (5,))],
                         [TorchClassDecoder(2, 2)], 0.7, 0.3)
    transplant(oracle, model.state_dict())
    hist = MultiModNHistory(["t0"])
    results = model.test(loader, "cross_entropy", hist, tag="val")
    theirs = oracle.run_epoch(torch_batches(loader),
                              torch.nn.CrossEntropyLoss())
    ours = {k: hist.__dict__[k]["val"][-1] if k != "state_change_loss" else None
            for k in ("loss", "accuracy", "sensitivity", "specificity",
                      "balanced_accuracy")}
    for k, v in ours.items():
        np.testing.assert_allclose(v, theirs[k], rtol=2e-4, atol=2e-5,
                                   err_msg=k)
    # 15-tuple performance suite present per decoder.
    assert len(results) == 1 and len(results[0]) == 15
    f1, auc, acc = results[0][:3]
    assert 0 <= f1 <= 1 and 0 <= auc <= 1 and 0 <= acc <= 1


def test_padded_tail_batch_is_exact():
    """n not divisible by batch size: padding must not change any metric."""
    ds = make_dataset(n=50, partitions=(6,), seed=5)
    model, oracle, loader, batches, ours, theirs = run_both(
        ds,
        [MLPEncoder(2, 6, (5,))], [LogisticDecoder(2)],
        [TorchMLPEncoder(2, 6, (5,))], [TorchClassDecoder(2, 2)],
        epochs=2, batch_size=16)
    assert loader.n_batches == 4  # 16*3 + 2
    assert_grids_close(ours, theirs)

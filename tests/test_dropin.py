"""True script-level drop-in: byte-identical reference pipeline bodies run
against the repo's compat tree (VERDICT r2 next-#3).

Each test execs the UNMODIFIED source of a reference pipeline script
(``/root/reference/pipelines/titanic/*_pipeline.py``) with NO namespace
swapping — ``multimodn`` / ``datasets`` / ``pipelines`` resolve to the
repo's own compat packages, ``torch.optim.Adam(model.parameters(), lr)`` /
``nn.CrossEntropyLoss()`` / ``torch.utils.data.DataLoader`` flow through
``multimodn_tpu.interop``, and ``F.relu`` maps to the JAX relu
(core.nn.resolve_activation). Only ``__file__``/``sys.argv`` are pointed
into a scratch dir so artifacts don't land in the repo.
"""
from __future__ import annotations

import os
import pickle
import sys
import types

import numpy as np
import pytest

REF_PATH = "/root/reference"

_CAPTURE: dict = {}


def run_dropin(pipeline: str, argv, workdir: str) -> dict:
    """Exec the reference script source against the repo packages and call
    its main(); returns captured {"models": [...], "histories": [...]}."""
    with open(os.path.join(REF_PATH, "pipelines", "titanic",
                           pipeline + ".py")) as f:
        src = f.read()
    fake_file = os.path.join(workdir, "pipelines", "titanic",
                             pipeline + ".py")
    os.makedirs(os.path.dirname(fake_file), exist_ok=True)

    _CAPTURE.clear()
    _CAPTURE.update({"models": [], "histories": []})

    mod = types.ModuleType("_dropin_main")
    mod.__file__ = fake_file
    argv_snapshot, path_snapshot = sys.argv, list(sys.path)
    sys.modules["_dropin_main"] = mod
    sys.argv = [fake_file] + list(argv)
    try:
        exec(compile(src, fake_file, "exec"), mod.__dict__)
        # Wrap the classes in the SCRIPT's namespace (not the packages') so
        # the objects main() creates but never returns are observable.
        model_cls, hist_cls = mod.MultiModN, mod.MultiModNHistory

        def capturing_model(*a, **k):
            m = model_cls(*a, **k)
            _CAPTURE["models"].append(m)
            return m

        def capturing_history(*a, **k):
            h = hist_cls(*a, **k)
            _CAPTURE["histories"].append(h)
            return h

        mod.MultiModN = capturing_model
        mod.MultiModNHistory = capturing_history
        mod.main()
    finally:
        sys.argv = argv_snapshot
        sys.path[:] = path_snapshot
        sys.modules.pop("_dropin_main", None)
    return dict(_CAPTURE)


def test_mlp_dropin_full_artifacts(tmp_path):
    """The canonical quick-start script (titanic_mlp_pipeline.py:19-127)
    runs unmodified with every save flag ON: model/history pickles, plot
    PNG, results CSV all appear; the pickled model round-trips."""
    cap = run_dropin("titanic_mlp_pipeline", ["-e", "3"], str(tmp_path))
    base = tmp_path / "pipelines" / "titanic"
    assert (base / "models" / "titanic_mlp_model.pkl").exists()
    assert (base / "models" / "titanic_mlp_history.pkl").exists()
    assert (base / "plots" / "titanic_mlp.png").exists()
    assert (base / "results" / "titanic_mlp.csv").exists()
    with open(base / "models" / "titanic_mlp_model.pkl", "rb") as f:
        loaded = pickle.load(f)
    preds = loaded.predict([np.zeros((4, 6), np.float32)])
    assert preds.shape == (2, 1, 4)
    hist = cap["histories"][0]
    assert len(hist.loss["train"]) == 3 and len(hist.loss["val"]) == 3


def test_mlp_dropin_matches_native_pipeline(tmp_path):
    """The drop-in script's torch-object path (torch Adam + CE loss + torch
    DataLoader + looped train_epoch/test) produces the same trajectory as
    the repo-native pipeline (JAX optimizer + ArrayLoader + fused fit) at
    the same seed."""
    from pipelines.titanic.titanic_mlp_pipeline import main as native_main

    cap = run_dropin(
        "titanic_mlp_pipeline",
        ["-e", "3", "-m", "false", "-y", "false", "-p", "false",
         "-r", "false"], str(tmp_path))
    _, native_hist = native_main(["-e", "3", "-m", "false", "-y", "false",
                                  "-p", "false", "-r", "false"])
    dropin_hist = cap["histories"][0]
    for field in ("loss", "accuracy", "sensitivity", "specificity",
                  "balanced_accuracy"):
        ours, theirs = getattr(dropin_hist, field), getattr(native_hist,
                                                            field)
        assert set(ours) == set(theirs)
        for tag in theirs:
            np.testing.assert_allclose(
                np.asarray(ours[tag], np.float64),
                np.asarray(theirs[tag], np.float64),
                rtol=1e-5, atol=1e-6, err_msg=f"{field}[{tag}]")
    np.testing.assert_allclose(
        np.asarray(dropin_hist.state_change_loss, np.float64),
        np.asarray(native_hist.state_change_loss, np.float64),
        rtol=1e-5, atol=1e-7)


@pytest.mark.parametrize("pipeline,epochs", [
    ("titanic_featurewise_pipeline", 2),
    ("titanic_partitioned_pipeline", 2),
    ("titanic_lstm_pipeline", 2),
    ("titanic_rnn_pipeline", 2),
    ("titanic_missingness_pipeline", 1),
])
def test_other_scripts_dropin(pipeline, epochs, tmp_path):
    """Every remaining Titanic reference script executes unmodified against
    the compat tree (encoder-constructor signatures incl. positional
    ``F.relu``, batch_size=1 missingness, LSTM/RNN quirk-8 encoders)."""
    cap = run_dropin(
        pipeline, ["-e", str(epochs), "-m", "false", "-y", "false",
                   "-p", "false", "-r", "false"], str(tmp_path))
    hist = cap["histories"][0]
    assert len(hist.loss["train"]) == epochs
    assert len(hist.loss["val"]) == epochs
    assert np.isfinite(np.asarray(hist.loss["train"])).all()


def test_interop_caches_stable_and_weak():
    """Adapter memoization: the same torch optimizer/DataLoader maps to the
    SAME adapted object on every call (optimizer-state continuity across a
    300-epoch train_epoch loop), and dead torch objects evict their cache
    entries (no unbounded growth in long-lived processes)."""
    import gc

    import torch
    from torch.utils.data import DataLoader as TorchDataLoader

    from multimodn_tpu import interop
    from multimodn_tpu.data import PartitionDataset

    ds = PartitionDataset(np.zeros((8, 4), np.float32),
                          np.zeros((8, 1), np.int64))
    model_params = [torch.nn.Parameter(torch.zeros(2))]

    n_opt0 = len(interop._OPT_CACHE)
    n_ldr0 = len(interop._LOADER_CACHE)
    opt = torch.optim.Adam(model_params, 1e-3)
    ldr = TorchDataLoader(ds, batch_size=4)
    a1, a2 = interop.adapt_optimizer(opt), interop.adapt_optimizer(opt)
    l1, l2 = interop.adapt_loader(ldr), interop.adapt_loader(ldr)
    assert a1 is a2 and l1 is l2
    assert len(interop._OPT_CACHE) == n_opt0 + 1
    assert len(interop._LOADER_CACHE) == n_ldr0 + 1
    del opt, ldr, a1, a2, l1, l2
    gc.collect()
    assert len(interop._OPT_CACHE) == n_opt0
    assert len(interop._LOADER_CACHE) == n_ldr0


def test_torch_dataset_is_not_a_loader():
    """Only torch DataLoader instances route into loader adaptation: a
    Dataset/TensorDataset/Subset also lives under torch.utils.data and used
    to be misrouted, dying later on `.batch_size` (review finding)."""
    import torch
    from torch.utils.data import DataLoader, Subset as TSubset, TensorDataset

    from multimodn_tpu.interop import is_torch_dataloader

    ds = TensorDataset(torch.zeros(4, 3), torch.zeros(4, 1))
    assert not is_torch_dataloader(ds)
    assert not is_torch_dataloader(TSubset(ds, [0, 1]))
    assert is_torch_dataloader(DataLoader(ds, batch_size=2))


def test_adapt_loader_subset_sampler_and_rejections():
    """Round-5 review finding: a SubsetRandomSampler loader used to
    materialize the FULL dataset sequentially (silent train/test leakage);
    unknown samplers were silently treated as sequential-over-everything."""
    import torch
    from torch.utils.data import (DataLoader as TorchDataLoader,
                                  RandomSampler, SubsetRandomSampler,
                                  WeightedRandomSampler)

    from multimodn_tpu import interop
    from multimodn_tpu.data import PartitionDataset

    X = np.arange(40, dtype=np.float32).reshape(10, 4)
    ds = PartitionDataset(X, np.zeros((10, 1), np.int64))

    idx = [1, 3, 5]
    ldr = TorchDataLoader(ds, batch_size=2, sampler=SubsetRandomSampler(idx))
    ours = interop.adapt_loader(ldr)
    assert ours.n_samples == 3
    served = np.sort(np.asarray(ours.stacks()[0][0]).reshape(-1, 4)[:3, 0])
    np.testing.assert_array_equal(served, X[idx, 0])
    assert ours.shuffle

    with pytest.raises(NotImplementedError, match="sampler"):
        interop.adapt_loader(TorchDataLoader(
            ds, batch_size=2,
            sampler=WeightedRandomSampler([1.0] * 10, num_samples=10)))
    with pytest.raises(NotImplementedError, match="replacement"):
        interop.adapt_loader(TorchDataLoader(
            ds, batch_size=2, sampler=RandomSampler(ds, replacement=True)))


def test_adapt_optimizer_tracks_scheduler_lr():
    """Round-5 review finding: torch lr schedulers mutate param_groups, not
    .defaults — the adapter must honor the live lr (swapping the
    transformation in place so Adam moments carry across the change)."""
    import torch

    from multimodn_tpu import interop

    p = [torch.nn.Parameter(torch.zeros(2))]
    opt = torch.optim.Adam(p, lr=0.1)
    ours = interop.adapt_optimizer(opt)
    assert ours.signature[1] == 0.1
    sched = torch.optim.lr_scheduler.StepLR(opt, step_size=1, gamma=0.1)
    sched.step()
    ours2 = interop.adapt_optimizer(opt)
    assert ours2 is ours                       # same state-carrying object
    assert abs(ours.signature[1] - 0.01) < 1e-12

    # Per-group hyperparameters have no pytree mapping: reject loudly.
    p2 = [torch.nn.Parameter(torch.zeros(2)),
          torch.nn.Parameter(torch.zeros(3))]
    multi = torch.optim.Adam([{"params": p2[:1], "lr": 0.1},
                              {"params": p2[1:], "lr": 0.2}])
    with pytest.raises(NotImplementedError, match="param-group"):
        interop.adapt_optimizer(multi)


def test_adapt_optimizer_rejects_maximize():
    """Round-5 tail review finding: torch ``maximize=True`` is gradient
    ASCENT — silently mapping it onto the minimizing native optimizer
    trained in the opposite direction. It must be rejected loudly, like
    every other unmappable knob."""
    import torch

    from multimodn_tpu import interop

    for cls in (torch.optim.Adam, torch.optim.AdamW, torch.optim.SGD):
        p = [torch.nn.Parameter(torch.zeros(2))]
        opt = cls(p, lr=0.1, maximize=True)
        with pytest.raises(NotImplementedError, match="maximize"):
            interop.adapt_optimizer(opt)


def test_adapt_optimizer_memoizes_revisited_hparams():
    """Round-5 tail review finding: every distinct hparam set compiles its
    own fused program keyed on tx identity, so a REVISITED set (cyclic
    schedule, warm restart) must swap back the SAME transformation object —
    a fresh tx would force a full recompile of an already-compiled
    program."""
    import torch

    from multimodn_tpu import interop

    p = [torch.nn.Parameter(torch.zeros(2))]
    opt = torch.optim.Adam(p, lr=0.1)
    ours = interop.adapt_optimizer(opt)
    tx_at_01 = ours.tx
    opt.param_groups[0]["lr"] = 0.01
    interop.adapt_optimizer(opt)
    assert ours.tx is not tx_at_01
    opt.param_groups[0]["lr"] = 0.1
    interop.adapt_optimizer(opt)
    assert ours.tx is tx_at_01  # identity restored -> program cache re-hit


def test_scheduler_preserves_opt_state_across_epochs():
    """The lr swap must not reset the model's optimizer state: the Adam
    step counter keeps counting across a scheduler-driven lr change."""
    import torch

    from multimodn_tpu import MultiModN, MultiModNHistory
    from multimodn_tpu.data import ArrayLoader, PartitionDataset
    from multimodn_tpu.decoders import LogisticDecoder
    from multimodn_tpu.encoders import MLPEncoder

    rng = np.random.default_rng(0)
    ds = PartitionDataset(rng.normal(size=(32, 4)).astype(np.float32),
                          rng.integers(0, 2, (32, 1)))
    model = MultiModN(2, [MLPEncoder(2, 4, (4,))], [LogisticDecoder(2)],
                      1.0, 0.0)
    opt = torch.optim.Adam(
        [torch.nn.Parameter(torch.zeros(1))], lr=0.05)
    h = MultiModNHistory(["t"])
    model.train_epoch(ArrayLoader(ds, 8), opt, "cross_entropy", h)
    t1 = float(model.opt_state["t"])
    opt.param_groups[0]["lr"] = 0.005          # what a scheduler does
    model.train_epoch(ArrayLoader(ds, 8), opt, "cross_entropy", h)
    t2 = float(model.opt_state["t"])
    assert t1 == 4.0 and t2 == 8.0             # moments carried, not reset

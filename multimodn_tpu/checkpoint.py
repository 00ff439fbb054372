"""Checkpointing: params/opt_state persistence with best-k selection.

The reference persists (a) whole-object pickles of model and history
(``titanic_mlp_pipeline.py:96,102``) and (b) best-model dicts
``{'epoch', 'model_state_dict', 'auc_bac_val_cum'}`` via torch.save keyed on
validation auc+bac (``mimic_single_task_pipeline.py:151-158``). Equivalents:

- ``save_checkpoint`` / ``load_checkpoint``: dependency-free pickle of numpy
  pytrees (same dict keys as the reference's torch.save payload).
- ``CheckpointManager``: tracked best-k checkpoints with a score rule.
- ``OrbaxCheckpointer``: async orbax-backed variant for large params, when
  orbax is installed (it is in the standard image).

Note the reference never persists optimizer state (no mid-training resume);
``save_checkpoint`` optionally does, enabling true resume.
"""
from __future__ import annotations

import os
import pickle
from typing import Optional

import jax
import numpy as np


def _to_numpy(tree):
    return jax.tree_util.tree_map(np.asarray, tree)


def save_checkpoint(path: str, model, epoch: int, score: Optional[float] = None,
                    include_opt_state: bool = False, extra: Optional[dict] = None):
    payload = {
        "epoch": epoch,
        "model_state_dict": _to_numpy(model.params),
        "auc_bac_val_cum": score,
    }
    if include_opt_state and getattr(model, "opt_state", None) is not None:
        payload["opt_state"] = _to_numpy(model.opt_state)
    if extra:
        payload.update(extra)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    # Atomic (tmp + os.replace): a preemption mid-dump must never leave a
    # truncated best-checkpoint on disk — the exact crash window the
    # resume machinery exists for (review finding, round 5).
    _atomic_pickle(path, payload)
    return path


def load_checkpoint(path: str, model=None) -> dict:
    with open(path, "rb") as f:
        payload = pickle.load(f)
    if model is not None:
        model.load_state_dict(payload["model_state_dict"])
    return payload


class CheckpointManager:
    """Best-k checkpoint tracking (mode='max' keeps highest scores)."""

    def __init__(self, directory: str, prefix: str = "ckpt", keep: int = 1,
                 mode: str = "max"):
        self.directory = directory
        self.prefix = prefix
        self.keep = keep
        self.sign = 1.0 if mode == "max" else -1.0
        self._tracked = []  # list of (signed_score, epoch, path)
        self._n_saves = 0   # disambiguates repeated saves at one epoch
        os.makedirs(directory, exist_ok=True)

    def save(self, model, epoch: int, score: float, **extra) -> bool:
        """Persist if the score ranks in the best-k; returns True if saved."""
        import math
        if math.isnan(score):
            # NaN passes every <= gate and corrupts the sorted tracking
            # (best_path could point at a diverged epoch).
            return False
        signed = self.sign * score
        if len(self._tracked) >= self.keep and \
                signed <= min(s for s, _, _ in self._tracked):
            return False
        # A per-manager save counter keeps paths unique even when the same
        # epoch is saved twice (two tracked entries sharing one file would
        # let an eviction delete the survivor's file).
        self._n_saves += 1
        path = os.path.join(
            self.directory, f"{self.prefix}_epoch{epoch}_{self._n_saves}.pkl")
        save_checkpoint(path, model, epoch, score, extra=extra or None)
        self._tracked.append((signed, epoch, path))
        self._tracked.sort(reverse=True)
        while len(self._tracked) > self.keep:
            _, _, old = self._tracked.pop()
            if os.path.exists(old):
                os.remove(old)
        return True

    @property
    def best_path(self) -> Optional[str]:
        return self._tracked[0][2] if self._tracked else None

    def restore_best(self, model) -> Optional[dict]:
        if self.best_path is None:
            return None
        return load_checkpoint(self.best_path, model)


def _atomic_pickle(path: str, payload: dict):
    """Atomic checkpoint write (tmp + os.replace): never a torn payload.
    Shared by every resume format."""
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(payload, f)
    os.replace(tmp, path)


def _restore_opt_state(model, optimizer, opt_state_np):
    """Rebind a checkpointed (numpy) optimizer state onto the model,
    resharding onto the model's mesh when present (elastic rescaling) —
    shared by every resume format."""
    import jax.numpy as jnp

    if opt_state_np is None:
        return
    opt_state = jax.tree_util.tree_map(jnp.asarray, opt_state_np)
    if getattr(model, "mesh", None) is not None:
        from multimodn_tpu.parallel.sharding import shard_opt_state
        opt_state = shard_opt_state(opt_state, model.mesh)
    model.opt_state = opt_state
    model._opt = optimizer


def _merge_history(payload_history, history):
    """Adopt or merge a checkpointed history (shared resume semantics:
    accumulated epochs are never silently dropped on a history=None
    resume)."""
    if payload_history is None:
        return history
    if history is None:
        return payload_history
    history.__dict__.update(payload_history.__dict__)
    return history


def _load_resume_payload(state_path, model, optimizer, history):
    """Restore model/optimizer/counters/history from a resume checkpoint.
    Returns (start_epoch, payload, history) — (0, None, history) when no
    checkpoint exists. Shared by fit_resumable / fit_best_resumable so the
    resume format lives in exactly one place."""
    import jax.numpy as jnp

    if not os.path.exists(state_path):
        return 0, None, history
    with open(state_path, "rb") as f:
        payload = pickle.load(f)
    model.load_state_dict(payload["model_state_dict"])
    # Elastic rescaling: the checkpoint is a mesh-free numpy pytree, so a
    # run interrupted on one device topology resumes on ANY other —
    # load_state_dict already re-placed the params on the new mesh;
    # _restore_opt_state mirrors that for the optimizer moments.
    _restore_opt_state(model, optimizer, payload.get("opt_state"))
    model._epoch_counter = payload.get("epoch_counter", payload["epoch"])
    model._cycle_offset = payload.get("cycle_offset", 0)
    history = _merge_history(payload.get("history"), history)
    return int(payload["epoch"]), payload, history


def _write_resume_payload(state_path, model, epoch, history, **extra):
    """Atomically persist the full resume state (never a torn checkpoint)."""
    payload = {
        "epoch": epoch,
        "epoch_counter": model._epoch_counter,
        "cycle_offset": model._cycle_offset,
        "model_state_dict": _to_numpy(model.params),
        "opt_state": _to_numpy(model.opt_state)
        if model.opt_state is not None else None,
        "history": history,
    }
    payload.update(extra)
    _atomic_pickle(state_path, payload)


def fit_resumable(model, train_loader, optimizer, criterion=None, *,
                  epochs: int, checkpoint_dir: str, chunk_epochs: int = 10,
                  history=None, val_loader=None, val_tag: str = "val",
                  on_chunk=None):
    """Preemption-safe training: fused ``fit`` in chunks with a full-state
    checkpoint (params + optimizer state + epoch counter + history) written
    atomically after every chunk, and automatic resume from the newest
    checkpoint when re-invoked after an interruption.

    The reference has no mid-training resume at all (its best-checkpoint
    torch.save omits optimizer state — ``mimic_single_task_pipeline.py:
    151-158``); this is the production-training extension on top of the
    framework's exact-resume checkpoints. Chunked training is numerically
    identical to issuing the same ``fit`` calls manually; a resumed run
    continues bit-for-bit from the interrupted chunk boundary
    (tests/test_resume.py).

    ``on_chunk(epochs_done, epochs_total)``: optional host callback fired
    after every chunk's checkpoint lands — the engine-agnostic progress
    pattern for fused mesh runs (unlike ``on_epoch`` it needs no in-program
    effects, so it works under every engine including shard_map; cadence
    is ``chunk_epochs``). Tested in tests/test_callbacks.py.

    Streaming-protocol loaders (StreamingLoader / torch / disk) train each
    chunk through ``fit_streaming`` instead of the fused ``fit`` —
    larger-than-memory resumable training. The streamed per-epoch rng is
    derived from the ABSOLUTE epoch counter, so chunked streaming equals
    the uninterrupted streamed run bit-for-bit with no chunk-boundary rng
    caveat (tests/test_resume.py). Train and val loaders must be the same
    kind. (``fit_best_streaming(checkpoint_dir=)`` is the streamed
    SELECTION protocol's own, finer-grained resume path.)

    Returns (history, epochs_run_this_invocation).
    """
    streaming = hasattr(train_loader, "iter_batches")
    if val_loader is not None and \
            hasattr(val_loader, "iter_batches") != streaming:
        raise ValueError(
            "mixed loaders: train and val must both be streaming "
            "(iter_batches) or both ArrayLoaders.")
    if streaming and getattr(train_loader, "shuffle", False):
        raise NotImplementedError(
            "fit_resumable cannot honor a shuffle=True streaming loader: "
            "its permutation state lives in the host loader object and is "
            "not part of the resume payload, so a resumed process would "
            "REPLAY the early epochs' permutations and silently break the "
            "bit-for-bit guarantee. Stream shuffle=False (or use an "
            "ArrayLoader — the fused path's in-program permutation is "
            "epoch-counter-derived and resumes exactly).")
    os.makedirs(checkpoint_dir, exist_ok=True)
    state_path = os.path.join(checkpoint_dir, "resume_latest.pkl")
    start, _, history = _load_resume_payload(state_path, model, optimizer,
                                             history)
    ran = 0
    while start < epochs:
        n = min(chunk_epochs, epochs - start)
        if streaming:
            from multimodn_tpu.data.streaming import fit_streaming
            history = fit_streaming(
                model, train_loader, optimizer, criterion, epochs=n,
                history=history, val_loader=val_loader, val_tag=val_tag)
        else:
            model.fit(train_loader, optimizer, criterion, epochs=n,
                      history=history, val_loader=val_loader,
                      val_tag=val_tag)
        start += n
        ran += n
        _write_resume_payload(state_path, model, start, history)
        if on_chunk is not None:
            on_chunk(start, epochs)
    return history, ran


def fit_best_resumable(model, train_loader, optimizer, criterion=None, *,
                       epochs: int, checkpoint_dir: str, val_loader,
                       chunk_epochs: int = 10, history=None,
                       val_tag: str = "val", restore_best: bool = True,
                       on_chunk=None):
    """Preemption-safe fused ``fit_best``: the north-star MIMIC protocol
    (train + val + on-device AUROC/BAC best-checkpoint selection,
    reference ``mimic_single_task_pipeline.py:141-158``) in resumable
    chunks. The running global best (params/score/global epoch) rides the
    checkpoint payload; chunk-local strictly-greater winners compose to the
    same first-max a single fused ``fit_best`` selects, so an uninterrupted
    chunked run equals one ``fit_best`` call for models whose rng stream is
    unused — i.e. dropout-free AND shuffle=False loaders. With dropout or
    shuffle=True the per-epoch rng folds restart at each chunk boundary, so
    results are chunk_epochs-dependent (still valid training, and
    kill-and-resume still equals the uninterrupted CHUNKED run bit-for-bit
    — chunk boundaries are fixed by chunk_epochs; the same caveat applies
    to ``fit_resumable``).

    Returns {"best_epoch", "best_score", "best_params", "scores",
    "history", "epochs_run"}; with ``restore_best`` the model's live params
    become the global best epoch's.
    """
    if val_loader is None:
        raise ValueError("fit_best_resumable requires a val_loader")
    os.makedirs(checkpoint_dir, exist_ok=True)
    state_path = os.path.join(checkpoint_dir, "resume_best_latest.pkl")

    best = {"params": None, "score": -np.inf, "epoch": -1}
    all_scores: list = []
    start, payload, history = _load_resume_payload(state_path, model,
                                                   optimizer, history)
    if payload is not None:
        best = payload["best"]
        all_scores = list(payload["scores"])

    ran = 0
    while start < epochs:
        n = min(chunk_epochs, epochs - start)
        res = model.fit_best(train_loader, optimizer, criterion, epochs=n,
                             val_loader=val_loader, history=history,
                             val_tag=val_tag, restore_best=False)
        if res["best_score"] > best["score"]:
            best = {"params": res["best_params"],   # already numpy
                    "score": float(res["best_score"]),
                    "epoch": start + int(res["best_epoch"])}
        all_scores.extend(float(s) for s in np.asarray(res["scores"]))
        start += n
        ran += n
        _write_resume_payload(state_path, model, start, history,
                              best=best, scores=all_scores)
        if on_chunk is not None:
            # Same contract as fit_resumable's hook (see its docstring).
            on_chunk(start, epochs)
    if restore_best and best["params"] is not None:
        model.load_state_dict(best["params"])
    return {
        "best_epoch": best["epoch"],
        "best_score": best["score"],
        "best_params": best["params"],
        "scores": np.asarray(all_scores),
        "history": history,
        "epochs_run": ran,
    }


class OrbaxCheckpointer:
    """Orbax-backed params/opt_state checkpointing (async-capable)."""

    def __init__(self, directory: str):
        import orbax.checkpoint as ocp
        self._ocp = ocp
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._ckptr = ocp.StandardCheckpointer()

    def save(self, model, step: int):
        path = os.path.join(self.directory, f"step_{step}")
        self._ckptr.save(path, _to_numpy(model.params), force=True)
        return path

    def restore(self, model, step: int):
        path = os.path.join(self.directory, f"step_{step}")
        restored = self._ckptr.restore(path, model.state_dict())
        model.load_state_dict(restored)
        return restored

    def wait(self):
        self._ckptr.wait_until_finished()

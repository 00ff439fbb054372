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
    with open(path, "wb") as f:
        pickle.dump(payload, f)
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
        os.makedirs(directory, exist_ok=True)

    def save(self, model, epoch: int, score: float, **extra) -> bool:
        """Persist if the score ranks in the best-k; returns True if saved."""
        signed = self.sign * score
        if len(self._tracked) >= self.keep and \
                signed <= min(s for s, _, _ in self._tracked):
            return False
        path = os.path.join(self.directory, f"{self.prefix}_epoch{epoch}.pkl")
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

"""ArrayLoader: turns a MultiModDataset into on-device epoch batch stacks.

The reference iterates a torch DataLoader and pays a host->device copy per
batch (``multimodn.py:132-135``). Here the whole epoch is materialized ONCE as
padded, statically-shaped arrays — ``(n_batches, B, F_m)`` per modality plus a
``(n_batches, B)`` sample mask — and placed on device (optionally sharded over
a mesh's data axis). The jitted epoch program then ``lax.scan``s over the
leading axis with zero host involvement. NaNs are preserved (they encode
missingness; the fusion core masks on them).

Padding: the final short batch is padded to the static batch size with zero
rows and ``sample_mask=0``; every loss/metric in the fusion core is
mask-exact, so results match variable-size batches bit-for-bit.
"""
from __future__ import annotations

import math
from typing import List, Optional, Tuple

import jax
import numpy as np

from multimodn_tpu.data.dataset import Subset


def _materialize(dataset) -> Tuple[List[np.ndarray], np.ndarray, Optional[np.ndarray]]:
    """Return (list of (N, F_m) float32 arrays, (N, D) targets, optional
    (N, E) encoding sequences)."""
    # Fast path: PartitionDataset-style .arrays(), optionally behind a Subset.
    if isinstance(dataset, Subset):
        base = dataset.dataset
        if hasattr(base, "arrays"):
            xs, y, seq = base.arrays()
            idx = np.asarray(dataset.indices, dtype=np.int64)
            xs = [x[idx] for x in xs]
            y = y[idx]
            seq = seq[idx] if seq is not None else None
            return [np.asarray(x, np.float32) for x in xs], np.asarray(y), seq
    if hasattr(dataset, "arrays"):
        xs, y, seq = dataset.arrays()
        return [np.asarray(x, np.float32) for x in xs], np.asarray(y), seq

    # Generic path: per-item Python loop (any MultiModDataset).
    first = dataset[0]
    has_seq = len(first) > 2
    n_mod = len(first[0])
    xs_cols: List[List[np.ndarray]] = [[] for _ in range(n_mod)]
    ys, seqs = [], []
    for i in range(len(dataset)):
        item = dataset[i]
        for m in range(n_mod):
            xs_cols[m].append(np.asarray(item[0][m], dtype=np.float32).reshape(-1))
        ys.append(np.asarray(item[1]))
        if has_seq:
            seqs.append(np.asarray(item[2]))
    xs = [np.stack(col) for col in xs_cols]
    y = np.stack(ys)
    seq = np.stack(seqs) if has_seq else None
    return xs, y, seq


class ArrayLoader:
    """Epoch-stacked, device-resident batches for the jitted epoch programs.

    Args:
        dataset: a MultiModDataset / Subset (or anything item-compatible).
        batch_size: samples per batch; 0 means full-batch (reference pipelines'
            convention — ``titanic_mlp_pipeline.py:52-57``).
        shuffle: reshuffle sample order every ``reshuffle()`` call (epoch).
        seed: shuffle seed.
        sharding: optional ``jax.sharding.Sharding`` for the batch dimension.
    """

    def __init__(self, dataset, batch_size: int = 0, shuffle: bool = False,
                 seed: int = 0, sharding=None, use_native: bool = True):
        self.dataset = dataset
        xs, y, seq = _materialize(dataset)
        # Native fast path: the C++ packer consumes the unsplit matrix.
        self._full_X, self._widths, self._row_indices = None, None, None
        if use_native:
            base, idx = dataset, None
            if isinstance(base, Subset):
                idx = np.asarray(base.indices, np.int64)
                base = base.dataset
            if hasattr(base, "full_arrays"):
                fx, widths, _fy, _fseq = base.full_arrays()
                self._full_X = np.ascontiguousarray(fx, np.float32)
                self._widths = widths
                self._row_indices = idx if idx is not None else \
                    np.arange(len(base), dtype=np.int64)
        self.n_samples = y.shape[0]
        if self.n_samples == 0:
            raise ValueError(
                "ArrayLoader got an empty dataset (0 samples) — check your "
                "split probabilities / subset indices.")
        if y.ndim == 1:
            y = y[:, None]
        self._xs = xs
        self._y = y.astype(np.int32)
        # Per-sample encoding sequences are kept whole; uniformity is
        # validated PER BATCH (after batching) in batch_sequences(), exactly
        # the reference's requirement (multimodn.py:520-523, quirk #7) —
        # batch_size=1 therefore supports fully per-sample sequences, and
        # any batch-uniform grouping works at larger batch sizes.
        self._seq = seq.astype(np.int32) if seq is not None else None
        self._batch_seq = None
        self.batch_size = batch_size if batch_size > 0 else self.n_samples
        self.shuffle = shuffle
        self._rng = np.random.default_rng(seed)
        self.sharding = sharding
        self.n_batches = max(1, math.ceil(self.n_samples / self.batch_size))
        self._order = np.arange(self.n_samples)
        self._stacks = None

    def __len__(self) -> int:
        return self.n_batches

    @property
    def modality_widths(self):
        """Per-modality feature widths (for host-side pairing checks)."""
        return [int(x.shape[1]) if x.ndim > 1 else 1 for x in self._xs]

    @property
    def encoding_sequence(self) -> Optional[np.ndarray]:
        """Globally uniform encoder order from the dataset, if any. Returns
        None when sequences vary by sample/batch — use batch_sequences()."""
        if self._seq is None or not (self._seq == self._seq[0]).all():
            return None
        return self._seq[0]

    def batch_sequences(self) -> Optional[np.ndarray]:
        """Per-batch encoder orders as an (n_batches, L) int32 array, or None
        when the dataset supplies no sequences or one globally uniform
        sequence (the fast static-order path covers that case).

        Raises the reference's error (multimodn.py:520-523) if any batch
        mixes different sequences — per-sample sequences need batch_size=1
        or a sample order that groups equal sequences into batches.
        """
        if self._seq is None or self.encoding_sequence is not None:
            return None
        if self._batch_seq is None:
            stacked = self._pad_stack(self._seq)          # (nb, B, L)
            mask = self._pad_stack(np.ones(self.n_samples, np.float32)) > 0
            rows = []
            for b in range(self.n_batches):
                real = stacked[b][mask[b]]
                if not (real == real[0]).all():
                    raise ValueError(
                        "Encoder sequence has different values across the "
                        "batch. Hint: set batch size to 1 to avoid this "
                        "error.")
                rows.append(real[0])
            self._batch_seq = np.stack(rows).astype(np.int32)
        return self._batch_seq

    def reshuffle(self):
        if self.shuffle:
            self._rng.shuffle(self._order)
            self._stacks = None
            self._host_stacks_cache = None
            self._batch_seq = None

    def _pad_stack(self, arr: np.ndarray) -> np.ndarray:
        """(N, ...) -> (n_batches, B, ...) with zero-padded tail."""
        n, B = self.n_samples, self.batch_size
        total = self.n_batches * B
        ordered = arr[self._order]
        if total > n:
            pad = np.zeros((total - n,) + arr.shape[1:], dtype=arr.dtype)
            ordered = np.concatenate([ordered, pad], axis=0)
        return ordered.reshape((self.n_batches, B) + arr.shape[1:])

    def host_stacks(self):
        """(data_tuple, targets, sample_mask) as HOST numpy arrays, no
        device transfer — for consumers that restack before placement
        (the vmapped k-fold pads and fold-stacks on host, then uploads
        once; round-tripping device arrays back through numpy would
        triple the transfer volume)."""
        if getattr(self, "_host_stacks_cache", None) is None:
            packed = None
            if self._full_X is not None:
                from multimodn_tpu.data import native
                packed = native.pack_epoch(
                    self._full_X, self._row_indices[self._order],
                    self._widths, self.batch_size, self.n_batches)
            if packed is not None:
                blocks, mask, _valid = packed
                data = tuple(blocks)
            else:
                data = tuple(self._pad_stack(x) for x in self._xs)
                mask = self._pad_stack(np.ones(self.n_samples, np.float32))
            targets = self._pad_stack(self._y)
            self._host_stacks_cache = (data, targets, mask)
        return self._host_stacks_cache

    def stacks(self):
        """Return (data_tuple, targets, sample_mask) device arrays."""
        if self._stacks is None:
            data, targets, mask = self.host_stacks()
            if self.sharding is not None:
                put = lambda a: jax.device_put(a, self.sharding)
            else:
                put = jax.device_put
            self._stacks = (tuple(put(d) for d in data), put(targets), put(mask))
        return self._stacks

    def numpy_batches(self):
        """Host-side batch iterator (data list, targets, mask) for debugging
        and for interop with non-jitted consumers."""
        data, targets, mask = self.host_stacks()
        for b in range(self.n_batches):
            yield [d[b] for d in data], targets[b], mask[b]


# Drop-in-named alias for users arriving from the reference's
# torch.utils.data.DataLoader usage.
DataLoader = ArrayLoader

"""Arbitrary optax transformations compose with the fused programs: the
`Optimizer` wrapper accepts any GradientTransformation (chains, schedules,
clipping), so users get the whole optax ecosystem — beyond the reference's
fixed torch.optim.Adam (titanic_mlp_pipeline.py:74)."""
import numpy as np
import optax

from multimodn_tpu import MultiModN, MultiModNHistory
from multimodn_tpu.data import ArrayLoader, PartitionDataset
from multimodn_tpu.decoders import LogisticDecoder
from multimodn_tpu.encoders import MLPEncoder
from multimodn_tpu.optim import Optimizer


def _setup(seed=0):
    rng = np.random.default_rng(seed)
    X = rng.normal(size=(80, 6)).astype(np.float32)
    y = (X @ rng.normal(size=6) > 0).astype(np.int64)[:, None]
    ds = PartitionDataset(X, y, [3, 3])
    tr, va, _ = ds.random_split((0.7, 0.3, 0), seed=0)
    return ArrayLoader(tr, 16), ArrayLoader(va, 16)


def _model(seed=0):
    return MultiModN(2, [MLPEncoder(2, 3, (4,)), MLPEncoder(2, 3, (4,))],
                     [LogisticDecoder(2)], 0.7, 0.3, seed=seed)


def test_clipped_adam_with_cosine_schedule_trains():
    tl, vl = _setup()
    sched = optax.cosine_decay_schedule(init_value=0.05, decay_steps=200)
    opt = Optimizer(optax.chain(optax.clip_by_global_norm(1.0),
                                optax.adam(sched)))
    m = _model()
    h = MultiModNHistory(["t"])
    m.fit(tl, opt, "cross_entropy", epochs=10, history=h)
    losses = [float(np.mean(l)) for l in h.loss["train"]]
    assert losses[-1] < losses[0]
    assert np.all(np.isfinite(losses))
    # fit_best (scan AND while_loop select programs) accept it too.
    r = m.fit_best(tl, opt, "cross_entropy", epochs=4, val_loader=vl,
                   history=h)
    assert np.isfinite(r["best_score"])
    r = m.fit_best(tl, opt, "cross_entropy", epochs=8, val_loader=vl,
                   patience=2)
    assert 1 <= r["epochs_ran"] <= 8


def test_sgd_momentum_weight_decay_chain():
    tl, _ = _setup(1)
    opt = Optimizer(optax.chain(optax.add_decayed_weights(1e-4),
                                optax.sgd(0.05, momentum=0.9)))
    m = _model(1)
    h = MultiModNHistory(["t"])
    m.train_epoch(tl, opt, "cross_entropy", h)
    m.train_epoch(tl, opt, "cross_entropy", h)
    losses = [float(np.mean(l)) for l in h.loss["train"]]
    assert losses[-1] < losses[0]

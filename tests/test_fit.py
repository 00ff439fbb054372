"""The fused multi-epoch fit() must reproduce looped train_epoch()/test()
exactly (dropout-free models; dropout draws differ by construction)."""
import numpy as np

from multimodn_tpu import Adam, MultiModN, MultiModNHistory
from multimodn_tpu.data import ArrayLoader, PartitionDataset
from multimodn_tpu.decoders import LogisticDecoder
from multimodn_tpu.encoders import MLPEncoder


def _setup(seed=0):
    rng = np.random.default_rng(seed)
    X = rng.normal(size=(60, 6)).astype(np.float32)
    y = (X @ rng.normal(size=6) > 0).astype(np.int64)[:, None]
    ds = PartitionDataset(X, y, [3, 3])
    tr, va, _ = ds.random_split((0.7, 0.3, 0), seed=0)
    return ArrayLoader(tr, 16), ArrayLoader(va, 16)


def _model():
    return MultiModN(2, [MLPEncoder(2, 3, (4,)), MLPEncoder(2, 3, (4,))],
                     [LogisticDecoder(2)], 0.7, 0.3)


def test_fit_matches_looped_epochs():
    tl, vl = _setup()
    epochs = 8

    m1 = _model()
    h1 = MultiModNHistory(["t"])
    opt1 = Adam(0.01)
    for _ in range(epochs):
        m1.train_epoch(tl, opt1, "cross_entropy", h1)
        m1.test(vl, "cross_entropy", h1, tag="val")

    m2 = _model()
    h2 = MultiModNHistory(["t"])
    m2.fit(tl, Adam(0.01), "cross_entropy", epochs=epochs, history=h2,
           val_loader=vl, val_tag="val")

    assert len(h2.loss["train"]) == epochs
    assert len(h2.loss["val"]) == epochs
    for e in range(epochs):
        np.testing.assert_allclose(h1.loss["train"][e], h2.loss["train"][e],
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(h1.loss["val"][e], h2.loss["val"][e],
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(h1.accuracy["val"][e], h2.accuracy["val"][e],
                                   rtol=1e-5, atol=1e-6)
    # Final params agree too.
    p1, p2 = m1.state_dict(), m2.state_dict()
    np.testing.assert_allclose(p1["init_state"]["value"],
                               p2["init_state"]["value"], rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(p1["encoders"][0]["layers"][0]["w"],
                               p2["encoders"][0]["layers"][0]["w"],
                               rtol=1e-5, atol=1e-6)


def test_fit_without_val():
    tl, _ = _setup(1)
    m = _model()
    h = MultiModNHistory(["t"])
    m.fit(tl, Adam(0.01), "cross_entropy", epochs=5, history=h)
    assert len(h.loss["train"]) == 5
    assert np.isfinite(h.loss["train"][-1]).all()


def test_fit_best_requires_binary_decoder():
    """fit_best's AUROC+BAC selection score is only defined for binary
    decoders; a model with none must fail loudly instead of silently
    restoring untrained initial parameters."""
    import pytest
    from multimodn_tpu.decoders import MLPDecoder
    tl, vl = _setup(2)
    model = MultiModN(2, [MLPEncoder(2, 3, (4,)), MLPEncoder(2, 3, (4,))],
                      [MLPDecoder(2, (4,), n_classes=3)], 0.7, 0.3)
    with pytest.raises(ValueError, match="binary"):
        model.fit_best(tl, Adam(0.01), "cross_entropy", epochs=2,
                       val_loader=vl)


def test_fn_cache_survives_criterion_gc():
    """Program caches must not alias a new criterion to a dead one's compiled
    program (the old id()-keyed cache could, when CPython reused the id)."""
    import gc

    from multimodn_tpu.core.losses import cross_entropy_loss

    def make_crit(scale):
        def crit(outputs, targets, mask=None):
            return scale * cross_entropy_loss(outputs, targets, mask)
        return crit

    from multimodn_tpu.optim import SGD

    tl, _ = _setup(3)
    # state_change_penalty=0 so the criterion is the ONLY gradient source;
    # momentum-free SGD so zero grads imply exactly-zero updates.
    model = MultiModN(2, [MLPEncoder(2, 3, (4,)), MLPEncoder(2, 3, (4,))],
                      [LogisticDecoder(2)], 0.7, 0.0)
    opt = SGD(0.05)
    crit1 = make_crit(1.0)
    model.train_epoch(tl, opt, crit1, None)
    del crit1
    gc.collect()
    # A zero-scaled criterion yields zero grads -> Adam update is exactly 0.
    crit2 = make_crit(0.0)
    before = model.state_dict()
    model.train_epoch(tl, opt, crit2, None)
    after = model.state_dict()
    np.testing.assert_array_equal(before["encoders"][0]["layers"][0]["w"],
                                  after["encoders"][0]["layers"][0]["w"])
    np.testing.assert_array_equal(before["init_state"]["value"],
                                  after["init_state"]["value"])


def _reshuffle_setup(n=48, batch=16, seed=7):
    rng = np.random.default_rng(seed)
    X = rng.normal(size=(n, 6)).astype(np.float32)
    y = (X @ rng.normal(size=6) > 0).astype(np.int64)[:, None]
    return PartitionDataset(X, y, [3, 3])


def test_fit_reshuffles_per_epoch_with_shuffle_loader():
    """fit() on a shuffle=True loader must apply a fresh in-program sample
    permutation per epoch — verified exactly: the fused run equals looped
    train_epoch() calls on loaders whose host-side order replays the same
    per-epoch permutations (rng derivation mirrored from make_fit_fn)."""
    import jax

    ds = _reshuffle_setup()
    epochs = 3
    n, batch = 48, 16

    m1 = _model()
    h1 = MultiModNHistory(["t"])
    m1.fit(ArrayLoader(ds, batch, shuffle=True), Adam(0.01), "cross_entropy",
           epochs=epochs, history=h1)

    # Replay: same permutations applied host-side, one train_epoch per epoch.
    m2 = _model()
    h2 = MultiModNHistory(["t"])
    opt2 = Adam(0.01)
    base_rng = jax.random.fold_in(jax.random.PRNGKey(0), 0)  # _epoch_counter=0
    for e in range(epochs):
        erng = jax.random.fold_in(base_rng, e)
        from multimodn_tpu.core.step import _PERM_FOLD
        perm = np.asarray(
            jax.random.permutation(jax.random.fold_in(erng, _PERM_FOLD), n))
        loader = ArrayLoader(ds, batch)
        loader._order = perm          # no padding: flat perm == sample order
        loader._stacks = None
        m2.train_epoch(loader, opt2, "cross_entropy", h2)

    for e in range(epochs):
        np.testing.assert_allclose(h1.loss["train"][e], h2.loss["train"][e],
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(h1.accuracy["train"][e],
                                   h2.accuracy["train"][e],
                                   rtol=1e-5, atol=1e-6)
    p1, p2 = m1.state_dict(), m2.state_dict()
    np.testing.assert_allclose(p1["encoders"][0]["layers"][0]["w"],
                               p2["encoders"][0]["layers"][0]["w"],
                               rtol=1e-5, atol=1e-6)
    # And the epochs genuinely saw different orders: a no-shuffle fit differs.
    m3 = _model()
    h3 = MultiModNHistory(["t"])
    m3.fit(ArrayLoader(ds, batch), Adam(0.01), "cross_entropy",
           epochs=epochs, history=h3)
    assert not np.allclose(h1.loss["train"][-1], h3.loss["train"][-1])


def test_fit_best_reshuffle_smoke():
    """fit_best with a shuffle loader runs and selects a real epoch."""
    ds = _reshuffle_setup(seed=8)
    tr, va, _ = ds.random_split((0.7, 0.3, 0), seed=0)
    model = _model()
    res = model.fit_best(ArrayLoader(tr, 16, shuffle=True), Adam(0.01),
                         "cross_entropy", epochs=4,
                         val_loader=ArrayLoader(va, 16))
    assert 0 <= res["best_epoch"] < 4
    assert np.isfinite(res["best_score"])


def test_fit_with_per_batch_sequences_matches_looped():
    """Fused fit() threads per-batch encoding sequences and reproduces the
    looped train_epoch()/test() path exactly."""
    from multimodn_tpu.data import PartitionDataset

    class SeqDS(PartitionDataset):
        def __init__(self, X, y, parts):
            super().__init__(X, y, parts)
            n = len(self)
            self._seqs = np.stack(
                [np.asarray([0, 1]) if i % 2 == 0 else np.asarray([1, 0])
                 for i in range(n)]).astype(np.int64)

        def __getitem__(self, i):
            xs, y = super().__getitem__(i)[:2]
            return xs, y, self._seqs[i]

        def arrays(self):
            xs, y = super().arrays()[:2]
            return xs, y, self._seqs

    rng = np.random.default_rng(9)
    X = rng.normal(size=(24, 6)).astype(np.float32)
    y = (X @ rng.normal(size=6) > 0).astype(np.int64)[:, None]
    ds = SeqDS(X, y, [3, 3])
    epochs = 3

    def build():
        return MultiModN(3, [MLPEncoder(3, 3, (4,)), MLPEncoder(3, 3, (4,))],
                         [LogisticDecoder(3)], 0.7, 0.3)

    m1, h1 = build(), MultiModNHistory(["t"])
    l1, v1 = ArrayLoader(ds, 1), ArrayLoader(ds, 1)
    assert l1.batch_sequences() is not None
    m1.fit(l1, Adam(0.01), "cross_entropy", epochs=epochs, history=h1,
           val_loader=v1, val_tag="val")

    m2, h2 = build(), MultiModNHistory(["t"])
    l2, v2 = ArrayLoader(ds, 1), ArrayLoader(ds, 1)
    opt2 = Adam(0.01)
    for _ in range(epochs):
        m2.train_epoch(l2, opt2, "cross_entropy", h2)
        m2.test(v2, "cross_entropy", h2, tag="val")

    for e in range(epochs):
        np.testing.assert_allclose(h1.loss["train"][e], h2.loss["train"][e],
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(h1.loss["val"][e], h2.loss["val"][e],
                                   rtol=1e-5, atol=1e-6)
    for a, b in zip(__import__("jax").tree_util.tree_leaves(m1.state_dict()),
                    __import__("jax").tree_util.tree_leaves(m2.state_dict())):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_fit_best_with_per_batch_sequences_runs():
    from multimodn_tpu.data import PartitionDataset

    class SeqDS(PartitionDataset):
        def __init__(self, X, y, parts):
            super().__init__(X, y, parts)
            self._seqs = np.stack(
                [np.asarray([0, 1]) if i % 2 == 0 else np.asarray([1, 0])
                 for i in range(len(self))]).astype(np.int64)

        def __getitem__(self, i):
            xs, y = super().__getitem__(i)[:2]
            return xs, y, self._seqs[i]

        def arrays(self):
            xs, y = super().arrays()[:2]
            return xs, y, self._seqs

    rng = np.random.default_rng(10)
    X = rng.normal(size=(32, 6)).astype(np.float32)
    y = (X @ rng.normal(size=6) > 0).astype(np.int64)[:, None]
    tr = SeqDS(X[:24], y[:24], [3, 3])
    va = SeqDS(X[24:], y[24:], [3, 3])
    model = MultiModN(3, [MLPEncoder(3, 3, (4,)), MLPEncoder(3, 3, (4,))],
                      [LogisticDecoder(3)], 0.7, 0.3)
    res = model.fit_best(ArrayLoader(tr, 1), Adam(0.01), "cross_entropy",
                         epochs=3, val_loader=ArrayLoader(va, 1))
    assert 0 <= res["best_epoch"] < 3
    assert np.isfinite(res["best_score"])


def test_fit_reshuffle_with_padded_tail_matches_manual_replay():
    """Padded rows (mask=0) travel with the in-program permutation into
    arbitrary batches; grids must equal a host-side replay of the same
    permutation applied to the padded epoch stacks."""
    import jax
    import jax.numpy as jnp

    from multimodn_tpu.core.losses import resolve_criterion
    from multimodn_tpu.core.step import epoch_permute, make_train_epoch_fn

    ds = _reshuffle_setup(n=50)           # 50 % 16 != 0 -> padded tail
    batch, epochs = 16, 2
    m1 = _model()
    h1 = MultiModNHistory(["t"])
    m1.fit(ArrayLoader(ds, batch, shuffle=True), Adam(0.01), "cross_entropy",
           epochs=epochs, history=h1)

    # Replay: identical permutations applied to the PADDED stacks, then the
    # single-epoch train program on the permuted arrays.
    m2 = _model()
    loader = ArrayLoader(ds, batch)
    data, targets, mask = loader.stacks()
    criterion = resolve_criterion("cross_entropy")
    order = tuple((i, i) for i in range(2))
    loss_fn = m2._loss_fn(criterion, order, m2.nan_skip)
    opt = Adam(0.01)
    opt_state = opt.init(m2.params)
    fn = make_train_epoch_fn(loss_fn, opt.tx, donate=False, scan_unroll=1)
    from multimodn_tpu.core.step import epoch_reduction
    params = m2.params
    base_rng = jax.random.fold_in(jax.random.PRNGKey(0), 0)
    h2 = []
    for e in range(epochs):
        erng = jax.random.fold_in(base_rng, e)
        d, t, m = epoch_permute(data, targets, mask, erng)
        params, opt_state, sums, _ = fn(params, opt_state, d, t, m, erng)
        stats = jax.tree_util.tree_map(
            np.asarray, epoch_reduction(sums, loader.n_batches, True))
        h2.append(stats["loss"])

    for e in range(epochs):
        np.testing.assert_allclose(h1.loss["train"][e], h2[e],
                                   rtol=1e-5, atol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(m1.state_dict()),
                    jax.tree_util.tree_leaves(
                        jax.tree_util.tree_map(np.asarray, params))):
        np.testing.assert_allclose(np.asarray(a), b, rtol=1e-5, atol=1e-6)


class _UniformSeqDS(PartitionDataset):
    """Every sample carries the same NON-identity sequence [1, 0]."""

    def __init__(self, X, y, parts):
        super().__init__(X, y, parts)
        self._seq = np.asarray([1, 0], np.int64)

    def __getitem__(self, i):
        xs, y = super().__getitem__(i)[:2]
        return xs, y, self._seq

    def arrays(self):
        xs, y = super().arrays()[:2]
        return xs, y, np.tile(self._seq[None, :], (len(self), 1))


def test_fused_fit_best_respects_uniform_val_sequence():
    """A val loader with a globally-uniform NON-identity sequence must drive
    that order in per-batch mode (regression: it was silently replaced by
    identity when the train loader carried per-batch sequences)."""
    from tests.test_fit import _UniformSeqDS  # self-import for clarity

    rng = np.random.default_rng(11)
    X = rng.normal(size=(32, 6)).astype(np.float32)
    y = (X @ rng.normal(size=6) > 0).astype(np.int64)[:, None]

    class PerSampleDS(PartitionDataset):
        def __init__(self, X, y, parts):
            super().__init__(X, y, parts)
            self._seqs = np.stack(
                [np.asarray([0, 1]) if i % 2 == 0 else np.asarray([1, 0])
                 for i in range(len(self))]).astype(np.int64)

        def __getitem__(self, i):
            xs, y = super().__getitem__(i)[:2]
            return xs, y, self._seqs[i]

        def arrays(self):
            xs, y = super().arrays()[:2]
            return xs, y, self._seqs

    tr = PerSampleDS(X[:24], y[:24], [3, 3])
    va = _UniformSeqDS(X[24:], y[24:], [3, 3])

    def build():
        return MultiModN(3, [MLPEncoder(3, 3, (4,)), MLPEncoder(3, 3, (4,))],
                         [LogisticDecoder(3)], 0.7, 0.3)

    # Fused: per-batch train sequences + uniform [1,0] val sequence.
    m1, h1 = build(), MultiModNHistory(["t"])
    m1.fit(ArrayLoader(tr, 1), Adam(0.01), "cross_entropy", epochs=2,
           history=h1, val_loader=ArrayLoader(va, 8), val_tag="val")
    # Looped ground truth: train_epoch / test with the same loaders.
    m2, h2 = build(), MultiModNHistory(["t"])
    opt = Adam(0.01)
    l_tr, l_va = ArrayLoader(tr, 1), ArrayLoader(va, 8)
    for _ in range(2):
        m2.train_epoch(l_tr, opt, "cross_entropy", h2)
        m2.test(l_va, "cross_entropy", h2, tag="val")
    for e in range(2):
        np.testing.assert_allclose(h1.loss["val"][e], h2.loss["val"][e],
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(h1.loss["train"][e], h2.loss["train"][e],
                                   rtol=1e-5, atol=1e-6)


def test_fit_shuffle_with_val_only_sequences_allowed():
    """shuffle=True + per-batch sequences on the VAL side only is legal
    (epoch_permute touches train arrays only)."""
    rng = np.random.default_rng(12)
    X = rng.normal(size=(48, 6)).astype(np.float32)
    y = (X @ rng.normal(size=6) > 0).astype(np.int64)[:, None]
    tr = PartitionDataset(X[:32], y[:32], [3, 3])

    class PerSampleDS(PartitionDataset):
        def __init__(self, X, y, parts):
            super().__init__(X, y, parts)
            self._seqs = np.stack(
                [np.asarray([0, 1]) if i % 2 == 0 else np.asarray([1, 0])
                 for i in range(len(self))]).astype(np.int64)

        def __getitem__(self, i):
            xs, y = super().__getitem__(i)[:2]
            return xs, y, self._seqs[i]

        def arrays(self):
            xs, y = super().arrays()[:2]
            return xs, y, self._seqs

    va = PerSampleDS(X[32:], y[32:], [3, 3])
    model = _model()
    h = MultiModNHistory(["t"])
    model.fit(ArrayLoader(tr, 16, shuffle=True), Adam(0.01), "cross_entropy",
              epochs=2, history=h, val_loader=ArrayLoader(va, 1))
    assert np.isfinite(h.loss["val"][-1]).all()
    # Train-side per-batch sequences + shuffle still raise.
    import pytest
    tr_seq = PerSampleDS(X[:32], y[:32], [3, 3])
    with pytest.raises(ValueError, match="shuffle=True"):
        model.fit(ArrayLoader(tr_seq, 1, shuffle=True), Adam(0.01),
                  "cross_entropy", epochs=2)


def test_unhashable_criterion_accepted():
    """Criteria defining __eq__ without __hash__ (unhashable) must still
    work through every cached entry point (regression for object-keyed
    program caches)."""
    from multimodn_tpu.core.losses import cross_entropy_loss

    class WeirdLoss:
        _accepts_mask = True

        def __call__(self, outputs, targets, mask=None):
            return cross_entropy_loss(outputs, targets, mask)

        def __eq__(self, other):
            return isinstance(other, WeirdLoss)

        __hash__ = None  # explicitly unhashable

    tl, vl = _setup(4)
    model = _model()
    crit = WeirdLoss()
    h = MultiModNHistory(["t"])
    model.train_epoch(tl, Adam(0.01), crit, h)
    model.test(vl, crit, h, tag="val")
    model.fit(tl, Adam(0.01), crit, epochs=2, history=h)
    assert np.isfinite(h.loss["train"][-1]).all()


def test_fused_fit_rejects_unrolled_host_shuffle():
    """shuffle_mode on the unrolled chain cannot be expressed in one fused
    program (the order would freeze for every epoch) — must raise."""
    import pytest

    tl, _ = _setup(5)
    model = MultiModN(2, [MLPEncoder(2, 3, (4,)), MLPEncoder(2, 3, (4,))],
                      [LogisticDecoder(2)], 0.7, 0.3, shuffle_mode=True,
                      chain_mode="unrolled")
    with pytest.raises(NotImplementedError, match="host-side"):
        model.fit(tl, Adam(0.01), "cross_entropy", epochs=2)


def test_fused_reshuffle_rejects_unbatched_recurrent_with_padding():
    """In-program reshuffle + padded tail + across-batch recurrence would
    feed real samples through interior zero rows — must raise."""
    import pytest

    from multimodn_tpu.encoders import LSTMEncoder

    ds = _reshuffle_setup(n=50)              # 50 % 16 != 0 -> padded tail
    model = MultiModN(2, [LSTMEncoder(2, 6, (5,))], [LogisticDecoder(2)],
                      0.7, 0.3)
    ds2 = PartitionDataset(
        np.random.default_rng(0).normal(size=(50, 6)).astype(np.float32),
        np.zeros((50, 1), np.int64), [6])
    with pytest.raises(ValueError, match="unbatched-compat"):
        model.fit(ArrayLoader(ds2, 16, shuffle=True), Adam(0.01),
                  "cross_entropy", epochs=2)


def test_seed_changes_in_program_randomness():
    """Different model seeds must draw different dropout/permutation streams
    (regression: everything derived from PRNGKey(0))."""
    from multimodn_tpu.encoders import MIMICMLPEncoder

    rng = np.random.default_rng(6)
    X = rng.normal(size=(32, 6)).astype(np.float32)
    y = (X @ rng.normal(size=6) > 0).astype(np.int64)[:, None]
    ds = PartitionDataset(X, y, [3, 3])

    outs = []
    for seed in (0, 1):
        model = MultiModN(3, [MIMICMLPEncoder(3, 3, (4,), dropout=0.5),
                              MIMICMLPEncoder(3, 3, (4,), dropout=0.5)],
                          [LogisticDecoder(3)], 1.0, 0.0, seed=seed)
        # Same INITIAL weights for both: transplant seed-0's params.
        if seed == 0:
            p0 = model.state_dict()
        else:
            model.load_state_dict(p0)
        model.train_epoch(ArrayLoader(ds, 16), Adam(0.01), "cross_entropy")
        outs.append(model.state_dict()["encoders"][0]["layers"][0]["w"])
    assert not np.allclose(outs[0], outs[1])   # dropout masks differed


def test_mismatched_pairing_widths_rejected():
    """A sequence pairing a modality with a different-width encoder raises
    (the reference crashes on the matmul; silent pad/truncate is worse)."""
    import pytest

    rng = np.random.default_rng(7)
    X = rng.normal(size=(16, 5)).astype(np.float32)
    y = np.zeros((16, 1), np.int64)

    class SeqDS(PartitionDataset):
        def __getitem__(self, i):
            xs, yv = super().__getitem__(i)[:2]
            return xs, yv, np.asarray([1, 0], np.int64)

        def arrays(self):
            xs, yv = super().arrays()[:2]
            return xs, yv, np.tile(np.asarray([[1, 0]], np.int64),
                                   (len(self), 1))

    ds = SeqDS(X, y, [3, 2])   # widths 3, 2 — encoders sized 3, 2: seq [1,0]
    loader = ArrayLoader(ds, 16)
    model = MultiModN(2, [MLPEncoder(2, 3, (4,)), MLPEncoder(2, 2, (4,))],
                      [LogisticDecoder(2)], 0.7, 0.3)
    with pytest.raises(ValueError, match="widths must match"):
        model.train_epoch(loader, Adam(0.01), "cross_entropy")


def test_adam_bf16_state_dtype():
    """Adam(state_dtype=bf16) stores moments in bf16 (HBM-traffic option,
    RESULTS.md roofline) and tracks fp32-Adam training closely."""
    import jax
    import jax.numpy as jnp
    from multimodn_tpu import Adam, MultiModN, MultiModNHistory
    from multimodn_tpu.data import ArrayLoader, PartitionDataset
    from multimodn_tpu.decoders import LogisticDecoder
    from multimodn_tpu.encoders import MLPEncoder

    rng = np.random.default_rng(0)
    X = rng.normal(size=(64, 6)).astype(np.float32)
    y = (X @ rng.normal(size=6) > 0).astype(np.int64)[:, None]
    ds = PartitionDataset(X, y, [3, 3])

    def build():
        return MultiModN(3, [MLPEncoder(3, 3, (4,)), MLPEncoder(3, 3, (4,))],
                         [LogisticDecoder(3)], 0.7, 0.3)

    m32, m16 = build(), build()
    h32, h16 = MultiModNHistory(["t"]), MultiModNHistory(["t"])
    m32.fit(ArrayLoader(ds, 16), Adam(0.01), "cross_entropy", epochs=5,
            history=h32)
    m16.fit(ArrayLoader(ds, 16), Adam(0.01, state_dtype=jnp.bfloat16),
            "cross_entropy", epochs=5, history=h16)
    moments = jax.tree_util.tree_leaves(m16.opt_state["m"])
    assert all(x.dtype == jnp.bfloat16 for x in moments)
    # Not bit-equal (that's the point), but the trajectory must track fp32.
    np.testing.assert_allclose(np.asarray(h32.loss["train"][-1]),
                               np.asarray(h16.loss["train"][-1]),
                               rtol=0.05, atol=0.02)


def test_fused_fit_honors_val_loader_sequence():
    """Review finding: fused fit/fit_best evaluated the val loader under
    the TRAIN loader's encoder order. A val loader with its own uniform
    sequence must match looped train_epoch + test exactly."""
    import jax.numpy as jnp
    from multimodn_tpu import MultiModN, MultiModNHistory, Adam
    from multimodn_tpu.data import ArrayLoader, PartitionDataset
    from multimodn_tpu.decoders import LogisticDecoder
    from multimodn_tpu.encoders import MLPEncoder
    from tests.test_order import SeqDataset

    rng = np.random.default_rng(61)
    X = rng.normal(size=(64, 6)).astype(np.float32)
    y = (X @ rng.normal(size=6) > 0).astype(np.int64)[:, None]
    train_ds = PartitionDataset(X[:48], y[:48], [3, 3])       # identity
    val_ds = SeqDataset(X[48:], y[48:], [3, 3], [1, 0])       # swapped

    def build():
        return MultiModN(3, [MLPEncoder(3, 3, (4,)), MLPEncoder(3, 3, (4,))],
                         [LogisticDecoder(3)], 0.7, 0.3)

    m_loop, m_fused = build(), build()
    h_loop, h_fused = MultiModNHistory(["t"]), MultiModNHistory(["t"])
    opt = Adam(0.01)
    for _ in range(3):
        m_loop.train_epoch(ArrayLoader(train_ds, 16), opt, "cross_entropy",
                           h_loop)
        m_loop.test(ArrayLoader(val_ds, 16), "cross_entropy", h_loop,
                    tag="val")
    m_fused.fit(ArrayLoader(train_ds, 16), Adam(0.01), "cross_entropy",
                epochs=3, history=h_fused, val_loader=ArrayLoader(val_ds, 16))
    for e in range(3):
        np.testing.assert_allclose(np.asarray(h_loop.loss["val"][e]),
                                   np.asarray(h_fused.loss["val"][e]),
                                   rtol=1e-5, atol=1e-6)


def test_per_batch_sequences_identity_order_not_falsely_rejected():
    """Review finding: _validate_pairings checked the never-executed static
    identity order in per-batch mode, rejecting width-valid configs."""
    from multimodn_tpu import MultiModN, MultiModNHistory, Adam
    from multimodn_tpu.data import ArrayLoader, PartitionDataset
    from multimodn_tpu.decoders import LogisticDecoder
    from multimodn_tpu.encoders import MLPEncoder

    class BatchSeqDS(PartitionDataset):
        """Rows alternate per 8-sample block between the two width-valid
        non-identity orders; the identity order is width-INVALID."""
        _rows = np.asarray([[0, 2, 1], [2, 0, 1]], np.int64)

        def __getitem__(self, i):
            xs, y = super().__getitem__(i)[:2]
            return xs, y, self._rows[(i // 8) % 2]

        def arrays(self):
            xs, y = super().arrays()[:2]
            seq = np.stack([self._rows[(i // 8) % 2]
                            for i in range(len(self))])
            return xs, y, seq

    rng = np.random.default_rng(62)
    X = rng.normal(size=(32, 11)).astype(np.float32)
    y = (X @ rng.normal(size=11) > 0).astype(np.int64)[:, None]
    ds = BatchSeqDS(X, y, [3, 3, 5])
    # widths [3,3,5]; encoders n_features [3,5,3]: identity pairing (1->1)
    # is invalid (3 vs 5), but both actual rows are width-valid.
    m = MultiModN(3, [MLPEncoder(3, 3, (4,)), MLPEncoder(3, 5, (4,)),
                      MLPEncoder(3, 3, (4,))],
                  [LogisticDecoder(3)], 0.7, 0.3)
    h = MultiModNHistory(["t"])
    m.train_epoch(ArrayLoader(ds, 8), Adam(0.01), "cross_entropy", h)
    assert np.isfinite(np.asarray(h.loss["train"][-1])).all()

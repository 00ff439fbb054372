"""8-bit blockwise-quantized Adam (ops/fused_adam.py + optim.Adam8bit).

Covers: quantization error bounds, first-step exactness vs fp32 Adam,
Pallas-interpret == jnp-path equality, convergence parity on a real
training run, torch structural-skip gating semantics, and the vmap-safety
guard on the experiment programs.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodn_tpu import Adam, Adam8bit, MultiModN, MultiModNHistory
from multimodn_tpu.data import ArrayLoader, PartitionDataset
from multimodn_tpu.decoders import LogisticDecoder
from multimodn_tpu.encoders import MLPEncoder
from multimodn_tpu.ops import fused_adam as fa


def test_quantize_roundtrip_error_bound_int8():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(64, 96)).astype(np.float32)) * 3.0
    q, s = fa.quantize_rows(x, fmt="int8")
    assert q.dtype == jnp.int8 and s.shape == (64, 1)
    err = np.abs(np.asarray(fa.dequantize(q, s)) - np.asarray(x))
    # Per-row bound: half a quantization step = absmax/254.
    bound = np.max(np.abs(np.asarray(x)), axis=1, keepdims=True) / 254.0
    assert np.all(err <= bound + 1e-7)


def test_quantize_roundtrip_error_bound_fp8():
    """fp8 codes: RELATIVE error bound per element (e4m3 has 3 mantissa
    bits -> half-step rel error 2^-4), plus absolute floor from the
    subnormal range around the per-row scale."""
    rng = np.random.default_rng(7)
    # Mix magnitudes ORDERS apart within a row (the int8 failure mode).
    x = rng.normal(size=(32, 64)).astype(np.float32)
    x[:, ::2] *= 1e-4
    x = jnp.asarray(x)
    q, s = fa.quantize_rows(x)  # default fmt='fp8'
    assert q.dtype == jnp.float8_e4m3fn
    xd = np.asarray(fa.dequantize(q, s))
    xn = np.asarray(x)
    absmax = np.max(np.abs(xn), axis=1, keepdims=True)
    rel = np.abs(xd - xn) / (np.abs(xn) + absmax * 2.0 ** -10)
    assert np.all(rel <= 2.0 ** -4 + 1e-3)


def test_quantize_zero_rows():
    x = jnp.zeros((8, 16), jnp.float32)
    q, s = fa.quantize_rows(x)
    assert np.all(np.asarray(q) == 0) and np.all(np.asarray(s) == 0)
    np.testing.assert_array_equal(np.asarray(fa.dequantize(q, s)), 0.0)


def _fresh_leaf_state(shape, fmt="fp8"):
    qdt = fa.code_dtype(fmt)
    return (jnp.zeros(shape, qdt),
            jnp.zeros(fa.scale_shape(shape), jnp.float32),
            jnp.zeros(shape, qdt),
            jnp.zeros(fa.scale_shape(shape), jnp.float32))


def test_first_step_exact_vs_fp32_adam():
    """With zero moments the int8 state quantizes losslessly, so step 1's
    parameter update must EQUAL fp32 Adam's (error enters only through the
    moment history)."""
    rng = np.random.default_rng(1)
    p = jnp.asarray(rng.normal(size=(40, 24)).astype(np.float32))
    g = jnp.asarray(rng.normal(size=(40, 24)).astype(np.float32))
    lr, b1, b2, eps = 0.01, 0.9, 0.999, 1e-8
    mq, ms, vq, vs = _fresh_leaf_state(p.shape)
    c12 = jnp.asarray([[1 - b1, 1 - b2]], jnp.float32)
    p1, *_ = fa.leaf_update(p, g, mq, ms, vq, vs, c12, lr=lr, b1=b1,
                            b2=b2, eps=eps, mode="xla")
    # fp32 Adam step 1: m=(1-b1)g, v=(1-b2)g^2, hat = m/(1-b1), etc.
    m_hat = g
    v_hat = g * g
    expect = p - lr * m_hat / (jnp.sqrt(v_hat) + eps)
    np.testing.assert_allclose(np.asarray(p1), np.asarray(expect),
                               rtol=1e-6, atol=1e-7)


@pytest.mark.parametrize("fmt", ["fp8", "int8"])
def test_pallas_interpret_matches_xla_path(fmt):
    rng = np.random.default_rng(2)
    shape = (48, 80)
    p = jnp.asarray(rng.normal(size=shape).astype(np.float32))
    g = jnp.asarray(rng.normal(size=shape).astype(np.float32))
    lr, b1, b2, eps = 0.003, 0.9, 0.999, 1e-8
    mq, ms, vq, vs = _fresh_leaf_state(shape, fmt)
    # Advance two steps so the quantized-history path is exercised.
    for t in (1, 2):
        c12 = jnp.asarray([[1 - b1 ** t, 1 - b2 ** t]], jnp.float32)
        xla = fa.leaf_update(p, g, mq, ms, vq, vs, c12, lr=lr, b1=b1,
                             b2=b2, eps=eps, mode="xla", fmt=fmt)
        itp = fa.leaf_update(p, g, mq, ms, vq, vs, c12, lr=lr, b1=b1,
                             b2=b2, eps=eps, mode="interpret", fmt=fmt)
        for a, b in zip(xla, itp):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-6, atol=1e-7)
        p, mq, ms, vq, vs = xla
        g = g * 0.7 + 0.1  # vary the gradient between steps


def test_leaf_update_1d_and_3d_shapes():
    lr, b1, b2, eps = 0.01, 0.9, 0.999, 1e-8
    c12 = jnp.asarray([[1 - b1, 1 - b2]], jnp.float32)
    for shape in [(33,), (3, 10, 7)]:
        rng = np.random.default_rng(hash(shape) % 2**31)
        p = jnp.asarray(rng.normal(size=shape).astype(np.float32))
        g = jnp.asarray(rng.normal(size=shape).astype(np.float32))
        mq, ms, vq, vs = _fresh_leaf_state(shape)
        out = fa.leaf_update(p, g, mq, ms, vq, vs, c12, lr=lr, b1=b1,
                             b2=b2, eps=eps, mode="xla")
        assert out[0].shape == shape and out[1].shape == shape
        assert out[2].shape == fa.scale_shape(shape)
        assert np.all(np.isfinite(np.asarray(out[0])))


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


def test_training_converges_like_fp32_adam():
    tl, vl = _setup()
    epochs = 12

    m32 = _model()
    h32 = MultiModNHistory(["t"])
    m32.fit(tl, Adam(0.01), "cross_entropy", epochs=epochs, history=h32)

    m8 = _model()
    h8 = MultiModNHistory(["t"])
    m8.fit(tl, Adam8bit(0.01), "cross_entropy", epochs=epochs, history=h8)

    l32 = np.mean(h32.loss["train"][-1])
    l8 = np.mean(h8.loss["train"][-1])
    l0 = np.mean(h8.loss["train"][0])
    assert l8 < l0, "8-bit Adam failed to reduce the training loss"
    # fp8 codes track the fp32 trajectory tightly (measured: 4 decimals
    # on the titanic drive; keep head-room for config drift).
    assert abs(l8 - l32) < 0.02 * abs(l32) + 0.005


def test_int8_fmt_runs_but_is_not_default():
    """fmt='int8' must stay mechanically correct (finite, loss moves);
    its convergence GAP on mixed-magnitude rows is the documented reason
    fp8 is the default (ops/fused_adam.quantize_rows docstring)."""
    tl, _ = _setup(9)
    m = _model()
    h = MultiModNHistory(["t"])
    m.fit(tl, Adam8bit(0.01, fmt="int8"), "cross_entropy", epochs=4,
          history=h)
    assert np.isfinite(np.mean(h.loss["train"][-1]))
    assert Adam8bit(0.01).signature[-1] == "fp8"


def test_train_epoch_path_and_protocol_update():
    """Looped train_epoch (gated_update fused branch) and the optax-protocol
    tx.update both work and agree with each other's state evolution."""
    tl, _ = _setup(3)
    m = _model()
    h = MultiModNHistory(["t"])
    opt = Adam8bit(0.02)
    m.train_epoch(tl, opt, "cross_entropy", h)
    assert np.isfinite(np.mean(h.loss["train"][-1]))

    # Protocol path: update() returns (updates, state) like optax.
    params = {"w": jnp.ones((4, 8)), "b": jnp.zeros((8,))}
    tx = Adam8bit(0.1).tx
    st = tx.init(params)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    upd, st2 = tx.update(grads, st, params)
    stepped = jax.tree_util.tree_map(lambda p, u: p + u, params, upd)
    assert float(st2["t"]) == 1.0
    # Step-1 Adam with all-ones grads moves every weight by ~ -lr.
    np.testing.assert_allclose(np.asarray(stepped["w"]),
                               1.0 - 0.1 / (1.0 + 1e-8), rtol=1e-5)


def test_batch_nan_skip_gating_freezes_moments():
    """nan_skip='batch' + a modality that is NaN in some batches: the
    skipped encoder's int8 moments and group step count must stay frozen
    (torch None-grad semantics), exactly like optim.Adam's gating."""
    rng = np.random.default_rng(4)
    X = rng.normal(size=(32, 6)).astype(np.float32)
    X[:, 3:] = np.nan  # second modality always NaN -> always skipped
    y = (X[:, 0] > 0).astype(np.int64)[:, None]
    ds = PartitionDataset(X, y, [3, 3])
    tl = ArrayLoader(ds, 16)

    m = MultiModN(2, [MLPEncoder(2, 3, (4,)), MLPEncoder(2, 3, (4,))],
                  [LogisticDecoder(2)], 0.7, 0.3, nan_skip="batch")
    h = MultiModNHistory(["t"])
    opt = Adam8bit(0.01)
    before = jax.tree_util.tree_map(
        np.asarray, m.state_dict()["encoders"][1])
    m.train_epoch(tl, opt, "cross_entropy", h)
    m.train_epoch(tl, opt, "cross_entropy", h)
    after = jax.tree_util.tree_map(np.asarray, m.state_dict()["encoders"][1])
    for b, a in zip(jax.tree_util.tree_leaves(before),
                    jax.tree_util.tree_leaves(after)):
        np.testing.assert_array_equal(b, a)
    st = m.opt_state
    t_enc = st["t_enc"]
    t_enc = np.asarray(t_enc if not isinstance(t_enc, list)
                       else [np.asarray(x) for x in t_enc])
    assert t_enc.shape[0] == 2
    assert t_enc[1] == 0.0, "skipped encoder's group step count advanced"
    assert t_enc[0] > 0.0


def test_fit_best_and_checkpoint_roundtrip():
    tl, vl = _setup(5)
    m = _model()
    h = MultiModNHistory(["t"])
    m.fit_best(tl, Adam8bit(0.01), "cross_entropy", epochs=4,
               val_loader=vl, history=h)
    import pickle
    blob = pickle.loads(pickle.dumps(jax.tree_util.tree_map(
        np.asarray, m.opt_state)))
    assert blob["mq"]["encoders"] is not None


def test_vmapped_experiments_reject_pallas_mode():
    from multimodn_tpu.experiments import sweep_fit_best
    tl, vl = _setup(6)
    with pytest.raises(NotImplementedError, match="vmap-safe"):
        sweep_fit_best(lambda s: _model(), tl, vl,
                       Adam8bit(0.01, mode="pallas"),
                       "cross_entropy", epochs=2, seeds=[0, 1])
    # The default (auto == the XLA path) is vmap-safe and trains.
    res = sweep_fit_best(lambda s: _model(), tl, vl, Adam8bit(0.01),
                         "cross_entropy", epochs=2, seeds=[0, 1])
    assert len(res) == 2
    assert all(np.isfinite(r["best_score"]) for r in res)


def _identity_quant_state(params):
    """Adam8bit state with f32 'codes' and unit scales — makes the
    quantization a no-op so the two gated drivers' SEMANTICS can be
    compared exactly."""
    tm = jax.tree_util.tree_map
    enc = params.get("encoders") if isinstance(params, dict) else None
    if enc is None:
        t_enc = None
    elif not isinstance(enc, (list, tuple)):
        t_enc = jnp.zeros((jax.tree_util.tree_leaves(enc)[0].shape[0],))
    else:
        t_enc = [jnp.zeros(()) for _ in enc]
    return {"mq": tm(lambda p: jnp.zeros(p.shape, jnp.float32), params),
            "ms": tm(lambda p: jnp.ones(fa.scale_shape(p.shape),
                                        jnp.float32), params),
            "vq": tm(lambda p: jnp.zeros(p.shape, jnp.float32), params),
            "vs": tm(lambda p: jnp.ones(fa.scale_shape(p.shape),
                                        jnp.float32), params),
            "t": jnp.zeros(()), "t_enc": t_enc}


@pytest.mark.parametrize("layout", ["stacked", "list"])
def test_gated_driver_matches_torch_adam_semantics(monkeypatch, layout):
    """optim._adam8bit duplicates _torch_adam's gated (structural-skip)
    driver for the quantized state layout. With quantization disabled
    (identity codes), the two MUST evolve params and group step counts
    identically — this test enforces that the drivers stay in sync
    (plain + gated, stacked and per-encoder-list storage)."""
    monkeypatch.setattr(
        fa, "quantize_rows",
        lambda x, fmt="fp8": (x.astype(jnp.float32),
                              jnp.ones(fa.scale_shape(x.shape),
                                       jnp.float32)))
    rng = np.random.default_rng(11)

    def arr(*shape):
        return jnp.asarray(rng.normal(size=shape).astype(np.float32))

    if layout == "stacked":
        params = {"encoders": {"w": arr(3, 4, 6), "b": arr(3, 6)},
                  "init_state": {"value": arr(1, 5)}}
        gate_seq = [None if g is None else jnp.asarray(g, jnp.float32)
                    for g in ([1, 0, 1], [0, 0, 1], [1, 1, 1], None,
                              [0, 1, 0])]
    else:
        params = {"encoders": [{"w": arr(4, 6)}, {"w": arr(4, 6)}],
                  "head": arr(5, 2)}
        gate_seq = [None if g is None else jnp.asarray(g, jnp.float32)
                    for g in ([1, 0], [0, 1], None, [1, 1], [0, 0])]

    adam = Adam(0.01)
    a_st = adam.tx.init(params)
    a8 = Adam8bit(0.01)
    st8 = _identity_quant_state(params)
    p_a, p_8 = params, params
    for gates in gate_seq:
        g = jax.tree_util.tree_map(
            lambda p: jnp.asarray(rng.normal(size=p.shape).astype(
                np.float32)), params)
        upd, a_st = adam.tx.update(g, a_st, p_a, enc_gates=gates)
        p_a = jax.tree_util.tree_map(lambda p, u: p + u, p_a, upd)
        p_8, st8 = a8.tx.fused_apply(g, st8, p_8, enc_gates=gates)
    for x, y in zip(jax.tree_util.tree_leaves(p_a),
                    jax.tree_util.tree_leaves(p_8)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=1e-6, atol=1e-7)
    te_a, te_8 = a_st["t_enc"], st8["t_enc"]
    if isinstance(te_a, list):
        te_a, te_8 = jnp.stack(te_a), jnp.stack(te_8)
    np.testing.assert_array_equal(np.asarray(te_a), np.asarray(te_8))


def test_scalar_leaf_shapes_preserved():
    """0-d param leaves must keep their shape through init + update
    (review finding: scale_shape(()) used to be (1,), corrupting the
    carry structure on the second step)."""
    params = {"s": jnp.asarray(2.0), "w": jnp.ones((3, 4))}
    tx = Adam8bit(0.1).tx
    st = tx.init(params)
    assert st["mq"]["s"].shape == () and st["ms"]["s"].shape == ()
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    for _ in range(2):
        params, st = tx.fused_apply(grads, st, params)
    assert params["s"].shape == () and st["mq"]["s"].shape == ()
    assert np.isfinite(float(params["s"]))


def test_mode_and_fmt_validation():
    with pytest.raises(ValueError, match="mode"):
        Adam8bit(0.01, mode="XLA")
    with pytest.raises(ValueError, match="fmt"):
        Adam8bit(0.01, fmt="fp16")
    with pytest.raises(ValueError, match="mode"):
        fa.leaf_update(jnp.ones((4, 4)), jnp.ones((4, 4)),
                       *_fresh_leaf_state((4, 4)),
                       jnp.asarray([[0.1, 0.001]], jnp.float32),
                       lr=0.01, b1=0.9, b2=0.999, eps=1e-8, mode="palas")


def test_shard_map_engine_matches_auto_with_adam8bit():
    """dp_engine='shard_map' routes through its own update site
    (parallel/shard_map_step._sm_batch_update) — with Adam8bit it must
    take the fused_apply branch and still equal the auto engine."""
    from multimodn_tpu.parallel import make_mesh

    rng = np.random.default_rng(12)
    n = 8 * len(jax.devices())
    X = rng.normal(size=(n, 6)).astype(np.float32)
    y = (X @ rng.normal(size=6) > 0).astype(np.int64)[:, None]
    ds = PartitionDataset(X, y, [3, 3])
    mesh = make_mesh(axis_names=("data",))

    def build(engine):
        return MultiModN(3, [MLPEncoder(3, 3, (4,)), MLPEncoder(3, 3, (4,))],
                         [LogisticDecoder(3)], 0.7, 0.3, mesh=mesh,
                         dp_engine=engine)

    m_auto, m_expl = build("auto"), build("shard_map")
    h_auto, h_expl = MultiModNHistory(["t"]), MultiModNHistory(["t"])
    opt_a, opt_e = Adam8bit(0.01), Adam8bit(0.01)
    for _ in range(3):
        m_auto.train_epoch(ArrayLoader(ds, 16), opt_a, "cross_entropy",
                           h_auto)
        m_expl.train_epoch(ArrayLoader(ds, 16), opt_e, "cross_entropy",
                           h_expl)
    for e in range(3):
        np.testing.assert_allclose(h_auto.loss["train"][e],
                                   h_expl.loss["train"][e],
                                   rtol=1e-5, atol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(m_auto.state_dict()),
                    jax.tree_util.tree_leaves(m_expl.state_dict())):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_fit_resumable_adam8bit_kill_and_resume(tmp_path):
    """Preemption-safe resume with the QUANTIZED optimizer state: the
    checkpoint must roundtrip fp8 code arrays and a fresh process must
    continue bit-exactly (same contract as Adam, tests/test_resume.py)."""
    from multimodn_tpu.checkpoint import fit_resumable

    rng = np.random.default_rng(13)
    X = rng.normal(size=(48, 6)).astype(np.float32)
    y = (X @ rng.normal(size=6) > 0).astype(np.int64)[:, None]
    ds = PartitionDataset(X, y, [3, 3])

    def build():
        return MultiModN(3, [MLPEncoder(3, 3, (4,)), MLPEncoder(3, 3, (4,))],
                         [LogisticDecoder(3)], 0.7, 0.3)

    m_full = build()
    h_full = MultiModNHistory(["t"])
    h_full, ran = fit_resumable(
        m_full, ArrayLoader(ds, 16), Adam8bit(0.01), "cross_entropy",
        epochs=6, checkpoint_dir=str(tmp_path / "full"), chunk_epochs=2,
        history=h_full)
    assert ran == 6

    ckpt = str(tmp_path / "interrupted")
    m_a = build()
    fit_resumable(m_a, ArrayLoader(ds, 16), Adam8bit(0.01), "cross_entropy",
                  epochs=2, checkpoint_dir=ckpt, chunk_epochs=2,
                  history=MultiModNHistory(["t"]))
    m_b = build()
    h_b, ran_b = fit_resumable(
        m_b, ArrayLoader(ds, 16), Adam8bit(0.01), "cross_entropy",
        epochs=6, checkpoint_dir=ckpt, chunk_epochs=2,
        history=MultiModNHistory(["t"]))
    assert ran_b == 4
    for a, b in zip(jax.tree_util.tree_leaves(m_full.state_dict()),
                    jax.tree_util.tree_leaves(m_b.state_dict())):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(np.asarray(h_b.loss["train"]),
                               np.asarray(h_full.loss["train"]),
                               rtol=1e-6, atol=1e-7)

"""Mid-training resume: checkpoints with optimizer state restore the exact
trajectory (capability the reference lacks — it never saves optimizer state,
SURVEY §5 checkpoint/resume)."""
import numpy as np

import jax

from multimodn_tpu import Adam, MultiModN, MultiModNHistory
from multimodn_tpu.checkpoint import load_checkpoint, save_checkpoint
from multimodn_tpu.data import ArrayLoader, PartitionDataset
from multimodn_tpu.decoders import LogisticDecoder
from multimodn_tpu.encoders import MLPEncoder


def _make(seed=0):
    return MultiModN(2, [MLPEncoder(2, 6, (4,))], [LogisticDecoder(2)],
                     0.7, 0.3, seed=seed)


def test_resume_with_optimizer_state_matches_uninterrupted(tmp_path):
    rng = np.random.default_rng(0)
    X = rng.normal(size=(40, 6)).astype(np.float32)
    y = rng.integers(0, 2, size=(40, 1))
    loader = ArrayLoader(PartitionDataset(X, y), 10)

    # Uninterrupted: 6 epochs.
    m_full = _make()
    opt = Adam(0.01)
    h_full = MultiModNHistory(["t"])
    m_full.fit(loader, opt, "cross_entropy", epochs=6, history=h_full)

    # Interrupted: 3 epochs, checkpoint (with opt state), restore, 3 more.
    m_a = _make()
    opt_a = Adam(0.01)
    h_a = MultiModNHistory(["t"])
    m_a.fit(loader, opt_a, "cross_entropy", epochs=3, history=h_a)
    path = save_checkpoint(str(tmp_path / "resume.pkl"), m_a, epoch=3,
                           include_opt_state=True)

    m_b = _make(seed=99)  # different init — must be fully overwritten
    payload = load_checkpoint(path, m_b)
    opt_b = Adam(0.01)
    m_b._opt = opt_b
    m_b.opt_state = jax.tree_util.tree_map(
        np.asarray, payload["opt_state"])
    m_b._epoch_counter = 3  # rng stream continuity
    h_b = MultiModNHistory(["t"])
    m_b.fit(loader, opt_b, "cross_entropy", epochs=3, history=h_b)

    np.testing.assert_allclose(h_full.loss["train"][5], h_b.loss["train"][2],
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(m_full.params["encoders"][0]["layers"][0]["w"]),
        np.asarray(m_b.params["encoders"][0]["layers"][0]["w"]),
        rtol=1e-5, atol=1e-6)


def test_fit_resumable_interrupted_equals_uninterrupted(tmp_path):
    """Kill-and-resume: training interrupted at a chunk boundary and resumed
    in a fresh process-equivalent (new model object, restored state) ends
    with the same parameters and history as an uninterrupted run."""
    from multimodn_tpu import Adam, MultiModN, MultiModNHistory
    from multimodn_tpu.checkpoint import fit_resumable
    from multimodn_tpu.data import ArrayLoader, PartitionDataset
    from multimodn_tpu.decoders import LogisticDecoder
    from multimodn_tpu.encoders import MLPEncoder

    rng = np.random.default_rng(0)
    X = rng.normal(size=(48, 6)).astype(np.float32)
    y = (X @ rng.normal(size=6) > 0).astype(np.int64)[:, None]
    ds = PartitionDataset(X, y, [3, 3])

    def build():
        return MultiModN(3, [MLPEncoder(3, 3, (4,)), MLPEncoder(3, 3, (4,))],
                         [LogisticDecoder(3)], 0.7, 0.3)

    # Uninterrupted: 6 epochs in chunks of 2.
    m_full = build()
    h_full = MultiModNHistory(["t"])
    h_full, ran = fit_resumable(
        m_full, ArrayLoader(ds, 16), Adam(0.01), "cross_entropy",
        epochs=6, checkpoint_dir=str(tmp_path / "full"), chunk_epochs=2,
        history=h_full)
    assert ran == 6

    # Interrupted: run only the first 2 epochs ("preempted" at the boundary),
    # then a FRESH model object resumes from the checkpoint dir.
    ckpt = str(tmp_path / "interrupted")
    m_a = build()
    h_a = MultiModNHistory(["t"])
    fit_resumable(m_a, ArrayLoader(ds, 16), Adam(0.01), "cross_entropy",
                  epochs=2, checkpoint_dir=ckpt, chunk_epochs=2, history=h_a)
    m_b = build()     # fresh object: params re-initialized, opt_state None
    h_b = MultiModNHistory(["t"])
    h_b, ran_b = fit_resumable(
        m_b, ArrayLoader(ds, 16), Adam(0.01), "cross_entropy",
        epochs=6, checkpoint_dir=ckpt, chunk_epochs=2, history=h_b)
    assert ran_b == 4                      # resumed, not restarted

    import jax
    for a, b in zip(jax.tree_util.tree_leaves(m_full.state_dict()),
                    jax.tree_util.tree_leaves(m_b.state_dict())):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)
    assert len(h_b.loss["train"]) == 6
    np.testing.assert_allclose(np.asarray(h_b.loss["train"]),
                               np.asarray(h_full.loss["train"]),
                               rtol=1e-6, atol=1e-7)


def test_fit_resumable_noop_when_complete(tmp_path):
    """Re-invoking after completion runs zero epochs."""
    from multimodn_tpu import Adam, MultiModN, MultiModNHistory
    from multimodn_tpu.checkpoint import fit_resumable
    from multimodn_tpu.data import ArrayLoader, PartitionDataset
    from multimodn_tpu.decoders import LogisticDecoder
    from multimodn_tpu.encoders import MLPEncoder

    rng = np.random.default_rng(1)
    X = rng.normal(size=(32, 6)).astype(np.float32)
    y = (X[:, :1] > 0).astype(np.int64)
    ds = PartitionDataset(X, y, [3, 3])
    model = MultiModN(3, [MLPEncoder(3, 3, (4,)), MLPEncoder(3, 3, (4,))],
                      [LogisticDecoder(3)], 0.7, 0.3)
    _, ran1 = fit_resumable(model, ArrayLoader(ds, 16), Adam(0.01),
                            "cross_entropy", epochs=3,
                            checkpoint_dir=str(tmp_path), chunk_epochs=3)
    _, ran2 = fit_resumable(model, ArrayLoader(ds, 16), Adam(0.01),
                            "cross_entropy", epochs=3,
                            checkpoint_dir=str(tmp_path), chunk_epochs=3)
    assert (ran1, ran2) == (3, 0)


def test_fit_resumable_history_none_adopts_checkpoint_history(tmp_path):
    """Resuming with history=None must return the checkpointed history, not
    silently discard it."""
    from multimodn_tpu import Adam, MultiModN, MultiModNHistory
    from multimodn_tpu.checkpoint import fit_resumable
    from multimodn_tpu.data import ArrayLoader, PartitionDataset
    from multimodn_tpu.decoders import LogisticDecoder
    from multimodn_tpu.encoders import MLPEncoder

    rng = np.random.default_rng(2)
    X = rng.normal(size=(32, 6)).astype(np.float32)
    y = (X[:, :1] > 0).astype(np.int64)
    ds = PartitionDataset(X, y, [3, 3])
    model = MultiModN(3, [MLPEncoder(3, 3, (4,))], [LogisticDecoder(3)],
                      0.7, 0.3)
    h = MultiModNHistory(["t"])
    fit_resumable(model, ArrayLoader(ds, 16), Adam(0.01), "cross_entropy",
                  epochs=2, checkpoint_dir=str(tmp_path), chunk_epochs=2,
                  history=h)
    fresh = MultiModN(3, [MLPEncoder(3, 3, (4,))], [LogisticDecoder(3)],
                      0.7, 0.3)
    h2, ran = fit_resumable(fresh, ArrayLoader(ds, 16), Adam(0.01),
                            "cross_entropy", epochs=4,
                            checkpoint_dir=str(tmp_path), chunk_epochs=2)
    assert ran == 2
    assert h2 is not None and len(h2.loss["train"]) == 4


def test_checkpoint_manager_same_epoch_twice(tmp_path):
    """Two saves at the same epoch must not share a file (an eviction could
    delete the survivor's checkpoint)."""
    from multimodn_tpu import MultiModN
    from multimodn_tpu.checkpoint import CheckpointManager
    from multimodn_tpu.decoders import LogisticDecoder
    from multimodn_tpu.encoders import MLPEncoder

    model = MultiModN(3, [MLPEncoder(3, 3, (4,))], [LogisticDecoder(3)],
                      0.7, 0.3)
    mgr = CheckpointManager(str(tmp_path), keep=1)
    assert mgr.save(model, epoch=3, score=0.5)
    assert mgr.save(model, epoch=3, score=0.7)
    restored = mgr.restore_best(model)
    assert restored["auc_bac_val_cum"] == 0.7


def test_fit_best_resumable_equals_single_fit_best(tmp_path):
    """Uninterrupted chunked fit_best_resumable == ONE fused fit_best call
    (dropout-free model: the rng stream is unused, so chunk boundaries are
    invisible); and kill-and-resume equals the uninterrupted chunked run."""
    from multimodn_tpu.checkpoint import fit_best_resumable

    rng = np.random.default_rng(7)
    X = rng.normal(size=(64, 6)).astype(np.float32)
    y = (X @ rng.normal(size=6) > 0).astype(np.int64)[:, None]
    ds = PartitionDataset(X, y, [3, 3])
    tr, va, _ = ds.random_split((0.7, 0.3, 0), seed=0)

    def build():
        return MultiModN(3, [MLPEncoder(3, 3, (4,)), MLPEncoder(3, 3, (4,))],
                         [LogisticDecoder(3)], 0.7, 0.3)

    # Single fused run.
    m_one = build()
    r_one = m_one.fit_best(ArrayLoader(tr, 16), Adam(0.01), "cross_entropy",
                           epochs=6, val_loader=ArrayLoader(va, 16))

    # Uninterrupted chunked run.
    m_ch = build()
    r_ch = fit_best_resumable(
        m_ch, ArrayLoader(tr, 16), Adam(0.01), "cross_entropy", epochs=6,
        checkpoint_dir=str(tmp_path / "full"), chunk_epochs=2,
        val_loader=ArrayLoader(va, 16))
    assert r_ch["epochs_run"] == 6
    assert r_ch["best_epoch"] == r_one["best_epoch"]
    np.testing.assert_allclose(r_ch["best_score"], r_one["best_score"],
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(r_ch["scores"], r_one["scores"],
                               rtol=1e-5, atol=1e-6)
    import jax
    for a, b in zip(jax.tree_util.tree_leaves(m_one.state_dict()),
                    jax.tree_util.tree_leaves(m_ch.state_dict())):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)

    # Kill at the first chunk boundary, resume in a fresh model object.
    ckpt = str(tmp_path / "interrupted")
    m_a = build()
    fit_best_resumable(m_a, ArrayLoader(tr, 16), Adam(0.01), "cross_entropy",
                       epochs=2, checkpoint_dir=ckpt, chunk_epochs=2,
                       val_loader=ArrayLoader(va, 16), restore_best=False)
    m_b = build()
    r_res = fit_best_resumable(
        m_b, ArrayLoader(tr, 16), Adam(0.01), "cross_entropy", epochs=6,
        checkpoint_dir=ckpt, chunk_epochs=2,
        val_loader=ArrayLoader(va, 16))
    assert r_res["epochs_run"] == 4       # resumed, not restarted
    assert r_res["best_epoch"] == r_ch["best_epoch"]
    np.testing.assert_allclose(r_res["scores"], r_ch["scores"],
                               rtol=1e-6, atol=1e-7)
    for a, b in zip(jax.tree_util.tree_leaves(m_ch.state_dict()),
                    jax.tree_util.tree_leaves(m_b.state_dict())):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)


# ---------------------------------------------------------------------------
# OrbaxCheckpointer (VERDICT r2 weak-#2 / next-#5: test it or cut it)
# ---------------------------------------------------------------------------

def _trained_model(tmp_seed=0):
    rng = np.random.default_rng(tmp_seed)
    X = rng.normal(size=(48, 6)).astype(np.float32)
    y = rng.integers(0, 2, size=(48, 1))
    loader = ArrayLoader(PartitionDataset(X, y), 16)
    m = _make(seed=tmp_seed)
    m.train_epoch(loader, Adam(0.01), "cross_entropy")
    return m


def test_orbax_roundtrip_matches_pickle_checkpoint(tmp_path):
    """Orbax save -> wait -> restore reproduces the exact params, and the
    restored tree equals the pickle-based save_checkpoint payload leaf for
    leaf (the two persistence paths agree)."""
    from multimodn_tpu.checkpoint import OrbaxCheckpointer

    m = _trained_model(0)
    want = m.state_dict()
    save_checkpoint(str(tmp_path / "pickle.pkl"), m, epoch=1)
    pickled = load_checkpoint(str(tmp_path / "pickle.pkl"))

    ck = OrbaxCheckpointer(str(tmp_path / "orbax"))
    ck.save(m, step=1)
    ck.wait()          # async save must be committed after wait()
    ck.wait()          # idempotent

    m2 = _make(seed=99)  # different init; restore must overwrite fully
    ck.restore(m2, step=1)
    got = m2.state_dict()
    for a, b, c in zip(jax.tree_util.tree_leaves(want),
                       jax.tree_util.tree_leaves(got),
                       jax.tree_util.tree_leaves(
                           pickled["model_state_dict"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        np.testing.assert_array_equal(np.asarray(a), np.asarray(c))


def test_orbax_save_overwrites_step(tmp_path):
    """Re-saving the same step (force=True) persists the NEWER params."""
    from multimodn_tpu.checkpoint import OrbaxCheckpointer

    m = _trained_model(1)
    ck = OrbaxCheckpointer(str(tmp_path / "orbax"))
    ck.save(m, step=3)
    ck.wait()
    rng = np.random.default_rng(2)
    X = rng.normal(size=(48, 6)).astype(np.float32)
    y = rng.integers(0, 2, size=(48, 1))
    m.train_epoch(ArrayLoader(PartitionDataset(X, y), 16), Adam(0.01),
                  "cross_entropy")
    newer = m.state_dict()
    ck.save(m, step=3)
    ck.wait()
    m2 = _make(seed=5)
    ck.restore(m2, step=3)
    for a, b in zip(jax.tree_util.tree_leaves(newer),
                    jax.tree_util.tree_leaves(m2.state_dict())):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_orbax_restore_into_sharded_model(tmp_path):
    """Restore into a mesh-constructed model: params come back sharded
    (load_state_dict re-applies the mesh placement) and numerically equal."""
    from multimodn_tpu.checkpoint import OrbaxCheckpointer
    from multimodn_tpu.parallel import make_mesh

    m = _trained_model(2)
    want = m.state_dict()
    ck = OrbaxCheckpointer(str(tmp_path / "orbax"))
    ck.save(m, step=0)
    ck.wait()

    mesh = make_mesh((4, 2), ("data", "model"))
    m_sharded = MultiModN(2, [MLPEncoder(2, 6, (4,))], [LogisticDecoder(2)],
                          0.7, 0.3, seed=7, mesh=mesh)
    ck.restore(m_sharded, step=0)
    for a, b in zip(jax.tree_util.tree_leaves(want),
                    jax.tree_util.tree_leaves(m_sharded.state_dict())):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # Live params actually carry mesh shardings.
    leaf = jax.tree_util.tree_leaves(m_sharded.params)[0]
    assert getattr(leaf, "sharding", None) is not None
    assert getattr(leaf.sharding, "mesh", None) is not None


# ---------------------------------------------------------------------------
# Elastic rescaling: resume an interrupted run on a DIFFERENT device
# topology (SURVEY §2.4 row 37 — the checkpoint is a mesh-free numpy
# pytree; params AND optimizer moments re-place on whatever mesh the
# resuming process builds).
# ---------------------------------------------------------------------------

def test_elastic_resume_across_mesh_sizes(tmp_path):
    """6 epochs trained as 2 on an 8-way DP mesh + 2 resumed on a 4-way
    mesh + 2 resumed on a single device equal one uninterrupted
    single-device run (params and full history)."""
    from multimodn_tpu.checkpoint import fit_resumable
    from multimodn_tpu.parallel import make_mesh

    rng = np.random.default_rng(3)
    X = rng.normal(size=(48, 6)).astype(np.float32)
    y = rng.integers(0, 2, size=(48, 1))

    def loader():
        return ArrayLoader(PartitionDataset(X, y), 8)

    def build(mesh):
        return MultiModN(2, [MLPEncoder(2, 6, (4,))], [LogisticDecoder(2)],
                         0.7, 0.3, seed=0, mesh=mesh)

    # Uninterrupted single-device baseline.
    m_ref = _make(seed=0)
    opt = Adam(0.01)
    h_ref = MultiModNHistory(["t"])
    m_ref.fit(loader(), opt, "cross_entropy", epochs=6, history=h_ref)

    ckpt = str(tmp_path / "elastic")
    meshes = [make_mesh((8,), ("data",)), make_mesh((4,), ("data",)), None]
    for stage, mesh in enumerate(meshes, start=1):
        model = build(mesh)          # a fresh "process" on a new topology
        # Stage 1 starts a fresh history; later stages pass None and ADOPT
        # the checkpointed history, like a genuinely restarted process.
        h, ran = fit_resumable(model, loader(), Adam(0.01),
                               "cross_entropy", epochs=2 * stage,
                               checkpoint_dir=ckpt, chunk_epochs=2,
                               history=MultiModNHistory(["t"])
                               if stage == 1 else None)
        assert ran == 2
        if mesh is not None:
            # Params actually live on the stage's mesh.
            leaf = jax.tree_util.tree_leaves(model.params)[0]
            assert leaf.sharding.mesh.shape == mesh.shape

    assert len(h.loss["train"]) == 6
    np.testing.assert_allclose(
        np.asarray(h.loss["train"], np.float64),
        np.asarray(h_ref.loss["train"], np.float64), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(model.params["encoders"][0]["layers"][0]["w"]),
        np.asarray(m_ref.params["encoders"][0]["layers"][0]["w"]),
        rtol=1e-5, atol=1e-6)


def test_elastic_resume_dp_tp_to_single(tmp_path):
    """fit_best_resumable interrupted on a DP2xTP2 mesh resumes on a single
    device with identical continuation (best selection included)."""
    from multimodn_tpu.checkpoint import fit_best_resumable
    from multimodn_tpu.parallel import make_mesh

    rng = np.random.default_rng(4)
    X = rng.normal(size=(64, 6)).astype(np.float32)
    y = (X[:, 0] > 0).astype(np.int64)[:, None]

    def loaders():
        ds = PartitionDataset(X, y)
        from multimodn_tpu.data.dataset import Subset
        return (ArrayLoader(Subset(ds, list(range(48))), 8),
                ArrayLoader(Subset(ds, list(range(48, 64))), 8))

    def build(mesh):
        return MultiModN(4, [MLPEncoder(4, 6, (8,))], [LogisticDecoder(4)],
                         0.7, 0.3, seed=1, mesh=mesh)

    # Uninterrupted single-device run.
    tr, va = loaders()
    ref = build(None).fit_best(tr, Adam(0.01), "cross_entropy", epochs=4,
                               val_loader=va)

    ckpt = str(tmp_path / "elastic_best")
    tr, va = loaders()
    m1 = build(make_mesh((2, 2), ("data", "model")))
    fit_best_resumable(m1, tr, Adam(0.01), "cross_entropy", epochs=2,
                       checkpoint_dir=ckpt, val_loader=va, chunk_epochs=2)
    tr, va = loaders()
    m2 = build(None)
    res = fit_best_resumable(m2, tr, Adam(0.01), "cross_entropy", epochs=4,
                             checkpoint_dir=ckpt, val_loader=va,
                             chunk_epochs=2)
    np.testing.assert_allclose(res["scores"], np.asarray(ref["scores"]),
                               rtol=1e-5, atol=1e-6)
    assert res["best_epoch"] == ref["best_epoch"]


def test_fit_best_streaming_kill_and_resume_bit_equal(tmp_path):
    """Streamed preemption-safe training (fit_best_streaming
    checkpoint_dir=): a run KILLED mid-training (on_chunk raises after the
    epoch-2 checkpoint lands) resumed in a fresh process/model continues
    the SAME host-side rng stream — the final result is BIT-EQUAL to the
    uninterrupted run, stronger than the fused chunk-boundary caveat.
    Covers TrainableInitState and the StaticInitState stream offset."""
    import pytest

    from multimodn_tpu.core.state import StaticInitState
    from multimodn_tpu.data import StreamingLoader, fit_best_streaming

    rng = np.random.default_rng(7)
    X = rng.normal(size=(56, 6)).astype(np.float32)
    y = (X @ rng.normal(size=6) > 0).astype(np.int64)[:, None]
    ds = PartitionDataset(X, y, [3, 3])
    tr = lambda: StreamingLoader(ds, 8)
    va = lambda: StreamingLoader(ds, 8)

    def build(static):
        kw = {"init_state": StaticInitState(
            np.arange(4, dtype=np.float32).reshape(2, 2))} if static else {}
        return MultiModN(2, [MLPEncoder(2, 3, (4,)), MLPEncoder(2, 3, (4,))],
                         [LogisticDecoder(2)], 0.7, 0.3, seed=3, **kw)

    for static in (False, True):
        ckpt = str(tmp_path / f"ck_{static}")
        full = build(static)
        r_full = fit_best_streaming(full, tr(), Adam(0.05), "cross_entropy",
                                    epochs=6, val_loader=va())

        def bomb(done, total):
            if done == 2:
                raise KeyboardInterrupt    # simulated preemption

        victim = build(static)
        with pytest.raises(KeyboardInterrupt):
            fit_best_streaming(victim, tr(), Adam(0.05), "cross_entropy",
                               epochs=6, val_loader=va(),
                               checkpoint_dir=ckpt, checkpoint_every=2,
                               on_chunk=bomb)

        chunks = []
        revived = build(static)   # fresh model, as after a real preemption
        r_res = fit_best_streaming(revived, tr(), Adam(0.05),
                                   "cross_entropy", epochs=6,
                                   val_loader=va(), checkpoint_dir=ckpt,
                                   checkpoint_every=2,
                                   on_chunk=lambda d, t: chunks.append(d))
        assert chunks == [4, 6]        # resumed AT epoch 2, not restarted
        assert r_res["best_epoch"] == r_full["best_epoch"]
        assert r_res["best_score"] == r_full["best_score"]
        np.testing.assert_array_equal(r_res["scores"], r_full["scores"])
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                       np.asarray(b)),
            full.state_dict(), revived.state_dict())
        # post-resume counters equal the uninterrupted model's (continued
        # training / cycle phases stay aligned)
        assert revived._epoch_counter == full._epoch_counter
        assert revived._cycle_offset == full._cycle_offset


def test_fit_resumable_streaming_chunks_equal_uninterrupted(tmp_path):
    """fit_resumable over streaming loaders: chunked streamed training ==
    one uninterrupted fit_streaming call BIT-for-bit (the streamed
    per-epoch rng is absolute-epoch-counter-based, so chunk boundaries are
    invisible — no fused chunk-boundary caveat), and a second invocation
    after 'preemption' completes the remaining epochs."""
    from multimodn_tpu.checkpoint import fit_resumable
    from multimodn_tpu.data import StreamingLoader, fit_streaming

    rng = np.random.default_rng(9)
    X = rng.normal(size=(48, 6)).astype(np.float32)
    y = (X @ rng.normal(size=6) > 0).astype(np.int64)[:, None]
    ds = PartitionDataset(X, y, [3, 3])

    def build():
        return MultiModN(2, [MLPEncoder(2, 3, (4,)), MLPEncoder(2, 3, (4,))],
                         [LogisticDecoder(2)], 0.7, 0.3, seed=5)

    full = build()
    h_full = MultiModNHistory(["t"])
    fit_streaming(full, StreamingLoader(ds, 8), Adam(0.05), "cross_entropy",
                  epochs=6, history=h_full,
                  val_loader=StreamingLoader(ds, 8))

    # interrupted: first invocation covers 4 epochs (2 chunks), a fresh
    # model resumes the remaining 2 from the checkpoint.
    part = build()
    h1 = MultiModNHistory(["t"])
    fit_resumable(part, StreamingLoader(ds, 8), Adam(0.05), "cross_entropy",
                  epochs=4, checkpoint_dir=str(tmp_path), chunk_epochs=2,
                  history=h1, val_loader=StreamingLoader(ds, 8))
    revived = build()
    h2, ran = fit_resumable(revived, StreamingLoader(ds, 8), Adam(0.05),
                            "cross_entropy", epochs=6,
                            checkpoint_dir=str(tmp_path), chunk_epochs=2,
                            val_loader=StreamingLoader(ds, 8))
    assert ran == 2
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        full.state_dict(), revived.state_dict())
    np.testing.assert_array_equal(np.asarray(h_full.loss["train"]),
                                  np.asarray(h2.loss["train"]))
    np.testing.assert_array_equal(np.asarray(h_full.loss["val"]),
                                  np.asarray(h2.loss["val"]))


def test_fit_best_streaming_sigkill_resume(tmp_path):
    """HARD preemption: the training process is SIGKILLed mid-run (after a
    checkpoint lands); a separate fresh process resumes from the payload
    and the result is bit-equal to the uninterrupted run. This is the
    cross-process durability evidence behind docs/COOKBOOK.md's claim."""
    import os
    import subprocess
    import sys
    import textwrap

    from multimodn_tpu.data import StreamingLoader, fit_best_streaming

    ckpt = str(tmp_path / "ck")
    victim = textwrap.dedent(f"""
        import os, signal
        import numpy as np
        from multimodn_tpu import Adam, MultiModN
        from multimodn_tpu.data import (PartitionDataset, StreamingLoader,
                                        fit_best_streaming)
        from multimodn_tpu.decoders import LogisticDecoder
        from multimodn_tpu.encoders import MLPEncoder
        rng = np.random.default_rng(7)
        X = rng.normal(size=(56, 6)).astype(np.float32)
        y = (X @ rng.normal(size=6) > 0).astype(np.int64)[:, None]
        ds = PartitionDataset(X, y, [3, 3])
        m = MultiModN(2, [MLPEncoder(2, 3, (4,)), MLPEncoder(2, 3, (4,))],
                      [LogisticDecoder(2)], 0.7, 0.3, seed=3)
        def killer(done, total):
            if done == 2:
                os.kill(os.getpid(), signal.SIGKILL)
        fit_best_streaming(m, StreamingLoader(ds, 8), Adam(0.05),
                           "cross_entropy", epochs=6,
                           val_loader=StreamingLoader(ds, 8),
                           checkpoint_dir={ckpt!r}, checkpoint_every=2,
                           on_chunk=killer)
    """)
    env = {**os.environ, "MULTIMODN_PLATFORM": "cpu",
           "JAX_PLATFORMS": "cpu"}
    p = subprocess.run([sys.executable, "-c", victim], env=env,
                       capture_output=True, timeout=300)
    assert p.returncode == -9, p.stderr.decode()[-500:]
    assert os.path.exists(os.path.join(ckpt, "resume_stream_latest.pkl"))

    rng = np.random.default_rng(7)
    X = rng.normal(size=(56, 6)).astype(np.float32)
    y = (X @ rng.normal(size=6) > 0).astype(np.int64)[:, None]
    ds = PartitionDataset(X, y, [3, 3])

    def build():
        return MultiModN(2, [MLPEncoder(2, 3, (4,)), MLPEncoder(2, 3, (4,))],
                         [LogisticDecoder(2)], 0.7, 0.3, seed=3)

    full = build()
    r_full = fit_best_streaming(full, StreamingLoader(ds, 8), Adam(0.05),
                                "cross_entropy", epochs=6,
                                val_loader=StreamingLoader(ds, 8))
    revived = build()
    r_res = fit_best_streaming(revived, StreamingLoader(ds, 8), Adam(0.05),
                               "cross_entropy", epochs=6,
                               val_loader=StreamingLoader(ds, 8),
                               checkpoint_dir=ckpt, checkpoint_every=2)
    assert r_res["best_epoch"] == r_full["best_epoch"]
    np.testing.assert_array_equal(r_res["scores"], r_full["scores"])
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        full.state_dict(), revived.state_dict())


def test_resume_guards(tmp_path):
    """Loud-error corners of the streamed resume formats."""
    import pytest

    from multimodn_tpu.checkpoint import fit_resumable
    from multimodn_tpu.data import StreamingLoader, fit_best_streaming

    rng = np.random.default_rng(1)
    X = rng.normal(size=(32, 6)).astype(np.float32)
    y = (X @ rng.normal(size=6) > 0).astype(np.int64)[:, None]
    ds = PartitionDataset(X, y, [3, 3])

    def build():
        return MultiModN(2, [MLPEncoder(2, 3, (4,)), MLPEncoder(2, 3, (4,))],
                         [LogisticDecoder(2)], 0.7, 0.3, seed=1)

    # shuffle=True streaming loader: the permutation state is host-local
    # and not checkpointable -> loud error, not silent replay.
    with pytest.raises(NotImplementedError, match="REPLAY"):
        fit_resumable(build(), StreamingLoader(ds, 8, shuffle=True),
                      Adam(0.05), "cross_entropy", epochs=2,
                      checkpoint_dir=str(tmp_path / "a"))
    # shrinking epochs below the checkpoint's progress -> loud error.
    ck = str(tmp_path / "b")
    fit_best_streaming(build(), StreamingLoader(ds, 8), Adam(0.05),
                       "cross_entropy", epochs=4,
                       val_loader=StreamingLoader(ds, 8),
                       checkpoint_dir=ck, checkpoint_every=2)
    with pytest.raises(ValueError, match="already trained"):
        fit_best_streaming(build(), StreamingLoader(ds, 8), Adam(0.05),
                           "cross_entropy", epochs=2,
                           val_loader=StreamingLoader(ds, 8),
                           checkpoint_dir=ck)

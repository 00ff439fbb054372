"""Serving tier: incremental fusion sessions and pickle-free export/load."""
import numpy as np
import pytest

from multimodn_tpu import Adam, MultiModN
from multimodn_tpu.data import ArrayLoader, PartitionDataset
from multimodn_tpu.decoders import LogisticDecoder, MLPDecoder
from multimodn_tpu.encoders import MIMICMLPEncoder, MLPEncoder
from multimodn_tpu.serving import InferenceSession, export_model, load_model


def _trained_model(seed=0):
    rng = np.random.default_rng(seed)
    X = rng.normal(size=(40, 6)).astype(np.float32)
    y = (X @ rng.normal(size=6) > 0).astype(np.int64)[:, None]
    loader = ArrayLoader(PartitionDataset(X, y, [3, 3]), 16)
    model = MultiModN(3, [MLPEncoder(3, 3, (4,)), MLPEncoder(3, 3, (4,))],
                      [LogisticDecoder(3)], 0.7, 0.3)
    model.fit(loader, Adam(0.01), "cross_entropy", epochs=3)
    return model, X


def test_incremental_session_matches_batch_forward():
    model, X = _trained_model()
    session = InferenceSession(model)
    B = 8
    x0, x1 = X[:B, :3], X[:B, 3:]

    state = session.init(B)
    probs0 = session.decode(state)              # step-0 predictions
    state, probs1 = session.step(state, 0, x0)  # after modality 0
    state, probs2 = session.step(state, 1, x1)  # after modality 1

    full = model.predict_proba([x0, x1])
    np.testing.assert_allclose(probs0[0], full[0][0], atol=1e-6)
    np.testing.assert_allclose(probs1[0], full[0][1], atol=1e-6)
    np.testing.assert_allclose(probs2[0], full[0][2], atol=1e-6)


def test_incremental_session_nan_skip():
    model, X = _trained_model(1)
    session = InferenceSession(model)
    x0 = X[:4, :3].copy()
    x0[2] = np.nan
    state = session.init(4)
    new_state, _ = session.step(state, 0, x0)
    # NaN row keeps its state; others move.
    np.testing.assert_allclose(np.asarray(new_state)[2],
                               np.asarray(state)[2])
    assert not np.allclose(np.asarray(new_state)[0], np.asarray(state)[0])


def test_session_slice_invalidates_on_inplace_leaf_patch():
    """Round-5 tail review finding: the scan-stacked encoder-slice cache
    keyed on the CONTAINER's identity, so a user patching a single leaf in
    place (params['encoders'][k] = new) kept serving the pre-patch slice
    while decode() saw the new decoders. The cache must key on leaf
    identities."""
    import jax.numpy as jnp

    rng = np.random.default_rng(3)
    X = rng.normal(size=(40, 6)).astype(np.float32)
    y = (X @ rng.normal(size=6) > 0).astype(np.int64)[:, None]
    loader = ArrayLoader(PartitionDataset(X, y, [3, 3]), 16)
    model = MultiModN(3, [MLPEncoder(3, 3, (4,)), MLPEncoder(3, 3, (4,))],
                      [LogisticDecoder(3)], 0.7, 0.3, chain_mode="scan")
    model.fit(loader, Adam(0.01), "cross_entropy", epochs=3)
    assert model._chain_plan()[0] == "scan"  # stacked storage engaged
    session = InferenceSession(model)
    x0 = X[:4, :3]
    state = session.init(4)
    _, probs_before = session.step(state, 0, x0)

    def zero_one_leaf_in_place(node):
        if isinstance(node, dict):
            for k, v in node.items():
                if isinstance(v, jnp.ndarray):
                    node[k] = jnp.zeros_like(v)
                    return True
                if zero_one_leaf_in_place(v):
                    return True
        if isinstance(node, list):
            for i, v in enumerate(node):
                if isinstance(v, jnp.ndarray):
                    node[i] = jnp.zeros_like(v)
                    return True
                if zero_one_leaf_in_place(v):
                    return True
        return False

    enc = model.params["encoders"]
    assert zero_one_leaf_in_place(enc)
    assert model.params["encoders"] is enc  # container identity unchanged

    _, probs_after = session.step(state, 0, x0)
    fresh = InferenceSession(model)
    _, probs_fresh = fresh.step(state, 0, x0)
    np.testing.assert_allclose(probs_after[0], probs_fresh[0], atol=1e-6)
    assert not np.allclose(probs_after[0], probs_before[0])


def test_export_load_roundtrip(tmp_path):
    model, X = _trained_model(2)
    export_model(model, str(tmp_path / "artifact"))
    assert (tmp_path / "artifact" / "config.json").exists()
    assert (tmp_path / "artifact" / "params.npz").exists()

    loaded = load_model(str(tmp_path / "artifact"))
    x0, x1 = X[:6, :3], X[:6, 3:]
    np.testing.assert_allclose(model.predict_proba([x0, x1])[0],
                               loaded.predict_proba([x0, x1])[0],
                               atol=1e-6)


def test_export_load_mimic_style(tmp_path):
    model = MultiModN(5, [MIMICMLPEncoder(5, 7, (8, 8), dropout=0.2),
                          MIMICMLPEncoder(5, 4, (8, 8), dropout=0.2)],
                      [MLPDecoder(5, (8,), 2)], 1.0, 0.0)
    export_model(model, str(tmp_path / "m"))
    loaded = load_model(str(tmp_path / "m"))
    assert loaded.encoders[0].dropout_rate == 0.2
    assert loaded.decoders[0].n_classes == 2
    x = [np.zeros((3, 7), np.float32), np.zeros((3, 4), np.float32)]
    np.testing.assert_allclose(model.predict_proba(x)[0],
                               loaded.predict_proba(x)[0], atol=1e-6)


def test_export_load_static_init_state(tmp_path):
    """StaticInitState models roundtrip: the state bank is persisted in
    params.npz and the provider rebuilt on load."""
    from multimodn_tpu.core.state import StaticInitState

    states = [np.full(3, 0.5, np.float32), np.full(3, -1.0, np.float32)]
    model = MultiModN(3, [MLPEncoder(3, 4, (5,))], [LogisticDecoder(3)],
                      0.7, 0.3, init_state=StaticInitState(states))
    x = [np.random.default_rng(0).normal(size=(6, 4)).astype(np.float32)]
    before = model.predict(x)

    d = export_model(model, str(tmp_path / "static_model"))
    loaded = load_model(d)
    assert isinstance(loaded.init_state, StaticInitState)
    np.testing.assert_array_equal(np.asarray(loaded.init_state._bank),
                                  np.stack(states))
    np.testing.assert_array_equal(loaded.predict(x), before)


def test_export_load_transformer_encoder(tmp_path):
    from multimodn_tpu.encoders import TransformerEncoder

    model = MultiModN(4, [TransformerEncoder(4, 50, embed_dim=16, n_heads=2,
                                             n_layers=1, chunk=10)],
                      [LogisticDecoder(4)], 1.0, 0.0)
    x = [np.random.default_rng(0).normal(size=(5, 50)).astype(np.float32)]
    before = model.predict_proba(x)
    d = export_model(model, str(tmp_path / "tf_model"))
    loaded = load_model(d)
    enc = loaded.encoders[0]
    assert (enc.embed_dim, enc.n_heads, enc.n_layers, enc.chunk) == (16, 2, 1, 10)
    after = loaded.predict_proba(x)
    for a, b in zip(before, after):
        np.testing.assert_array_equal(a, b)


def test_export_load_feature_encoder(tmp_path):
    """MLPFeatureEncoder roundtrips (regression: hidden_layers tuple was
    passed as the scalar hidden_size ctor arg and load crashed)."""
    from multimodn_tpu.encoders import MLPFeatureEncoder

    model = MultiModN(5, [MLPFeatureEncoder(5, 7) for _ in range(3)],
                      [LogisticDecoder(5)], 0.7, 0.3, chain_mode="unrolled")
    x = [np.random.default_rng(0).normal(size=(6, 1)).astype(np.float32)
         for _ in range(3)]
    before = model.predict(x)
    d = export_model(model, str(tmp_path / "fw_model"))
    loaded = load_model(d)
    assert loaded.encoders[0].hidden_layers == (7,)
    np.testing.assert_array_equal(loaded.predict(x), before)


def test_export_custom_activation_raises(tmp_path):
    """Custom activation callables cannot be persisted by name: export must
    raise instead of silently swapping in relu."""
    import pytest

    def my_act(x):
        return x * 2

    model = MultiModN(3, [MLPEncoder(3, 4, (5,), activation=my_act)],
                      [LogisticDecoder(3)], 0.7, 0.3)
    with pytest.raises(ValueError, match="cannot be persisted"):
        export_model(model, str(tmp_path / "custom"))


def test_session_nan_skip_tracks_model_mode():
    """InferenceSession.step defaults to the MODEL's missingness mode: a
    nan_skip='none' model advances NaN rows (through nan_to_num), matching
    its predict()."""
    model = MultiModN(3, [MLPEncoder(3, 4, (5,))], [LogisticDecoder(3)],
                      0.7, 0.3, nan_skip="none")
    session = InferenceSession(model)
    x = np.random.default_rng(0).normal(size=(4, 4)).astype(np.float32)
    x[1, 2] = np.nan
    state0 = session.init(4)
    state, _ = session.step(state0, 0, x)
    # Row 1 must have ADVANCED (not frozen at the initial state).
    assert not np.allclose(np.asarray(state)[1], np.asarray(state0)[1])
    # A nan_skip='sample' model freezes that row by default.
    model2 = MultiModN(3, [MLPEncoder(3, 4, (5,))], [LogisticDecoder(3)],
                       0.7, 0.3)
    s2 = InferenceSession(model2)
    st0 = s2.init(4)
    st, _ = s2.step(st0, 0, x)
    np.testing.assert_array_equal(np.asarray(st)[1], np.asarray(st0)[1])


def test_export_compiled_roundtrip(tmp_path):
    """AOT StableHLO artifact (params baked in, symbolic batch): loads
    without any model/params and matches the live forward at multiple
    batch sizes."""
    import os
    from multimodn_tpu.serving import export_compiled, load_compiled

    rng = np.random.default_rng(17)
    model = MultiModN(3, [MLPEncoder(3, 4, (5,)), MLPEncoder(3, 2, (5,))],
                      [LogisticDecoder(3)], 0.7, 0.3, nan_skip="none")
    path = export_compiled(model, str(tmp_path / "model.stablehlo"))
    assert os.path.getsize(path) > 0
    run = load_compiled(path)
    for n in (1, 7):
        x0 = rng.normal(size=(n, 4)).astype(np.float32)
        x1 = rng.normal(size=(n, 2)).astype(np.float32)
        got = run(x0, x1)
        want = model.predict_proba((x0, x1))
        for g, w in zip(got, want):
            np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                       rtol=1e-6, atol=1e-6)


def test_export_compiled_scan_chain_nan_skip(tmp_path):
    """AOT artifact under scan-chain storage + per-sample NaN skip: NaN
    rows leave the state unchanged inside the exported program too."""
    import os
    from multimodn_tpu.encoders import MLPFeatureEncoder
    from multimodn_tpu.serving import export_compiled, load_compiled

    rng = np.random.default_rng(23)
    model = MultiModN(3, [MLPFeatureEncoder(3, 4) for _ in range(4)],
                      [LogisticDecoder(3)], 0.7, 0.3, nan_skip="sample",
                      chain_mode="scan")
    path = export_compiled(model, str(tmp_path / "scan.stablehlo"))
    run = load_compiled(path)
    X = rng.normal(size=(6, 4)).astype(np.float32)
    X[0, 2] = np.nan    # modality 2 missing for sample 0
    mods = [X[:, i:i+1] for i in range(4)]
    got = run(*mods)[0]                      # (E+1, 6, 2)
    assert np.isfinite(np.asarray(got)).all()
    # The exported forward must equal the model's own forward in the SAME
    # nan mode (per-sample skip), which predict_proba does not use; compare
    # against a no-NaN run where the two modes coincide.
    Xc = rng.normal(size=(5, 4)).astype(np.float32)
    modsc = [Xc[:, i:i+1] for i in range(4)]
    np.testing.assert_allclose(np.asarray(run(*modsc)[0]),
                               np.asarray(model.predict_proba(tuple(modsc))[0]),
                               rtol=1e-6, atol=1e-6)


def test_export_load_vit_geometry_and_knobs(tmp_path):
    """Round-5 review findings: ViTEncoder geometry (image_size/patch_size/
    channels) and the training-semantics knobs (presence_penalty/dropout,
    compute_dtype, scan_unroll, seed) must survive the export round-trip —
    they previously reloaded as ctor defaults."""
    from multimodn_tpu.encoders import ViTEncoder

    model = MultiModN(4, [ViTEncoder(4, image_size=(16, 24), patch_size=4,
                                     channels=1, embed_dim=8, n_heads=2,
                                     n_layers=1)],
                      [LogisticDecoder(4)], 1.0, 0.0,
                      presence_penalty=25.0, presence_dropout=0.1,
                      scan_unroll=4, seed=3)
    x = [np.random.default_rng(0).normal(
        size=(3, 16 * 24)).astype(np.float32)]
    before = model.predict_proba(x)
    d = export_model(model, str(tmp_path / "vit"))
    loaded = load_model(d)
    enc = loaded.encoders[0]
    assert enc.image_size == (16, 24)
    assert (enc.patch_size, enc.channels) == (4, 1)
    assert loaded.presence_penalty == 25.0
    assert loaded.presence_dropout == 0.1
    assert loaded.scan_unroll == 4
    assert loaded._seed == 3
    after = loaded.predict_proba(x)
    for a, b in zip(before, after):
        np.testing.assert_array_equal(a, b)


def test_export_load_compute_dtype(tmp_path):
    model = MultiModN(2, [MLPEncoder(2, 3, (4,))], [LogisticDecoder(2)],
                      1.0, 0.0, compute_dtype="bfloat16")
    d = export_model(model, str(tmp_path / "bf16"))
    loaded = load_model(d)
    import jax.numpy as jnp
    assert jnp.dtype(loaded.compute_dtype) == jnp.bfloat16


def test_export_compiled_permuted_sequence_widths(tmp_path):
    """export_compiled builds input shapes from the RESOLVED pairing: a
    permuted sequence over heterogeneous widths must export (and run) with
    modality widths following the pairing, not encoder positions."""
    from multimodn_tpu.serving import export_compiled, load_compiled

    model = MultiModN(3, [MLPEncoder(3, 4, (5,)), MLPEncoder(3, 4, (6,))],
                      [LogisticDecoder(3)], 1.0, 0.0)
    p = str(tmp_path / "perm.hlo")
    export_compiled(model, p, platforms=("cpu",), encoder_sequence=[1, 0])
    run = load_compiled(p)
    rng = np.random.default_rng(0)
    outs = run(rng.normal(size=(4, 4)).astype(np.float32),
               rng.normal(size=(4, 4)).astype(np.float32))
    assert outs[0].shape[0] == 3  # (E+1, b, C)

    # Heterogeneous widths under a permuted sequence are VALID: the
    # artifact's modality-d input takes the width of the encoder the
    # pairing assigns to d (seq=[1,0] -> modality 0 is width-7 encoder 1,
    # modality 1 is width-4 encoder 0), not the position-order widths.
    model2 = MultiModN(3, [MLPEncoder(3, 4, (5,)), MLPEncoder(3, 7, (6,))],
                       [LogisticDecoder(3)], 1.0, 0.0)
    p2 = str(tmp_path / "perm_het.hlo")
    export_compiled(model2, p2, platforms=("cpu",), encoder_sequence=[1, 0])
    run2 = load_compiled(p2)
    outs2 = run2(rng.normal(size=(4, 7)).astype(np.float32),
                 rng.normal(size=(4, 4)).astype(np.float32))
    assert outs2[0].shape == (3, 4, 2)  # (E+1, b, n_classes=2)
    with pytest.raises(Exception):  # position-order widths must NOT run
        run2(rng.normal(size=(4, 4)).astype(np.float32),
             rng.normal(size=(4, 7)).astype(np.float32))

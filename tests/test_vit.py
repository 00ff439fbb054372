"""ViTEncoder: the MXU-native image encoder (beyond-reference; SURVEY
§2.4 names a ViT as the TP-era replacement for the reference's unused
torchvision ResNet, multimodn/encoders/resnet_encoder.py:6-45)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multimodn_tpu import Adam, MultiModN, MultiModNHistory
from multimodn_tpu.data import ArrayLoader, PartitionDataset
from multimodn_tpu.decoders import LogisticDecoder
from multimodn_tpu.encoders import MLPEncoder, ViTEncoder
from multimodn_tpu.parallel import make_mesh

H = W = 8
C = 3
P = 4


def _enc(state=4, **kw):
    cfg = dict(image_size=(H, W), patch_size=P, channels=C, embed_dim=32,
               n_heads=2, n_layers=2)
    cfg.update(kw)
    return ViTEncoder(state, **cfg)


def test_patchify_matches_manual_slicing():
    enc = _enc()
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, H, W, C)).astype(np.float32))
    toks = np.asarray(enc._patchify(x))
    assert toks.shape == (2, (H // P) * (W // P), P * P * C)
    t = 0
    for i in range(H // P):
        for j in range(W // P):
            patch = np.asarray(x)[:, i * P:(i + 1) * P, j * P:(j + 1) * P, :]
            np.testing.assert_array_equal(toks[:, t], patch.reshape(2, -1))
            t += 1


def test_flat_and_image_inputs_agree():
    enc = _enc()
    params = enc.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(1)
    imgs = jnp.asarray(rng.normal(size=(5, H, W, C)).astype(np.float32))
    state = jnp.zeros((5, 4), jnp.float32)
    out_img = enc.apply(params, state, imgs)
    out_flat = enc.apply(params, state, imgs.reshape(5, -1))
    assert out_img.shape == (5, 4)
    np.testing.assert_array_equal(np.asarray(out_img), np.asarray(out_flat))


def test_validation_errors():
    with pytest.raises(ValueError, match="divisible"):
        ViTEncoder(4, image_size=(10, 10), patch_size=4)
    enc = _enc()
    params = enc.init(jax.random.PRNGKey(0))
    with pytest.raises(ValueError, match="configured for"):
        enc.apply(params, jnp.zeros((2, 4)),
                  jnp.zeros((2, H, W, 1), jnp.float32))


def _dataset(n=48, seed=0):
    """Images flattened into a modality column + a 3-feature tabular
    modality (the MultiModDataset convention)."""
    rng = np.random.default_rng(seed)
    X = rng.normal(size=(n, H * W * C + 3)).astype(np.float32)
    y = (X[:, : H * W * C] @ rng.normal(size=H * W * C) > 0
         ).astype(np.int64)[:, None]
    return PartitionDataset(X, y, [H * W * C, 3])


def _model(mesh=None, seed=0):
    return MultiModN(
        4, [_enc(), MLPEncoder(4, 3, (8,))], [LogisticDecoder(4)],
        1.0, 0.0, mesh=mesh, seed=seed)


def test_trains_through_fused_fit():
    m = _model()
    h = MultiModNHistory(["t"])
    m.fit(ArrayLoader(_dataset(), 16), Adam(1e-3), "cross_entropy",
          epochs=5, history=h)
    losses = [float(np.mean(l)) for l in h.loss["train"]]
    assert losses[-1] < losses[0]
    assert np.all(np.isfinite(losses))


def test_dp_tp_fit_matches_single_device():
    """Patch-embed/qkv/mlp weights column-shard over the model axis; the
    DP4xTP2 run must reproduce the single-device trajectory."""
    mesh = make_mesh((4, 2), ("data", "model"))
    m1, m2 = _model(seed=3), _model(mesh, seed=3)
    qkv = m2.params["encoders"][0]["blocks"][0]["qkv"]["w"]
    assert "model" in str(qkv.sharding.spec)
    ds = _dataset(seed=2)
    h1, h2 = MultiModNHistory(["t"]), MultiModNHistory(["t"])
    m1.fit(ArrayLoader(ds, 16), Adam(1e-3), "cross_entropy", epochs=3,
           history=h1)
    m2.fit(ArrayLoader(ds, 16), Adam(1e-3), "cross_entropy", epochs=3,
           history=h2)
    for e in range(3):
        np.testing.assert_allclose(h1.loss["train"][e], h2.loss["train"][e],
                                   rtol=1e-5, atol=1e-6)

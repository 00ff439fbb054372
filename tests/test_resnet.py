"""ResNet image encoder: shapes, gradient flow, freeze, checkpoint overlay,
and end-to-end use inside MultiModN."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multimodn_tpu.encoders.resnet import ResNet

S, B, H = 4, 2, 32


def test_resnet_forward_shapes():
    enc = ResNet(state_size=S)
    params = enc.init(jax.random.PRNGKey(0))
    imgs = jnp.asarray(np.random.default_rng(0)
                       .normal(size=(B, H, H, 3)).astype(np.float32))
    state = jnp.zeros((B, S))
    out = enc.apply(params, state, imgs)
    assert out.shape == (B, S)
    assert np.isfinite(np.asarray(out)).all()
    feats = enc.features(params, imgs)
    assert feats.shape == (B, 512)


def test_resnet_freeze_stops_backbone_grads():
    enc = ResNet(state_size=S, freeze=True)
    params = enc.init(jax.random.PRNGKey(1))
    imgs = jnp.ones((B, H, H, 3))
    state = jnp.zeros((B, S))

    def loss(p):
        return jnp.sum(enc.apply(p, state, imgs) ** 2)

    g = jax.grad(loss)(params)
    assert float(jnp.abs(g["stem"]["w"]).max()) == 0.0
    assert float(jnp.abs(g["head"]["w"]).max()) > 0.0


def test_resnet_checkpoint_overlay(tmp_path):
    enc = ResNet(state_size=S)
    params = enc.init(jax.random.PRNGKey(2))
    custom = np.full((7, 7, 3, 64), 0.123, np.float32)
    path = tmp_path / "ckpt.npz"
    np.savez(path, **{"stem/w": custom})
    enc2 = ResNet(state_size=S, pretrained_path=str(path))
    params2 = enc2.init(jax.random.PRNGKey(2))
    np.testing.assert_allclose(np.asarray(params2["stem"]["w"]), custom)
    # untouched keys keep their init
    np.testing.assert_allclose(np.asarray(params2["head"]["w"]),
                               np.asarray(params["head"]["w"]))


def test_resnet_rejects_network_pretrained():
    with pytest.raises(ValueError):
        ResNet(state_size=S, pretrained=True)
    with pytest.raises(ValueError):
        ResNet(state_size=S, pretrained=True, pretrained_path="x.npz")


def test_resnet_inside_multimodn():
    from multimodn_tpu import Adam, MultiModN, MultiModNHistory
    from multimodn_tpu.data import ArrayLoader
    from multimodn_tpu.decoders import LogisticDecoder

    rng = np.random.default_rng(3)
    n = 8

    class ImgDataset:
        def __len__(self):
            return n

        def __getitem__(self, i):
            return [rng.normal(size=(H * H * 3,)).astype(np.float32)], \
                np.array([i % 2])

    # Images travel flattened through the generic loader; a wrapper encoder
    # reshapes before the conv stack.
    base = ResNet(state_size=S)

    class FlatResNet(ResNet):
        def apply(self, params, state, x, *, train=False, rng=None,
                  sample_mask=None):
            return super().apply(params, state,
                                 x.reshape(-1, H, H, 3), train=train, rng=rng,
                                 sample_mask=sample_mask)

    enc = FlatResNet(state_size=S)
    model = MultiModN(S, [enc], [LogisticDecoder(S)], 1.0, 0.0)
    loader = ArrayLoader(ImgDataset(), 4)
    h = MultiModNHistory(["t"])
    model.train_epoch(loader, Adam(1e-3), "cross_entropy", h)
    assert np.isfinite(h.loss["train"][-1]).all()


def test_resnet_batch_stats_ema():
    import jax
    import jax.numpy as jnp

    enc = ResNet(state_size=S)
    params = enc.init(jax.random.PRNGKey(10))
    imgs = jnp.asarray(np.random.default_rng(10)
                       .normal(size=(4, H, H, 3)).astype(np.float32) * 3 + 1)
    updated = enc.update_batch_stats(params, imgs, momentum=0.0)
    # momentum=0 -> running stats become exactly the batch stats of the stem.
    from multimodn_tpu.encoders.resnet import _conv
    stem_out = _conv(imgs, params["stem"]["w"], 2)
    np.testing.assert_allclose(np.asarray(updated["stem"]["bn"]["mean"]),
                               np.asarray(jnp.mean(stem_out, axis=(0, 1, 2))),
                               rtol=1e-5, atol=1e-5)
    # Other params untouched.
    np.testing.assert_allclose(np.asarray(updated["head"]["w"]),
                               np.asarray(params["head"]["w"]))
    # Eval-mode forward with updated stats differs from identity-stats eval.
    state = jnp.zeros((4, S))
    out_before = enc.apply(params, state, imgs, train=False)
    out_after = enc.apply(updated, state, imgs, train=False)
    assert not np.allclose(np.asarray(out_before), np.asarray(out_after))


def test_bn_train_stats_exclude_padded_rows():
    """Train-mode BatchNorm with a sample mask must equal computing the
    stats over the real rows only (padded-tail exactness)."""
    import jax
    import jax.numpy as jnp

    from multimodn_tpu.encoders.resnet import _bn, _bn_init

    rng = np.random.default_rng(0)
    x = rng.normal(size=(6, 4, 4, 8)).astype(np.float32)
    x[4:] = 0.0                              # padded rows
    mask = np.array([1, 1, 1, 1, 0, 0], np.float32)
    p = _bn_init(8)
    full = _bn(jnp.asarray(x[:4]), p, True)          # real rows only
    masked = _bn(jnp.asarray(x), p, True, jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(masked)[:4], np.asarray(full),
                               rtol=1e-5, atol=1e-6)


def test_update_batch_stats_masked_padding():
    """Review finding: padded zero-image rows contaminated the BN EMA.
    With sample_mask, padded rows are excluded: stats from a padded batch
    equal stats from the unpadded batch."""
    import jax.numpy as jnp
    from multimodn_tpu.encoders.resnet import ResNet

    enc = ResNet(state_size=4)
    params = enc.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    imgs = rng.normal(size=(6, 32, 32, 3)).astype(np.float32)
    padded = np.concatenate([imgs, np.zeros((2, 32, 32, 3), np.float32)])
    mask = jnp.asarray([1, 1, 1, 1, 1, 1, 0, 0], jnp.float32)

    p_clean = enc.update_batch_stats(params, jnp.asarray(imgs))
    p_masked = enc.update_batch_stats(params, jnp.asarray(padded),
                                      sample_mask=mask)
    np.testing.assert_allclose(
        np.asarray(p_clean["stem"]["bn"]["mean"]),
        np.asarray(p_masked["stem"]["bn"]["mean"]), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(p_clean["stem"]["bn"]["var"]),
        np.asarray(p_masked["stem"]["bn"]["var"]), rtol=1e-4, atol=1e-5)
    # Deeper layers too: the re-run normalizes with MASKED batch stats, so
    # real-row activations (and hence all recorded stats) match unpadded.
    deep_clean = np.asarray(p_clean["stages"][1][0]["conv2"]["bn"]["mean"])
    deep_masked = np.asarray(p_masked["stages"][1][0]["conv2"]["bn"]["mean"])
    np.testing.assert_allclose(deep_clean, deep_masked, rtol=1e-4, atol=1e-5)
    # Unmasked padded stats DO differ (the original bug).
    p_unmasked = enc.update_batch_stats(params, jnp.asarray(padded))
    assert not np.allclose(np.asarray(p_clean["stem"]["bn"]["mean"]),
                           np.asarray(p_unmasked["stem"]["bn"]["mean"]))

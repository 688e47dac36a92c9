"""Tests for parity extras: gamma aug, deep-supervised UNet, pairwise
measures, feature extraction, UKBB-style policies."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

KEY = jax.random.key(0)


class TestGammaAug:
    def test_gamma_policy_changes_histogram(self):
        from maxstyle_tpu.data import augment as A
        p = A.AugPolicy(pad_hw=(32, 32), crop_hw=(32, 32), gamma_prob=1.0,
                        gamma_range=(2.0, 2.0))
        rng = np.random.RandomState(0)
        img = rng.rand(1, 32, 32).astype(np.float32)
        lab = np.zeros((1, 32, 32), np.int32)
        out, _ = A.augment_batch(KEY, jnp.asarray(img), jnp.asarray(lab), p)
        base, _ = A.norm_batch(jnp.asarray(img), jnp.asarray(lab), (32, 32))
        # gamma=2 darkens midtones
        assert float(np.asarray(out).mean()) < float(np.asarray(base).mean())


class TestDeepSupervision:
    def test_outputs_three_heads_full_res(self):
        from maxstyle_tpu.models.unet import DeeplySupervisedUNet
        from tests.helpers import jit_apply, jit_init
        net = DeeplySupervisedUNet(num_classes=4, feature_reduce=4)
        x = jnp.zeros((2, 32, 32, 1))
        v = jit_init(net, KEY, x, train=False)
        outs = jit_apply(net, v, x, train=False)
        assert len(outs) == 3
        assert all(o.shape == (2, 32, 32, 4) for o in outs)

    def test_unetv2(self):
        from maxstyle_tpu.models.unet import UNetv2
        from tests.helpers import jit_apply, jit_init
        net = UNetv2(num_classes=2, feature_reduce=4)
        x = jnp.zeros((2, 32, 32, 1))
        v = jit_init(net, KEY, x, train=False)
        y = jit_apply(net, v, x, train=False)
        assert y.shape == (2, 32, 32, 2)


class TestPairwiseMeasures:
    def test_measure_dict(self):
        from maxstyle_tpu.utils.pairwise_measures import PairwiseMeasures
        seg = np.zeros((16, 16), bool)
        ref = np.zeros((16, 16), bool)
        seg[4:10, 4:10] = True
        ref[4:10, 5:11] = True
        pm = PairwiseMeasures(seg, ref)
        d = pm.to_dict()
        assert 0 < d["dice"] < 1
        assert d["hd"] >= d["hd95"] >= 0
        assert np.isfinite(d["assd"])


class TestFeatureExtraction:
    def test_capture_intermediates(self):
        from maxstyle_tpu.models.encoder_decoder import Encoder
        from maxstyle_tpu.utils.features import extract_features
        enc = Encoder(out_ch=32, feature_reduce=4, act="relu")
        x = jnp.zeros((1, 32, 32, 1))
        v = jax.jit(lambda k, x: enc.init(k, x, train=False))(KEY, x)
        feats = extract_features(enc, v, x, train=False,
                                 filter_names=["down1", "down2"])
        assert len(feats) >= 2

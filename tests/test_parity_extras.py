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


class TestPairwiseMeasuresFull:
    """The full hausdorff_util.PairwiseMeasures surface (:92-563)."""

    def _pair(self):
        seg = np.zeros((16, 16), bool)
        ref = np.zeros((16, 16), bool)
        seg[2:6, 2:6] = True      # overlaps ref component A
        ref[3:7, 3:7] = True
        ref[10:13, 10:13] = True  # missed component (FN)
        seg[12:14, 2:4] = True    # spurious component (FP)
        return seg, ref

    def test_counts_and_rates(self):
        from maxstyle_tpu.utils.pairwise_measures import PairwiseMeasures
        seg, ref = self._pair()
        pm = PairwiseMeasures(seg, ref)
        assert pm.tp() == np.count_nonzero(seg & ref)
        assert pm.fp() + pm.tp() == pm.n_pos_seg()
        assert pm.fn() + pm.tp() == pm.n_pos_ref()
        assert pm.n_union() == pm.tp() + pm.fp() + pm.fn()
        np.testing.assert_allclose(
            pm.accuracy(), (pm.tp() + pm.tn()) / seg.size)
        np.testing.assert_allclose(
            pm.intersection_over_union(), pm.n_intersection() / pm.n_union())
        np.testing.assert_allclose(
            pm.informedness(), pm.sensitivity() + pm.specificity() - 1)
        np.testing.assert_allclose(
            pm.markedness(), pm.positive_predictive_values()
            + pm.negative_predictive_values() - 1)

    def test_connected_component_errors(self):
        from maxstyle_tpu.utils.pairwise_measures import PairwiseMeasures
        seg, ref = self._pair()
        pm = PairwiseMeasures(seg, ref)
        tpc, fpc, fnc = pm.connected_elements()
        assert (tpc, fpc, fnc) == (1, 1, 1)
        de, defp, defn = pm.detection_error()
        assert defp == 4 and defn == 9 and de == 13  # whole wrong components
        oer, oefp, oefn = pm.outline_error()
        # reference formula (hausdorff_util:513-530): OEFMap = ref - TPc*seg,
        # so OEFN = ref voxels not covered by TP-component seg (INCLUDING the
        # whole missed component), OEFP = TP-component seg voxels outside ref
        tpc, _, _ = pm.connected_errormaps()
        assert oefn == np.count_nonzero(ref & ~((tpc > 0) & seg))
        assert oefp == np.count_nonzero((tpc > 0) & seg & ~ref)
        assert oer > 0

    def test_com_distance_with_pixdim(self):
        from maxstyle_tpu.utils.pairwise_measures import PairwiseMeasures
        seg = np.zeros((8, 8), bool); seg[2, 2] = True
        ref = np.zeros((8, 8), bool); ref[2, 6] = True
        pm = PairwiseMeasures(seg, ref, pixdim=(1.0, 0.5))
        np.testing.assert_allclose(pm.com_dist(), 2.0)  # 4 cols * 0.5

    def test_header_and_to_string_protocol(self):
        from maxstyle_tpu.utils.pairwise_measures import PairwiseMeasures
        seg, ref = self._pair()
        pm = PairwiseMeasures(seg, ref, measures=["dice", "jaccard",
                                                  "connected_elements"])
        hdr = pm.header_str()
        row = pm.to_string()
        assert hdr == ",Dice,Jaccard,TPc,FPc,FNc"
        # tuple measures expand into as many cells as the header promises
        assert len(row.split(",")) == len(hdr.split(","))

    def test_regression_measures(self):
        from maxstyle_tpu.utils.pairwise_measures import RegressionMeasures
        rng = np.random.RandomState(0)
        ref = rng.rand(32, 32)
        reg = ref + 0.1
        rm = RegressionMeasures(reg, ref)
        np.testing.assert_allclose(rm.mse(), 0.01, rtol=1e-6)
        np.testing.assert_allclose(rm.rmse(), 0.1, rtol=1e-6)
        np.testing.assert_allclose(rm.mae(), 0.1, rtol=1e-6)
        assert rm.r2() < 1.0
        assert rm.header_str() == ",MSE,RMSE,MAE,R2"

    def test_r2_is_squared_pearson(self):
        """Reference r2 (hausdorff_util:584-591) is squared Pearson
        correlation: a constant bias still scores ~1."""
        from maxstyle_tpu.utils.pairwise_measures import RegressionMeasures
        ref = np.random.RandomState(2).rand(64, 64)
        rm = RegressionMeasures(ref + 0.35, ref)
        assert rm.r2() > 0.999

    def test_com_ref_pixdim_scaled_com_seg_not(self):
        from maxstyle_tpu.utils.pairwise_measures import PairwiseMeasures
        seg = np.zeros((8, 8), bool); seg[4, 4] = True
        ref = np.zeros((8, 8), bool); ref[2, 6] = True
        pm = PairwiseMeasures(seg, ref, pixdim=(2.0, 0.5))
        np.testing.assert_allclose(pm.com_ref(), (4.0, 3.0))  # scaled
        np.testing.assert_allclose(pm.com_seg(), (4.0, 4.0))  # voxel units

    def test_full_default_row_aligns_with_header(self):
        """Every default measure — including the tuple-valued COM cells —
        must keep row arity == header arity."""
        from maxstyle_tpu.utils.pairwise_measures import PairwiseMeasures
        seg, ref = self._pair()
        pm = PairwiseMeasures(seg, ref, pixdim=(1.0, 1.0))
        assert len(pm.to_string().split(",")) == len(pm.header_str().split(","))

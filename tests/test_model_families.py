"""Shape tests for the UNet / UNETR / FCN / ResConvUNet families + a Unet
solver train-step smoke."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from maxstyle_tpu.models.baselines import FCN, ResConvUNet
from maxstyle_tpu.models.unet import UNet, UnetDecoder, UnetEncoder
from maxstyle_tpu.models.unetr import UNETRDecoder, UNETREncoder
from tests.helpers import jit_apply, jit_init

KEY = jax.random.key(0)


class TestUnet:
    def test_encoder_pyramid_shapes(self):
        enc = UnetEncoder(feature_reduce=4)
        x = jnp.zeros((2, 64, 64, 1))
        v = jit_init(enc, KEY, x, train=False)
        z, z_s = jit_apply(enc, v, x, train=False)
        shapes = [t.shape for t in z]
        assert shapes == [(2, 64, 64, 16), (2, 32, 32, 32), (2, 16, 16, 64),
                          (2, 8, 8, 128), (2, 4, 4, 128)]

    def test_decoder_reconstructs_resolution(self):
        enc = UnetEncoder(feature_reduce=4)
        dec = UnetDecoder(out_ch=4, feature_reduce=4)
        x = jnp.zeros((2, 64, 64, 1))
        ev = jit_init(enc, KEY, x, train=False)
        z, _ = jit_apply(enc, ev, x, train=False)
        dv = jit_init(dec, KEY, z, train=False)
        y = jit_apply(dec, dv, z, train=False)
        assert y.shape == (2, 64, 64, 4)

    def test_code_filter_variant(self):
        enc = UnetEncoder(feature_reduce=4, enable_code_filter=True)
        x = jnp.zeros((2, 32, 32, 1))
        v = jit_init(enc, KEY, x, train=False)
        z, z_s = jit_apply(enc, v, x, train=False)
        assert all(a.shape == b.shape for a, b in zip(z, z_s))

    def test_monolithic_unet(self):
        net = UNet(num_classes=2, feature_reduce=4)
        x = jnp.zeros((2, 32, 32, 1))
        v = jit_init(net, KEY, x, train=False)
        y = jit_apply(net, v, x, train=False)
        assert y.shape == (2, 32, 32, 2)


@pytest.mark.slow
class TestUNETR:
    def test_encoder_pyramid_shapes(self):
        enc = UNETREncoder(img_size=64, feature_size=16)
        x = jnp.zeros((2, 64, 64, 1))
        v = jit_init(enc, KEY, x, train=False)
        z, _ = jit_apply(enc, v, x, train=False)
        shapes = [t.shape for t in z]
        assert shapes == [(2, 64, 64, 16), (2, 32, 32, 32), (2, 16, 16, 64),
                          (2, 8, 8, 128), (2, 4, 4, 768)]

    def test_decoder_output(self):
        enc = UNETREncoder(img_size=64, feature_size=16)
        dec = UNETRDecoder(out_ch=4, feature_size=16)
        x = jnp.zeros((2, 64, 64, 1))
        ev = jit_init(enc, KEY, x, train=False)
        z, _ = jit_apply(enc, ev, x, train=False)
        dv = jit_init(dec, KEY, z, train=False)
        y = jit_apply(dec, dv, z, train=False)
        assert y.shape == (2, 64, 64, 4)


class TestBaselines:
    def test_fcn_shapes(self):
        net = FCN(num_classes=4, feature_scale=4)
        x = jnp.zeros((2, 64, 64, 1))
        v = jit_init(net, KEY, x, train=False)
        y = jit_apply(net, v, x, train=False)
        assert y.shape == (2, 64, 64, 4)

    def test_resconvunet_shapes(self):
        net = ResConvUNet(num_classes=3, feature_scale=4)
        x = jnp.zeros((2, 32, 32, 1))
        v = jit_init(net, KEY, x, train=False)
        y = jit_apply(net, v, x, train=False)
        assert y.shape == (2, 32, 32, 3)

    def test_resconvunet_self_attention(self):
        net = ResConvUNet(num_classes=2, feature_scale=4, self_attention=True)
        x = jnp.zeros((2, 32, 32, 1))
        v = jit_init(net, KEY, x, train=False)
        y = jit_apply(net, v, x, train=False)
        assert y.shape == (2, 32, 32, 2)


@pytest.mark.slow
class TestUnetSolver:
    def test_unet_train_step_with_maxstyle(self):
        from maxstyle_tpu.solver import TripletSegmentationSolver
        from maxstyle_tpu.train_step import make_train_step
        from tests.test_train_step import small_config, synthetic_batch
        import dataclasses
        cfg = small_config(max_style=True)
        cfg = dataclasses.replace(
            cfg, segmentation_model=dataclasses.replace(
                cfg.segmentation_model, network_type="Unet_16"))
        solver = TripletSegmentationSolver(cfg)
        state = solver.init_state(jax.random.key(0), (64, 64), batch_size=4)
        step = make_train_step(solver)
        batch = synthetic_batch(jax.random.key(1))
        state, metrics = step(state, batch, jax.random.key(2))
        for k, v in metrics.items():
            assert np.isfinite(float(v)), k

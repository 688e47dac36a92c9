"""Tests for 3D blocks."""

import jax
import jax.numpy as jnp
import numpy as np

from maxstyle_tpu.models.blocks3d import FixableDropout3d, UnetConv3, UnetUp3
from tests.helpers import jit_apply, jit_init

KEY = jax.random.key(0)


class TestBlocks3D:
    def test_unet_conv3_shape(self):
        m = UnetConv3(out_ch=8)
        x = jnp.zeros((1, 4, 8, 8, 2))
        v = jit_init(m, KEY, x, train=False)
        y = jit_apply(m, v, x, train=False)
        assert y.shape == (1, 4, 8, 8, 8)

    def test_unet_up3_doubles_resolution(self):
        m = UnetUp3(out_ch=4)
        x = jnp.zeros((1, 2, 4, 4, 8))
        skip = jnp.zeros((1, 4, 8, 8, 4))
        v = jit_init(m, KEY, x, skip, train=False)
        y = jit_apply(m, v, x, skip, train=False)
        assert y.shape == (1, 4, 8, 8, 4)

    def test_dropout3d_replayable(self):
        m = FixableDropout3d(rate=0.5)
        x = jnp.ones((2, 4, 4, 4, 8))
        y1 = m.apply({}, x, rngs={"dropout": jax.random.key(3)})
        y2 = m.apply({}, x, rngs={"dropout": jax.random.key(3)})
        np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))
        y3 = m.apply({}, x, deterministic=True)
        np.testing.assert_array_equal(np.asarray(y3), np.asarray(x))

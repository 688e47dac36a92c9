"""BatchInstanceNorm{1,2,3}d + replace_bn_with_in / recover_model_w_bn.

Pins the dim-generic `layers.BatchInstanceNorm` against the reference's OWN
torch `custom_layers.BatchInstanceNorm{2,3}d` (via tests/reference_shim.py)
and exercises the flax-functional norm-swap helpers
(model_util.replace_bn_with_in:43-62, recover_model_w_bn:66-71).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from maxstyle_tpu.models import layers, norm_swap
from maxstyle_tpu.models.encoder_decoder import Encoder

KEY = jax.random.key(0)


def _ref_custom_layers():
    from tests.reference_shim import reference_module
    return reference_module("src.models.custom_layers")


def _pin_vs_reference(ndim_spatial: int):
    """Train-mode fwd + running-stat update + eval-mode fwd parity."""
    import torch
    cl = _ref_custom_layers()
    n, c = 4, 3
    spatial = (7, 8, 6)[:ndim_spatial]
    rng = np.random.RandomState(0)
    x = rng.randn(n, c, *spatial).astype(np.float32)
    w = rng.rand(c).astype(np.float32) + 0.5
    b = rng.randn(c).astype(np.float32)
    gate = np.array([0.2, 0.7, 1.3], np.float32)  # 1.3 exercises the clamp

    ref_cls = {2: cl.BatchInstanceNorm2d, 3: cl.BatchInstanceNorm3d}[
        ndim_spatial]
    ref = ref_cls(c)
    with torch.no_grad():
        ref.weight.copy_(torch.from_numpy(w))
        ref.bias.copy_(torch.from_numpy(b))
        ref.gate.copy_(torch.from_numpy(gate))
    ref.train()
    xt = torch.from_numpy(x)
    y_ref = ref(xt).detach().numpy()

    ours = layers.BatchInstanceNorm(expected_ndim=ndim_spatial + 2)
    # NCHW -> channels-last
    perm = (0,) + tuple(range(2, 2 + ndim_spatial)) + (1,)
    xj = jnp.asarray(np.transpose(x, perm))
    v = ours.init(KEY, xj, train=True)
    v = {"params": {"gate": jnp.asarray(gate), "scale": jnp.asarray(w),
                    "bias": jnp.asarray(b)},
         "batch_stats": v["batch_stats"]}
    y, upd = ours.apply(v, xj, train=True, mutable=["batch_stats"])
    inv = np.argsort(perm)
    np.testing.assert_allclose(np.transpose(np.asarray(y), inv), y_ref,
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(upd["batch_stats"]["mean"]),
                               ref.running_mean.numpy(), atol=1e-6)
    np.testing.assert_allclose(np.asarray(upd["batch_stats"]["var"]),
                               ref.running_var.numpy(), rtol=1e-5)

    ref.eval()
    y_ref_eval = ref(xt).detach().numpy()
    v_eval = {"params": v["params"], "batch_stats": upd["batch_stats"]}
    y_eval = ours.apply(v_eval, xj, train=False)
    np.testing.assert_allclose(np.transpose(np.asarray(y_eval), inv),
                               y_ref_eval, atol=2e-5)


class TestBatchInstanceNorm:
    def test_2d_pinned_vs_reference(self):
        _pin_vs_reference(2)

    def test_3d_reference_crashes_ours_matches_numpy(self):
        # Reference bug: custom_layers.py:368 scales the IN branch with
        # `in_w[None, :, None, None]` — a 4D-only broadcast — so the
        # reference's own BatchInstanceNorm3d (and 1d) CRASH on their
        # documented input ranks. Pin the crash, then validate our 3d
        # against an independent numpy derivation of the BIN math.
        import torch
        cl = _ref_custom_layers()
        ref = cl.BatchInstanceNorm3d(3)
        with pytest.raises(RuntimeError):
            ref(torch.randn(2, 3, 4, 5, 6))

        rng = np.random.RandomState(1)
        x = rng.randn(2, 4, 5, 6, 3).astype(np.float32)  # channels-last
        gate = np.array([0.2, 0.7, 1.0], np.float32)
        w = rng.rand(3).astype(np.float32) + 0.5
        b = rng.randn(3).astype(np.float32)
        eps = 1e-5
        mu_bn = x.mean(axis=(0, 1, 2, 3))
        var_bn = x.var(axis=(0, 1, 2, 3))
        bn = (x - mu_bn) / np.sqrt(var_bn + eps)
        mu_in = x.mean(axis=(1, 2, 3), keepdims=True)
        var_in = x.var(axis=(1, 2, 3), keepdims=True)
        inn = (x - mu_in) / np.sqrt(var_in + eps)
        expect = bn * (w * gate) + b + inn * (w * (1 - gate))

        m = layers.BatchInstanceNorm3d()
        v = m.init(KEY, jnp.asarray(x), train=True)
        v = {"params": {"gate": jnp.asarray(gate), "scale": jnp.asarray(w),
                        "bias": jnp.asarray(b)},
             "batch_stats": v["batch_stats"]}
        y, _ = m.apply(v, jnp.asarray(x), train=True,
                       mutable=["batch_stats"])
        np.testing.assert_allclose(np.asarray(y), expect, atol=2e-5)

    def test_1d_runs_and_dim_checks(self):
        # the reference's BatchInstanceNorm1d torch path is identical math;
        # here: shape + pure-BN-at-gate-1 sanity and the ndim guards.
        m = layers.BatchInstanceNorm1d()
        x = jax.random.normal(KEY, (4, 16, 3))
        v = m.init(KEY, x, train=True)
        y, _ = m.apply(v, x, train=True, mutable=["batch_stats"])
        assert y.shape == x.shape
        # gate init 1 => pure BN branch
        bn = layers.BatchNorm(use_running_average=False)
        vb = bn.init(KEY, x)
        yb, _ = bn.apply(vb, x, mutable=["batch_stats"])
        np.testing.assert_allclose(np.asarray(y), np.asarray(yb), atol=1e-6)
        with pytest.raises(ValueError):
            m.apply(v, x[None], train=True, mutable=["batch_stats"])
        with pytest.raises(ValueError):
            layers.BatchInstanceNorm3d().init(KEY, x, train=True)

    def test_affine_false_works_where_reference_crashes(self):
        # custom_layers.py:340-343 assigns gate=None for affine=False then
        # calls self.gate.data.fill_(1) -> AttributeError in the reference.
        cl = _ref_custom_layers()
        with pytest.raises(AttributeError):
            cl.BatchInstanceNorm2d(3, affine=False)
        m = layers.BatchInstanceNorm(affine=False, track_running_stats=False)
        x = jax.random.normal(KEY, (2, 8, 8, 3))
        v = m.init(KEY, x, train=True)
        assert set(v["params"]) == {"gate"} and "batch_stats" not in v
        y = m.apply(v, x, train=False)  # batch stats even in eval
        assert np.asarray(jnp.std(y)).item() == pytest.approx(1.0, abs=0.05)


def _small_encoder():
    enc = Encoder(out_ch=8, feature_reduce=16)
    x = jnp.linspace(0, 1, 2 * 32 * 32).reshape(2, 32, 32, 1)
    v = enc.init(jax.random.key(1), x, train=True)
    return enc, dict(v), x


class TestNormSwap:
    def test_replace_with_instance_non_affine(self):
        enc, v, x = _small_encoder()
        new_enc, nv = norm_swap.replace_bn_with_in(
            enc, v, jax.random.key(2), x, train=True)
        assert new_enc.norm == "instance"
        assert "batch_stats" not in nv or not nv["batch_stats"]
        # conv weights carry over
        np.testing.assert_array_equal(
            np.asarray(nv["params"]["inc"]["conv1"]["kernel"]),
            np.asarray(v["params"]["inc"]["conv1"]["kernel"]))
        # instance norm: train/eval forwards identical, no mutable state
        y_tr = new_enc.apply(nv, x, train=True,
                             rngs={"dropout": jax.random.key(3)})
        y_ev = new_enc.apply(nv, x, train=False)
        np.testing.assert_allclose(np.asarray(y_tr), np.asarray(y_ev),
                                   atol=1e-6)

    def test_replace_affine_carries_bn_scale_bias(self):
        enc, v, x = _small_encoder()
        new_enc, nv = norm_swap.replace_bn_with_in(
            enc, v, jax.random.key(2), x, train=True, affine=True)
        assert new_enc.norm == "instance_affine"
        old_scale = v["params"]["inc"]["norm1"]["BatchNorm_0"]["scale"]
        np.testing.assert_array_equal(
            np.asarray(nv["params"]["inc"]["norm1"]["scale"]),
            np.asarray(old_scale))

    def test_replace_with_bin_then_recover(self):
        enc, v, x = _small_encoder()
        bin_enc, bv = norm_swap.replace_bn_with_in(
            enc, v, jax.random.key(2), x, train=True, affine=True,
            bn_in=True)
        assert bin_enc.norm == "batch_instance"
        bin_norm = bv["params"]["inc"]["norm1"]["BatchInstanceNorm_0"]
        np.testing.assert_array_equal(np.asarray(bin_norm["gate"]), 1.0)
        np.testing.assert_array_equal(  # affine carried into the BIN layer
            np.asarray(bin_norm["scale"]),
            np.asarray(v["params"]["inc"]["norm1"]["BatchNorm_0"]["scale"]))
        # fresh running stats (reference recreates buffers, model_util:52-59)
        np.testing.assert_array_equal(
            np.asarray(
                bv["batch_stats"]["inc"]["norm1"]["BatchInstanceNorm_0"]
                ["var"]), 1.0)
        # gate=1 => identical to the BN model in train mode
        y_bin, _ = bin_enc.apply(bv, x, train=True, mutable=["batch_stats"],
                                 rngs={"dropout": jax.random.key(3)})
        y_bn, _ = enc.apply(v, x, train=True, mutable=["batch_stats"],
                            rngs={"dropout": jax.random.key(3)})
        np.testing.assert_allclose(np.asarray(y_bin), np.asarray(y_bn),
                                   atol=1e-5)

        rec_enc, rv = norm_swap.recover_model_w_bn(
            bin_enc, bv, jax.random.key(4), x, train=True)
        assert rec_enc.norm == "batch"
        # trained convs survive the round trip; BN affine + stats are fresh
        np.testing.assert_array_equal(
            np.asarray(rv["params"]["inc"]["conv1"]["kernel"]),
            np.asarray(v["params"]["inc"]["conv1"]["kernel"]))
        np.testing.assert_array_equal(
            np.asarray(rv["batch_stats"]["inc"]["norm1"]["BatchNorm_0"]
                       ["mean"]), 0.0)


class TestGateGradientDynamics:
    def test_out_of_range_gate_keeps_gradient(self):
        """torch clamps gate.data in-place each forward, so the stored
        parameter never leaves [0,1] and the boundary never kills the
        gradient. Our straight-through projection must likewise keep a
        live gradient when an optimizer step overshoots the bound —
        a plain jnp.clip would freeze the gate forever."""
        m = layers.BatchInstanceNorm()
        x = jnp.asarray(np.random.RandomState(0).randn(2, 5, 5, 3),
                        jnp.float32)
        v = m.init({"params": KEY}, x, train=True)

        def loss(params):
            y, _ = m.apply({**v, "params": params}, x, train=True,
                           mutable=["batch_stats"])
            return jnp.sum(y ** 2)

        for bad in (1.3, -0.2):
            params = jax.tree_util.tree_map(lambda p: p, v["params"])
            params = {**params, "gate": jnp.full((3,), bad, jnp.float32)}
            g = jax.grad(loss)(params)["gate"]
            assert np.abs(np.asarray(g)).min() > 0, (bad, g)

    def test_out_of_range_gate_value_is_clipped(self):
        # forward VALUE uses the clamped gate: 1.3 behaves exactly as 1.0
        m = layers.BatchInstanceNorm()
        x = jnp.asarray(np.random.RandomState(1).randn(2, 5, 5, 3),
                        jnp.float32)
        v = m.init({"params": KEY}, x, train=True)
        y13, _ = m.apply(
            {**v, "params": {**v["params"],
                             "gate": jnp.full((3,), 1.3)}},
            x, train=True, mutable=["batch_stats"])
        y10, _ = m.apply(
            {**v, "params": {**v["params"],
                             "gate": jnp.ones((3,))}},
            x, train=True, mutable=["batch_stats"])
        np.testing.assert_allclose(np.asarray(y13), np.asarray(y10),
                                   atol=1e-6)

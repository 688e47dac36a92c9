"""Shape/dtype tests for the model zoo + BN mode choreography checks."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from maxstyle_tpu.models.encoder_decoder import (Decoder, DualBranchEncoder,
                                                 Encoder,
                                                 decoder_style_channels)
from maxstyle_tpu.models.registry import build_modules, parse_network_type
from tests.helpers import jit_apply, jit_init

KEY = jax.random.key(0)


class TestEncoder:
    def test_output_stride_16_and_channels(self):
        enc = Encoder(out_ch=128, feature_reduce=4, act="relu")
        x = jnp.zeros((2, 64, 64, 1))
        variables = jit_init(enc, KEY, x, train=False)
        z = jit_apply(enc, variables, x, train=False)
        assert z.shape == (2, 4, 4, 128)

    def test_relu_head_nonnegative(self):
        enc = Encoder(out_ch=32, feature_reduce=4, act="relu")
        x = jax.random.normal(KEY, (2, 32, 32, 1))
        variables = jit_init(enc, KEY, x, train=False)
        z = jit_apply(enc, variables, x, train=False)
        assert float(jnp.min(z)) >= 0.0

    def test_domain_specific_bn_has_two_stat_sets(self):
        enc = Encoder(out_ch=32, feature_reduce=4, act="relu", num_domains=2)
        x = jnp.zeros((2, 32, 32, 1))
        variables = jit_init(enc, KEY, x, train=False)
        flat = jax.tree_util.tree_leaves_with_path(variables["batch_stats"])
        names = {"/".join(str(p) for p in path) for path, _ in flat}
        assert any("bn_domain0" in n for n in names)
        assert any("bn_domain1" in n for n in names)

    def test_train_mode_updates_batch_stats(self):
        enc = Encoder(out_ch=32, feature_reduce=4, act="relu")
        x = jax.random.normal(KEY, (4, 32, 32, 1)) * 3 + 1
        variables = jit_init(enc, KEY, x, train=False)
        _, updates = jit_apply(enc, variables, x, train=True, mutable=["batch_stats"])
        diff = jax.tree_util.tree_map(
            lambda a, b: float(jnp.max(jnp.abs(a - b))),
            variables["batch_stats"], updates["batch_stats"])
        assert max(jax.tree_util.tree_leaves(diff)) > 0


class TestDecoder:
    def test_upsamples_16x(self):
        dec = Decoder(out_ch=4, feature_reduce=4, up_type="NN")
        z = jnp.zeros((2, 4, 4, 128))
        variables = jit_init(dec, KEY, z, train=False)
        y = jit_apply(dec, variables, z, train=False)
        assert y.shape == (2, 64, 64, 4)

    def test_conv2_transposed_upsampling(self):
        dec = Decoder(out_ch=1, feature_reduce=4, up_type="Conv2", last_act="sigmoid")
        z = jnp.zeros((2, 4, 4, 128))
        variables = jit_init(dec, KEY, z, train=False)
        y = jit_apply(dec, variables, z, train=False)
        assert y.shape == (2, 64, 64, 1)
        assert float(jnp.min(y)) >= 0.0 and float(jnp.max(y)) <= 1.0

    def test_style_hooks_applied_at_every_index(self):
        dec = Decoder(out_ch=1, feature_reduce=4, up_type="NN")
        z = jax.random.normal(KEY, (2, 4, 4, 128))
        variables = jit_init(dec, KEY, z, train=False)
        chans = decoder_style_channels(4, 1)
        seen = {}

        def make_hook(i):
            def hook(x):
                seen[i] = x.shape[-1]
                return x
            return hook

        style_fns = {i: make_hook(i) for i in range(6)}
        y_plain = jit_apply(dec, variables, z, train=False)
        y_hooked = jit_apply(dec, variables, z, train=False, style_fns=style_fns)
        np.testing.assert_allclose(np.asarray(y_plain), np.asarray(y_hooked), atol=1e-6)
        assert [seen[i] for i in range(6)] == chans

    def test_instance_norm_head(self):
        dec = Decoder(out_ch=1, feature_reduce=4, up_type="Conv2",
                      last_act="instance_norm")
        z = jax.random.normal(KEY, (2, 4, 4, 128))
        variables = jit_init(dec, KEY, z, train=False)
        y = np.asarray(jit_apply(dec, variables, z, train=False))
        np.testing.assert_allclose(y.mean(axis=(1, 2)), 0.0, atol=1e-4)


class TestDualBranch:
    def test_forward_returns_two_codes(self):
        m = DualBranchEncoder(z_level_1_ch=128, z_level_2_ch=128, feature_reduce=4)
        x = jnp.zeros((2, 64, 64, 1))
        variables = jit_init(m, KEY, x, train=False)
        z, z_s = jit_apply(m, variables, x, train=False)
        assert z.shape == (2, 4, 4, 128) and z_s.shape == (2, 4, 4, 128)

    def test_filter_code_method_matches_forward(self):
        m = DualBranchEncoder(z_level_1_ch=128, z_level_2_ch=128, feature_reduce=4)
        x = jax.random.normal(KEY, (2, 64, 64, 1))
        variables = jit_init(m, KEY, x, train=False)
        z, z_s = jit_apply(m, variables, x, train=False)
        z2 = jit_apply(m, variables, x, train=False, method=m.encode)
        z_s2 = jit_apply(m, variables, z2, train=False, method=m.filter_code)
        np.testing.assert_allclose(np.asarray(z_s), np.asarray(z_s2), atol=1e-6)


class TestRegistry:
    def test_parse_fcn_16_standard_no_stn(self):
        spec = parse_network_type("FCN_16_standard_no_STN")
        assert spec.feature_reduce == 4
        assert not spec.has_stn
        assert spec.has_image_recon
        assert spec.image_decoder_up == "Conv2"
        assert spec.image_decoder_last_act == "sigmoid"

    def test_parse_variants(self):
        assert parse_network_type("FCN_64_standard_no_STN").feature_reduce == 1
        assert parse_network_type("DS_FCN_16_standard").num_domains == 2
        assert parse_network_type("FCN_16_standard").has_stn
        assert parse_network_type("FCN_16_standard").shape_input_mode == "seg_only"
        assert parse_network_type("FCN_16_standard_w_dual_image").shape_input_mode == "w_dual_image"
        assert not parse_network_type("FCN_16_standard_no_STN_no_im_recon").has_image_recon
        assert parse_network_type("FCN_16_standard_share_code").share_code
        assert parse_network_type("FCN_16_standard_w_o_filter").no_filter
        assert parse_network_type("FCN_16_standard_NN_decoder").image_decoder_up == "NN"
        assert parse_network_type(
            "FCN_64_standard_no_STN_z_score").image_decoder_last_act == "instance_norm"
        assert parse_network_type(
            "FCN_64_standard_no_STN_identity").image_decoder_last_act is None

    def test_build_modules_no_stn(self):
        spec = parse_network_type("FCN_16_standard_no_STN")
        mods = build_modules(spec)
        assert set(mods) == {"image_encoder", "segmentation_decoder", "image_decoder"}

    def test_build_modules_with_stn(self):
        spec = parse_network_type("FCN_16_standard")
        mods = build_modules(spec)
        assert set(mods) == {"image_encoder", "segmentation_decoder",
                             "image_decoder", "shape_encoder", "shape_decoder"}


class TestSpectralNorm:
    """res_convdown's if_SN option (encoder_decoder.py:29-51): every conv in
    the down block runs under spectral normalization."""

    def test_sn_blocks_forward_and_track_sigma(self):
        from maxstyle_tpu.models.layers import ResConvDown
        m = ResConvDown(8, if_sn=True)
        x = jnp.ones((2, 16, 16, 4))
        v = jit_init(m, jax.random.key(0), x, train=True)
        # one sigma/u pair per conv (down, conv1, conv2, conv_input)
        sn_groups = [k for k in v["batch_stats"] if k.startswith("SpectralNorm")]
        assert len(sn_groups) == 4
        out, mut = m.apply(v, x, train=True, mutable=["batch_stats"])
        assert out.shape == (2, 8, 8, 8)
        assert bool(jnp.all(jnp.isfinite(out)))

    def test_sigma_converges_to_top_singular_value(self):
        from maxstyle_tpu.models.layers import ResConvDown
        m = ResConvDown(8, if_sn=True)
        x = jnp.asarray(np.random.RandomState(0).rand(2, 16, 16, 4), jnp.float32)
        v = jit_init(m, jax.random.key(0), x, train=True)
        # several power iterations (one per training forward)
        for _ in range(30):
            _, mut = m.apply(v, x, train=True, mutable=["batch_stats"])
            v = {"params": v["params"], "batch_stats": mut["batch_stats"]}
        kern = np.asarray(v["params"]["conv1"]["kernel"])
        true_sigma = np.linalg.svd(kern.reshape(-1, kern.shape[-1]),
                                   compute_uv=False)[0]
        sn = [g for g in v["batch_stats"] if "SpectralNorm" in g]
        sigmas = {kk: float(vv) for g in sn
                  for kk, vv in v["batch_stats"][g].items() if "sigma" in kk}
        got = sigmas["conv1/kernel/sigma"]
        np.testing.assert_allclose(got, true_sigma, rtol=1e-2)

    def test_encoder_if_sn_plumbing(self):
        enc = DualBranchEncoder(z_level_1_ch=16, z_level_2_ch=16,
                                feature_reduce=8, if_sn=True)
        x = jnp.ones((1, 32, 32, 1))
        v = jit_init(enc, jax.random.key(0), x, train=False)
        z, zs = jit_apply(enc, v, x, train=False)
        assert z.shape == (1, 2, 2, 16) and zs.shape == (1, 2, 2, 16)


class TestDecoderSplit:
    """Prefix/suffix split used to hoist the style-independent decoder
    prefix out of the MaxStyle inner loop: composition must equal the
    monolithic forward exactly."""

    def test_split_composition_is_exact(self):
        dec = Decoder(out_ch=1, feature_reduce=8, up_type="NN",
                      last_act="sigmoid")
        z = jnp.asarray(np.random.RandomState(0).rand(2, 4, 4, 64),
                        jnp.float32)
        v = jit_init(dec, jax.random.key(0), z, train=False)
        style_fns = {3: lambda x: x * 1.5 + 0.1, 5: lambda x: 1.0 - x}
        full = dec.apply(v, z, train=False, style_fns=style_fns)
        for k in (1, 2, 3):
            prefix = dec.apply(v, z, train=False, stop_before_hook=k)
            out = dec.apply(v, prefix, train=False, style_fns=style_fns,
                            start_at_hook=k)
            np.testing.assert_array_equal(np.asarray(out), np.asarray(full),
                                          err_msg=f"split at {k}")

    def test_param_structure_unchanged(self):
        dec = Decoder(out_ch=4, feature_reduce=8)
        z = jnp.zeros((1, 4, 4, 64))
        v = jit_init(dec, jax.random.key(0), z, train=False)
        names = set(v["params"])
        assert names == {"up1", "up2", "up3", "up4", "final_conv"}

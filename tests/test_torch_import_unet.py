"""UNet torch-import mapping: structural/shape agreement with our modules
(numeric parity of the underlying conv/BN/transposed-conv conversions is
established by test_torch_parity.py and test_torch_import_encoder.py)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from maxstyle_tpu.models.unet import UnetDecoder, UnetEncoder  # noqa: E402
from maxstyle_tpu.utils import torch_import as ti  # noqa: E402


def rnd(rng, *shape):
    return rng.randn(*shape).astype(np.float32)


def bn(rng, sd, name, c):
    sd[f"{name}.weight"] = rnd(rng, c)
    sd[f"{name}.bias"] = rnd(rng, c)
    sd[f"{name}.running_mean"] = rnd(rng, c)
    sd[f"{name}.running_var"] = np.abs(rnd(rng, c)) + 0.5


def dconv(rng, sd, prefix, cin, cout):
    sd[f"{prefix}.0.weight"] = rnd(rng, cout, cin, 3, 3)
    sd[f"{prefix}.0.bias"] = rnd(rng, cout)
    bn(rng, sd, f"{prefix}.1", cout)
    sd[f"{prefix}.3.weight"] = rnd(rng, cout, cout, 3, 3)
    sd[f"{prefix}.3.bias"] = rnd(rng, cout)
    bn(rng, sd, f"{prefix}.4", cout)


def keypaths(tree):
    return {jax.tree_util.keystr(p)
            for p, _ in jax.tree_util.tree_leaves_with_path(tree)}


def test_unet_encoder_import_structure():
    rng = np.random.RandomState(0)
    r = 4
    chans = [64 // r, 128 // r, 256 // r, 512 // r, 512 // r]
    sd = {}
    dconv(rng, sd, "inc.conv.conv", 1, chans[0])
    cin = chans[0]
    for i, cout in enumerate(chans[1:], 1):
        dconv(rng, sd, f"down{i}.mpconv.1.conv", cin, cout)
        cin = cout
    params, stats = ti.convert_unet_encoder(sd)

    enc = UnetEncoder(feature_reduce=4)
    init = jax.jit(lambda k, x: enc.init(k, x, train=False))(
        jax.random.key(0), jnp.zeros((1, 32, 32, 1)))
    assert keypaths(init["params"]) == keypaths(params)
    for (pa, a), (pb, b) in zip(
            sorted(jax.tree_util.tree_leaves_with_path(init["params"]),
                   key=lambda t: jax.tree_util.keystr(t[0])),
            sorted(jax.tree_util.tree_leaves_with_path(params),
                   key=lambda t: jax.tree_util.keystr(t[0]))):
        assert a.shape == np.asarray(b).shape, jax.tree_util.keystr(pa)
    # imported weights produce a working forward
    out, _ = enc.apply({"params": params, "batch_stats": stats},
                       jnp.ones((1, 32, 32, 1)), train=False)
    assert out[-1].shape == (1, 2, 2, 128)


def test_unet_decoder_import_structure():
    rng = np.random.RandomState(1)
    r = 4
    sd = {}
    # up{i}: in = skip + up channels
    dconv(rng, sd, "up1.conv.conv", (512 + 512) // r, 256 // r)
    dconv(rng, sd, "up2.conv.conv", (256 + 256) // r, 128 // r)
    dconv(rng, sd, "up3.conv.conv", (128 + 128) // r, 64 // r)
    dconv(rng, sd, "up4.conv.conv", (64 + 64) // r, 64 // r)
    sd["outc.conv.weight"] = rnd(rng, 4, 64 // r, 1, 1)
    sd["outc.conv.bias"] = rnd(rng, 4)
    params, stats = ti.convert_unet_decoder(sd)

    dec = UnetDecoder(out_ch=4, feature_reduce=4)
    feats = [jnp.zeros((1, 32, 32, 16)), jnp.zeros((1, 16, 16, 32)),
             jnp.zeros((1, 8, 8, 64)), jnp.zeros((1, 4, 4, 128)),
             jnp.zeros((1, 2, 2, 128))]
    init = jax.jit(lambda k: dec.init(k, feats, train=False))(jax.random.key(0))
    assert keypaths(init["params"]) == keypaths(params)
    out = dec.apply({"params": params, "batch_stats": stats}, feats,
                    train=False)
    assert out.shape == (1, 32, 32, 4)


def torch_double_conv(x, sd, prefix):
    import torch.nn.functional as F

    def tbn(v, name):
        s = (1, -1, 1, 1)
        return ((v - torch.from_numpy(sd[f"{name}.running_mean"]).view(s))
                / torch.sqrt(torch.from_numpy(sd[f"{name}.running_var"]).view(s)
                             + 1e-5)
                * torch.from_numpy(sd[f"{name}.weight"]).view(s)
                + torch.from_numpy(sd[f"{name}.bias"]).view(s))

    x = F.conv2d(x, torch.from_numpy(sd[f"{prefix}.0.weight"]),
                 torch.from_numpy(sd[f"{prefix}.0.bias"]), padding=1)
    x = F.relu(tbn(x, f"{prefix}.1"))
    x = F.conv2d(x, torch.from_numpy(sd[f"{prefix}.3.weight"]),
                 torch.from_numpy(sd[f"{prefix}.3.bias"]), padding=1)
    return F.relu(tbn(x, f"{prefix}.4"))


def test_unet_full_forward_numerical_parity():
    """FULL UNet encoder+decoder forward vs a torch-functional execution of
    the documented architecture (unet.py:15-110 + unet_parts double_conv /
    down(maxpool) / up(align_corners=True bilinear, cat [skip, up]) /
    outconv) — upgrades the round-1 structural check to numerics."""
    import torch.nn.functional as F

    rng = np.random.RandomState(7)
    r = 8
    chans = [64 // r, 128 // r, 256 // r, 512 // r, 512 // r]
    sd = {}
    dconv(rng, sd, "inc.conv.conv", 1, chans[0])
    cin = chans[0]
    for i, cout in enumerate(chans[1:], 1):
        dconv(rng, sd, f"down{i}.mpconv.1.conv", cin, cout)
        cin = cout
    dec_sd = {}
    dconv(rng, dec_sd, "up1.conv.conv", (512 + 512) // r, 256 // r)
    dconv(rng, dec_sd, "up2.conv.conv", (256 + 256) // r, 128 // r)
    dconv(rng, dec_sd, "up3.conv.conv", (128 + 128) // r, 64 // r)
    dconv(rng, dec_sd, "up4.conv.conv", (64 + 64) // r, 64 // r)
    dec_sd["outc.conv.weight"] = rnd(rng, 4, 64 // r, 1, 1)
    dec_sd["outc.conv.bias"] = rnd(rng, 4)

    # condition the random weights (fan-in scaling) so 18 stacked convs
    # keep activations O(1) — raw randn kernels explode to ~1e12, where
    # fp32 accumulation-order noise exceeds any sensible tolerance
    for d in (sd, dec_sd):
        for k, v in d.items():
            if v.ndim == 4:
                d[k] = (v / np.sqrt(9.0 * v.shape[1])).astype(np.float32)

    x = rng.rand(2, 32, 32, 1).astype(np.float32)

    # torch-functional reference forward
    with torch.no_grad():
        t = torch.from_numpy(x.transpose(0, 3, 1, 2))
        f1 = torch_double_conv(t, sd, "inc.conv.conv")
        feats_t = [f1]
        h = f1
        for i in range(1, 5):
            h = F.max_pool2d(h, 2)
            h = torch_double_conv(h, sd, f"down{i}.mpconv.1.conv")
            feats_t.append(h)
        u = feats_t[4]
        for i, skip in enumerate([feats_t[3], feats_t[2], feats_t[1],
                                  feats_t[0]], 1):
            u = F.interpolate(u, scale_factor=2, mode="bilinear",
                              align_corners=True)
            u = torch.cat([skip, u], dim=1)  # [x2, x1] order (unet_parts up)
            u = torch_double_conv(u, dec_sd, f"up{i}.conv.conv")
        out_t = F.conv2d(u, torch.from_numpy(dec_sd["outc.conv.weight"]),
                         torch.from_numpy(dec_sd["outc.conv.bias"]))
    out_t = out_t.numpy().transpose(0, 2, 3, 1)

    # ours with imported weights
    enc_params, enc_stats = ti.convert_unet_encoder(sd)
    dec_params, dec_stats = ti.convert_unet_decoder(dec_sd)
    enc = UnetEncoder(feature_reduce=r)
    dec = UnetDecoder(out_ch=4, feature_reduce=r)
    feats, _ = enc.apply({"params": enc_params, "batch_stats": enc_stats},
                         jnp.asarray(x), train=False)
    out = dec.apply({"params": dec_params, "batch_stats": dec_stats},
                    feats, train=False)
    np.testing.assert_allclose(np.asarray(out), out_t, rtol=1e-3, atol=1e-4)


def test_bilinear_upsample_matches_torch_align_corners():
    import torch.nn.functional as F

    from maxstyle_tpu.models.layers import upsample2x
    x = np.random.RandomState(0).rand(1, 7, 9, 3).astype(np.float32)
    want = F.interpolate(torch.from_numpy(x.transpose(0, 3, 1, 2)),
                         scale_factor=2, mode="bilinear",
                         align_corners=True).numpy().transpose(0, 2, 3, 1)
    got = np.asarray(upsample2x(jnp.asarray(x), "bilinear"))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

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

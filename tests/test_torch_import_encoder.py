"""Encoder/dual-branch torch-import validation with synthetic weights.

No pretrained encoder fixture ships with the reference, so we synthesize a
state dict in the reference's naming scheme (general_encoder.inc.0…,
code_decoupler.0…), import it, and compare our Flax forward against an
independent torch-functional execution of the documented encoder
architecture (encoder_decoder.MyEncoder:423-482 + code_decoupler:648-668).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from maxstyle_tpu.models.encoder_decoder import DualBranchEncoder  # noqa: E402
from maxstyle_tpu.utils import torch_import as ti  # noqa: E402


def rnd(rng, *shape):
    return torch.from_numpy(rng.randn(*shape).astype(np.float32) * 0.1)


def bn_entries(rng, sd, name, c):
    sd[f"{name}.weight"] = rnd(rng, c).abs() + 0.5
    sd[f"{name}.bias"] = rnd(rng, c)
    sd[f"{name}.running_mean"] = rnd(rng, c)
    sd[f"{name}.running_var"] = rnd(rng, c).abs() + 0.5


def conv_entries(rng, sd, name, cin, cout, k, bias=True):
    sd[f"{name}.weight"] = rnd(rng, cout, cin, k, k)
    if bias:
        sd[f"{name}.bias"] = rnd(rng, cout)


def make_encoder_sd(rng, r=4, in_ch=1, out_ch=128):
    """State dict in the reference's Dual_Branch_Encoder naming."""
    sd = {}
    p = "general_encoder"
    chans = [64 // r, 128 // r, 256 // r, 512 // r, 512 // r]
    conv_entries(rng, sd, f"{p}.inc.0", in_ch, chans[0], 3)
    bn_entries(rng, sd, f"{p}.inc.1", chans[0])
    conv_entries(rng, sd, f"{p}.inc.3", chans[0], chans[0], 3)
    bn_entries(rng, sd, f"{p}.inc.4", chans[0])
    cin = chans[0]
    for i, cout in enumerate(chans[1:], start=1):
        conv_entries(rng, sd, f"{p}.down{i}.down", cin, cin, 3)
        conv_entries(rng, sd, f"{p}.down{i}.conv.0", cin, cout, 3)
        bn_entries(rng, sd, f"{p}.down{i}.conv.1", cout)
        conv_entries(rng, sd, f"{p}.down{i}.conv.3", cout, cout, 3)
        bn_entries(rng, sd, f"{p}.down{i}.conv.4", cout)
        conv_entries(rng, sd, f"{p}.down{i}.conv_input", cin, cout, 1)
        cin = cout
    conv_entries(rng, sd, f"{p}.final_conv.0", cin, out_ch, 1)
    bn_entries(rng, sd, f"{p}.final_conv.1", out_ch)
    conv_entries(rng, sd, "code_decoupler.0", out_ch, out_ch, 3, bias=False)
    bn_entries(rng, sd, "code_decoupler.1", out_ch)
    conv_entries(rng, sd, "code_decoupler.3", out_ch, out_ch, 3, bias=False)
    bn_entries(rng, sd, "code_decoupler.4", out_ch)
    return sd


def t_bn(x, sd, name, eps=1e-5):
    s = (1, -1, 1, 1)
    return ((x - sd[f"{name}.running_mean"].view(s))
            / torch.sqrt(sd[f"{name}.running_var"].view(s) + eps)
            * sd[f"{name}.weight"].view(s) + sd[f"{name}.bias"].view(s))


def torch_encoder_forward(x, sd):
    import torch.nn.functional as F
    p = "general_encoder"
    h = F.conv2d(x, sd[f"{p}.inc.0.weight"], sd[f"{p}.inc.0.bias"], padding=1)
    h = F.leaky_relu(t_bn(h, sd, f"{p}.inc.1"), 0.2)
    h = F.conv2d(h, sd[f"{p}.inc.3.weight"], sd[f"{p}.inc.3.bias"], padding=1)
    h = t_bn(h, sd, f"{p}.inc.4")
    h = F.leaky_relu(h, 0.2)
    for i in range(1, 5):
        q = f"{p}.down{i}"
        h = F.conv2d(h, sd[f"{q}.down.weight"], sd[f"{q}.down.bias"],
                     stride=2, padding=1)
        b = F.conv2d(h, sd[f"{q}.conv.0.weight"], sd[f"{q}.conv.0.bias"],
                     padding=1)
        b = F.leaky_relu(t_bn(b, sd, f"{q}.conv.1"), 0.2)
        b = F.conv2d(b, sd[f"{q}.conv.3.weight"], sd[f"{q}.conv.3.bias"],
                     padding=1)
        b = t_bn(b, sd, f"{q}.conv.4")
        skip = F.conv2d(h, sd[f"{q}.conv_input.weight"],
                        sd[f"{q}.conv_input.bias"])
        h = F.leaky_relu(skip + b, 0.2)
    h = F.conv2d(h, sd[f"{p}.final_conv.0.weight"], sd[f"{p}.final_conv.0.bias"])
    z = torch.relu(t_bn(h, sd, f"{p}.final_conv.1"))
    # code decoupler
    d = F.conv2d(z, sd["code_decoupler.0.weight"], padding=1)
    d = F.leaky_relu(t_bn(d, sd, "code_decoupler.1"), 0.2)
    d = F.conv2d(d, sd["code_decoupler.3.weight"], padding=1)
    z_s = torch.relu(t_bn(d, sd, "code_decoupler.4"))
    return z, z_s


def test_dual_branch_encoder_import_parity():
    rng = np.random.RandomState(0)
    sd_t = make_encoder_sd(rng)
    x = rng.rand(2, 64, 64, 1).astype(np.float32)

    with torch.no_grad():
        z_ref, zs_ref = torch_encoder_forward(
            torch.from_numpy(x.transpose(0, 3, 1, 2)), sd_t)
    z_ref = z_ref.numpy().transpose(0, 2, 3, 1)
    zs_ref = zs_ref.numpy().transpose(0, 2, 3, 1)

    sd = {k: v.numpy() for k, v in sd_t.items()}
    params, stats = ti.convert_dual_branch_encoder(sd)
    enc = DualBranchEncoder(z_level_1_ch=128, z_level_2_ch=128,
                            feature_reduce=4)
    # structural agreement with a fresh init
    init = jax.jit(lambda k, xx: enc.init(k, xx, train=False))(
        jax.random.key(0), jnp.asarray(x))
    a = {jax.tree_util.keystr(p) for p, _ in
         jax.tree_util.tree_leaves_with_path(init["params"])}
    b = {jax.tree_util.keystr(p) for p, _ in
         jax.tree_util.tree_leaves_with_path(params)}
    assert a == b, a.symmetric_difference(b)

    z, z_s = enc.apply({"params": params, "batch_stats": stats},
                       jnp.asarray(x), train=False)
    # atol 5e-4: activations reach ~40 through 5 conv+BN stages, and
    # layers.BatchNorm's eval math ((x-mean)*rsqrt then *scale) associates
    # floats differently from torch's fused (x-mean)*(scale*rsqrt) —
    # lone near-zero elements can drift ~2e-4 abs (seen: 1/4096 elements).
    np.testing.assert_allclose(np.asarray(z), z_ref, rtol=1e-3, atol=5e-4)
    np.testing.assert_allclose(np.asarray(z_s), zs_ref, rtol=1e-3, atol=5e-4)

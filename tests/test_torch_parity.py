"""Numerical parity against the reference's PRETRAINED checkpoints.

The reference ships trained decoder weights
(/root/reference/notebooks/model/{image,segmentation}_decoder.pth) and a real
cardiac image fixture (notebooks/data/image.npy). We import the torch state
dicts into our Flax decoders (utils/torch_import.py) and compare eval-mode
outputs against an INDEPENDENT torch-functional execution of the documented
architecture — bitwise-level proof that layer semantics, layouts, BN math
and activation chains match the reference implementation.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from maxstyle_tpu.models.encoder_decoder import Decoder  # noqa: E402
from maxstyle_tpu.utils import torch_import as ti  # noqa: E402

IMAGE_DEC = "/root/reference/notebooks/model/image_decoder.pth"
SEG_DEC = "/root/reference/notebooks/model/segmentation_decoder.pth"
IMAGE_NPY = "/root/reference/notebooks/data/image.npy"

import os  # noqa: E402

needs_fixtures = pytest.mark.skipif(
    not (os.path.exists(IMAGE_DEC) and os.path.exists(SEG_DEC)),
    reason="reference fixtures unavailable")


def torch_bn_eval(x, sd, name, eps=1e-5):
    w = sd[f"{name}.weight"]
    b = sd[f"{name}.bias"]
    m = sd[f"{name}.running_mean"]
    v = sd[f"{name}.running_var"]
    shape = (1, -1, 1, 1)
    return ((x - m.view(shape)) / torch.sqrt(v.view(shape) + eps)
            * w.view(shape) + b.view(shape))


def torch_res_up(x, sd, prefix, up_type):
    import torch.nn.functional as F
    if up_type == "NN":
        x = F.interpolate(x, scale_factor=2, mode="nearest")
    else:  # Conv2: transposed conv k2 s2
        x = F.conv_transpose2d(x, sd[f"{prefix}.up.weight"],
                               sd[f"{prefix}.up.bias"], stride=2)
    h = F.conv2d(x, sd[f"{prefix}.conv.0.weight"], sd[f"{prefix}.conv.0.bias"],
                 padding=1)
    h = torch_bn_eval(h, sd, f"{prefix}.conv.1")
    h = F.leaky_relu(h, 0.2)
    h = F.conv2d(h, sd[f"{prefix}.conv.3.weight"], sd[f"{prefix}.conv.3.bias"],
                 padding=1)
    h = torch_bn_eval(h, sd, f"{prefix}.conv.4")
    skip = F.conv2d(x, sd[f"{prefix}.conv_input.weight"],
                    sd[f"{prefix}.conv_input.bias"])
    return F.leaky_relu(skip + h, 0.2)


def torch_decoder_forward(z_nchw, sd, up_type, last_act):
    import torch.nn.functional as F
    x = z_nchw
    for i in range(1, 5):
        x = torch_res_up(x, sd, f"up{i}", up_type)
    x = F.conv2d(x, sd["final_conv.weight"], sd["final_conv.bias"])
    if last_act == "sigmoid":
        x = torch.sigmoid(x)
    return x


@needs_fixtures
@pytest.mark.parametrize("path,up_type,last_act,out_ch", [
    (SEG_DEC, "NN", None, 4),
    (IMAGE_DEC, "Conv2", "sigmoid", 1),
])
def test_decoder_parity_with_pretrained_reference_weights(path, up_type,
                                                          last_act, out_ch):
    sd_t = torch.load(path, map_location="cpu")
    rng = np.random.RandomState(0)
    z = rng.randn(2, 12, 12, 128).astype(np.float32) * 0.5

    # torch functional forward (NCHW)
    with torch.no_grad():
        ref = torch_decoder_forward(torch.from_numpy(z.transpose(0, 3, 1, 2)),
                                    sd_t, up_type, last_act)
    ref = ref.numpy().transpose(0, 2, 3, 1)

    # our decoder with imported weights
    dec = Decoder(out_ch=out_ch, feature_reduce=4, up_type=up_type,
                  last_act=last_act)
    variables_init = jax.jit(
        lambda k, x: dec.init(k, x, train=False))(jax.random.key(0),
                                                  jnp.asarray(z))
    params, stats = ti.convert_decoder(ti.load_torch_state_dict(path), up_type)
    # structure check: imported tree must match the initialized tree
    init_paths = {jax.tree_util.keystr(p)
                  for p, _ in jax.tree_util.tree_leaves_with_path(
                      variables_init["params"])}
    imp_paths = {jax.tree_util.keystr(p)
                 for p, _ in jax.tree_util.tree_leaves_with_path(params)}
    assert init_paths == imp_paths, (
        init_paths.symmetric_difference(imp_paths))
    for (pa, a), (pb, b) in zip(
            sorted(jax.tree_util.tree_leaves_with_path(variables_init["params"]),
                   key=lambda t: jax.tree_util.keystr(t[0])),
            sorted(jax.tree_util.tree_leaves_with_path(params),
                   key=lambda t: jax.tree_util.keystr(t[0]))):
        assert a.shape == np.asarray(b).shape, (jax.tree_util.keystr(pa),
                                                a.shape, np.asarray(b).shape)

    out = dec.apply({"params": params, "batch_stats": stats},
                    jnp.asarray(z), train=False)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-3, atol=1e-4)


@needs_fixtures
def test_image_fixture_decodes_to_valid_image():
    """End-to-end sanity on the real cardiac fixture: the pretrained image
    decoder maps a latent to a [0,1] image of the right shape."""
    sd = ti.load_torch_state_dict(IMAGE_DEC)
    params, stats = ti.convert_decoder(sd, "Conv2")
    dec = Decoder(out_ch=1, feature_reduce=4, up_type="Conv2",
                  last_act="sigmoid")
    z = jnp.asarray(np.random.RandomState(1).rand(1, 12, 12, 128), jnp.float32)
    out = dec.apply({"params": params, "batch_stats": stats}, z, train=False)
    arr = np.asarray(out)
    assert arr.shape == (1, 192, 192, 1)
    assert 0.0 <= arr.min() and arr.max() <= 1.0

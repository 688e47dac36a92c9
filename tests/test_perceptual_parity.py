"""VGG perceptual loss numerics vs a torch-functional execution
(custom_loss.VGGPerceptualLoss:692-738). Pretrained ImageNet weights are
not downloadable here (zero egress), so a synthetic VGG16 state dict in
torchvision's `features.{i}` layout exercises the exact same code path a
real checkpoint would: layout conversion, block boundaries, channel
replication, ImageNet normalization, 224 bilinear resize
(align_corners=False == jax half-pixel linear), per-block L1 accumulation.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from maxstyle_tpu.ops import perceptual as P  # noqa: E402

# small-channel VGG16-shaped plan to keep the test fast: same topology,
# scaled channels
SMALL_PLAN = [(8, 2), (16, 2), (24, 3), (32, 3), (32, 3)]


@pytest.fixture()
def small_plan(monkeypatch):
    monkeypatch.setattr(P, "_VGG16_PLAN", SMALL_PLAN)
    return SMALL_PLAN


def make_tv_sd(rng, plan):
    """torchvision-layout state dict for the scaled plan."""
    sd = {}
    cin = 3
    for conv_ids, (ch, n_convs) in zip(P._TORCHVISION_CONV_IDX, plan):
        for fi in conv_ids[:n_convs]:
            sd[f"features.{fi}.weight"] = torch.from_numpy(
                rng.randn(ch, cin, 3, 3).astype(np.float32) * 0.1)
            sd[f"features.{fi}.bias"] = torch.from_numpy(
                rng.randn(ch).astype(np.float32) * 0.1)
            cin = ch
    return sd


def torch_perceptual(sd, plan, x_np, y_np, layers=(1, 2, 3, 4)):
    import torch.nn.functional as F
    mean = torch.tensor([0.485, 0.456, 0.406]).view(1, 3, 1, 1)
    std = torch.tensor([0.229, 0.224, 0.225]).view(1, 3, 1, 1)

    def prep(a):
        t = torch.from_numpy(a.transpose(0, 3, 1, 2))
        if t.shape[1] != 3:
            t = t.repeat(1, 3, 1, 1)
        t = (t - mean) / std
        return F.interpolate(t, mode="bilinear", size=(224, 224),
                             align_corners=False)

    def block(t, bi):
        ch, n_convs = plan[bi]
        if bi > 0:
            t = F.max_pool2d(t, 2, 2)
        for ci, fi in enumerate(P._TORCHVISION_CONV_IDX[bi][:n_convs]):
            t = F.relu(F.conv2d(t, sd[f"features.{fi}.weight"],
                                sd[f"features.{fi}.bias"], padding=1))
        return t

    x, y = prep(x_np), prep(y_np)
    loss = 0.0
    for bi in range(max(layers)):
        x = block(x, bi)
        y = block(y, bi)
        if bi + 1 in layers:
            loss = loss + torch.mean(torch.abs(x - y))
    return float(loss)


def test_vgg_perceptual_matches_torch_functional(small_plan):
    rng = np.random.RandomState(0)
    sd = make_tv_sd(rng, small_plan)
    x = rng.rand(2, 48, 48, 1).astype(np.float32)
    y = rng.rand(2, 48, 48, 1).astype(np.float32)

    with torch.no_grad():
        want = torch_perceptual(sd, small_plan, x, y)

    params = P.convert_vgg16_torchvision({k: v.numpy() for k, v in sd.items()})
    got = float(P.vgg_perceptual_loss(jnp.asarray(x), jnp.asarray(y),
                                      variables={"params": params}))
    np.testing.assert_allclose(got, want, rtol=2e-4)


def test_identical_inputs_zero_loss(small_plan):
    rng = np.random.RandomState(1)
    sd = make_tv_sd(rng, small_plan)
    params = P.convert_vgg16_torchvision({k: v.numpy() for k, v in sd.items()})
    x = jnp.asarray(rng.rand(1, 32, 32, 1), jnp.float32)
    loss = float(P.vgg_perceptual_loss(x, x, variables={"params": params}))
    assert abs(loss) < 1e-6

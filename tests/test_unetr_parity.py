"""UNETR ViT numerical parity against MONAI semantics (VERDICT r1 weak #8).

MONAI is not installed in this image, so — as with the other torch-parity
suites — we execute the DOCUMENTED architecture torch-functionally from a
synthetic state dict in MONAI's naming scheme and compare against our Flax
ViT with the same weights imported (utils/torch_import.convert_unetr_vit).

Covered MONAI details (monai/networks/{nets/vit.py, blocks/selfattention.py,
blocks/mlp.py, blocks/patchembedding.py}):
  * conv patch embedding + learned position embeddings;
  * fused qkv Linear WITHOUT bias, (qkv, head, dim) feature layout
    (`b h (qkv l d)` rearrange), scale = head_dim**-0.5;
  * out_proj Linear WITH bias;
  * pre-norm blocks x = x + attn(norm1(x)); x = x + mlp(norm2(x));
  * exact-erf GELU in the MLP;
  * trailing LayerNorm on the final tokens only — hidden_states un-normed;
  * reference taps hidden_states_out[3]/[6]/[9] + final (unetr.py:353-363).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from maxstyle_tpu.models.unetr import ViT  # noqa: E402
from maxstyle_tpu.utils import torch_import as ti  # noqa: E402

HID, MLP, HEADS, LAYERS = 48, 96, 4, 4
IMG, PATCH = 32, 16


def rnd(rng, *shape):
    return torch.from_numpy(rng.randn(*shape).astype(np.float32) * 0.1)


def make_vit_sd(rng):
    sd = {
        "patch_embedding.patch_embeddings.weight": rnd(rng, HID, 1, PATCH, PATCH),
        "patch_embedding.patch_embeddings.bias": rnd(rng, HID),
        "patch_embedding.position_embeddings": rnd(rng, 1, (IMG // PATCH) ** 2, HID),
        "norm.weight": rnd(rng, HID).abs() + 0.5,
        "norm.bias": rnd(rng, HID),
    }
    for i in range(LAYERS):
        p = f"blocks.{i}"
        sd[f"{p}.norm1.weight"] = rnd(rng, HID).abs() + 0.5
        sd[f"{p}.norm1.bias"] = rnd(rng, HID)
        sd[f"{p}.norm2.weight"] = rnd(rng, HID).abs() + 0.5
        sd[f"{p}.norm2.bias"] = rnd(rng, HID)
        sd[f"{p}.attn.qkv.weight"] = rnd(rng, 3 * HID, HID)  # no bias (MONAI)
        sd[f"{p}.attn.out_proj.weight"] = rnd(rng, HID, HID)
        sd[f"{p}.attn.out_proj.bias"] = rnd(rng, HID)
        sd[f"{p}.mlp.linear1.weight"] = rnd(rng, MLP, HID)
        sd[f"{p}.mlp.linear1.bias"] = rnd(rng, MLP)
        sd[f"{p}.mlp.linear2.weight"] = rnd(rng, HID, MLP)
        sd[f"{p}.mlp.linear2.bias"] = rnd(rng, HID)
    return sd


def torch_vit_forward(x_nchw, sd):
    import torch.nn.functional as F

    def ln(x, p):
        return F.layer_norm(x, (HID,), sd[f"{p}.weight"], sd[f"{p}.bias"])

    x = F.conv2d(x_nchw, sd["patch_embedding.patch_embeddings.weight"],
                 sd["patch_embedding.patch_embeddings.bias"], stride=PATCH)
    x = x.flatten(2).transpose(1, 2)  # [B, N, HID]
    x = x + sd["patch_embedding.position_embeddings"]
    hidden = []
    head_dim = HID // HEADS
    for i in range(LAYERS):
        p = f"blocks.{i}"
        h = ln(x, f"{p}.norm1")
        qkv = F.linear(h, sd[f"{p}.attn.qkv.weight"])  # no bias
        b, n, _ = qkv.shape
        # rearrange "b h (qkv l d) -> qkv b l h d"
        qkv = qkv.reshape(b, n, 3, HEADS, head_dim).permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        att = torch.einsum("blxd,blyd->blxy", q, k) * (head_dim ** -0.5)
        att = att.softmax(dim=-1)
        out = torch.einsum("bhxy,bhyd->bhxd", att, v)
        out = out.permute(0, 2, 1, 3).reshape(b, n, HID)
        out = F.linear(out, sd[f"{p}.attn.out_proj.weight"],
                       sd[f"{p}.attn.out_proj.bias"])
        x = x + out
        h = ln(x, f"{p}.norm2")
        h = F.linear(h, sd[f"{p}.mlp.linear1.weight"], sd[f"{p}.mlp.linear1.bias"])
        h = F.gelu(h)  # exact erf
        h = F.linear(h, sd[f"{p}.mlp.linear2.weight"], sd[f"{p}.mlp.linear2.bias"])
        x = x + h
        hidden.append(x)
    return ln(x, "norm"), hidden


def test_vit_forward_parity_with_monai_semantics():
    rng = np.random.RandomState(7)
    sd_t = make_vit_sd(rng)
    x = rng.rand(2, IMG, IMG, 1).astype(np.float32)

    with torch.no_grad():
        final_t, hidden_t = torch_vit_forward(
            torch.from_numpy(x.transpose(0, 3, 1, 2)), sd_t)

    vit = ViT(img_size=IMG, patch_size=PATCH, hidden_size=HID, mlp_dim=MLP,
              num_layers=LAYERS, num_heads=HEADS)
    params = ti.convert_unetr_vit({k: v.numpy() for k, v in sd_t.items()},
                                  num_layers=LAYERS, num_heads=HEADS)
    # structural agreement with a fresh init
    init = jax.jit(lambda k, xx: vit.init(k, xx, train=False))(
        jax.random.key(0), jnp.asarray(x))
    a = {jax.tree_util.keystr(p) for p, _ in
         jax.tree_util.tree_leaves_with_path(init["params"])}
    b = {jax.tree_util.keystr(p) for p, _ in
         jax.tree_util.tree_leaves_with_path(params)}
    assert a == b, a.symmetric_difference(b)

    final, hidden = vit.apply({"params": params}, jnp.asarray(x), train=False)
    np.testing.assert_allclose(np.asarray(final), final_t.numpy(),
                               rtol=1e-4, atol=1e-5)
    for i in (3, LAYERS - 1):  # a reference tap + the last block
        np.testing.assert_allclose(np.asarray(hidden[i]), hidden_t[i].numpy(),
                                   rtol=1e-4, atol=1e-5, err_msg=f"hidden[{i}]")


def test_final_norm_applies_to_dec4_only():
    """hidden_states must be un-normed; only the returned final tokens carry
    the trailing LayerNorm (monai vit.py forward)."""
    vit = ViT(img_size=IMG, patch_size=PATCH, hidden_size=HID, mlp_dim=MLP,
              num_layers=LAYERS, num_heads=HEADS)
    x = jnp.asarray(np.random.RandomState(0).rand(1, IMG, IMG, 1), jnp.float32)
    v = vit.init(jax.random.key(0), x, train=False)
    final, hidden = vit.apply(v, x, train=False)
    assert not np.allclose(np.asarray(final), np.asarray(hidden[-1]))

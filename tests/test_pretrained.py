"""Pretrained-weight conversion tests.

Structural: converted torchvision/timm state dicts must graft exactly onto
our param trees (every leaf matched by name and shape).
Numeric: a converted ResNet bottleneck must reproduce the torch forward
bit-for-bit (torch core only — no torchvision needed to build the block).
"""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn as tnn

from swinvox_tpu.models.pretrained import (
    apply_pretrained_backbone,
    convert_timm_swin_tiny,
    convert_torch_resnet50_trunk,
)
from swinvox_tpu.models.resnet import Bottleneck


def fake_resnet50_state_dict(rng):
    """torchvision-named resnet50 tensors (conv1..layer3) with real shapes."""
    sd = {}

    def conv(name, out_c, in_c, k):
        sd[f"{name}.weight"] = rng.standard_normal(
            (out_c, in_c, k, k), dtype=np.float32
        ) * 0.05

    def bn(name, c):
        sd[f"{name}.weight"] = rng.standard_normal(c).astype(np.float32)
        sd[f"{name}.bias"] = rng.standard_normal(c).astype(np.float32)
        sd[f"{name}.running_mean"] = rng.standard_normal(c).astype(np.float32)
        sd[f"{name}.running_var"] = np.abs(rng.standard_normal(c)).astype(np.float32) + 0.5

    conv("conv1", 64, 3, 7)
    bn("bn1", 64)
    in_c = 64
    for stage, (depth, width) in enumerate(
        [(3, 64), (4, 128), (6, 256)], start=1
    ):
        for b in range(depth):
            p = f"layer{stage}.{b}"
            conv(f"{p}.conv1", width, in_c if b == 0 else width * 4, 1)
            bn(f"{p}.bn1", width)
            conv(f"{p}.conv2", width, width, 3)
            bn(f"{p}.bn2", width)
            conv(f"{p}.conv3", width * 4, width, 1)
            bn(f"{p}.bn3", width * 4)
            if b == 0:
                conv(f"{p}.downsample.0", width * 4, in_c, 1)
                bn(f"{p}.downsample.1", width * 4)
        in_c = width * 4
    return sd


def fake_swin_tiny_state_dict(rng):
    """timm-named swin-tiny tensors with real shapes ('layers.N' style)."""
    sd = {}

    def lin(name, out_f, in_f):
        sd[f"{name}.weight"] = rng.standard_normal((out_f, in_f)).astype(np.float32) * 0.05
        sd[f"{name}.bias"] = rng.standard_normal(out_f).astype(np.float32) * 0.05

    def ln(name, c):
        sd[f"{name}.weight"] = np.ones(c, np.float32)
        sd[f"{name}.bias"] = np.zeros(c, np.float32)

    sd["patch_embed.proj.weight"] = rng.standard_normal((96, 3, 4, 4)).astype(np.float32)
    sd["patch_embed.proj.bias"] = np.zeros(96, np.float32)
    ln("patch_embed.norm", 96)
    dims = [96, 192, 384, 768]
    heads = [3, 6, 12, 24]
    for s, depth in enumerate([2, 2, 6, 2]):
        c = dims[s]
        if s > 0:
            ln(f"layers.{s}.downsample.norm", 4 * dims[s - 1])
            sd[f"layers.{s}.downsample.reduction.weight"] = rng.standard_normal(
                (2 * dims[s - 1], 4 * dims[s - 1])
            ).astype(np.float32)
        for d in range(depth):
            p = f"layers.{s}.blocks.{d}"
            ln(f"{p}.norm1", c)
            ln(f"{p}.norm2", c)
            lin(f"{p}.attn.qkv", 3 * c, c)
            lin(f"{p}.attn.proj", c, c)
            sd[f"{p}.attn.relative_position_bias_table"] = rng.standard_normal(
                (169, heads[s])
            ).astype(np.float32)
            lin(f"{p}.mlp.fc1", 4 * c, c)
            lin(f"{p}.mlp.fc2", c, 4 * c)
    return sd


def test_full_graft_onto_encoder(rng):
    """Every converted leaf must land on the init tree with exact shape."""
    from swinvox_tpu.models.encoder import Encoder

    enc = Encoder(dtype=jnp.float32)
    variables = jax.eval_shape(
        lambda k: enc.init(k, jnp.zeros((1, 1, 224, 224, 3)), False),
        jax.random.PRNGKey(0),
    )
    # materialize zeros with the right shapes for grafting
    params = jax.tree.map(lambda s: np.zeros(s.shape, np.float32), variables["params"])
    stats = jax.tree.map(lambda s: np.zeros(s.shape, np.float32), variables["batch_stats"])

    wrapped_p = {"encoder": params}
    wrapped_s = {"encoder": stats}
    new_p, new_s = apply_pretrained_backbone(
        wrapped_p, wrapped_s,
        resnet_sd=fake_resnet50_state_dict(rng),
        swin_sd=fake_swin_tiny_state_dict(rng),
    )
    # all resnet conv kernels and swin linears must now be non-zero
    def count_nonzero_leaves(tree):
        return sum(int(np.any(np.asarray(l) != 0)) for l in jax.tree.leaves(tree))

    assert count_nonzero_leaves(new_p["encoder"]["resnet"]) > 100
    assert count_nonzero_leaves(new_p["encoder"]["swin"]) > 100
    assert count_nonzero_leaves(new_s["encoder"]["resnet"]) > 50


def test_bottleneck_numeric_parity_with_torch(rng):
    """Converted weights: our Bottleneck == a torch-core bottleneck."""
    in_c, width = 64, 64
    sd = {}
    sd["conv1.weight"] = rng.standard_normal((width, in_c, 1, 1)).astype(np.float32) * 0.1
    sd["conv2.weight"] = rng.standard_normal((width, width, 3, 3)).astype(np.float32) * 0.1
    sd["conv3.weight"] = rng.standard_normal((width * 4, width, 1, 1)).astype(np.float32) * 0.1
    sd["downsample.0.weight"] = rng.standard_normal((width * 4, in_c, 1, 1)).astype(np.float32) * 0.1
    for i, c in [(1, width), (2, width), (3, width * 4)]:
        sd[f"bn{i}.weight"] = rng.standard_normal(c).astype(np.float32)
        sd[f"bn{i}.bias"] = rng.standard_normal(c).astype(np.float32)
        sd[f"bn{i}.running_mean"] = rng.standard_normal(c).astype(np.float32) * 0.1
        sd[f"bn{i}.running_var"] = np.abs(rng.standard_normal(c)).astype(np.float32) + 0.5
    sd["downsample.1.weight"] = rng.standard_normal(width * 4).astype(np.float32)
    sd["downsample.1.bias"] = rng.standard_normal(width * 4).astype(np.float32)
    sd["downsample.1.running_mean"] = rng.standard_normal(width * 4).astype(np.float32) * 0.1
    sd["downsample.1.running_var"] = np.abs(rng.standard_normal(width * 4)).astype(np.float32) + 0.5

    # ---- torch side (core modules only, torchvision layout) -------------
    class TorchBottleneck(tnn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = tnn.Conv2d(in_c, width, 1, bias=False)
            self.bn1 = tnn.BatchNorm2d(width)
            self.conv2 = tnn.Conv2d(width, width, 3, stride=2, padding=1, bias=False)
            self.bn2 = tnn.BatchNorm2d(width)
            self.conv3 = tnn.Conv2d(width, width * 4, 1, bias=False)
            self.bn3 = tnn.BatchNorm2d(width * 4)
            self.downsample = tnn.Sequential(
                tnn.Conv2d(in_c, width * 4, 1, stride=2, bias=False),
                tnn.BatchNorm2d(width * 4),
            )
            self.relu = tnn.ReLU()

        def forward(self, x):
            out = self.relu(self.bn1(self.conv1(x)))
            out = self.relu(self.bn2(self.conv2(out)))
            out = self.bn3(self.conv3(out))
            return self.relu(out + self.downsample(x))

    tb = TorchBottleneck().eval()
    tb.load_state_dict({k: torch.from_numpy(v) for k, v in sd.items()})

    x = rng.standard_normal((2, 8, 8, in_c)).astype(np.float32)
    with torch.no_grad():
        expected = (
            tb(torch.from_numpy(x.transpose(0, 3, 1, 2)))
            .numpy()
            .transpose(0, 2, 3, 1)
        )

    # ---- our side: graft converted weights into a Bottleneck ------------
    blk = Bottleneck(width=width, strides=2, project=True, dtype=jnp.float32)
    variables = blk.init(jax.random.PRNGKey(0), jnp.asarray(x), False)

    from swinvox_tpu.models.pretrained import _conv

    def bn_tree(p):
        return (
            {"bn": {"scale": sd[f"{p}.weight"], "bias": sd[f"{p}.bias"]}},
            {"bn": {"mean": sd[f"{p}.running_mean"], "var": sd[f"{p}.running_var"]}},
        )

    params = {}
    stats = {}
    for i in (1, 2, 3):
        params[f"conv{i}"] = {"Conv_0": {"kernel": _conv(sd[f"conv{i}.weight"])}}
        params[f"bn{i}"], stats[f"bn{i}"] = bn_tree(f"bn{i}")
    params["downsample_conv"] = {"Conv_0": {"kernel": _conv(sd["downsample.0.weight"])}}
    params["downsample_bn"], stats["downsample_bn"] = bn_tree("downsample.1")

    params = jax.tree.map(jnp.asarray, params)
    stats = jax.tree.map(jnp.asarray, stats)
    out = blk.apply({"params": params, "batch_stats": stats}, jnp.asarray(x), False)
    np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-4, atol=1e-5)


def test_graft_rejects_shape_mismatch(rng):
    from swinvox_tpu.models.pretrained import apply_pretrained_backbone

    sd = fake_resnet50_state_dict(rng)
    sd["conv1.weight"] = sd["conv1.weight"][:, :2]  # corrupt
    params = {"encoder": {"resnet": {"conv1": {"Conv_0": {"kernel": np.zeros((7, 7, 3, 64), np.float32)}}}}}
    stats = {"encoder": {"resnet": {}}}
    import pytest

    with pytest.raises((ValueError, KeyError)):
        apply_pretrained_backbone(params, stats, resnet_sd=sd)

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


# ---------------------------------------------------------------------------
# End-to-end Swin-Tiny parity: a timm-equivalent torch implementation (swin
# v1 semantics: rel-pos bias indexing, cyclic shift, window partition order,
# patch-merge concat order — timm swin_tiny_patch4_window7_224, consumed by
# the reference at models/swin_transformer.py:19-24) is loaded with a
# synthetic timm-format state dict; the converted flax SwinTiny must match
# every stage output.  This pins exactly the places a silent transposition
# would hide (rel-pos index order, merge concat order, qkv head split).


class _TorchWindowAttention(tnn.Module):
    def __init__(self, dim, heads, window=7):
        super().__init__()
        self.heads = heads
        self.window = window
        self.scale = (dim // heads) ** -0.5
        self.qkv = tnn.Linear(dim, dim * 3)
        self.proj = tnn.Linear(dim, dim)
        self.relative_position_bias_table = tnn.Parameter(
            torch.zeros((2 * window - 1) ** 2, heads)
        )
        coords = torch.stack(
            torch.meshgrid(
                torch.arange(window), torch.arange(window), indexing="ij"
            )
        )
        flat = torch.flatten(coords, 1)
        rel = flat[:, :, None] - flat[:, None, :]
        rel = rel.permute(1, 2, 0).contiguous()
        rel += window - 1
        rel[:, :, 0] *= 2 * window - 1
        self.register_buffer(
            "relative_position_index", rel.sum(-1), persistent=False
        )

    def forward(self, x, mask):
        b_, n, c = x.shape
        qkv = (
            self.qkv(x)
            .reshape(b_, n, 3, self.heads, c // self.heads)
            .permute(2, 0, 3, 1, 4)
        )
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = (q * self.scale) @ k.transpose(-2, -1)
        bias = self.relative_position_bias_table[
            self.relative_position_index.view(-1)
        ].view(n, n, -1)
        attn = attn + bias.permute(2, 0, 1).contiguous().unsqueeze(0)
        if mask is not None:
            nw = mask.shape[0]
            attn = attn.view(b_ // nw, nw, self.heads, n, n) + mask.unsqueeze(
                1
            ).unsqueeze(0)
            attn = attn.view(-1, self.heads, n, n)
        attn = attn.softmax(dim=-1)
        x = (attn @ v).transpose(1, 2).reshape(b_, n, c)
        return self.proj(x)


class _TorchSwinBlock(tnn.Module):
    def __init__(self, dim, heads, shift, window=7):
        super().__init__()
        self.shift = shift
        self.window = window
        self.norm1 = tnn.LayerNorm(dim)
        self.attn = _TorchWindowAttention(dim, heads, window)
        self.norm2 = tnn.LayerNorm(dim)
        self.mlp = tnn.Sequential(
            tnn.Linear(dim, 4 * dim), tnn.GELU(), tnn.Linear(4 * dim, dim)
        )

    @staticmethod
    def _partition(x, w):
        b, h, ww, c = x.shape
        x = x.view(b, h // w, w, ww // w, w, c)
        return (
            x.permute(0, 1, 3, 2, 4, 5).contiguous().view(-1, w * w, c)
        )

    @staticmethod
    def _reverse(win, w, h, ww):
        b = win.shape[0] // (h * ww // w // w)
        x = win.view(b, h // w, ww // w, w, w, -1)
        return x.permute(0, 1, 3, 2, 4, 5).contiguous().view(b, h, ww, -1)

    def forward(self, x):
        b, h, w, c = x.shape
        shift = 0 if (h <= self.window and w <= self.window) else self.shift
        shortcut = x
        x = self.norm1(x)
        if shift > 0:
            x = torch.roll(x, shifts=(-shift, -shift), dims=(1, 2))
            mask = self._attn_mask(h, w, shift, x.device)
        else:
            mask = None
        xw = self._partition(x, self.window)
        xw = self.attn(xw, mask)
        x = self._reverse(xw, self.window, h, w)
        if shift > 0:
            x = torch.roll(x, shifts=(shift, shift), dims=(1, 2))
        x = shortcut + x
        return x + self.mlp(self.norm2(x))

    def _attn_mask(self, h, w, shift, device):
        img = torch.zeros((1, h, w, 1), device=device)
        cnt = 0
        for hs in (
            slice(0, -self.window),
            slice(-self.window, -shift),
            slice(-shift, None),
        ):
            for ws in (
                slice(0, -self.window),
                slice(-self.window, -shift),
                slice(-shift, None),
            ):
                img[:, hs, ws, :] = cnt
                cnt += 1
        win = self._partition(img, self.window).view(-1, self.window**2)
        diff = win.unsqueeze(1) - win.unsqueeze(2)
        return diff.masked_fill(diff != 0, -100.0).masked_fill(diff == 0, 0.0)


class _TorchPatchMerging(tnn.Module):
    def __init__(self, dim):
        super().__init__()
        self.norm = tnn.LayerNorm(4 * dim)
        self.reduction = tnn.Linear(4 * dim, 2 * dim, bias=False)

    def forward(self, x):
        x0 = x[:, 0::2, 0::2]
        x1 = x[:, 1::2, 0::2]
        x2 = x[:, 0::2, 1::2]
        x3 = x[:, 1::2, 1::2]
        x = torch.cat([x0, x1, x2, x3], -1)
        return self.reduction(self.norm(x))


class _TorchSwinTiny(tnn.Module):
    def __init__(self, depths=(2, 2, 6, 2), heads=(3, 6, 12, 24), dim=96):
        super().__init__()
        self.proj = tnn.Conv2d(3, dim, 4, stride=4)
        self.norm = tnn.LayerNorm(dim)
        self.merges = tnn.ModuleList()
        self.stages = tnn.ModuleList()
        d = dim
        for s, (depth, h) in enumerate(zip(depths, heads)):
            if s > 0:
                self.merges.append(_TorchPatchMerging(d))
                d *= 2
            self.stages.append(
                tnn.ModuleList(
                    [
                        _TorchSwinBlock(d, h, shift=0 if i % 2 == 0 else 3)
                        for i in range(depth)
                    ]
                )
            )

    def forward(self, x):
        x = self.proj(x).permute(0, 2, 3, 1)
        x = self.norm(x)
        feats = []
        for s, blocks in enumerate(self.stages):
            if s > 0:
                x = self.merges[s - 1](x)
            for blk in blocks:
                x = blk(x)
            feats.append(x)
        return feats


def _load_torch_swin(model, sd):
    mapping = {}
    mapping["proj.weight"] = sd["patch_embed.proj.weight"]
    mapping["proj.bias"] = sd["patch_embed.proj.bias"]
    mapping["norm.weight"] = sd["patch_embed.norm.weight"]
    mapping["norm.bias"] = sd["patch_embed.norm.bias"]
    for s, depth in enumerate((2, 2, 6, 2)):
        if s > 0:
            for a, b in (
                (f"merges.{s - 1}.norm.weight", f"layers.{s}.downsample.norm.weight"),
                (f"merges.{s - 1}.norm.bias", f"layers.{s}.downsample.norm.bias"),
                (
                    f"merges.{s - 1}.reduction.weight",
                    f"layers.{s}.downsample.reduction.weight",
                ),
            ):
                mapping[a] = sd[b]
        for d in range(depth):
            src = f"layers.{s}.blocks.{d}"
            dst = f"stages.{s}.{d}"
            for a, b in (
                (f"{dst}.norm1.weight", f"{src}.norm1.weight"),
                (f"{dst}.norm1.bias", f"{src}.norm1.bias"),
                (f"{dst}.norm2.weight", f"{src}.norm2.weight"),
                (f"{dst}.norm2.bias", f"{src}.norm2.bias"),
                (f"{dst}.attn.qkv.weight", f"{src}.attn.qkv.weight"),
                (f"{dst}.attn.qkv.bias", f"{src}.attn.qkv.bias"),
                (f"{dst}.attn.proj.weight", f"{src}.attn.proj.weight"),
                (f"{dst}.attn.proj.bias", f"{src}.attn.proj.bias"),
                (
                    f"{dst}.attn.relative_position_bias_table",
                    f"{src}.attn.relative_position_bias_table",
                ),
                (f"{dst}.mlp.0.weight", f"{src}.mlp.fc1.weight"),
                (f"{dst}.mlp.0.bias", f"{src}.mlp.fc1.bias"),
                (f"{dst}.mlp.2.weight", f"{src}.mlp.fc2.weight"),
                (f"{dst}.mlp.2.bias", f"{src}.mlp.fc2.bias"),
            ):
                mapping[a] = sd[b]
    model.load_state_dict({k: torch.from_numpy(v) for k, v in mapping.items()})


def test_swin_tiny_end_to_end_parity_with_torch(rng):
    """Converted timm weights: our SwinTiny == the torch swin, all 4 stages.

    Catches rel-pos index transposition, patch-merge concat-order swaps,
    and qkv head-split mistakes that structural tests cannot see."""
    from swinvox_tpu.models.swin import SwinTiny

    sd = fake_swin_tiny_state_dict(rng)
    # non-trivial bias tables and norms so order bugs actually move outputs
    for k in list(sd):
        if "relative_position_bias_table" in k:
            sd[k] = (rng.standard_normal(sd[k].shape) * 0.2).astype(np.float32)
        if k.endswith("norm1.weight") or k.endswith("norm2.weight"):
            sd[k] = (1.0 + 0.1 * rng.standard_normal(sd[k].shape)).astype(
                np.float32
            )

    tmodel = _TorchSwinTiny().eval()
    _load_torch_swin(tmodel, sd)

    x = (rng.standard_normal((1, 224, 224, 3)) * 0.5).astype(np.float32)
    with torch.no_grad():
        expected = [
            f.numpy() for f in tmodel(torch.from_numpy(x.transpose(0, 3, 1, 2)))
        ]

    model = SwinTiny(dtype=jnp.float32, drop_path_rate=0.0)
    variables = jax.eval_shape(
        lambda k: model.init(k, jnp.asarray(x), False), jax.random.PRNGKey(0)
    )
    converted = convert_timm_swin_tiny(sd)
    # graft: every leaf of the init tree must be provided by the converter
    def fill(tmpl, src, path=""):
        out = {}
        for k, v in tmpl.items():
            assert k in src, f"converter missing {path}/{k}"
            if isinstance(v, dict):
                out[k] = fill(v, src[k], f"{path}/{k}")
            else:
                assert tuple(v.shape) == tuple(np.shape(src[k])), f"{path}/{k}"
                out[k] = jnp.asarray(src[k], v.dtype)
        return out

    params = fill(variables["params"], converted)
    feats = jax.jit(lambda p, x: model.apply({"params": p}, x, False))(
        params, jnp.asarray(x)
    )
    assert len(feats) == 4
    for s, (ours, theirs) in enumerate(zip(feats, expected)):
        np.testing.assert_allclose(
            np.asarray(ours),
            theirs,
            rtol=2e-3,
            atol=2e-4,
            err_msg=f"stage {s} diverged",
        )

"""Pretrained backbone weight conversion (torchvision / timm -> flax trees).

The reference builds its encoder from pretrained torchvision ResNet-50 and
timm swin_tiny_patch4_window7_224 (reference models/encoder.py:22,
models/swin_transformer.py:19-24) — although it then clobbers them with
init_weights (core/train.py:91-94).  For the "as-intended" training mode,
this module maps those checkpoints' state dicts onto our parameter trees.

Input: a dict[str, np.ndarray] of torch-style names (load a .pth with
torch.load + {k: v.numpy()} or an .npz).  Conversions:
  * conv weights [out, in, kh, kw] -> (kh, kw, in, out)
  * linear weights [out, in] -> (in, out)
  * BatchNorm weight/bias -> scale/bias; running stats -> batch_stats
Set cfg.NETWORK.PRETRAINED_BACKBONE to the checkpoint path to apply at
model-creation time.
"""

from __future__ import annotations

import logging
from typing import Any, Dict, Mapping, Tuple

import numpy as np

log = logging.getLogger(__name__)

Array = np.ndarray
StateDict = Mapping[str, Array]


def _conv(w: Array) -> Array:
    return np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))


def _linear(w: Array) -> Array:
    return np.ascontiguousarray(w.T)


def convert_torch_resnet50_trunk(
    sd: StateDict,
) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """torchvision resnet50 state dict -> (params, batch_stats) for
    ResNet50Trunk (conv1..layer3).  Accepts full-resnet dicts; layer4/fc
    are ignored."""
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    def bn(prefix: str):
        return (
            {"bn": {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]}},
            {"bn": {"mean": sd[f"{prefix}.running_mean"], "var": sd[f"{prefix}.running_var"]}},
        )

    params["conv1"] = {"Conv_0": {"kernel": _conv(sd["conv1.weight"])}}
    p, s = bn("bn1")
    params["bn1"], stats["bn1"] = p, s

    depths = {1: 3, 2: 4, 3: 6}
    for stage, depth in depths.items():
        for block in range(depth):
            src = f"layer{stage}.{block}"
            dst = f"layer{stage}_block{block}"
            bp: Dict[str, Any] = {}
            bs: Dict[str, Any] = {}
            for i in (1, 2, 3):
                bp[f"conv{i}"] = {
                    "Conv_0": {"kernel": _conv(sd[f"{src}.conv{i}.weight"])}
                }
                p, s = bn(f"{src}.bn{i}")
                bp[f"bn{i}"], bs[f"bn{i}"] = p, s
            if f"{src}.downsample.0.weight" in sd:
                bp["downsample_conv"] = {
                    "Conv_0": {"kernel": _conv(sd[f"{src}.downsample.0.weight"])}
                }
                p, s = bn(f"{src}.downsample.1")
                bp["downsample_bn"], bs["downsample_bn"] = p, s
            params[dst] = bp
            stats[dst] = bs
    return params, stats


def convert_timm_swin_tiny(
    sd: StateDict, depths: Tuple[int, ...] = (2, 2, 6, 2)
) -> Dict[str, Any]:
    """timm swin_tiny_patch4_window7_224 state dict -> SwinTiny params.

    Handles both 'layers.N' (classic) and 'layers_N' (newer timm) naming.
    Swin has no BatchNorm, so there are no batch_stats.
    """

    def get(*names: str) -> Array:
        for n in names:
            if n in sd:
                return sd[n]
        raise KeyError(f"none of {names} in state dict")

    def ln(prefix_options) -> Dict[str, Array]:
        w = get(*[f"{p}.weight" for p in prefix_options])
        b = get(*[f"{p}.bias" for p in prefix_options])
        return {"LayerNorm_0": {"scale": w, "bias": b}}

    params: Dict[str, Any] = {
        "patch_embed": {
            "Conv_0": {
                "kernel": _conv(get("patch_embed.proj.weight")),
                "bias": get("patch_embed.proj.bias"),
            }
        },
        "patch_norm": ln(["patch_embed.norm"]),
    }

    for s, depth in enumerate(depths):
        layer_opts = [f"layers.{s}", f"layers_{s}"]
        if s > 0:
            # timm places the downsample at the START of stage s (newer) or
            # the END of stage s-1 (classic swin); accept both.
            down_opts = (
                [f"{p}.downsample" for p in layer_opts]
                + [f"layers.{s - 1}.downsample", f"layers_{s - 1}.downsample"]
            )
            params[f"merge{s}"] = {
                "norm": ln([f"{p}.norm" for p in down_opts]),
                "reduction": {
                    "Dense_0": {
                        "kernel": _linear(
                            get(*[f"{p}.reduction.weight" for p in down_opts])
                        )
                    }
                },
            }
        for d in range(depth):
            blk_opts = [f"{p}.blocks.{d}" for p in layer_opts]
            params[f"stage{s}_block{d}"] = {
                "norm1": ln([f"{p}.norm1" for p in blk_opts]),
                "norm2": ln([f"{p}.norm2" for p in blk_opts]),
                "attn": {
                    "qkv_kernel": _linear(get(*[f"{p}.attn.qkv.weight" for p in blk_opts])),
                    "qkv_bias": get(*[f"{p}.attn.qkv.bias" for p in blk_opts]),
                    "proj_kernel": _linear(get(*[f"{p}.attn.proj.weight" for p in blk_opts])),
                    "proj_bias": get(*[f"{p}.attn.proj.bias" for p in blk_opts]),
                    "rel_pos_bias_table": get(
                        *[f"{p}.attn.relative_position_bias_table" for p in blk_opts]
                    ),
                },
                "mlp_fc1": {
                    "Dense_0": {
                        "kernel": _linear(get(*[f"{p}.mlp.fc1.weight" for p in blk_opts])),
                        "bias": get(*[f"{p}.mlp.fc1.bias" for p in blk_opts]),
                    }
                },
                "mlp_fc2": {
                    "Dense_0": {
                        "kernel": _linear(get(*[f"{p}.mlp.fc2.weight" for p in blk_opts])),
                        "bias": get(*[f"{p}.mlp.fc2.bias" for p in blk_opts]),
                    }
                },
            }
    return params


# --------------------------------------------------------------------
# Reference SwinVox head converters: map the reference's own torch
# modules (models/{decoder,merger,refiner,cross_view_attention}.py) onto
# our flax trees, so a user can port a trained reference checkpoint —
# and so tests can pin numerical parity against the reference's code
# itself (tests/test_reference_parity.py).
# --------------------------------------------------------------------


def _conv3d(w: Array) -> Array:
    """torch Conv3d weight [out, in, kd, kh, kw] -> (kd, kh, kw, in, out)."""
    return np.ascontiguousarray(np.transpose(w, (2, 3, 4, 1, 0)))


def _tconv(w: Array) -> Array:
    """torch ConvTranspose{2,3}d weight [in, out, *k] -> our ConvTranspose
    kernel (*k, in, out), spatially FLIPPED.

    torch's transposed conv scatters input q to output q*s - p + k with
    tap w[k]; layers.ConvTranspose is an input-dilated correlation that
    reads tap K-1-k at the same output — identical geometry, mirrored
    taps — so grafting torch weights requires reversing every spatial
    axis."""
    rank = w.ndim - 2
    w = np.transpose(w, tuple(range(2, 2 + rank)) + (0, 1))
    return np.ascontiguousarray(w[(slice(None, None, -1),) * rank])


def _bn(sd: StateDict, prefix: str) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    return (
        {"bn": {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]}},
        {
            "bn": {
                "mean": sd[f"{prefix}.running_mean"],
                "var": sd[f"{prefix}.running_var"],
            }
        },
    )


def convert_reference_decoder(
    sd: StateDict,
) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Reference models/decoder.py state dict -> (params, batch_stats)
    for models.decoder.Decoder (tconv1..tconv5 + bn1..bn4)."""
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    for i in range(1, 6):
        layer = {"kernel": _tconv(sd[f"layer{i}.0.weight"])}
        if f"layer{i}.0.bias" in sd:
            layer["bias"] = sd[f"layer{i}.0.bias"]
        params[f"tconv{i}"] = layer
        if i <= 4:
            params[f"bn{i}"], stats[f"bn{i}"] = _bn(sd, f"layer{i}.1")
    return params, stats


def convert_reference_merger(
    sd: StateDict,
) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Reference models/merger.py state dict -> (params, batch_stats)
    for models.merger.Merger (conv1..conv6 + bn1..bn6)."""
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    for i in range(1, 7):
        params[f"conv{i}"] = {
            "Conv_0": {
                "kernel": _conv3d(sd[f"layer{i}.0.weight"]),
                "bias": sd[f"layer{i}.0.bias"],
            }
        }
        params[f"bn{i}"], stats[f"bn{i}"] = _bn(sd, f"layer{i}.1")
    return params, stats


def convert_reference_refiner(
    sd: StateDict,
) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Reference models/refiner.py state dict -> (params, batch_stats)
    for models.refiner.Refiner.

    The FC bottleneck flattens (C, D, H, W) in torch but (D, H, W, C)
    here (models/refiner.py docstring), so fc1's input axis and fc2's
    output axis are permuted accordingly — a pure reparameterization
    that makes the two bottlenecks compute the same function."""
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    for i, name in ((1, "down1"), (2, "down2"), (3, "down3")):
        params[f"{name}_conv"] = {
            "Conv_0": {
                "kernel": _conv3d(sd[f"layer{i}.0.weight"]),
                "bias": sd[f"layer{i}.0.bias"],
            }
        }
        params[f"{name}_bn"], stats[f"{name}_bn"] = _bn(sd, f"layer{i}.1")

    # fc1: torch [2048, 8192(C,D,H,W)] -> kernel [8192(D,H,W,C), 2048]
    w1 = sd["layer4.0.weight"].reshape(2048, 128, 4, 4, 4)
    w1 = w1.transpose(0, 2, 3, 4, 1).reshape(2048, 8192)
    params["fc1"] = {
        "Dense_0": {"kernel": np.ascontiguousarray(w1.T),
                    "bias": sd["layer4.0.bias"]}
    }
    # fc2: torch [8192(C,D,H,W), 2048] -> kernel [2048, 8192(D,H,W,C)]
    w2 = sd["layer5.0.weight"].reshape(128, 4, 4, 4, 2048)
    w2 = w2.transpose(1, 2, 3, 0, 4).reshape(8192, 2048)
    b2 = sd["layer5.0.bias"].reshape(128, 4, 4, 4)
    b2 = b2.transpose(1, 2, 3, 0).reshape(8192)
    params["fc2"] = {
        "Dense_0": {"kernel": np.ascontiguousarray(w2.T),
                    "bias": np.ascontiguousarray(b2)}
    }

    for i, name in ((6, "up1"), (7, "up2"), (8, "up3")):
        layer = {"kernel": _tconv(sd[f"layer{i}.0.weight"])}
        if f"layer{i}.0.bias" in sd:
            layer["bias"] = sd[f"layer{i}.0.bias"]
        params[f"{name}_tconv"] = layer
        if name != "up3":
            params[f"{name}_bn"], stats[f"{name}_bn"] = _bn(sd, f"layer{i}.1")
    return params, stats


def convert_reference_cross_view(
    sd: StateDict,
) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Reference models/cross_view_attention.py state dict ->
    (params, batch_stats) for models.cross_view.CrossViewAttention.

    The per-(view, head) Q/K/V flatten order differs (torch: (d, y, x);
    here: (y, x, d)) but is applied consistently to Q, K, V and the
    un-flatten, so scores and outputs match with untouched 1x1 conv
    weights.  The depthwise downsample kernel goes [C,1,r,r] ->
    [r,r,1,C] (flax grouped-conv layout)."""
    params: Dict[str, Any] = {}
    if "downsample_qkv.weight" in sd:
        params["downsample_qkv"] = {
            "Conv_0": {
                "kernel": np.ascontiguousarray(
                    np.transpose(sd["downsample_qkv.weight"], (2, 3, 1, 0))
                ),
                "bias": sd["downsample_qkv.bias"],
            }
        }
    for src, dst in (
        ("qkv_conv", "qkv_conv"),
        ("proj_conv", "proj_conv"),
        ("ffn.0", "ffn_fc1"),
        ("ffn.2", "ffn_fc2"),
    ):
        params[dst] = {
            "Conv_0": {
                "kernel": _conv(sd[f"{src}.weight"]),
                "bias": sd[f"{src}.bias"],
            }
        }
    bn_p, bn_s = _bn(sd, "batch_norm")
    params["batch_norm"] = bn_p
    return params, {"batch_norm": bn_s}


def load_state_dict_file(path: str) -> Dict[str, Array]:
    """Load a torch .pth / .pt (requires torch) or numpy .npz of weights."""
    if path.endswith(".npz"):
        with np.load(path) as z:
            return {k: z[k] for k in z.files}
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(obj, dict) and "state_dict" in obj:
        obj = obj["state_dict"]
    return {k: v.numpy() for k, v in obj.items()}


def apply_pretrained_backbone(
    params: Dict[str, Any],
    batch_stats: Dict[str, Any],
    resnet_sd: StateDict | None = None,
    swin_sd: StateDict | None = None,
) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Graft converted backbone weights into an encoder's param tree
    (under params['encoder']['resnet'] / ['swin']), dtype-cast to match."""
    import jax

    params = jax.tree.map(lambda x: x, params)  # shallow copy tree
    batch_stats = jax.tree.map(lambda x: x, batch_stats)

    def graft(dst, src, path=""):
        for k, v in src.items():
            if isinstance(v, dict):
                graft(dst[k], v, f"{path}/{k}")
            else:
                cur = dst[k]
                if tuple(cur.shape) != tuple(np.shape(v)):
                    raise ValueError(
                        f"shape mismatch at {path}/{k}: "
                        f"{cur.shape} vs {np.shape(v)}"
                    )
                dst[k] = np.asarray(v, dtype=cur.dtype)

    if resnet_sd is not None:
        rp, rs = convert_torch_resnet50_trunk(resnet_sd)
        graft(params["encoder"]["resnet"], rp, "resnet")
        graft(batch_stats["encoder"]["resnet"], rs, "resnet")
        log.info("Loaded pretrained ResNet-50 trunk weights")
    if swin_sd is not None:
        sp = convert_timm_swin_tiny(swin_sd)
        graft(params["encoder"]["swin"], sp, "swin")
        log.info("Loaded pretrained Swin-Tiny weights")
    return params, batch_stats

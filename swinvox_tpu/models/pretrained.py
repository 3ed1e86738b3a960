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

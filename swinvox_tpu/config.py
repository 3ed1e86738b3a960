"""Typed configuration for swinvox_tpu.

Field names and defaults mirror the reference's EasyDict config
(/root/reference/config.py:1-142) so that recipes transfer 1:1, but the
implementation is a tree of typed dataclasses with validation, serialization,
and CLI override support instead of a hand-mutated global dict.
"""

from __future__ import annotations

import dataclasses
import json
import os
from dataclasses import dataclass, field
from typing import Any, List, Optional, Sequence, Tuple


def resolve_data_path(path: str) -> str:
    """Resolve a ``./datasets/*.json`` style path for installed packages.

    The default taxonomy paths are cwd-relative (matching the reference's
    layout, config.py:17-41).  From an installed wheel there is no repo
    checkout, so when the literal path does not exist we fall back to the
    same-named file shipped as ``swinvox_tpu.datasets`` package data.
    Non-taxonomy paths (or anything the caller customized to an existing
    location) pass through untouched.
    """
    if os.path.exists(path):
        return path
    try:
        from importlib.resources import files

        pkg = files("swinvox_tpu.datasets") / os.path.basename(path)
        # filesystem-backed installs (wheels, editable) expose a real path
        if pkg.is_file():
            return str(pkg)
    except (ModuleNotFoundError, FileNotFoundError, TypeError):
        pass
    return path


@dataclass
class ShapeNetPaths:
    """Path templates for the ShapeNet dataset (reference config.py:17-30)."""

    TAXONOMY_FILE_PATH: str = "./datasets/ShapeNet.json"
    RENDERING_PATH: str = "./data/ShapeNetRendering/%s/%s/rendering/%02d.png"
    VOXEL_PATH: str = "./data/ShapeNetVox32/%s/%s/model.binvox"


@dataclass
class Pascal3DPaths:
    """Path templates for Pascal3D (reference config.py:32-36)."""

    TAXONOMY_FILE_PATH: str = "./datasets/Pascal3D.json"
    ANNOTATION_PATH: str = "./data/PASCAL3D/Annotations/%s_imagenet/%s.mat"
    RENDERING_PATH: str = "./data/PASCAL3D/Images/%s_imagenet/%s.JPEG"
    VOXEL_PATH: str = "./data/PASCAL3D/CAD/%s/%02d.binvox"


@dataclass
class Pix3DPaths:
    """Path templates for Pix3D (reference config.py:37-41)."""

    TAXONOMY_FILE_PATH: str = "./datasets/Pix3D.json"
    ANNOTATION_PATH: str = "./data/pix3d.json"
    RENDERING_PATH: str = "./data/pix3d/img/%s/%s.%s"
    VOXEL_PATH: str = "./data/pix3d/model/%s/%s/%s.binvox"


@dataclass
class DatasetsConfig:
    SHAPENET: ShapeNetPaths = field(default_factory=ShapeNetPaths)
    PASCAL3D: Pascal3DPaths = field(default_factory=Pascal3DPaths)
    PIX3D: Pix3DPaths = field(default_factory=Pix3DPaths)


@dataclass
class DatasetConfig:
    """Dataset selection + normalization (reference config.py:47-53)."""

    MEAN: Tuple[float, float, float] = (0.5, 0.5, 0.5)
    STD: Tuple[float, float, float] = (0.5, 0.5, 0.5)
    TRAIN_DATASET: str = "ShapeNet"
    TEST_DATASET: str = "ShapeNet"


@dataclass
class ConstConfig:
    """Common constants (reference config.py:59-69)."""

    DEVICE: str = "0"
    # TPU extra: explicit device restriction ("" = use every visible
    # device).  Set by the runner's --gpu flag — the analogue of the
    # reference exporting CUDA_VISIBLE_DEVICES (runner.py:74-75); comma
    # separated jax.devices() indices, e.g. "0" or "0,2".
    DEVICE_SELECT: str = ""
    RNG_SEED: int = 0
    IMG_W: int = 224
    IMG_H: int = 224
    BATCH_SIZE: int = 32
    N_VIEWS_RENDERING: int = 1
    CROP_IMG_W: int = 128
    CROP_IMG_H: int = 128
    NUM_WORKER: int = 16
    WEIGHTS: str = ""


@dataclass
class DirConfig:
    OUT_PATH: str = "./output"
    RANDOM_BG_PATH: str = ""
    # when non-empty, a jax.profiler trace of a few training steps is
    # written here (TPU-native replacement for cudnn.benchmark+nvprof)
    PROFILE_DIR: str = ""


@dataclass
class NetworkConfig:
    """Model architecture flags (reference config.py:83-94)."""

    LEAKY_VALUE: float = 0.2
    TCONV_USE_BIAS: bool = False
    USE_REFINER: bool = True
    USE_MERGER: bool = True

    USE_SWIN_T_MULTI_STAGE: bool = True
    SWIN_T_STAGES: Tuple[int, ...] = (0, 1, 2, 3)
    USE_CROSS_VIEW_ATTENTION: bool = True
    CROSS_ATT_REDUCTION_RATIO: int = 4
    ATT_SPATIAL_DOWNSAMPLE_RATIO: int = 2
    CROSS_ATT_NUM_HEADS: int = 4

    # TPU-native extensions (not in the reference):
    #   compute dtype for the forward/backward pass; params stay float32.
    COMPUTE_DTYPE: str = "bfloat16"
    #   use the fused Pallas window-attention kernel inside the Swin encoder
    #   (falls back to the pure-XLA path off-TPU or when False).
    USE_PALLAS_WINDOW_ATTENTION: bool = True
    # fused merger conv stack at inference (ops/pallas_merger.py); the
    # training path always uses XLA convs (BN batch statistics).
    # Off by default: the kernel beats XLA in isolation (8.0 vs 9.4 ms at
    # batch 64) but loses inside the full jitted model, where XLA fuses
    # and overlaps the conv stack with its neighbors (measured 2013 ->
    # 1865 img/s at batch 128) — see ROADMAP.md item 1 for the next design
    USE_PALLAS_MERGER: bool = False
    # training-path merger convs through the differentiable banded Pallas
    # conv (ops/pallas_band_conv.py): in-kernel input/weight grads for
    # the 9-channel Conv3d stack XLA runs at 35-70 GB/s effective
    USE_PALLAS_MERGER_TRAIN: bool = False
    # merger convs as dense-lane 2D band convs in XLA
    # (ops/band2d_merger.py): packs (w, c) into lanes so the 9-channel
    # Conv3d stack stops running 14x lane-padded; full autodiff +
    # training-mode BN.  Applies to BOTH train and eval paths
    USE_BAND2D_MERGER: bool = False
    # merger convs as Pallas slab band-convs (ops/pallas_slab_conv.py):
    # the dense-lane band trick with the matmuls VMEM-resident and an
    # in-kernel exact backward (custom_vjp), so the band-zero FLOP
    # inflation rides the idle MXU instead of HBM (the pure-XLA band2d
    # variant measurably LOST on bandwidth: 555 -> 534 img/s).  BN and
    # LeakyReLU stay in XLA: training batch stats + param tree unchanged
    USE_SLAB_MERGER: bool = False
    # merger training path: the WHOLE six-layer conv/BN/LeakyReLU stack
    # in ONE Pallas call forward and ONE backward
    # (ops/pallas_merger_stack.py): slab-resident activations, in-kernel
    # batch statistics, halo-fill as a permutation matmul.  Falls back
    # to XLA when the volume count is not divisible by 16.  The kernel
    # scales linearly with volumes while XLA's merger cost is nearly
    # flat in batch (PERFORMANCE.md), so it wins at per-chip volume
    # counts <= MERGER_STACK_MAX_VOLUMES (measured: full step 154.3 ->
    # 137.9 ms at 64 volumes; loses at 128) — the auto policy enables
    # it exactly there, which is the multi-chip data-parallel regime
    USE_MERGER_STACK: bool = True
    MERGER_STACK_MAX_VOLUMES: int = 64
    # n_views == 1 (a static shape): the merger's softmax over a
    # singleton view axis is exactly 1.0, so merged == coarse bitwise
    # and every merger-parameter gradient is exactly zero — skip the
    # weighted sum and the whole merger backward, keeping the conv
    # stack forward-only at train time for bit-exact BatchNorm
    # running-statistics parity with the reference's always-on merger
    # (core/train.py runs it regardless of view count).  The merger
    # gradient is exactly zero either way, so the training trajectory
    # is unchanged; the flag exists for A/B only.  Measured at batch
    # 128: 569.9 -> 637.4 img/s (tools/ab_bench.py 2026-08-20).
    MERGER_SINGLE_VIEW_IDENTITY: bool = True
    # tap-unrolled custom backward for the refiner's 1-channel first conv
    # (ops/unrolled_conv.py — pure XLA reassociation; fwd unchanged).
    # Off: measured 153.7 -> 298.6 ms/step at batch 64 — the chunked
    # patch-stack scan lowers far worse than XLA's own kernel-grad conv
    REFINER_UNROLLED_CONV: bool = False
    # fused Pallas backward for the same conv (ops/pallas_down1.py):
    # dW + dx in ONE pass over the cotangent (XLA computes them at
    # 69 GB/s / 1.9% MXU — its 1-input-channel worst case); forward
    # stays the stock lax conv (bit-identical inference)
    REFINER_DOWN1_PALLAS: bool = False
    # whole-SwinBlock megakernel at inference (ops/pallas_swin_block.py):
    # LN1+W-MSA+residual+LN2+MLP in one kernel (supersedes the W-MSA-only
    # kernel on deterministic passes).  Measured at batch 128: 2012 ->
    # 2222 img/s whole-model (+10%)
    # run every Pallas kernel in the interpreter (CPU tests of the
    # kernel + GSPMD composition; never set on real hardware)
    PALLAS_INTERPRET: bool = False
    USE_PALLAS_SWIN_BLOCK: bool = True
    # the TRAINING variant: forward with stochastic-depth factors plus a
    # full in-kernel backward (flash-style recompute; weight grads
    # accumulate in VMEM across the sequential grid).  The XLA swin
    # backbone cost 86.6 ms of the 186 ms train step (fwd 34.6 + bwd
    # 52.0, v5e trace at batch 64); with this kernel the whole step is
    # 154.4 ms (344 -> 414 img/s, +20%), loss bit-identical
    USE_PALLAS_SWIN_BLOCK_TRAIN: bool = True
    # chain whole swin stages window-major between fused blocks: ONE
    # rewindow pallas pass per block boundary (ops/rewindow.py) instead
    # of unpartition -> roll -> partition, with the 49->64 token padding
    # kept resident across the stage.  Escape hatch for the fused-block
    # paths above (bench.py falls back automatically if the kernel fails
    # to build on a new toolchain)
    USE_REWINDOW_CHAIN: bool = True
    #   initialize backbones from converted pretrained weights when a
    #   checkpoint path is given.  The reference downloads pretrained
    #   ResNet-50/Swin-Tiny but then clobbers them with init_weights
    #   (reference core/train.py:91-94, utils/helpers.py:20-44), so the
    #   as-coded behavior is random init; keep that as the default.
    PRETRAINED_BACKBONE: str = ""
    #   backbone scale (defaults = reference ResNet-50 / Swin-Tiny);
    #   smaller values give cheap model-family variants (e.g. SwinVox-Nano
    #   for CI: SWIN_DEPTHS=(1,1,1,1), RESNET_STAGE_DEPTHS=(1,1,1)).
    SWIN_DEPTHS: Tuple[int, ...] = (2, 2, 6, 2)
    RESNET_STAGE_DEPTHS: Tuple[int, int, int] = (3, 4, 6)
    #   "reference" replicates the reference's init_weights exactly
    #   (incl. its x0.1 conv scaling); "standard" uses conventional inits.
    #   Measured on the synthetic fixture: standard init reduces loss much
    #   faster initially but DIVERGES at the LRs that suit reference init
    #   (its x0.1 scaling acts as an implicit warmup) — pair "standard"
    #   with ~10x lower LRs or a warmup schedule.
    INIT_SCHEME: str = "reference"


@dataclass
class TrainConfig:
    """Training hyperparameters (reference config.py:100-124)."""

    RESUME_TRAIN: bool = False
    NUM_EPOCHS: int = 200
    BRIGHTNESS: float = 0.13746317606570424
    CONTRAST: float = 0.3365401951623921
    SATURATION: float = 0.20370660036548005
    NOISE_STD: float = 0.0850409938037522
    RANDOM_BG_COLOR_RANGE: Tuple[Tuple[int, int], ...] = (
        (225, 255),
        (225, 255),
        (225, 255),
    )
    POLICY: str = "adam"  # 'adam' | 'sgd'
    EPOCH_START_USE_REFINER: int = 0
    EPOCH_START_USE_MERGER: int = 0
    ENCODER_LEARNING_RATE: float = 3.834299021554089e-06
    DECODER_LEARNING_RATE: float = 2.4966084898328403e-05
    REFINER_LEARNING_RATE: float = 1.6418272442716922e-06
    MERGER_LEARNING_RATE: float = 0.00022177181973320365
    ENCODER_LR_MILESTONES: Tuple[int, ...] = (150,)
    DECODER_LR_MILESTONES: Tuple[int, ...] = (150,)
    REFINER_LR_MILESTONES: Tuple[int, ...] = (150,)
    MERGER_LR_MILESTONES: Tuple[int, ...] = (150,)
    BETAS: Tuple[float, float] = (0.8500000000000001, 0.993)
    MOMENTUM: float = 0.9
    GAMMA: float = 0.8830819189779433
    WEIGHT_DECAY: float = 0.0003370779562775397
    SAVE_FREQ: int = 10
    UPDATE_N_VIEWS_RENDERING: bool = False
    GRAD_CLIP_NORM: float = 1.0
    # fetch loss scalars from the device every N batches (1 = reference
    # behavior; >1 keeps the TPU pipeline free of host round-trips)
    LOG_EVERY: int = 10
    # split each batch into this many sequential micro-batches, averaging
    # gradients before the optimizer update — lets BATCH_SIZE exceed HBM
    GRAD_ACCUM_STEPS: int = 1
    # single-HBM-pass clip+decay+Adam+param update (optim.py
    # fused_torch_adam_apply); False falls back to the optax chain.
    # Same math, same optimizer-state structure either way.
    FUSED_OPTIMIZER: bool = False
    # run the train augmentations ON-DEVICE (data/device_augment.py): the
    # host ships raw decoded renders + per-sample parameters; crop/resize
    # ride the MXU and the color pipeline folds into one affine map.
    # Same distributions as the host path (parity in tests/test_data.py).
    # ShapeNet-style fixed-size alpha renders only (no bbox crops, no
    # RANDOM_BG_PATH images)
    DEVICE_AUGMENT: bool = False


@dataclass
class TestConfig:
    """Eval options (reference config.py:130-132)."""

    RANDOM_BG_COLOR_RANGE: Tuple[Tuple[int, int], ...] = (
        (240, 240),
        (240, 240),
        (240, 240),
    )
    VOXEL_THRESH: Tuple[float, ...] = (0.2, 0.3, 0.4, 0.5)
    # fixed-shape eval batch (the reference evaluates one sample at a time,
    # core/test.py:73; batching is where most of the eval speedup lives).
    # Rounded up to a multiple of the mesh's data axis when eval is sharded.
    EVAL_BATCH_SIZE: int = 8


@dataclass
class LRFinderConfig:
    """LR range-test options (reference config.py:138-142)."""

    START_LR: float = 1e-7
    END_LR: float = 1e-2
    NUM_BATCHES_TO_TEST: int = 1000
    AVG_BETA: float = 0.98


@dataclass
class ParallelConfig:
    """TPU mesh / sharding options (no reference analogue; replaces the
    reference's single-process torch.nn.DataParallel, core/train.py:156-161)."""

    # Mesh axis sizes; -1 on DATA means "all remaining devices".
    DATA_PARALLEL: int = -1
    MODEL_PARALLEL: int = 1
    MESH_AXIS_NAMES: Tuple[str, str] = ("data", "model")
    # multi-process bootstrap: call jax.distributed.initialize() at start
    # (auto-detected coordinator on Cloud TPU; explicit via the
    # SWINVOX_COORDINATOR/NUM_PROCESSES/PROCESS_ID env vars — see
    # parallel/distributed.py).  Single-process runs leave this False.
    DISTRIBUTED: bool = False


@dataclass
class Config:
    DATASETS: DatasetsConfig = field(default_factory=DatasetsConfig)
    DATASET: DatasetConfig = field(default_factory=DatasetConfig)
    CONST: ConstConfig = field(default_factory=ConstConfig)
    DIR: DirConfig = field(default_factory=DirConfig)
    NETWORK: NetworkConfig = field(default_factory=NetworkConfig)
    TRAIN: TrainConfig = field(default_factory=TrainConfig)
    TEST: TestConfig = field(default_factory=TestConfig)
    LR_FINDER: LRFinderConfig = field(default_factory=LRFinderConfig)
    PARALLEL: ParallelConfig = field(default_factory=ParallelConfig)

    # ---- serialization ----------------------------------------------------

    def to_dict(self) -> dict:
        return dataclasses.asdict(self)

    def to_json(self, **kwargs: Any) -> str:
        return json.dumps(self.to_dict(), indent=2, **kwargs)

    @classmethod
    def from_dict(cls, d: dict) -> "Config":
        cfg = cls()
        cfg.update(d)
        return cfg

    @classmethod
    def from_json(cls, s: str) -> "Config":
        return cls.from_dict(json.loads(s))

    # ---- overrides ---------------------------------------------------------

    def update(self, overrides: dict) -> "Config":
        """Recursively apply a nested dict of overrides in place."""
        _apply_overrides(self, overrides)
        return self

    def set(self, dotted_key: str, value: Any) -> "Config":
        """Set e.g. cfg.set('NETWORK.USE_MERGER', False)."""
        parts = dotted_key.split(".")
        obj: Any = self
        for p in parts[:-1]:
            obj = getattr(obj, p)
        current = getattr(obj, parts[-1])
        if isinstance(current, tuple) and isinstance(value, (list, tuple)):
            value = tuple(
                tuple(v) if isinstance(v, (list, tuple)) else v for v in value
            )
        elif current is not None and not isinstance(current, bool) and isinstance(
            current, (int, float)
        ):
            value = type(current)(value)
        setattr(obj, parts[-1], value)
        return self

    def get(self, dotted_key: str) -> Any:
        obj: Any = self
        for p in dotted_key.split("."):
            obj = getattr(obj, p)
        return obj

    def validate(self) -> None:
        if self.TRAIN.POLICY not in ("adam", "sgd"):
            raise ValueError(f"Unknown optimizer policy {self.TRAIN.POLICY!r}")
        stages = tuple(self.NETWORK.SWIN_T_STAGES)
        if stages == (-1,):
            stages = (3,)
            self.NETWORK.SWIN_T_STAGES = stages
        if any(s < 0 or s > 3 for s in stages):
            raise ValueError(f"SWIN_T_STAGES must be within [0,3], got {stages}")
        reduced = 512 // self.NETWORK.CROSS_ATT_REDUCTION_RATIO
        if reduced % self.NETWORK.CROSS_ATT_NUM_HEADS != 0:
            raise ValueError(
                f"cross-view reduced channels ({reduced}) must be divisible by "
                f"num_heads ({self.NETWORK.CROSS_ATT_NUM_HEADS})"
            )
        if self.CONST.N_VIEWS_RENDERING < 1:
            raise ValueError("N_VIEWS_RENDERING must be >= 1")


def _apply_overrides(obj: Any, overrides: dict) -> None:
    for k, v in overrides.items():
        if not hasattr(obj, k):
            raise KeyError(f"Unknown config key: {k} on {type(obj).__name__}")
        current = getattr(obj, k)
        if dataclasses.is_dataclass(current) and isinstance(v, dict):
            _apply_overrides(current, v)
        else:
            if isinstance(current, tuple) and isinstance(v, (list, tuple)):
                v = tuple(tuple(x) if isinstance(x, (list, tuple)) else x for x in v)
            setattr(obj, k, v)


def default_config() -> Config:
    return Config()

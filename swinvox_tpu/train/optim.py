"""Per-module optimizers with torch semantics.

The reference trains four separate optimizers (Adam or SGD) with distinct
learning rates and MultiStepLR decay per module, and clips each module's
gradients to norm 1.0 separately (reference core/train.py:98-152, 282-285).
Here each module gets its own optax chain; the step function applies them
to the four parameter subtrees and can skip a module faithfully (the
reference skips scaler.step for gated modules, which leaves both moments
and weight-decay untouched — core/train.py:292-295).

Torch Adam applies weight decay as L2 on the gradient *before* the moment
update; the equivalent chain is add_decayed_weights -> scale_by_adam.
No GradScaler is needed: TPU trains in bfloat16, which has float32's
exponent range, so the reference's AMP loss-scaling machinery
(core/train.py:32,152,272-297) has no TPU counterpart by design.
"""

from __future__ import annotations

from typing import Callable, Dict, NamedTuple, Sequence, Tuple

import optax

from swinvox_tpu.config import Config

MODULE_NAMES = ("encoder", "decoder", "merger", "refiner")


class ModuleOptimizer(NamedTuple):
    """A gradient transform with its LR schedule kept OUTSIDE the chain.

    The schedule is evaluated on the global training step, not optax's
    per-module update count: the reference steps every module's MultiStepLR
    each epoch even while that module's optimizer step is gated off
    (core/train.py:292-295, 318-321), so a refiner enabled at epoch 50
    still decays at milestone 150 — not 200.
    """

    transform: optax.GradientTransformation
    schedule: optax.Schedule

    def init(self, params):
        return self.transform.init(params)


def multistep_lr(
    base_lr: float,
    milestones: Sequence[int],
    gamma: float,
    steps_per_epoch: int,
) -> optax.Schedule:
    """MultiStepLR: multiply by gamma at each milestone epoch."""
    boundaries = {
        int(m) * int(steps_per_epoch): gamma for m in milestones if m > 0
    }
    return optax.piecewise_constant_schedule(base_lr, boundaries)


def build_module_optimizer(
    cfg: Config, base_lr: float, milestones: Sequence[int], steps_per_epoch: int
) -> ModuleOptimizer:
    schedule = multistep_lr(base_lr, milestones, cfg.TRAIN.GAMMA, steps_per_epoch)
    clip = optax.clip_by_global_norm(cfg.TRAIN.GRAD_CLIP_NORM)
    if cfg.TRAIN.POLICY == "adam":
        b1, b2 = cfg.TRAIN.BETAS
        transform = optax.chain(
            clip,
            optax.add_decayed_weights(cfg.TRAIN.WEIGHT_DECAY),
            optax.scale_by_adam(b1=b1, b2=b2, eps=1e-8),
        )
    elif cfg.TRAIN.POLICY == "sgd":
        transform = optax.chain(
            clip,
            optax.add_decayed_weights(cfg.TRAIN.WEIGHT_DECAY),
            optax.trace(decay=cfg.TRAIN.MOMENTUM),
        )
    else:
        raise ValueError(f"Unknown optimizer policy {cfg.TRAIN.POLICY!r}")
    return ModuleOptimizer(transform, schedule)


def build_optimizers(
    cfg: Config, steps_per_epoch: int
) -> Dict[str, ModuleOptimizer]:
    """One (transform, schedule) per module, keyed by param-tree group."""
    t = cfg.TRAIN
    spec = {
        "encoder": (t.ENCODER_LEARNING_RATE, t.ENCODER_LR_MILESTONES),
        "decoder": (t.DECODER_LEARNING_RATE, t.DECODER_LR_MILESTONES),
        "merger": (t.MERGER_LEARNING_RATE, t.MERGER_LR_MILESTONES),
        "refiner": (t.REFINER_LEARNING_RATE, t.REFINER_LR_MILESTONES),
    }
    return {
        name: build_module_optimizer(cfg, lr, ms, steps_per_epoch)
        for name, (lr, ms) in spec.items()
    }

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

from typing import Callable, Dict, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
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
    # single-HBM-pass update (see fused_torch_adam_apply); None -> use the
    # optax chain.  State structure is IDENTICAL either way, so checkpoints
    # and the flag are freely interchangeable mid-run.
    fused_apply: Optional[Callable] = None

    def init(self, params):
        return self.transform.init(params)


def _clip_scale_and_trigger(grads, clip_norm):
    """optax.clip_by_global_norm's decision, hoisted out of the per-leaf
    expression: trigger (norm < max) and the scalar g_norm."""
    g_norm = optax.global_norm(grads)
    trigger = jnp.squeeze(g_norm < clip_norm)
    return trigger, g_norm


def _unzip3(tree_of_triples):
    is_triple = lambda x: isinstance(x, tuple) and len(x) == 3
    pick = lambda i: jax.tree.map(
        lambda t: t[i], tree_of_triples, is_leaf=is_triple
    )
    return pick(0), pick(1), pick(2)


def fused_torch_adam_apply(
    clip_norm: float, wd: float, b1: float, b2: float, eps: float = 1e-8
) -> Callable:
    """One-pass clip -> L2-on-grad -> Adam -> param update.

    The optax chain (clip_by_global_norm -> add_decayed_weights ->
    scale_by_adam) + apply_updates is numerically identical but XLA
    materializes the decayed-gradient intermediate as its own HBM pass
    (measured 3.2 ms for the 79 M-param tree at batch 128, on top of
    3.2 ms for the Adam math itself — jax.profiler trace, PERFORMANCE.md).
    Expressing the whole update as ONE jax.tree.map keeps every
    intermediate in registers: each leaf reads (g, p, mu, nu) and writes
    (p', mu', nu') exactly once — the 28 B/param HBM floor.

    Op-for-op the same math as the optax chain (clipping.py's
    select(trigger, g, g/norm*max), transform.py's moment updates and
    1-b**t bias correction, steps.py's p - lr*u), so the torch-semantics
    parity pinned in tests/test_train.py holds on both paths.
    """

    def apply(params, grads, opt_state, lr):
        clip_state, wd_state, adam = opt_state
        trigger, g_norm = _clip_scale_and_trigger(grads, clip_norm)
        # optax numerics.safe_increment: saturating count + 1
        count = adam.count
        count_inc = jnp.where(
            count < jnp.iinfo(count.dtype).max, count + 1, count
        )
        bc1 = 1.0 - b1 ** count_inc
        bc2 = 1.0 - b2 ** count_inc

        def leaf(p, g, m, v):
            g = jax.lax.select(trigger, g, (g / g_norm) * clip_norm)
            u = g + wd * p
            m2 = b1 * m + (1.0 - b1) * u
            v2 = b2 * v + (1.0 - b2) * (u * u)
            step = (m2 / bc1.astype(m2.dtype)) / (
                jnp.sqrt(v2 / bc2.astype(v2.dtype)) + eps
            )
            return p - lr * step, m2, v2

        out = jax.tree.map(leaf, params, grads, adam.mu, adam.nu)
        new_p, new_mu, new_nu = _unzip3(out)
        new_adam = adam._replace(count=count_inc, mu=new_mu, nu=new_nu)
        return new_p, (clip_state, wd_state, new_adam)

    return apply


def fused_torch_sgd_apply(
    clip_norm: float, wd: float, momentum: float
) -> Callable:
    """One-pass clip -> L2-on-grad -> momentum SGD -> param update
    (optax.trace semantics: t' = u + decay*t, update = t')."""

    def apply(params, grads, opt_state, lr):
        clip_state, wd_state, trace = opt_state
        trigger, g_norm = _clip_scale_and_trigger(grads, clip_norm)

        def leaf(p, g, t):
            g = jax.lax.select(trigger, g, (g / g_norm) * clip_norm)
            u = g + wd * p
            t2 = u + momentum * t
            return p - lr * t2, t2, t2

        out = jax.tree.map(leaf, params, grads, trace.trace)
        new_p, new_t, _ = _unzip3(out)
        return new_p, (clip_state, wd_state, trace._replace(trace=new_t))

    return apply


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
    fused = None
    use_fused = cfg.TRAIN.FUSED_OPTIMIZER
    if cfg.TRAIN.POLICY == "adam":
        b1, b2 = cfg.TRAIN.BETAS
        transform = optax.chain(
            clip,
            optax.add_decayed_weights(cfg.TRAIN.WEIGHT_DECAY),
            optax.scale_by_adam(b1=b1, b2=b2, eps=1e-8),
        )
        if use_fused:
            fused = fused_torch_adam_apply(
                cfg.TRAIN.GRAD_CLIP_NORM, cfg.TRAIN.WEIGHT_DECAY, b1, b2
            )
    elif cfg.TRAIN.POLICY == "sgd":
        transform = optax.chain(
            clip,
            optax.add_decayed_weights(cfg.TRAIN.WEIGHT_DECAY),
            optax.trace(decay=cfg.TRAIN.MOMENTUM),
        )
        if use_fused:
            fused = fused_torch_sgd_apply(
                cfg.TRAIN.GRAD_CLIP_NORM,
                cfg.TRAIN.WEIGHT_DECAY,
                cfg.TRAIN.MOMENTUM,
            )
    else:
        raise ValueError(f"Unknown optimizer policy {cfg.TRAIN.POLICY!r}")
    return ModuleOptimizer(transform, schedule, fused)


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

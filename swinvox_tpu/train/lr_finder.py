"""Learning-rate range test — the reference's find_lr (utils/lr_finder.py).

Semantics: sweep LR geometrically from LR_FINDER.START_LR to END_LR over at
most NUM_BATCHES_TO_TEST batches, running real train steps; track an
EMA-smoothed loss (beta=AVG_BETA) with bias correction; stop early when the
smoothed loss exceeds 10x the best; suggest the LR at the steepest negative
loss gradient near the minimum; save a loss-vs-LR plot.  Model state is
thrown away afterwards (the reference restores saved weights,
lr_finder.py:251-256 — here the swept state simply isn't returned).

TPU-native difference: instead of mutating optimizer param groups each
batch, the sweep IS the optax schedule (one jitted step, zero recompiles).
"""

from __future__ import annotations

import logging
import math
import os
from typing import List, Optional, Tuple

import jax
import numpy as np
import optax

from swinvox_tpu.config import Config
from swinvox_tpu.data.pipeline import build_loader
from swinvox_tpu.data.taxonomy import DatasetType
from swinvox_tpu.train.optim import MODULE_NAMES
from swinvox_tpu.train.state import TrainState, create_train_state
from swinvox_tpu.train.steps import make_train_step
from swinvox_tpu.utils.cache import enable_compilation_cache

log = logging.getLogger(__name__)


def exponential_sweep(start: float, end: float, num_steps: int) -> optax.Schedule:
    ratio = end / start

    def schedule(step):
        frac = jax.numpy.minimum(step / max(num_steps - 1, 1), 1.0)
        return start * ratio**frac

    return schedule


def _sweep_optimizers(cfg: Config, num_steps: int):
    from swinvox_tpu.train.optim import ModuleOptimizer

    schedule = exponential_sweep(
        cfg.LR_FINDER.START_LR, cfg.LR_FINDER.END_LR, num_steps
    )
    b1, b2 = cfg.TRAIN.BETAS

    def chain():
        if cfg.TRAIN.POLICY == "adam":
            inner = optax.scale_by_adam(b1=b1, b2=b2, eps=1e-8)
        else:
            inner = optax.trace(decay=cfg.TRAIN.MOMENTUM)
        return optax.chain(
            optax.clip_by_global_norm(cfg.TRAIN.GRAD_CLIP_NORM),
            optax.add_decayed_weights(cfg.TRAIN.WEIGHT_DECAY),
            inner,
        )

    return {
        name: ModuleOptimizer(chain(), schedule) for name in MODULE_NAMES
    }, schedule


def find_lr(cfg: Config, plot_path: Optional[str] = None) -> float:
    enable_compilation_cache()
    num_steps = cfg.LR_FINDER.NUM_BATCHES_TO_TEST
    beta = cfg.LR_FINDER.AVG_BETA

    loader = build_loader(cfg, DatasetType.TRAIN)
    model, state, _ = create_train_state(
        cfg, jax.random.PRNGKey(cfg.CONST.RNG_SEED), steps_per_epoch=1
    )
    optimizers, schedule = _sweep_optimizers(cfg, num_steps)
    state = state.replace(
        opt_states={
            n: optimizers[n].init(state.params[n]) for n in MODULE_NAMES
        }
    )
    train_step = make_train_step(model, optimizers)

    lrs: List[float] = []
    losses: List[float] = []
    avg_loss, best_loss = 0.0, float("inf")
    step = 0
    rng = jax.random.PRNGKey(cfg.CONST.RNG_SEED + 7)
    stop = False
    while step < num_steps and not stop:
        loader.set_epoch(step // max(len(loader), 1))
        for batch in loader:
            lr = float(schedule(step))
            from swinvox_tpu.data.device_augment import (
                apply_device_augment,
                batch_to_host_dict,
            )

            images = apply_device_augment(batch_to_host_dict(batch, cfg), cfg)
            state, metrics = train_step(
                state, images, batch.volumes, rng,
                enable_merger=cfg.NETWORK.USE_MERGER,
                enable_refiner=cfg.NETWORK.USE_REFINER,
            )
            loss = float(metrics["total_loss"])
            avg_loss = beta * avg_loss + (1 - beta) * loss
            smoothed = avg_loss / (1 - beta ** (step + 1))
            lrs.append(lr)
            losses.append(smoothed)
            if smoothed < best_loss:
                best_loss = smoothed
            if step > 10 and smoothed > 10 * best_loss:
                log.info("Divergence at step %d (lr=%.2e); stopping.", step, lr)
                stop = True
                break
            if step % 25 == 0:
                log.info("lr_find step %d/%d lr=%.2e loss=%.4f",
                         step, num_steps, lr, smoothed)
            step += 1
            if step >= num_steps:
                break

    suggestion = suggest_lr(lrs, losses)
    log.info("Suggested LR: %.3e", suggestion)

    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        plot_path = plot_path or os.path.join(cfg.DIR.OUT_PATH, "lr_finder.png")
        os.makedirs(os.path.dirname(plot_path), exist_ok=True)
        fig, ax = plt.subplots()
        ax.plot(lrs, losses)
        ax.set_xscale("log")
        ax.set_xlabel("learning rate")
        ax.set_ylabel("smoothed loss")
        ax.axvline(suggestion, color="r", linestyle="--",
                   label=f"suggested {suggestion:.2e}")
        ax.legend()
        fig.savefig(plot_path, dpi=120)
        plt.close(fig)
        log.info("Saved LR plot to %s", plot_path)
    except Exception as e:  # plotting is best-effort
        log.warning("Could not save LR plot: %s", e)
    return suggestion


def suggest_lr(lrs: List[float], losses: List[float]) -> float:
    """LR at the steepest negative gradient of smoothed loss vs log-LR,
    restricted to before the loss minimum (reference lr_finder.py:224-241)."""
    if len(lrs) < 3:
        return lrs[-1] if lrs else 1e-3
    losses_arr = np.asarray(losses)
    min_idx = int(np.argmin(losses_arr))
    if min_idx < 2:
        return lrs[min_idx]
    grads = np.gradient(losses_arr[: min_idx + 1], np.log10(lrs[: min_idx + 1]))
    return lrs[int(np.argmin(grads))]

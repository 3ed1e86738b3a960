"""Jitted train/eval steps — the whole reference hot loop as one XLA program.

The reference's batch loop (core/train.py:216-314) does: host->device copy,
clamp, autocast forward through 4 modules, BCE losses, scaled backward,
per-module unscale + clip + step.  Here the forward, loss, backward, and all
four optimizer updates compile into a single jitted function; under a mesh
the batch is sharded over the "data" axis and GSPMD inserts the gradient
all-reduce.  bfloat16 makes the GradScaler machinery unnecessary.

Merger/refiner epoch gating (core/train.py:243-261, 292-295) is a static
argument: flipping it recompiles once at the gate epoch, and the skipped
module's optimizer state and weights stay EXACTLY untouched, like the
reference's skipped scaler.step.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from swinvox_tpu.models import SwinVoxModel
from swinvox_tpu.ops.losses import (
    bce_with_logits,
    bce_with_logits_per_sample,
    voxel_fscore,
    voxel_iou,
)
from swinvox_tpu.train.optim import MODULE_NAMES
from swinvox_tpu.train.state import TrainState


def make_train_step(
    model: SwinVoxModel,
    optimizers: Dict[str, optax.GradientTransformation],
    donate: bool = True,
    grad_accum_steps: int = 1,
    mesh=None,
) -> Callable:
    """Returns train_step(state, images, volumes, rng, enable_merger,
    enable_refiner) -> (state, metrics).

    With grad_accum_steps > 1 the batch is split into that many equal
    micro-batches scanned sequentially: gradients are averaged across
    micro-batches before the single optimizer update, and BatchNorm
    running statistics advance once per micro-batch (the same sequential
    semantics torch gets when accumulating).  Lets the effective batch
    exceed what fits in HBM at ~no extra memory.
    """

    def micro_grads(params, batch_stats, images, volumes, dropout_rng,
                    enable_merger, enable_refiner):
        def loss_fn(params):
            out, mutated = model.apply(
                {"params": params, "batch_stats": batch_stats},
                images,
                train=True,
                enable_merger=enable_merger,
                enable_refiner=enable_refiner,
                rngs={"dropout": dropout_rng},
                mutable=["batch_stats"],
            )
            encoder_loss = bce_with_logits(out["merged_volumes"], volumes)
            if enable_refiner:
                refiner_loss = bce_with_logits(out["refined_volumes"], volumes)
                total = encoder_loss + refiner_loss
            else:
                refiner_loss = encoder_loss
                total = encoder_loss
            return total, (encoder_loss, refiner_loss, mutated["batch_stats"])

        return jax.grad(loss_fn, has_aux=True)(params)

    def train_step(
        state: TrainState,
        images: jax.Array,  # [B, N, H, W, 3] float32
        volumes: jax.Array,  # [B, D, H, W] {0,1}: f32, or uint8 on the wire
        rng: jax.Array,
        enable_merger: bool,
        enable_refiner: bool,
    ) -> Tuple[TrainState, Dict[str, jax.Array]]:
        images = jnp.clip(images, -1.0, 1.0)
        # loaders ship binary occupancy as uint8 (4x less host->device
        # traffic, batch_to_host_dict); loss math is f32 either way
        volumes = jnp.clip(volumes.astype(jnp.float32), 0.0, 1.0)
        dropout_rng = jax.random.fold_in(rng, state.step)

        if grad_accum_steps == 1:
            grads, (encoder_loss, refiner_loss, new_batch_stats) = micro_grads(
                state.params, state.batch_stats, images, volumes,
                dropout_rng, enable_merger, enable_refiner,
            )
        else:
            b = images.shape[0]
            assert b % grad_accum_steps == 0, (
                f"batch {b} not divisible by grad_accum_steps "
                f"{grad_accum_steps}"
            )
            micro = b // grad_accum_steps
            images_r = images.reshape((grad_accum_steps, micro) + images.shape[1:])
            volumes_r = volumes.reshape(
                (grad_accum_steps, micro) + volumes.shape[1:]
            )
            if mesh is not None:
                # the incoming batch is sharded P('data'); after the
                # reshape the batch axis moved to dim 1 — pin the layout
                # so GSPMD reshards in place instead of gathering the
                # whole image batch before the scan
                from jax.sharding import NamedSharding, PartitionSpec

                micro_sharding = NamedSharding(
                    mesh, PartitionSpec(None, "data")
                )
                images_r = jax.lax.with_sharding_constraint(
                    images_r, micro_sharding
                )
                volumes_r = jax.lax.with_sharding_constraint(
                    volumes_r, micro_sharding
                )

            def body(carry, xs):
                grads_acc, batch_stats, el_acc, rl_acc = carry
                micro_images, micro_volumes, idx = xs
                g, (el, rl, new_stats) = micro_grads(
                    state.params, batch_stats, micro_images, micro_volumes,
                    jax.random.fold_in(dropout_rng, idx),
                    enable_merger, enable_refiner,
                )
                grads_acc = jax.tree.map(jnp.add, grads_acc, g)
                return (grads_acc, new_stats, el_acc + el, rl_acc + rl), None

            zero_grads = jax.tree.map(jnp.zeros_like, state.params)
            (grads, new_batch_stats, el_sum, rl_sum), _ = jax.lax.scan(
                body,
                (zero_grads, state.batch_stats, 0.0, 0.0),
                (images_r, volumes_r, jnp.arange(grad_accum_steps)),
            )
            inv = 1.0 / grad_accum_steps
            grads = jax.tree.map(lambda g: g * inv, grads)
            encoder_loss = el_sum * inv
            refiner_loss = rl_sum * inv

        active = {
            "encoder": True,
            "decoder": True,
            "merger": enable_merger and model.use_merger,
            "refiner": enable_refiner and model.use_refiner,
        }
        new_params = dict(state.params)
        new_opt_states = dict(state.opt_states)
        for name in MODULE_NAMES:
            if not active[name]:
                continue  # exactly like the reference's skipped solver.step
            # the LR schedule runs on the GLOBAL step so gated modules'
            # milestones don't shift (reference steps every scheduler each
            # epoch, core/train.py:318-321)
            lr = optimizers[name].schedule(state.step)
            if optimizers[name].fused_apply is not None:
                # single-HBM-pass clip+decay+moment+param update (optim.py)
                new_params[name], new_opt_states[name] = optimizers[
                    name
                ].fused_apply(
                    state.params[name], grads[name], state.opt_states[name], lr
                )
            else:
                updates, new_opt_states[name] = optimizers[
                    name
                ].transform.update(
                    grads[name], state.opt_states[name], state.params[name]
                )
                updates = jax.tree.map(lambda u: -lr * u, updates)
                new_params[name] = optax.apply_updates(
                    state.params[name], updates
                )

        metrics = {
            "encoder_loss": encoder_loss,
            "refiner_loss": refiner_loss,
            "total_loss": encoder_loss
            + (refiner_loss if enable_refiner else 0.0),
        }
        new_state = TrainState(
            params=new_params,
            batch_stats=new_batch_stats,
            opt_states=new_opt_states,
            step=state.step + 1,
        )
        return new_state, metrics

    return jax.jit(
        train_step,
        static_argnames=("enable_merger", "enable_refiner"),
        donate_argnames=("state",) if donate else (),
    )


def make_eval_step(
    model: SwinVoxModel,
    thresholds: Tuple[float, ...] = (0.2, 0.3, 0.4, 0.5),
) -> Callable:
    """Returns eval_step(params, batch_stats, images, volumes,
    enable_merger, enable_refiner) -> per-sample metrics.

    Matches reference core/test.py:114-164: losses x10, sigmoid, binarize
    at each threshold, IoU with the union-0 edge case, F-score eps=1e-8.
    """

    def eval_step(
        params,
        batch_stats,
        images: jax.Array,
        volumes: jax.Array,
        enable_merger: bool,
        enable_refiner: bool,
    ) -> Dict[str, jax.Array]:
        images = jnp.clip(images, -1.0, 1.0)
        volumes = jnp.clip(volumes.astype(jnp.float32), 0.0, 1.0)
        out = model.apply(
            {"params": params, "batch_stats": batch_stats},
            images,
            train=False,
            enable_merger=enable_merger,
            enable_refiner=enable_refiner,
        )
        # per-sample losses so padded eval batches can be sliced correctly
        encoder_loss = (
            bce_with_logits_per_sample(out["merged_volumes"], volumes) * 10.0
        )
        if enable_refiner:
            final = out["refined_volumes"]
            refiner_loss = bce_with_logits_per_sample(final, volumes) * 10.0
        else:
            final = out["merged_volumes"]
            refiner_loss = encoder_loss
        probs = jax.nn.sigmoid(final.astype(jnp.float32))
        return {
            "encoder_loss": encoder_loss,  # [B]
            "refiner_loss": refiner_loss,  # [B]
            "iou": voxel_iou(probs, volumes, thresholds),  # [B, T]
            "fscore": voxel_fscore(probs, volumes, thresholds),  # [B, T]
            "probs": probs,
        }

    return jax.jit(
        eval_step, static_argnames=("enable_merger", "enable_refiner")
    )

"""Context-aware merger: per-voxel softmax weighting over views.

Semantics of reference models/merger.py: four stacked Conv3d(9->9, k3)
blocks over each view's raw features, concat of the four intermediate
outputs -> Conv3d(36->9), Conv3d(9->1) (all BatchNorm + LeakyReLU(0.2)),
softmax of the resulting per-view scalar fields over the view axis, and a
weighted sum of the per-view coarse **logit** volumes.

Layout: NDHWC; raw_features [B, N, 32, 32, 32, 9], coarse [B, N, 32^3].
Returns merged logits [B, 32, 32, 32].

Two execution paths sharing ONE parameter layout:
  * XLA convs (training, CPU, or use_pallas=False);
  * the fused Pallas kernel (ops/pallas_merger.py) at inference on TPU —
    all six conv/BN/LeakyReLU layers in one VMEM-resident kernel, avoiding
    XLA's 9->128 channel padding (~14x memory inflation on this stack).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from swinvox_tpu.models.layers import Conv, Norm

Dtype = Any

_CHANNELS = ((9, 9), (9, 9), (9, 9), (9, 9), (36, 9), (9, 1))


class Merger(nn.Module):
    leaky_value: float = 0.2
    dtype: Dtype = jnp.bfloat16
    use_pallas: bool = False
    # training path: run each conv through the differentiable banded
    # Pallas conv (ops/pallas_band_conv.py) — in-kernel input/weight
    # gradients; BN/bias/LeakyReLU stay in XLA
    use_pallas_train: bool = False
    # training path: dense-lane 2D band convs in XLA
    # (ops/band2d_merger.py) — packs (h, c) into lanes so the 9-channel
    # convs stop running 14x lane-padded; autodiff + train BN for free
    use_band2d: bool = False
    # both paths: each conv as a Pallas slab band-conv with in-kernel
    # forward AND backward (ops/pallas_slab_conv.py) — lanes stay dense,
    # the dw taps fold into banded MXU matmuls; BN/bias/LeakyReLU stay
    # in XLA so training-mode batch stats and the param tree are
    # unchanged
    use_slab: bool = False
    # training path: the WHOLE six-layer stack in one Pallas call each
    # way (ops/pallas_merger_stack.py) — convs, train-mode BatchNorm and
    # LeakyReLU slab-resident, one fwd + one bwd pallas_call; needs the
    # volume count divisible by 16 (falls back to XLA otherwise)
    use_stack: bool = False
    # largest volume count at which use_stack engages (the kernel scales
    # linearly with volumes; XLA's merger cost is ~flat in batch)
    stack_max_volumes: int = 64
    # n_views == 1 (a static shape): softmax over a singleton view axis
    # is exactly 1.0, so the merged volume IS the single coarse volume
    # bitwise, the softmax jacobian w*(1-w) is exactly zero, and every
    # merger-parameter gradient (and the gradient into raw_features) is
    # exactly zero.  With this flag the weighted sum and the whole
    # backward are skipped; the conv stack still runs FORWARD-only at
    # train time (under stop_gradient) so the BatchNorm running
    # statistics update exactly as the reference's always-on merger
    # does (reference core/train.py runs the merger regardless of view
    # count).  The merger gradient is exactly zero either way (asserted
    # numerically in tests/test_train.py), so the training trajectory
    # is unchanged; measured 224.6 -> 200.8 ms on the batch-128 train
    # step (569.9 -> 637.4 img/s, tools/ab_bench.py 2026-08-20).
    single_view_identity: bool = True
    # run the fused kernel in the Pallas interpreter (CPU parity tests)
    pallas_interpret: bool = False

    @nn.compact
    def __call__(
        self, raw_features: jax.Array, coarse_volumes: jax.Array, train: bool
    ) -> jax.Array:
        b, n_views = raw_features.shape[:2]
        x = raw_features.reshape(b * n_views, 32, 32, 32, 9)

        # The fused kernel folds BatchNorm as an affine from RUNNING stats,
        # so it serves inference only; training-mode BN needs cross-volume
        # batch statistics and stays on the XLA path.
        use_fused = self.use_pallas and not train and (
            self.pallas_interpret or jax.default_backend() == "tpu"
        )

        convs = [
            Conv(co, (3, 3, 3), padding=1, dtype=self.dtype,
                 name=f"conv{i + 1}")
            for i, (_, co) in enumerate(_CHANNELS)
        ]
        norms = [
            Norm(dtype=self.dtype, name=f"bn{i + 1}") for i in range(6)
        ]

        identity = self.single_view_identity and n_views == 1
        if identity:
            # merged == coarse bitwise and all merger/raw gradients are
            # exactly zero (see the single_view_identity note above).
            merged_1v = (
                coarse_volumes[:, 0].astype(jnp.float32).astype(self.dtype)
            )
            if not train:
                # register the identical variable trees (the dummy-trace
                # trick from the use_fused branch) and skip the stack.
                for i, (ci, _) in enumerate(_CHANNELS):
                    d = convs[i](jnp.zeros((1, 3, 3, 3, ci), self.dtype))
                    norms[i](d, False)
                return merged_1v
            # train: fall through so the selected conv-stack path runs
            # forward-only for its BatchNorm statistics side effect; the
            # pre-softmax `weights` value is discarded below, so XLA
            # dead-code-eliminates everything not feeding the stats.
            x = jax.lax.stop_gradient(x)

        if use_fused:
            from swinvox_tpu.ops.pallas_merger import merger_view_weights

            # materialize the SAME parameter/stat trees the XLA path
            # creates by tracing each module on a tiny dummy (the dummy
            # compute is dead code XLA eliminates), then read the bound
            # variables and run the fused kernel on the real input
            kernels, biases, bn_params = [], [], []
            for i, (ci, co) in enumerate(_CHANNELS):
                dummy = jnp.zeros((1, 3, 3, 3, ci), self.dtype)
                d_out = convs[i](dummy)
                norms[i](d_out, False)
                cp = convs[i].variables["params"]["Conv_0"]
                kernels.append(cp["kernel"])
                biases.append(cp["bias"])
                np_ = norms[i].variables["params"]["bn"]
                ns = norms[i].variables["batch_stats"]["bn"]
                bn_params.append(
                    (np_["scale"], np_["bias"], ns["mean"], ns["var"])
                )
            weights = merger_view_weights(
                x, kernels, biases, bn_params, leaky=self.leaky_value,
                interpret=self.pallas_interpret,
            ).reshape(b, n_views, 32, 32, 32)
        elif (
            self.use_stack and train and (b * n_views) % 16 == 0
            and (b * n_views) <= self.stack_max_volumes
            and (self.pallas_interpret or jax.default_backend() == "tpu")
        ):
            from swinvox_tpu.ops.pallas_merger_stack import merger_stack

            # materialize the identical conv/BN variable trees via the
            # dummy-trace trick (see use_fused), then run the whole
            # six-layer stack in one Pallas call each way
            kernels, biases, gammas, betas = [], [], [], []
            for i, (ci, co) in enumerate(_CHANNELS):
                convs[i](jnp.zeros((1, 3, 3, 3, ci), self.dtype))
                cp = convs[i].variables["params"]["Conv_0"]
                kernels.append(cp["kernel"])
                biases.append(cp["bias"])
                norms[i](jnp.zeros((1, co), self.dtype), False)
                bnv = norms[i].variables["params"]["bn"]
                gammas.append(bnv["scale"])
                betas.append(bnv["bias"])
            raw5, means, vars_ = merger_stack(
                x, kernels, biases, gammas[:5], betas[:5],
                leaky=self.leaky_value,
                interpret=self.pallas_interpret,
            )
            means = [jax.lax.stop_gradient(m) for m in means]
            vars_ = [jax.lax.stop_gradient(v) for v in vars_]
            # running-average updates (flax semantics via Norm's
            # external-stats mode; layers 0..4 were normalized in-kernel)
            for i in range(5):
                norms[i](
                    jnp.zeros((1, 9), self.dtype), True,
                    external_stats=(means[i], vars_[i]),
                )
            # layer 5's BatchNorm in XLA from raw5's own batch stats, so
            # plain autodiff covers its backward (incl. the stats terms)
            r32 = raw5.astype(jnp.float32)
            m5 = jnp.mean(r32, axis=(0, 1, 2, 3))
            v5 = jnp.mean(r32 * r32, axis=(0, 1, 2, 3)) - m5 * m5
            y5 = norms[5](raw5, True, external_stats=(m5, v5))
            y5 = nn.leaky_relu(y5, self.leaky_value)
            weights = y5[..., 0].reshape(b, n_views, 32, 32, 32)
        elif self.use_slab and (
            self.pallas_interpret or jax.default_backend() == "tpu"
        ):
            from swinvox_tpu.ops.pallas_slab_conv import slab_conv3d

            def layer(i, y5d):
                # y5d: [V, D, H, W, ci] -> conv -> BN -> leaky; the param
                # tree is materialized by the dummy-trace trick (see the
                # use_fused branch above)
                ci, co = _CHANNELS[i]
                convs[i](jnp.zeros((1, 3, 3, 3, ci), self.dtype))
                cp = convs[i].variables["params"]["Conv_0"]
                y = slab_conv3d(
                    y5d, cp["kernel"], interpret=self.pallas_interpret
                ) + cp["bias"].astype(y5d.dtype)
                y = norms[i](y, train)
                return nn.leaky_relu(y, self.leaky_value)

            y = x
            intermediates = []
            for i in range(4):
                y = layer(i, y)
                intermediates.append(y)
            y = layer(4, jnp.concatenate(intermediates, axis=-1))
            y = layer(5, y)
            weights = y[..., 0].reshape(b, n_views, 32, 32, 32)
        elif self.use_band2d:
            from swinvox_tpu.ops.band2d_merger import (
                band2d_conv,
                pack_wc,
                unpack_wc,
            )

            def layer(i, y5d):
                # y5d: [V, D, H, W, ci] -> conv -> BN -> leaky, same tree
                # as the direct path (dummy-trace trick, see use_fused)
                ci = _CHANNELS[i][0]
                convs[i](jnp.zeros((1, 3, 3, 3, ci), self.dtype))
                cp = convs[i].variables["params"]["Conv_0"]
                y = band2d_conv(
                    pack_wc(y5d), cp["kernel"], cp["bias"]
                )
                y = unpack_wc(y, _CHANNELS[i][1])
                y = norms[i](y, train)
                return nn.leaky_relu(y, self.leaky_value)

            y = x
            intermediates = []
            for i in range(4):
                y = layer(i, y)
                intermediates.append(y)
            y = layer(4, jnp.concatenate(intermediates, axis=-1))
            y = layer(5, y)
            weights = y[..., 0].reshape(b, n_views, 32, 32, 32)
        else:
            use_band = (
                self.use_pallas_train
                and train
                and (
                    self.pallas_interpret
                    or jax.default_backend() == "tpu"
                )
            )

            def conv(i, y):
                if not use_band:
                    return convs[i](y)
                # same dummy-trace trick as the fused branch: materialize
                # the identical param tree, then run the banded kernel
                from swinvox_tpu.ops.pallas_band_conv import band_conv3d

                ci = _CHANNELS[i][0]
                convs[i](jnp.zeros((1, 3, 3, 3, ci), self.dtype))
                cp = convs[i].variables["params"]["Conv_0"]
                out = band_conv3d(
                    y, cp["kernel"].astype(self.dtype),
                    interpret=self.pallas_interpret,
                )
                return out + cp["bias"].astype(out.dtype)

            intermediates = []
            y = x
            for i in range(4):
                y = conv(i, y)
                y = norms[i](y, train)
                y = nn.leaky_relu(y, self.leaky_value)
                intermediates.append(y)

            y = jnp.concatenate(intermediates, axis=-1)  # [BN, 32^3, 36]
            y = conv(4, y)
            y = norms[4](y, train)
            y = nn.leaky_relu(y, self.leaky_value)

            y = conv(5, y)
            y = norms[5](y, train)
            y = nn.leaky_relu(y, self.leaky_value)
            weights = y.reshape(b, n_views, 32, 32, 32)

        if identity:
            del weights  # kept only for its BatchNorm statistics
            return merged_1v
        weights = jax.nn.softmax(weights.astype(jnp.float32), axis=1)
        merged = jnp.sum(
            coarse_volumes.astype(jnp.float32) * weights, axis=1
        )
        return merged.astype(self.dtype)

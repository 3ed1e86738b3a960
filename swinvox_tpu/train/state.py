"""Train state: parameters, BN statistics, per-module optimizer states.

The parameter tree keeps the reference's four module groups
(encoder/decoder/merger/refiner) as top-level keys, so per-module
optimizers, gated stepping, and the 4-group checkpoint layout
(reference core/train.py:358-369) all map 1:1.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from swinvox_tpu.config import Config
from swinvox_tpu.models import SwinVoxModel
from swinvox_tpu.train.optim import MODULE_NAMES, build_optimizers


@struct.dataclass
class TrainState:
    params: Any
    batch_stats: Any
    opt_states: Dict[str, optax.OptState]
    step: jax.Array  # int32 scalar

    def n_params(self) -> Dict[str, int]:
        import numpy as np

        return {
            name: sum(
                int(np.prod(x.shape))
                for x in jax.tree.leaves(self.params[name])
            )
            for name in self.params
        }


def create_train_state(
    cfg: Config,
    rng: jax.Array,
    steps_per_epoch: int = 1,
    n_views: int | None = None,
    image_size: Tuple[int, int] | None = None,
    jit_init: bool | str = True,
) -> Tuple[SwinVoxModel, TrainState, Dict[str, optax.GradientTransformation]]:
    """Build the model, initialize variables, and set up the optimizers.

    Init always runs with merger+refiner enabled so the parameter tree is
    stable across the reference's epoch-gated enabling
    (core/train.py:243,252).

    jit_init=False runs init eagerly: on XLA:CPU the whole-model init
    compiles as ONE giant module (measured 5+ min on this host), while
    op-by-op eager dispatch finishes in seconds — use it for CPU dry runs
    and CI.  On a real TPU keep the jit (one cached compile beats
    thousands of tunnel round-trips).

    jit_init="shape" never executes the model at all: jax.eval_shape
    traces init and the variables are materialized host-side (small
    deterministic normals for params; mean=0/var=1 for BN statistics).
    The values are NOT a real initialization — use only where structure
    and finite numerics matter (dry runs, smoke tests): eager init
    measured 73 s of the multichip dryrun's budget on the 1-core CI
    host, shape init ~10 s.
    """
    from swinvox_tpu.models.layers import set_init_scheme

    set_init_scheme(cfg.NETWORK.INIT_SCHEME)
    model = SwinVoxModel.from_config(cfg)
    n_views = n_views or cfg.CONST.N_VIEWS_RENDERING
    h, w = image_size or (cfg.CONST.IMG_H, cfg.CONST.IMG_W)
    sample = jnp.zeros((1, n_views, h, w, 3), jnp.float32)

    params_rng, dropout_rng = jax.random.split(rng)

    def init_fn(k):
        return model.init(
            {"params": k, "dropout": dropout_rng},
            sample,
            train=False,
            enable_merger=True,
            enable_refiner=True,
        )

    if jit_init == "shape":
        import numpy as np

        shapes = jax.eval_shape(init_fn, params_rng)
        seed = [0]

        def fill_param(s):
            seed[0] += 1
            r = np.random.default_rng(seed[0])
            return jnp.asarray(
                (r.standard_normal(s.shape) * 0.05).astype(s.dtype)
            )

        def fill_stat(path, s):
            names = tuple(
                getattr(k, "key", getattr(k, "name", str(k))) for k in path
            )
            fill = np.ones if any("var" in n for n in names) else np.zeros
            return jnp.asarray(fill(s.shape, s.dtype))

        variables = {
            "params": jax.tree.map(fill_param, shapes["params"]),
            **(
                {
                    "batch_stats": jax.tree_util.tree_map_with_path(
                        fill_stat, shapes["batch_stats"]
                    )
                }
                if "batch_stats" in shapes
                else {}
            ),
        }
    else:
        variables = (jax.jit(init_fn) if jit_init else init_fn)(params_rng)

    optimizers = build_optimizers(cfg, steps_per_epoch)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})

    if cfg.NETWORK.PRETRAINED_BACKBONE:
        # Directory convention: resnet50.{pth,npz} / swin_tiny.{pth,npz}.
        # The reference downloads these pretrained backbones but then
        # re-initializes them (core/train.py:91-94); loading here is the
        # "as-intended" mode.
        import os

        from swinvox_tpu.models.pretrained import (
            apply_pretrained_backbone,
            load_state_dict_file,
        )

        root = cfg.NETWORK.PRETRAINED_BACKBONE
        def find(stem):
            for ext in (".npz", ".pth", ".pt"):
                p = os.path.join(root, stem + ext)
                if os.path.exists(p):
                    return load_state_dict_file(p)
            return None

        params, batch_stats = apply_pretrained_backbone(
            params, batch_stats,
            resnet_sd=find("resnet50"), swin_sd=find("swin_tiny"),
        )
        params = jax.tree.map(jnp.asarray, params)
        batch_stats = jax.tree.map(jnp.asarray, batch_stats)
    opt_states = {
        name: optimizers[name].init(params[name]) for name in MODULE_NAMES
    }
    state = TrainState(
        params=params,
        batch_stats=batch_stats,
        opt_states=opt_states,
        step=jnp.zeros((), jnp.int32),
    )
    return model, state, optimizers

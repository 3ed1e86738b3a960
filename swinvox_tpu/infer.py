"""High-level inference API: checkpoint -> voxel predictions.

The reference has no serving path (predictions only flow through its eval
loop); this is the convenience layer a production user needs:

    from swinvox_tpu.infer import Predictor

    p = Predictor.from_checkpoint("checkpoint-best.ckpt", cfg)
    vol = p.predict_files(["view0.png", "view1.png"])     # [32,32,32] probs
    p.export_binvox(vol, "out.binvox", threshold=0.4)

Batched, jitted, bf16 on TPU; images go through the reference's eval
transform (center crop -> background composite -> normalize).
"""

from __future__ import annotations

import logging
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from swinvox_tpu.config import Config, default_config
from swinvox_tpu.data import binvox
from swinvox_tpu.data.pipeline import load_image_bgr
from swinvox_tpu.data.transforms import eval_transform

log = logging.getLogger(__name__)


class Predictor:
    def __init__(self, model, variables, cfg: Config):
        self.model = model
        self.variables = variables
        self.cfg = cfg
        self._fn = jax.jit(
            lambda v, x: jax.nn.sigmoid(
                model.apply(v, x, train=False)["refined_volumes"].astype(
                    jnp.float32
                )
            )
        )

    @classmethod
    def from_checkpoint(
        cls, path: str, cfg: Optional[Config] = None
    ) -> "Predictor":
        from swinvox_tpu.train.checkpoint import load_checkpoint
        from swinvox_tpu.train.state import create_train_state
        from swinvox_tpu.utils.cache import enable_compilation_cache

        enable_compilation_cache()
        cfg = cfg or default_config()
        model, state, _ = create_train_state(cfg, jax.random.PRNGKey(0))
        state, _ = load_checkpoint(path, state, restore_optimizer=False)
        return cls(
            model,
            {"params": state.params, "batch_stats": state.batch_stats},
            cfg,
        )

    def predict(self, images: np.ndarray) -> np.ndarray:
        """images: [B, N, H, W, 3] normalized float32 -> [B, 32^3] probs."""
        return np.asarray(self._fn(self.variables, jnp.asarray(images)))

    def predict_files(
        self, image_paths: Sequence[str], bounding_box=None
    ) -> np.ndarray:
        """One object from its view image files -> [32, 32, 32] probs."""
        raw = np.stack([load_image_bgr(p) for p in image_paths])
        x = eval_transform(raw, self.cfg, bounding_box=bounding_box)
        return self.predict(x[None])[0]

    @staticmethod
    def export_binvox(
        probs: np.ndarray, path: str, threshold: float = 0.4
    ) -> None:
        vol = binvox.Voxels(
            probs >= threshold, list(probs.shape), [0.0, 0.0, 0.0], 1.0, "xyz"
        )
        with open(path, "wb") as f:
            binvox.write(vol, f)

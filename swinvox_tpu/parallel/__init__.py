"""Device mesh construction and sharding rules (replaces DataParallel)."""

from swinvox_tpu.parallel.distributed import maybe_initialize  # noqa: F401
from swinvox_tpu.parallel.mesh import (  # noqa: F401
    build_mesh,
    batch_sharding,
    replicated,
    select_devices,
    shard_batch,
    shard_batch_views,
    shard_params,
)

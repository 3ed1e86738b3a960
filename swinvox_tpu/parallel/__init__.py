"""Device mesh construction and sharding rules (replaces DataParallel)."""

from swinvox_tpu.parallel.distributed import (  # noqa: F401
    coordination_barrier,
    maybe_initialize,
    warm_collectives,
)
from swinvox_tpu.parallel.mesh import (  # noqa: F401
    build_mesh,
    batch_sharding,
    replicated,
    select_devices,
    shard_batch,
    shard_batch_views,
    shard_params,
)

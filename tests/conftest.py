"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding is validated without TPU hardware the idiomatic JAX way:
XLA_FLAGS=--xla_force_host_platform_device_count=8 gives eight independent
CPU "devices" that exercise real GSPMD partitioning and collectives.
"""

import os

# Must be set before jax initializes its backends.  The environment's
# sitecustomize pins JAX_PLATFORMS=axon (the TPU tunnel), so the env var
# alone is not enough — override the config programmatically too.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
# XLA:CPU ABORTS the process when a cross-device collective call looks
# stuck for ~35s (xla_cpu_collective_call_terminate_timeout_seconds).
# With 4 xdist workers oversubscribing one host CPU and interpret-mode
# Pallas inside sharded steps (minutes per step), per-device skew can
# blow well past that — seen as "Fatal Python error: Aborted" killing a
# worker mid-suite.  Raise both the warn and terminate deadlines — but keep
# terminate bounded (15 min, well above the observed skew) so a genuinely
# deadlocked collective still aborts with a diagnostic instead of hanging a
# pytest worker for an hour.
if "collective_call_terminate" not in flags:
    flags += (
        " --xla_cpu_collective_call_warn_stuck_timeout_seconds=600"
        " --xla_cpu_collective_call_terminate_timeout_seconds=900"
    )
os.environ["XLA_FLAGS"] = flags

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the big models compile in ~1min each on CPU;
# cache across pytest runs so only the first run pays.
from swinvox_tpu.utils.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)

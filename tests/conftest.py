"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding is validated here without TPU hardware, exactly as the
driver's `dryrun_multichip` does.  The axon TPU plugin ignores the
JAX_PLATFORMS env var, so the platform is forced via jax.config too.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the limb-arithmetic kernels are expensive to
# compile (big unrolled integer graphs); cache them across test runs.
# MLT_JAX_CACHE overrides the location (point it at an empty dir to measure
# a true cold run without sacrificing the committed warm cache).
_cache_dir = os.environ.get(
    "MLT_JAX_CACHE",
    os.path.join(os.path.dirname(os.path.dirname(__file__)), ".jax_cache"),
)
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

sys.path.insert(0, os.path.dirname(__file__))

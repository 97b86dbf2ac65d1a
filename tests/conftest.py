"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding is validated here without TPU hardware, exactly as the
driver's `dryrun_multichip` does.  Must run before the first `import jax`.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

"""Test configuration: force CPU with an 8-device virtual mesh.

Sharding/collective code paths are validated on a virtual CPU mesh
(multi-chip TPU hardware is exercised by the driver's dryrun_multichip).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

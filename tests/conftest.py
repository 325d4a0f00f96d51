"""Test configuration: force CPU.

Note: we deliberately do NOT set xla_force_host_platform_device_count here —
with 8 virtual devices the first MLIR lowering in the process takes ~2min
(vs ~25s with 1 device).  Sharding tests (tests/test_parallel.py) spawn
subprocesses with the flag set explicitly.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"

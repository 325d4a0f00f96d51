"""Test configuration: force CPU + persistent compilation cache.

Note: we deliberately do NOT set xla_force_host_platform_device_count here —
with 8 virtual devices the first MLIR lowering in the process takes ~2min
(vs ~25s with 1 device).  Sharding tests (tests/test_parallel.py) spawn
subprocesses with the flag set explicitly.

The persistent compilation cache (.jax_cache_cpu; bench/validate use .jax_cache) cuts
repeat test runs from ~26 min to a few minutes: most test shapes are stable
across runs, so recompiles become cache hits.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"

# tests get their OWN cache dir: CPU keys never match the device keys in
# .jax_cache, and concurrent reads while a tunnel process writes that dir
# have aborted the suite mid-read (zstd on a truncated entry)
_CACHE = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                      ".jax_cache_cpu")


def pytest_configure(config):
    import jax
    # The axon sitecustomize imports jax at interpreter startup (before this
    # conftest runs), so the env var above is captured too late when the
    # tunnel plugin is registered — mutate the live config instead.  Without
    # this, a wedged TPU tunnel hangs the whole suite at first dispatch.
    try:
        jax.config.update("jax_platforms", "cpu")
    except Exception:  # noqa: BLE001 - older jax: env var was enough
        pass
    jax.config.update("jax_compilation_cache_dir", _CACHE)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

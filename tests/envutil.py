"""Shared helper: a sanitized environment for CPU-only subprocess tests.

Strips every axon/tunnel variable so a wedged TPU tunnel can never hang a
"CPU-only" subprocess (the axon sitecustomize registers the remote plugin
whenever PALLAS_AXON_POOL_IPS is set, and remote-compile vars redirect
Mosaic compiles through the tunnel).
"""

import os


def cpu_subprocess_env(ndev: int | None = None) -> dict:
    env = dict(os.environ)
    for k in list(env):
        if k.startswith("PALLAS_AXON") or "REMOTE_COMPILE" in k:
            env.pop(k)
    env.pop("JTK_TPU_DISABLE_MESH", None)
    env["JAX_PLATFORMS"] = "cpu"
    if ndev is not None:
        env["XLA_FLAGS"] = env.get("XLA_FLAGS", "") + \
            f" --xla_force_host_platform_device_count={ndev}"
    return env

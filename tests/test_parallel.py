"""Sharding tests: run the multichip dry run on a virtual 8-device CPU mesh.

Spawned as a subprocess because xla_force_host_platform_device_count must be
set before jax initializes (and slows first-lowering in the main process).
"""

import os
import subprocess
import sys

import pytest

from envutil import cpu_subprocess_env


@pytest.mark.slow
def test_dryrun_multichip_8dev():
    """The full production dryrun (what the driver runs) — slow on 8 virtual
    CPU devices (first lowering is ~6x slower per device), so marked slow;
    the fast suite covers the entry compile + the sharded-engine tests."""
    env = cpu_subprocess_env(8)
    code = (
        "import __graft_entry__ as g; g.dryrun_multichip(8)"
    )
    res = subprocess.run([sys.executable, "-c", code], env=env,
                         cwd=os.path.dirname(os.path.dirname(__file__)),
                         capture_output=True, text=True, timeout=2400)
    assert res.returncode == 0, res.stderr[-3000:]
    assert "ok" in res.stdout


def test_entry_compiles():
    env = cpu_subprocess_env()
    code = (
        "import jax, __graft_entry__ as g\n"
        "fn, args = g.entry()\n"
        "out = jax.jit(fn)(*args)\n"
        "jax.block_until_ready(out)\n"
        "assert out.shape == (8,)\n"
        "print('entry ok')\n"
    )
    res = subprocess.run([sys.executable, "-c", code], env=env,
                         cwd=os.path.dirname(os.path.dirname(__file__)),
                         capture_output=True, text=True, timeout=2400)
    assert res.returncode == 0, res.stderr[-3000:]
    assert "entry ok" in res.stdout

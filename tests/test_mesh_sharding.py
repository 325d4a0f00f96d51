"""The sharded pileup engines must (a) actually partition the batch over the
``data`` mesh axis — not replicate it — and (b) return bit-identical results
to the unsharded engines (VERDICT r2 #3: 'a new test asserts the sharded
path is actually partitioned').

Subprocess-based: xla_force_host_platform_device_count must be set before
jax initializes.
"""

import os
import subprocess
import sys

_SCRIPT = r"""
import os
import numpy as np
import jax
assert len(jax.devices()) == 8, jax.devices()

from jtk_tpu.ops.banded_align import linear_offsets
from jtk_tpu.ops.modtable import (modification_table_pairs,
                                  modification_table_pairs_sharded,
                                  modification_table_pileup_pallas)
from jtk_tpu.ops.phmm import PHMMParams
from jtk_tpu.parallel import get_mesh, shard_leading

mesh = get_mesh()
assert mesh is not None and mesh.size == 8

rng = np.random.default_rng(0)
B, L, W, Tpad = 64, 120, 128, 256
params = PHMMParams.default()
tpl = rng.integers(0, 4, (B, L)).astype(np.int8)
tpl_mat = np.full((B, Tpad), 4, np.int8)
tpl_mat[:, :L] = tpl
qs = np.full((B, 256), 4, np.int8)
q_lens = np.zeros(B, np.int32)
for b in range(B):
    q = tpl[b, : L - rng.integers(0, 10)].copy()
    mut = rng.random(len(q)) < 0.1
    q[mut] = (q[mut] + 1) % 4
    qs[b, :len(q)] = q
    q_lens[b] = len(q)
offs = np.stack([linear_offsets(int(ql), L, 256, W) for ql in q_lens])
t_lens = np.full(B, L, np.int32)

# 1) the sharded inputs are genuinely split 8 ways, and the engine's output
#    inherits the partitioned sharding (GSPMD propagation, not replication)
arrs = shard_leading(mesh, qs, tpl_mat, offs, q_lens, t_lens)
for a in arrs:
    assert not a.sharding.is_fully_replicated, a.sharding
    shards = a.addressable_shards
    assert len(shards) == 8
    assert shards[0].data.shape[0] == B // 8, shards[0].data.shape
lk_dev, tab_dev = modification_table_pairs(*arrs, params, W, Tpad)
assert not lk_dev.sharding.is_fully_replicated, lk_dev.sharding
assert lk_dev.addressable_shards[0].data.shape[0] == B // 8

# 2) bit-identical to the unsharded engine
lk0, tab0 = modification_table_pairs(qs, tpl_mat, offs, q_lens, t_lens,
                                     params, W, Tpad)
np.testing.assert_array_equal(np.asarray(lk_dev), np.asarray(lk0))
np.testing.assert_array_equal(np.asarray(tab_dev), np.asarray(tab0))

# 3) the wrapper (pads + shards internally) agrees on a non-divisible batch
lk1, tab1 = modification_table_pairs_sharded(qs[:61], tpl_mat[:61],
                                             offs[:61], q_lens[:61],
                                             t_lens[:61], params, W, Tpad)
np.testing.assert_array_equal(lk1, np.asarray(lk0)[:61])

# 4) the Pallas fused engine takes the shard_map path on this mesh
#    (interpret mode on CPU) and matches the scan engine
import jtk_tpu.ops.modtable as mt
lk2, tab2 = modification_table_pileup_pallas(
    qs, tpl_mat, offs, q_lens, t_lens, params, W, Tpad, interpret=True)
assert mt._MESHES, "fused modtable never took the shard_map path"
np.testing.assert_allclose(lk2, np.asarray(lk0), rtol=5e-4, atol=5e-3)
print("sharding ok")
"""


def test_pileup_engines_partition_over_mesh():
    from envutil import cpu_subprocess_env
    env = cpu_subprocess_env(8)
    res = subprocess.run([sys.executable, "-c", _SCRIPT], env=env,
                         cwd=os.path.dirname(os.path.dirname(__file__)),
                         capture_output=True, text=True, timeout=2400)
    assert res.returncode == 0, res.stderr[-3000:]
    assert "sharding ok" in res.stdout


_MASK_SCRIPT = r"""
import numpy as np
import jax
assert len(jax.devices()) == 8
from jtk_tpu import seq as seqmod
from jtk_tpu.datamodel import DataSet, RawRead
from jtk_tpu.parallel import get_mesh
from jtk_tpu.stages.repeat_masking import mask_repeats
assert get_mesh() is not None

rng = np.random.default_rng(11)
rep = rng.integers(0, 4, 30).astype(np.int8)
reads = []
for i in range(6):
    parts = [rng.integers(0, 4, 200).astype(np.int8)]
    for _ in range(rng.integers(2, 5)):
        parts += [rep, rng.integers(0, 4, 100).astype(np.int8)]
    reads.append(seqmod.decode(np.concatenate(parts)).decode())

def build():
    return DataSet(read_type="ONT", raw_reads=[
        RawRead(name=f"r{i}", desc="", id=i, seq=s)
        for i, s in enumerate(reads)])

import os
ds_dev = build()
mask_repeats(ds_dev, k=8, freq=0.05, min_count=3)
os.environ["JTK_TPU_DISABLE_MESH"] = "1"
import jtk_tpu.parallel as par
par._MESH_CACHE.clear()
ds_host = build()
mask_repeats(ds_host, k=8, freq=0.05, min_count=3)
assert ds_dev.masked_kmers.thr == ds_host.masked_kmers.thr, (
    ds_dev.masked_kmers.thr, ds_host.masked_kmers.thr)
for a, b in zip(ds_dev.raw_reads, ds_host.raw_reads):
    assert a.seq == b.seq
assert any(c.islower() for r in ds_dev.raw_reads for c in r.seq)
print("mask ok")
"""


def test_sharded_repeat_masking_matches_host():
    """The psum-histogram repeat masking (SURVEY §5.8a) must reproduce the
    host np.unique path exactly: same threshold, same masked ranges."""
    from envutil import cpu_subprocess_env
    env = cpu_subprocess_env(8)
    res = subprocess.run([sys.executable, "-c", _MASK_SCRIPT], env=env,
                         cwd=os.path.dirname(os.path.dirname(__file__)),
                         capture_output=True, text=True, timeout=2400)
    assert res.returncode == 0, res.stderr[-3000:]
    assert "mask ok" in res.stdout

"""Microbench of the fused Pallas modtable slice (the clustering hot loop).

Times modification_table_pileup_pallas on one production-shaped slice
(192 pairs x ~2 kbp reads vs 2 kbp templates, W=128) with warm cache, so
changes to the kernels (e.g. JTK_TPU_SUB) can be A/B'd on the tunnel:

    python scripts/bench_modtable.py            # SUB=8 baseline
    JTK_TPU_SUB=16 python scripts/bench_modtable.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    from jtk_tpu.ops.banded_align import linear_offsets
    from jtk_tpu.ops.modtable import modification_table_pileup_pallas
    from jtk_tpu.ops.phmm import PHMMParams

    rng = np.random.default_rng(7)
    B, T, W, Tpad = 192, 2048, 128, 2176
    reps = int(os.environ.get("REPS", 5))
    tpl = rng.integers(0, 4, (B, Tpad)).astype(np.int8)
    t_lens = np.full(B, T, np.int32)
    q_lens = (T + rng.integers(-60, 60, B)).astype(np.int32)
    Qpad = ((int(q_lens.max()) + 255) // 256) * 256
    qs = np.full((B, Qpad), 4, np.int8)
    for b in range(B):
        qs[b, :q_lens[b]] = rng.integers(0, 4, q_lens[b])
    offs = np.stack([linear_offsets(int(ql), T, Qpad, W) for ql in q_lens])
    params = PHMMParams.default()
    strands = rng.random(B) < 0.5
    seg_ids = (np.arange(B) // 12).astype(np.int32)

    def run():
        lk, tot = modification_table_pileup_pallas(
            qs, tpl, offs, q_lens, t_lens, params, W, Tpad,
            strands=strands, params_rev=params,
            seg_ids=seg_ids, n_seg=16)
        jax.block_until_ready((lk, tot))
        return lk

    t0 = time.time()
    run()
    compile_s = time.time() - t0
    run()  # second warm call
    times = []
    for _ in range(reps):
        t0 = time.time()
        run()
        times.append(time.time() - t0)
    print(json.dumps({
        "sub": int(os.environ.get("JTK_TPU_SUB", 8)),
        "B": B, "Qpad": Qpad, "W": W, "Tpad": Tpad,
        "first_call_s": round(compile_s, 2),
        "warm_s": [round(t, 3) for t in times],
        "warm_min_s": round(min(times), 3),
    }))


if __name__ == "__main__":
    main()

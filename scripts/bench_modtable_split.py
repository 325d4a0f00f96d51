"""Split timing of the fused modtable slice: Pallas table kernels alone vs
the full fused dispatch (tables + closed-form assembly + reduction).

    BENCH_W=128 python scripts/bench_modtable_split.py
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
    from jtk_tpu.ops.pallas_phmm import _prep_tables_inputs, _tables_jit
    from jtk_tpu.ops.phmm import PHMMParams

    rng = np.random.default_rng(7)
    B = int(os.environ.get("BENCH_B", 192))
    T = int(os.environ.get("BENCH_T", 2048))
    W = int(os.environ.get("BENCH_W", 128))
    Tpad = T + 128
    reps = int(os.environ.get("REPS", 3))
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

    prep, B0, _Qp, Q, _Bp = _prep_tables_inputs(
        qs, tpl, offs, q_lens, t_lens, params, W,
        strands=strands, params_rev=params)

    def run_tables():
        out = _tables_jit(prep, W, Q, False)
        jax.block_until_ready(out[0])  # lk only; tables stay resident
        return out

    def run_fused():
        lk, tot = modification_table_pileup_pallas(
            qs, tpl, offs, q_lens, t_lens, params, W, Tpad,
            strands=strands, params_rev=params,
            seg_ids=seg_ids, n_seg=16)
        jax.block_until_ready((lk, tot))

    t0 = time.time(); run_tables(); t_tab_compile = time.time() - t0
    run_tables()
    tab_times = []
    for _ in range(reps):
        t0 = time.time(); run_tables(); tab_times.append(time.time() - t0)
    t0 = time.time(); run_fused(); t_fused_compile = time.time() - t0
    run_fused()
    fus_times = []
    for _ in range(reps):
        t0 = time.time(); run_fused(); fus_times.append(time.time() - t0)
    print(json.dumps({
        "B": B, "W": W, "Q": Q, "Tpad": Tpad,
        "sub": int(os.environ.get("JTK_TPU_SUB", 8)),
        "tables_s": round(min(tab_times), 3),
        "fused_s": round(min(fus_times), 3),
        "assembly_s": round(min(fus_times) - min(tab_times), 3),
        "compile_tables_s": round(t_tab_compile, 1),
        "compile_fused_s": round(t_fused_compile, 1),
    }))


if __name__ == "__main__":
    main()

"""K3 — banded edit-distance alignment with traceback (device kernel).

Replaces the reference's edlib FFI (Global/Infix modes; used by encode,
deletion_fill, consensus, polish_chunks — SURVEY.md §2.4) and kiley's
``bialignment::guided`` banded alignment.

TPU-native design (not a translation):
  * Row-wavefront DP over the query; the band (width ``W``, a multiple of 128)
    is a vector register lane dimension on the VPU.
  * The within-row horizontal dependency (ref-gap chain) is solved with a
    min-plus *prefix scan* (``lax.associative_scan``) instead of a sequential
    inner loop, so each row is O(log W) depth.
  * Traceback: the device emits 2-bit packed pointers; the host decodes them
    batch-vectorized (one numpy step per op, all alignments in parallel).
  * Everything is static-shape; variable lengths are carried as traced scalars
    and masked, so one compilation serves a whole batch bucket.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

INF = jnp.int32(2 ** 30)
DIAG, UP, LEFT = np.uint8(0), np.uint8(1), np.uint8(2)


def linear_offsets(q_len: int, t_len: int, Q: int, W: int) -> np.ndarray:
    """Band start per query row for a global alignment: the band follows the
    straight line from (0,0) to (q_len, t_len)."""
    i = np.arange(Q + 1, dtype=np.float64)
    center = np.round(i * (t_len / max(q_len, 1))).astype(np.int64)
    hi = max(t_len - W + 1, 0)
    off = np.clip(center - W // 2, 0, hi)
    off[q_len:] = off[q_len]
    return off.astype(np.int32)


def diagonal_offsets(q_len: int, diag: int, t_len: int, Q: int, W: int) -> np.ndarray:
    """Band start per row for an infix alignment around ref diagonal ``diag``
    (ref position where query position 0 lands)."""
    i = np.arange(Q + 1, dtype=np.int64)
    hi = max(t_len - W + 1, 0)
    off = np.clip(diag + i - W // 2, 0, hi)
    off[q_len:] = off[q_len]
    return off.astype(np.int32)


@functools.partial(jax.jit, static_argnames=("W", "mode"))
def _banded_edit(q, r, offsets, q_len, t_len, W: int, mode: str):
    """Single-pair banded edit DP.

    q: (Q,) int8; r: (T,) int8; offsets: (Q+1,) int32; q_len, t_len: scalars.
    Returns (score, end_j, ptrs (Q+1, W) uint8, last_row (W,) int32).
    """
    Q = q.shape[0]
    ks = jnp.arange(W, dtype=jnp.int32)

    # row 0
    j0 = offsets[0] + ks
    if mode == "global":
        row0 = jnp.where(j0 <= t_len, j0, INF)
    else:  # infix: free ref prefix
        row0 = jnp.where(j0 <= t_len, 0, INF)

    def step(prev, inp):
        qc, off_prev, off_cur, i = inp
        s = off_cur - off_prev
        idx_up = ks + s
        idx_diag = ks + s - 1
        up_ok = (idx_up >= 0) & (idx_up < W)
        dg_ok = (idx_diag >= 0) & (idx_diag < W)
        up = jnp.where(up_ok, prev[jnp.clip(idx_up, 0, W - 1)], INF) + 1
        ref_idx = off_cur + ks - 1  # j-1 for cell k
        rc = r[jnp.clip(ref_idx, 0, r.shape[0] - 1)]
        sub = jnp.where(rc == qc, 0, 1).astype(jnp.int32)
        dg_ok = dg_ok & (ref_idx >= 0) & (ref_idx < t_len)
        diag = jnp.where(dg_ok, prev[jnp.clip(idx_diag, 0, W - 1)], INF) + sub
        cand = jnp.minimum(diag, up)
        j = off_cur + ks
        cand = jnp.where(j <= t_len, cand, INF)
        # min-plus prefix scan: e[k] = min_{k'<=k} cand[k'] + (k - k')
        m = jax.lax.associative_scan(jnp.minimum, cand - ks)
        e = jnp.minimum(cand, m + ks)
        e = jnp.where(j <= t_len, jnp.minimum(e, INF), INF)
        ptr = jnp.where(e == diag, DIAG, jnp.where(e == up, UP, LEFT)).astype(jnp.uint8)
        # rows past q_len: freeze (propagate prev) so last-row gather is easy
        live = i <= q_len
        e = jnp.where(live, e, prev)
        return e, (e, ptr)

    ii = jnp.arange(1, Q + 1, dtype=jnp.int32)
    inputs = (q, offsets[:-1], offsets[1:], ii)
    last, (rows, ptrs) = jax.lax.scan(step, row0, inputs)
    ptrs = jnp.concatenate([jnp.zeros((1, W), jnp.uint8), ptrs], axis=0)

    if mode == "global":
        k_end = t_len - offsets[q_len]
        score = last[jnp.clip(k_end, 0, W - 1)]
        end_j = t_len
    else:
        k_end = jnp.argmin(last)
        score = last[k_end]
        end_j = offsets[q_len] + k_end
    return score, end_j, ptrs, last


_banded_edit_batch = jax.jit(
    jax.vmap(_banded_edit, in_axes=(0, 0, 0, 0, 0, None, None)),
    static_argnames=("W", "mode"),
)


def banded_align_batch(qs, rs, offsets, q_lens, t_lens, W: int, mode: str = "global"):
    """Batched banded alignment. All args numpy; returns numpy.

    qs (B, Q) int8, rs (B, T) int8, offsets (B, Q+1) int32.
    Returns dict with scores (B,), end_j (B,), ptrs (B, Q+1, W).
    """
    score, end_j, ptrs, _ = _banded_edit_batch(
        jnp.asarray(qs), jnp.asarray(rs), jnp.asarray(offsets),
        jnp.asarray(q_lens, jnp.int32), jnp.asarray(t_lens, jnp.int32), W, mode)
    return {
        "score": np.asarray(score),
        "end_j": np.asarray(end_j),
        "ptrs": np.asarray(ptrs),
    }


def traceback_batch(ptrs, offsets, q_lens, end_js, mode: str = "global"):
    """Decode packed pointers into op strings, vectorized across the batch.

    Returns a list of op lists (chars 'M'/'I'/'D', query-leading order) and the
    ref start position for each alignment.
    """
    ptrs = np.asarray(ptrs)
    offsets = np.asarray(offsets)
    B, Qp1, W = ptrs.shape
    i = np.asarray(q_lens, np.int64).copy()
    j = np.asarray(end_js, np.int64).copy()
    if mode == "global":
        active = (i > 0) | (j > 0)
    else:
        active = i > 0
    max_steps = int(Qp1 + offsets.max() + W + 2)
    out = np.zeros((B, max_steps), dtype=np.uint8)  # 0=none, 1=M, 2=I, 3=D
    step = 0
    bidx = np.arange(B)
    while active.any() and step < max_steps:
        k = j - offsets[bidx, np.clip(i, 0, Qp1 - 1)]
        k = np.clip(k, 0, W - 1)
        p = ptrs[bidx, np.clip(i, 0, Qp1 - 1), k]
        # boundary rules: i==0 -> only D (global) / stop (infix); j==0 -> only I
        at_top = i == 0
        at_left = j == 0
        opcode = np.where(p == DIAG, 1, np.where(p == UP, 2, 3)).astype(np.uint8)
        opcode = np.where(at_top, 3, opcode)           # row 0: eat ref
        opcode = np.where(at_left & ~at_top, 2, opcode)  # col 0: eat query
        if mode != "global":
            active_now = active & ~at_top
        else:
            active_now = active
        opcode = np.where(active_now, opcode, 0)
        out[bidx, step] = opcode
        di = np.where((opcode == 1) | (opcode == 2), 1, 0)
        dj = np.where((opcode == 1) | (opcode == 3), 1, 0)
        i = i - di
        j = j - dj
        if mode == "global":
            active = (i > 0) | (j > 0)
        else:
            active = i > 0
        step += 1
    kinds = np.array([" ", "M", "I", "D"])
    ops_list = []
    for b in range(B):
        codes = out[b, :step][out[b, :step] != 0][::-1]
        ops_list.append([kinds[c] for c in codes])
    ref_starts = j
    return ops_list, ref_starts


def ops_rle(ops):
    """Run-length encode a flat op list into CIGAR tuples."""
    out = []
    for k in ops:
        if out and out[-1][0] == k:
            out[-1] = (k, out[-1][1] + 1)
        else:
            out.append((k, 1))
    return out


def edit_align(q: np.ndarray, r: np.ndarray, W: int = 128, mode: str = "global",
               diag: int | None = None):
    """Convenience single-pair API: returns (score, cigar, ref_start, ref_end)."""
    Q, T = len(q), len(r)
    if mode == "global":
        off = linear_offsets(Q, T, Q, W)
    else:
        off = diagonal_offsets(Q, diag if diag is not None else 0, T, Q, W)
    res = banded_align_batch(q[None].astype(np.int8), r[None].astype(np.int8),
                             off[None], np.array([Q]), np.array([T]), W, mode)
    ops, ref_starts = traceback_batch(res["ptrs"], off[None], np.array([Q]),
                                      res["end_j"], mode)
    return int(res["score"][0]), ops_rle(ops[0]), int(ref_starts[0]), int(res["end_j"][0])

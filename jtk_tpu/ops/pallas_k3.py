"""K3 Pallas kernel — banded edit-distance DP with packed traceback.

The production encode verifier (`banded_align._extend_hostwin`) runs the DP
as an XLA scan: 2048 sequential steps whose per-step tensors are too small to
hide loop overhead, and whose traceback stores ptr uint8 + run uint16 streams
(3 bytes/cell).  This kernel keeps the whole wavefront in VMEM (SUB pairs x W
lanes), solves the within-row ref-gap chain with a min-plus doubling scan,
and streams ONE packed int16 per cell (2-bit pointer | left-run-length << 2)
— same information, 2/3 the HBM traffic, no per-step XLA overhead.

Same band conventions as ops.banded_align._banded_edit (offsets with unit
increments; rc[k] = r[j-1] for j = off_i + k; rows beyond q_len frozen).
Row-0 initialization and final score selection stay OUTSIDE the kernel, so
one kernel serves both global and infix modes.

Reference parity: replaces edlib Infix/Global (SURVEY §2.4 K3 row).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .pallas_phmm import SUB, _roll_left1, _roll_right1, _rollr

INF = np.int32(2 ** 30)
BLK = 128


def _edit_dp_kernel(e0_ref, qs_ref, shifts_ref, inc_ref, rc0_ref, j0_ref,
                    qlen_ref, tlen_ref, out_pl, last_ref, blk, sems):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    g = pl.program_id(0)
    W = rc0_ref.shape[1]
    Q = qs_ref.shape[1]
    qlen = qlen_ref[:, 0]                       # (SUB,)
    tlen = tlen_ref[:, 0]
    lane128 = jax.lax.broadcasted_iota(jnp.int32, (SUB, 128), 1)
    laneW = jax.lax.broadcasted_iota(jnp.int32, (SUB, W), 1)

    e = e0_ref[:]                               # (SUB, W) int32
    j = j0_ref[:]                               # (SUB, W) int32 (j = off+k)
    rc = rc0_ref[:]                             # (SUB, W) int32 chars r[j-1]

    def outer(tblk, carry):
        e, j, rc = carry
        col = pl.multiple_of(tblk * BLK, BLK)
        qt = qs_ref[:, pl.ds(col, BLK)]
        st = shifts_ref[:, pl.ds(col, BLK)]
        it = inc_ref[:, pl.ds(col, BLK)]

        def body(r, carry):
            e, j, rc = carry
            i = tblk * BLK + r + 1
            sel = lane128 == r
            qc = jnp.sum(jnp.where(sel, qt, 0), axis=1)          # (SUB,)
            sv = jnp.sum(jnp.where(sel, st, 0), axis=1)
            newc = jnp.sum(jnp.where(sel, it, 0), axis=1)
            one = (sv == 1)[:, None]
            shifted = jnp.where(one, _roll_left1(e, INF), e)     # E[i-1][j]
            up = shifted + 1
            diag_v = jnp.where(one, e, _roll_right1(e, INF))     # E[i-1][j-1]
            rc_shift = _roll_left1(rc, 4)
            rc_shift = jnp.where(laneW == W - 1, newc[:, None], rc_shift)
            rc_n = jnp.where(one, rc_shift, rc)
            j_n = j + sv[:, None]
            sub = jnp.where(rc_n == qc[:, None], 0, 1)
            ok = j_n <= tlen[:, None]
            diag = jnp.where(ok & (j_n >= 1), diag_v + sub, INF)
            up = jnp.where(ok, up, INF)
            cand = jnp.minimum(diag, up)
            # min-plus prefix: e[k] = min_{k'<=k} cand[k'] + (k - k')
            y = cand - laneW
            shift = 1
            while shift < W:
                y = jnp.minimum(y, _rollr(y, shift, INF))
                shift *= 2
            er = jnp.minimum(cand, y + laneW)
            er = jnp.where(ok, er, INF)
            ptr = jnp.where(er == diag, 0, jnp.where(er == up, 1, 2))
            # left-run lengths: L[k] = isleft[k] * (L[k-1] + 1) — varying-a
            # linear recurrence by doubling (floats exact for runs < 2^24)
            isl = (ptr == 2).astype(jnp.float32)
            L = isl
            A = isl
            shift = 1
            while shift < W:
                L = L + A * _rollr(L, shift, 0.0)
                A = A * _rollr(A, shift, 0.0)
                shift *= 2
            packed = (ptr | (L.astype(jnp.int32) << 2)).astype(jnp.int16)
            live = (i <= qlen)[:, None]
            e_n = jnp.where(live, er, e)
            j_keep = jnp.where(live, j_n, j)
            rc_keep = jnp.where(live, rc_n, rc)
            # dynamic row index goes on the UNTILED leading dim of the
            # scratch (Mosaic rejects dynamic stores on tiled dims unless
            # provably 8-aligned — BENCH_r03 failure)
            blk[r] = packed
            return e_n, j_keep, rc_keep

        e, j, rc = jax.lax.fori_loop(0, BLK, body, (e, j, rc))
        cp = pltpu.make_async_copy(
            blk, out_pl.at[pl.ds(tblk * BLK, BLK), pl.ds(g * SUB, SUB), :],
            sems.at[0])
        cp.start()
        cp.wait()
        return e, j, rc

    e, j, rc = jax.lax.fori_loop(0, Q // BLK, outer, (e, j, rc))
    last_ref[:] = e


@functools.partial(jax.jit, static_argnames=("W", "Q", "interpret"))
def _pallas_edit(e0, qs, shifts, inc, rc0, j0, qlp, tlp,
                 W: int, Q: int, interpret: bool):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B = qs.shape[0]

    def row_spec(ncols):
        return pl.BlockSpec((SUB, ncols), lambda g: (g, 0),
                            memory_space=pltpu.VMEM)

    hbm = getattr(pltpu, "HBM", pl.ANY)
    any_spec = pl.BlockSpec(memory_space=hbm)
    packed, last = pl.pallas_call(
        _edit_dp_kernel,
        grid=(B // SUB,),
        in_specs=[row_spec(W), row_spec(Q), row_spec(Q), row_spec(Q),
                  row_spec(W), row_spec(W), row_spec(1), row_spec(1)],
        out_specs=[any_spec, row_spec(W)],
        out_shape=[jax.ShapeDtypeStruct((Q, B, W), jnp.int16),
                   jax.ShapeDtypeStruct((B, W), jnp.int32)],
        scratch_shapes=[pltpu.VMEM((BLK, SUB, W), jnp.int16),
                        pltpu.SemaphoreType.DMA((1,))],
        interpret=interpret,
    )(e0, qs, shifts, inc, rc0, j0, qlp, tlp)
    return packed, last


def _traceback_packed(packed, offsets, q_len, end_j, W: int):
    """Batched traceback over the packed int16 stream in kernel layout.

    packed is (Q, B, W): packed[i-1, b, k] holds pair b row i's
    (ptr | left-run << 2).  One scan of Q steps walks all B pairs at once
    (carries are (B,) vectors).  Mirrors banded_align._traceback_on_device.
    Returns (dels (B,Q) uint16, ops (B,Q) uint8, start_j (B,))."""
    Q, B, _ = packed.shape
    # 2D layout (Q, B*W): per-row linear index stays < B*W, so no int32
    # overflow even when Q*B*W exceeds 2^31 (production 4096x2048x256 did)
    flat = packed.reshape(Q, B * W)
    boff = np.arange(B, dtype=np.int32) * W

    def step(carry, t):
        i, j = carry                                        # (B,), (B,)
        live = i > 0
        off_i = jnp.take_along_axis(
            offsets, jnp.clip(i, 0, Q)[:, None], axis=1)[:, 0]
        k = jnp.clip(j - off_i, 0, W - 1)
        row = jnp.clip(i - 1, 0, Q - 1)
        v = flat[row, boff + k].astype(jnp.int32)
        l = v >> 2
        k2 = jnp.clip(k - l, 0, W - 1)
        v2 = flat[row, boff + k2].astype(jnp.int32)
        p = v2 & 3
        is_diag = p == 0
        op = jnp.where(is_diag, 1, 2).astype(jnp.uint8)
        dj = jnp.where(is_diag, 1, 0)
        i_n = jnp.where(live, i - 1, i)
        j_n = jnp.where(live, j - l - dj, j)
        out_l = jnp.where(live, l, 0).astype(jnp.uint16)
        out_op = jnp.where(live, op, 0).astype(jnp.uint8)
        return (i_n, j_n), (out_l, out_op)

    (_, j_f), (dels, ops) = jax.lax.scan(
        step, (q_len.astype(jnp.int32), end_j.astype(jnp.int32)),
        np.arange(Q, dtype=np.int32))
    return dels.T, ops.T, j_f


@functools.partial(jax.jit,
                   static_argnames=("W", "Qpad", "Tpad", "margin",
                                    "interpret"))
def pallas_extend_hostwin(chunks_blob, chunk_lens, cand_chunk, rs_packed,
                          wstart, astart, t_lens, W: int, Qpad: int,
                          Tpad: int, margin: int, interpret: bool):
    """Drop-in Pallas engine for banded_align._extend_hostwin: same inputs,
    same (meta, ops_packed, delpack) outputs (infix mode; chunk as query
    inside the read window)."""
    from .banded_align import DEL_TOPK, _unpack2bit
    rs = _unpack2bit(rs_packed, Tpad)
    rs = jnp.where(np.arange(Tpad) < t_lens[:, None], rs, 4)
    B = cand_chunk.shape[0]
    Q = Qpad
    q = chunks_blob[cand_chunk].astype(jnp.int32)            # (B, Q)
    q_lens = chunk_lens[cand_chunk]
    diag0 = wstart + margin - astart
    ii = np.arange(Qpad + 1, dtype=np.int32)
    hi = jnp.maximum(t_lens - W + 1, 0)[:, None]
    off = jnp.clip(diag0[:, None] + ii[None, :] - W // 2, 0, hi)
    off_q = jnp.clip(diag0 + q_lens - W // 2, 0, hi[:, 0])
    off = jnp.where(ii[None, :] <= q_lens[:, None], off,
                    off_q[:, None]).astype(jnp.int32)        # (B, Q+1)
    shifts = off[:, 1:] - off[:, :-1]
    # r_pad = [sentinel 4, window, 4-pad]: rc[k] = r_pad[off + k]
    pad_tail = jnp.full((B, W + 1), 4, jnp.int8)
    r_pad = jnp.concatenate(
        [jnp.full((B, 1), 4, jnp.int8), rs.astype(jnp.int8), pad_tail],
        axis=1).astype(jnp.int32)
    ksW = np.arange(W, dtype=np.int32)
    rc0 = jnp.take_along_axis(r_pad, off[:, :1] + ksW[None, :], axis=1)
    j0 = off[:, :1] + ksW[None, :]
    # char entering the band (k = W-1) at row i: r[off_i + W - 2]
    inc = jnp.take_along_axis(
        r_pad, jnp.clip(off[:, 1:] + W - 1, 0, r_pad.shape[1] - 1), axis=1)
    # infix row 0: free ref prefix
    e0 = jnp.where(j0 <= t_lens[:, None], 0, INF).astype(jnp.int32)
    qlp = q_lens.astype(jnp.int32)[:, None]
    tlp = t_lens.astype(jnp.int32)[:, None]
    # slice the pair dim so the (Q, Bs, W) traceback stream stays well under
    # 2^31 elements (int32 index arithmetic) and bounded in HBM; all slices
    # run inside this one jit = one dispatch.  Each slice's stream dies with
    # its traceback, so peak HBM is ~one slice.
    import os
    maxb = max(SUB, min(2048, (1 << 30) // (Q * W) // SUB * SUB))
    maxb = int(os.environ.get("JTK_TPU_K3_MAXB", maxb))  # test knob
    score_l, end_l, dels_l, ops_l, start_l = [], [], [], [], []
    for s in range(0, B, maxb):
        e = min(B, s + maxb)
        sl = slice(s, e)
        packed, last = _pallas_edit(e0[sl], q[sl], shifts[sl], inc[sl],
                                    rc0[sl], j0[sl], qlp[sl], tlp[sl],
                                    W, Q, interpret)
        # infix score: min over the final row
        k_end = jnp.argmin(last, axis=1).astype(jnp.int32)
        bidx = np.arange(e - s)
        score_l.append(last[bidx, k_end])
        off_at_qlen = jnp.take_along_axis(off[sl], q_lens[sl, None],
                                          axis=1)[:, 0]
        end_sl = off_at_qlen + k_end
        end_l.append(end_sl)
        d, o, st = _traceback_packed(packed, off[sl], q_lens[sl], end_sl, W)
        dels_l.append(d)
        ops_l.append(o)
        start_l.append(st)
    score = jnp.concatenate(score_l)
    end_j = jnp.concatenate(end_l)
    dels = jnp.concatenate(dels_l)
    ops = jnp.concatenate(ops_l)
    start_j = jnp.concatenate(start_l)
    # pack results exactly like _extend_hostwin
    Qp = (Q + 7) // 8 * 8
    bits = jnp.pad((ops == 2).astype(jnp.uint8), ((0, 0), (0, Qp - Q)))
    bits = bits.reshape(B, Qp // 8, 8)
    weights = np.array([1, 2, 4, 8, 16, 32, 64, 128], np.uint8)
    ops_packed = jnp.sum(bits * weights, axis=-1).astype(jnp.uint8)
    k = min(DEL_TOPK, Q)
    dv, di = jax.lax.top_k(dels.astype(jnp.int32), k)
    n_runs = jnp.sum((dels > 0).astype(jnp.int32), axis=1)
    valid = t_lens >= chunk_lens[cand_chunk] // 2
    meta = jnp.stack([score.astype(jnp.int32), end_j.astype(jnp.int32),
                      start_j.astype(jnp.int32), n_runs,
                      valid.astype(jnp.int32), astart.astype(jnp.int32)],
                     axis=1)
    delpack = jnp.concatenate([dv.astype(jnp.uint16),
                               di.astype(jnp.uint16)], axis=1)
    return meta, ops_packed, delpack

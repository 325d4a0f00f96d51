"""Pallas TPU kernel: fused banded pair-HMM forward likelihood.

The speed-of-light path for K1 (SURVEY.md §7.3): the whole wavefront lives in
VMEM, one fori_loop over query rows, no HBM traffic per row and no gathers —
  * band realignment for unit-step offsets is a lane roll selected per pair;
  * the ref-character stream entering the band each row is precomputed on the
    host (``inc``), so the kernel never indexes the reference;
  * emissions are 5-way select-sums against the tiny emission tables;
  * the in-row Del-state linear recurrence D[k] = c[k] + tdd*D[k-1] is solved
    with a Hillis-Steele doubling scan in registers.

Each program processes SUB (=8) pairs so every vector op is a full
(8, 128·n) VPU tile.  Returns per-read log-likelihoods.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .phmm import PHMMParams

import os as _os

# pairs per program (sublane dimension of the in-VMEM wavefront state).
# 8 = one (8,128) VREG per vector op; larger values amortize the per-row
# loop/extract overhead over more pairs at the cost of register pressure
# (tunable for experiments; every batch size used must stay a multiple)
SUB = int(_os.environ.get("JTK_TPU_SUB", 8))
# inner row-loop unroll factor (amortizes Mosaic loop bookkeeping)
UNROLL = int(_os.environ.get("JTK_TPU_UNROLL", 1))


def _rollr(x, n, fill):
    return jnp.concatenate(
        [jnp.full_like(x[:, :n], fill), x[:, :-n]], axis=1)


def _rolll(x, n, fill):
    return jnp.concatenate(
        [x[:, n:], jnp.full_like(x[:, :n], fill)], axis=1)


def _roll_left1(x, fill):
    return jnp.concatenate([x[:, 1:], jnp.full_like(x[:, :1], fill)], axis=1)


def _roll_right1(x, fill):
    return jnp.concatenate([jnp.full_like(x[:, :1], fill), x[:, :-1]], axis=1)


def _phmm_fwd_kernel(qs_ref, shifts_ref, inc_ref, rc0_ref, j0_ref, qlen_ref,
                     tlen_ref, trans_ref, me_ref, ie_ref, out_ref):
    import jax.experimental.pallas as pl

    W = rc0_ref.shape[1]
    Q = qs_ref.shape[1]
    t = trans_ref[:]
    tmm, tmi, tmd = t[0, 0], t[0, 1], t[0, 2]
    tim, tii, tid = t[1, 0], t[1, 1], t[1, 2]
    tdm, tdi, tdd = t[2, 0], t[2, 1], t[2, 2]
    me = me_ref[:]          # (8, 8) padded [ref, query] probs
    ie = ie_ref[:]
    qlen = qlen_ref[:, 0]   # (SUB,)
    tlenf = tlen_ref[:, 0].astype(jnp.float32)

    def linrec(c, a):
        # y[k] = c[k] + a*y[k-1]  (Hillis-Steele doubling)
        y = c
        apow = jnp.full_like(c, a)
        shift = 1
        while shift < W:
            y = y + apow * _rollr(y, shift, 0.0)
            apow = apow * _rollr(apow, shift, 0.0)
            shift *= 2
        return y

    def emis_row(rc, col):
        # em[s, k] = col[s, rc[s, k]] for rc codes 0..4 (4 = pad, prob 0)
        em = jnp.zeros(rc.shape, jnp.float32)
        for b in range(4):
            em = em + jnp.where(rc == b, 1.0, 0.0) * col[:, b][:, None]
        return em

    # row 0
    j = j0_ref[:].astype(jnp.float32)           # (SUB, W) ref position j
    M = jnp.where(j == 0, 1.0, 0.0)
    I = jnp.zeros_like(M)
    D = linrec(tmd * _roll_right1(M, 0.0), tdd)
    D = jnp.where((j >= 1) & (j <= tlenf[:, None]), D, 0.0)
    s0 = jnp.sum(M + I + D, axis=1, keepdims=True) + 1e-30
    M, I, D = M / s0, I / s0, D / s0
    logs = jnp.log(s0[:, 0])
    rc = rc0_ref[:].astype(jnp.int32)           # (SUB, W) ref chars
    lane128 = jax.lax.broadcasted_iota(jnp.int32, (SUB, 128), 1)
    laneW = jax.lax.broadcasted_iota(jnp.int32, (SUB, W), 1)
    qprev0 = jnp.full((SUB,), 4, jnp.int32)

    def outer(tblk, carry):
        # lane-aligned tile loads; per-row scalars come from masked reduces
        col = pl.multiple_of(tblk * 128, 128)
        qt = qs_ref[:, pl.ds(col, 128)]
        st = shifts_ref[:, pl.ds(col, 128)]
        it = inc_ref[:, pl.ds(col, 128)]

        def body(r, carry):
            M, I, D, logs, j, rc, qprev = carry
            i = tblk * 128 + r + 1
            sel = lane128 == r
            qc = jnp.sum(jnp.where(sel, qt, 0), axis=1)         # (SUB,)
            sv = jnp.sum(jnp.where(sel, st, 0), axis=1)
            newc = jnp.sum(jnp.where(sel, it, 0), axis=1)
            s = sv.astype(jnp.float32)[:, None]                 # (SUB,1)
            one = s == 1.0
            Md = jnp.where(one, M, _roll_right1(M, 0.0))
            Id = jnp.where(one, I, _roll_right1(I, 0.0))
            Dd = jnp.where(one, D, _roll_right1(D, 0.0))
            Mu = jnp.where(one, _roll_left1(M, 0.0), M)
            Iu = jnp.where(one, _roll_left1(I, 0.0), I)
            Du = jnp.where(one, _roll_left1(D, 0.0), D)
            rc_shift = _roll_left1(rc, 0)
            rc_shift = jnp.where(laneW == W - 1, newc[:, None], rc_shift)
            rc = jnp.where(one, rc_shift, rc)
            j = j + s
            # emission tables gathered per pair: me[:, qc], ie[qprev, qc]
            me_col = jnp.zeros((SUB, 4), jnp.float32)
            ei = jnp.zeros((SUB,), jnp.float32)
            for b in range(4):
                hit = (qc == b).astype(jnp.float32)
                me_col = me_col + hit[:, None] * me[:4, b][None, :]
                for p in range(5):
                    ei = ei + hit * jnp.where(qprev == p, 1.0, 0.0) * ie[p, b]
            em = emis_row(rc, me_col)
            ok = (j >= 1) & (j <= tlenf[:, None])
            em = jnp.where(ok, em, 0.0)
            Mrow = em * (tmm * Md + tim * Id + tdm * Dd)
            Irow = ei[:, None] * (tmi * Mu + tii * Iu + tdi * Du)
            Irow = jnp.where(j <= tlenf[:, None], Irow, 0.0)
            c = tmd * _roll_right1(Mrow, 0.0) + tid * _roll_right1(Irow, 0.0)
            Drow = linrec(c, tdd)
            Drow = jnp.where(ok, Drow, 0.0)
            sc = jnp.sum(Mrow + Irow + Drow, axis=1, keepdims=True) + 1e-30
            Mrow, Irow, Drow = Mrow / sc, Irow / sc, Drow / sc
            live = (i <= qlen)[:, None]
            Mn = jnp.where(live, Mrow, M)
            In = jnp.where(live, Irow, I)
            Dn = jnp.where(live, Drow, D)
            logs = logs + jnp.where(live[:, 0], jnp.log(sc[:, 0]), 0.0)
            jn = jnp.where(live, j, j - s)
            return Mn, In, Dn, logs, jn, rc, qc

        return jax.lax.fori_loop(0, 128, body, carry, unroll=UNROLL)

    M, I, D, logs, j, rc, _ = jax.lax.fori_loop(
        0, Q // 128, outer, (M, I, D, logs, j, rc, qprev0))
    fin = jnp.sum(jnp.where(j == tlenf[:, None], M + I + D, 0.0), axis=1)
    lk = jnp.log(fin + 1e-30) + logs            # (SUB,)
    out_ref[:] = jnp.broadcast_to(lk[:, None], out_ref.shape)


@functools.partial(jax.jit, static_argnames=("W", "interpret"))
def _pallas_fwd(qs, shifts, inc, rc0, j0, q_lens, t_lens, trans, me, ie,
                W: int, interpret: bool):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, Q = qs.shape

    def row_spec(ncols):
        return pl.BlockSpec((SUB, ncols), lambda g: (g, 0),
                            memory_space=pltpu.VMEM)

    def rep_spec(shape):
        return pl.BlockSpec(shape, lambda g: tuple(0 for _ in shape),
                            memory_space=pltpu.VMEM)

    return pl.pallas_call(
        _phmm_fwd_kernel,
        grid=(B // SUB,),
        in_specs=[
            row_spec(Q), row_spec(Q), row_spec(Q), row_spec(W), row_spec(W),
            row_spec(1), row_spec(1),
            rep_spec((8, 8)), rep_spec((8, 8)), rep_spec((8, 8)),
        ],
        out_specs=row_spec(128),
        out_shape=jax.ShapeDtypeStruct((B, 128), jnp.float32),
        interpret=interpret,
    )(qs, shifts, inc, rc0, j0, q_lens, t_lens, trans, me, ie)


BLK = 128


def _fwd_tables_kernel(emis_ref, shifts_ref, inc_ref, rc0_ref, j0_ref,
                       m0_ref, i0_ref, d0_ref, qlen_ref, tlen_ref,
                       strand_ref, trans_ref, trans2_ref,
                       outM, outI, outD, outLs_ref,
                       blkM, blkI, blkD, sems):
    """Forward pass streaming every banded row to HBM.

    Identical math to ops.phmm.forward_banded's scan step; rows are computed
    in VMEM in blocks of BLK and DMA'd out, so the whole wavefront stays
    on-chip while the tables land in HBM for the closed-form modtable
    assembly.

    Emissions arrive PRECOMPUTED per row as 5 concatenated (SUB, Q) f32
    streams in ``emis_ref`` = [me(A)|me(C)|me(G)|me(T)|ie]: stream v<4 at
    row index x holds emit(ref_base=v, q[x]) and stream 4 holds
    ins_emit(q[x-1], q[x]), both already strand-selected — the per-row
    work drops from a 20-term select loop to 5 masked reduces."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    g = pl.program_id(0)
    W = rc0_ref.shape[1]
    Q = shifts_ref.shape[1]
    # per-pair strand flag picks the fwd- or rev-strand parameter set,
    # merging the two strand passes into one dispatch
    sflag = (strand_ref[:, 0] > 0).astype(jnp.float32)[:, None]  # (SUB,1)
    t1, t2 = trans_ref[:], trans2_ref[:]

    def tsel(i, j):
        return (1.0 - sflag) * t1[i, j] + sflag * t2[i, j]

    tmm, tmi, tmd = tsel(0, 0), tsel(0, 1), tsel(0, 2)
    tim, tii, tid = tsel(1, 0), tsel(1, 1), tsel(1, 2)
    tdm, tdi, tdd = tsel(2, 0), tsel(2, 1), tsel(2, 2)
    qlen = qlen_ref[:, 0]
    tlenf = tlen_ref[:, 0].astype(jnp.float32)

    def linrec(c, a):
        y = c
        apow = jnp.broadcast_to(a, c.shape)
        shift = 1
        while shift < W:
            y = y + apow * _rollr(y, shift, 0.0)
            apow = apow * _rollr(apow, shift, 0.0)
            shift *= 2
        return y

    lane128 = jax.lax.broadcasted_iota(jnp.int32, (SUB, 128), 1)
    laneW = jax.lax.broadcasted_iota(jnp.int32, (SUB, W), 1)

    M = m0_ref[:]
    I = i0_ref[:]
    D = d0_ref[:]
    j = j0_ref[:].astype(jnp.float32)
    rc = rc0_ref[:].astype(jnp.int32)

    def outer(tblk, carry):
        M, I, D, j, rc = carry
        col = pl.multiple_of(tblk * BLK, BLK)
        st = shifts_ref[:, pl.ds(col, BLK)]
        it = inc_ref[:, pl.ds(col, BLK)]
        e0t = emis_ref[:, pl.ds(0 * Q + col, BLK)]
        e1t = emis_ref[:, pl.ds(1 * Q + col, BLK)]
        e2t = emis_ref[:, pl.ds(2 * Q + col, BLK)]
        e3t = emis_ref[:, pl.ds(3 * Q + col, BLK)]
        eit = emis_ref[:, pl.ds(4 * Q + col, BLK)]

        def body(r, carry):
            M, I, D, j, rc, ls_blk = carry
            i = tblk * BLK + r + 1
            sel = lane128 == r
            self_ = jnp.where(sel, 1.0, 0.0)
            sv = jnp.sum(jnp.where(sel, st, 0), axis=1)
            newc = jnp.sum(jnp.where(sel, it, 0), axis=1)
            e0 = jnp.sum(self_ * e0t, axis=1)
            e1 = jnp.sum(self_ * e1t, axis=1)
            e2 = jnp.sum(self_ * e2t, axis=1)
            e3 = jnp.sum(self_ * e3t, axis=1)
            ei = jnp.sum(self_ * eit, axis=1)
            s = sv.astype(jnp.float32)[:, None]
            one = s == 1.0
            Md = jnp.where(one, M, _roll_right1(M, 0.0))
            Id = jnp.where(one, I, _roll_right1(I, 0.0))
            Dd = jnp.where(one, D, _roll_right1(D, 0.0))
            Mu = jnp.where(one, _roll_left1(M, 0.0), M)
            Iu = jnp.where(one, _roll_left1(I, 0.0), I)
            Du = jnp.where(one, _roll_left1(D, 0.0), D)
            rc_shift = _roll_left1(rc, 0)
            rc_shift = jnp.where(laneW == W - 1, newc[:, None], rc_shift)
            rc_n = jnp.where(one, rc_shift, rc)
            j_n = j + s
            em = (jnp.where(rc_n == 0, e0[:, None], 0.0)
                  + jnp.where(rc_n == 1, e1[:, None], 0.0)
                  + jnp.where(rc_n == 2, e2[:, None], 0.0)
                  + jnp.where(rc_n == 3, e3[:, None], 0.0))
            ok = (j_n >= 1) & (j_n <= tlenf[:, None])
            em = jnp.where(ok, em, 0.0)
            Mrow = em * (tmm * Md + tim * Id + tdm * Dd)
            Irow = ei[:, None] * (tmi * Mu + tii * Iu + tdi * Du)
            Irow = jnp.where(j_n <= tlenf[:, None], Irow, 0.0)
            c = tmd * _roll_right1(Mrow, 0.0) + tid * _roll_right1(Irow, 0.0)
            Drow = linrec(c, tdd)
            Drow = jnp.where(ok, Drow, 0.0)
            sc = jnp.sum(Mrow + Irow + Drow, axis=1, keepdims=True) + 1e-30
            Mrow, Irow, Drow = Mrow / sc, Irow / sc, Drow / sc
            live = (i <= qlen)[:, None]
            Mn = jnp.where(live, Mrow, M)
            In = jnp.where(live, Irow, I)
            Dn = jnp.where(live, Drow, D)
            ls = jnp.where(live[:, 0], jnp.log(sc[:, 0]), 0.0)
            jn = jnp.where(live, j_n, j_n - s)
            rc_keep = jnp.where(live, rc_n, rc)
            blkM[:, r, :] = Mn
            blkI[:, r, :] = In
            blkD[:, r, :] = Dn
            ls_blk = jnp.where(lane128 == r, ls[:, None], ls_blk)
            return Mn, In, Dn, jn, rc_keep, ls_blk

        ls0_blk = jnp.zeros((SUB, BLK), jnp.float32)
        M, I, D, j, rc, ls_blk = jax.lax.fori_loop(
            0, BLK, body, (M, I, D, j, rc, ls0_blk), unroll=UNROLL)
        outLs_ref[:, pl.ds(col, BLK)] = ls_blk
        row0 = tblk * BLK
        cpM = pltpu.make_async_copy(
            blkM, outM.at[pl.ds(g * SUB, SUB), pl.ds(row0, BLK), :], sems.at[0])
        cpI = pltpu.make_async_copy(
            blkI, outI.at[pl.ds(g * SUB, SUB), pl.ds(row0, BLK), :], sems.at[1])
        cpD = pltpu.make_async_copy(
            blkD, outD.at[pl.ds(g * SUB, SUB), pl.ds(row0, BLK), :], sems.at[2])
        cpM.start()
        cpI.start()
        cpD.start()
        cpM.wait()
        cpI.wait()
        cpD.wait()
        return M, I, D, j, rc

    jax.lax.fori_loop(0, Q // BLK, outer, (M, I, D, j, rc))


def _bwd_tables_kernel(emis_ref, shifts_ref, inc_ref,
                       rcq_ref, jq_ref, bm0_ref, bi0_ref, bd0_ref,
                       qlen_ref, tlen_ref, strand_ref,
                       trans_ref, trans2_ref,
                       outM, outI, outD, outLs_ref,
                       blkM, blkI, blkD, sems):
    """Backward pass streaming rows Q-1..0 to HBM (mirror of
    ops.phmm.backward_banded's scan step).  ``emis_ref`` carries the same
    5 precomputed per-row emission streams as the forward kernel: the
    backward step for row i consumes q[i] with context q[i-1] — exactly
    stream index i."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    g = pl.program_id(0)
    W = rcq_ref.shape[1]
    Q = shifts_ref.shape[1]
    sflag = (strand_ref[:, 0] > 0).astype(jnp.float32)[:, None]
    t1, t2 = trans_ref[:], trans2_ref[:]

    def tsel(i, j):
        return (1.0 - sflag) * t1[i, j] + sflag * t2[i, j]

    tmm, tmi, tmd = tsel(0, 0), tsel(0, 1), tsel(0, 2)
    tim, tii, tid = tsel(1, 0), tsel(1, 1), tsel(1, 2)
    tdm, tdi, tdd = tsel(2, 0), tsel(2, 1), tsel(2, 2)
    qlen = qlen_ref[:, 0]
    tlenf = tlen_ref[:, 0].astype(jnp.float32)

    def linrec_rev(c, a):
        y = c
        apow = jnp.broadcast_to(a, c.shape)
        shift = 1
        while shift < W:
            y = y + apow * _rolll(y, shift, 0.0)
            apow = apow * _rolll(apow, shift, 0.0)
            shift *= 2
        return y

    lane128 = jax.lax.broadcasted_iota(jnp.int32, (SUB, 128), 1)
    laneW = jax.lax.broadcasted_iota(jnp.int32, (SUB, W), 1)

    bM = bm0_ref[:]
    bI = bi0_ref[:]
    bD = bd0_ref[:]
    rc = rcq_ref[:].astype(jnp.int32)   # r[off[i]+k] at the CURRENT row
    j0 = jq_ref[:].astype(jnp.float32)  # off[Q] + k

    def outer(tblk_rev, carry):
        bM, bI, bD, rc, j = carry
        tblk = Q // BLK - 1 - tblk_rev
        col = pl.multiple_of(tblk * BLK, BLK)
        st = shifts_ref[:, pl.ds(col, BLK)]
        it = inc_ref[:, pl.ds(col, BLK)]
        e0t = emis_ref[:, pl.ds(0 * Q + col, BLK)]
        e1t = emis_ref[:, pl.ds(1 * Q + col, BLK)]
        e2t = emis_ref[:, pl.ds(2 * Q + col, BLK)]
        e3t = emis_ref[:, pl.ds(3 * Q + col, BLK)]
        eit = emis_ref[:, pl.ds(4 * Q + col, BLK)]

        def body(r_rev, carry):
            bM, bI, bD, rc, j, ls_blk = carry
            r = BLK - 1 - r_rev
            i = tblk * BLK + r          # computing row i from row i+1
            sel = lane128 == r
            self_ = jnp.where(sel, 1.0, 0.0)
            sv = jnp.sum(jnp.where(sel, st, 0), axis=1)
            newc = jnp.sum(jnp.where(sel, it, 0), axis=1)
            e0 = jnp.sum(self_ * e0t, axis=1)
            e1 = jnp.sum(self_ * e1t, axis=1)
            e2 = jnp.sum(self_ * e2t, axis=1)
            e3 = jnp.sum(self_ * e3t, axis=1)
            ei = jnp.sum(self_ * eit, axis=1)
            s = sv.astype(jnp.float32)[:, None]
            one = s == 1.0
            # band content at row i: shift right on s=1, char enters lane 0
            rc_shift = _roll_right1(rc, 0)
            rc_shift = jnp.where(laneW == 0, newc[:, None], rc_shift)
            rc_i = jnp.where(one, rc_shift, rc)
            j_i = j - s                 # off[i] + k
            em = (jnp.where(rc_i == 0, e0[:, None], 0.0)
                  + jnp.where(rc_i == 1, e1[:, None], 0.0)
                  + jnp.where(rc_i == 2, e2[:, None], 0.0)
                  + jnp.where(rc_i == 3, e3[:, None], 0.0))
            em = jnp.where(j_i + 1.0 <= tlenf[:, None], em, 0.0)
            bM1_at = jnp.where(one, bM, _roll_left1(bM, 0.0))
            bI1_at = jnp.where(one, _roll_right1(bI, 0.0), bI)
            u = em * bM1_at
            v = ei[:, None] * bI1_at
            c = tdm * u + tdi * v
            bDrow = linrec_rev(c, tdd)
            w = _roll_left1(bDrow, 0.0)
            ok = j_i <= tlenf[:, None]
            bMrow = jnp.where(ok, tmm * u + tmi * v + tmd * w, 0.0)
            bIrow = jnp.where(ok, tim * u + tii * v + tid * w, 0.0)
            bDrow = jnp.where(ok, bDrow, 0.0)
            sc = jnp.max(bMrow + bIrow + bDrow, axis=1, keepdims=True) + 1e-30
            bMrow, bIrow, bDrow = bMrow / sc, bIrow / sc, bDrow / sc
            live = (i < qlen)[:, None]
            bMn = jnp.where(live, bMrow, bM)
            bIn = jnp.where(live, bIrow, bI)
            bDn = jnp.where(live, bDrow, bD)
            ls = jnp.where(live[:, 0], jnp.log(sc[:, 0]), 0.0)
            rc_keep = jnp.where(live, rc_i, rc)
            j_keep = jnp.where(live, j_i, j)
            blkM[:, r, :] = bMn
            blkI[:, r, :] = bIn
            blkD[:, r, :] = bDn
            ls_blk = jnp.where(lane128 == r, ls[:, None], ls_blk)
            return bMn, bIn, bDn, rc_keep, j_keep, ls_blk

        ls0_blk = jnp.zeros((SUB, BLK), jnp.float32)
        bM, bI, bD, rc, j, ls_blk = jax.lax.fori_loop(
            0, BLK, body, (bM, bI, bD, rc, j, ls0_blk), unroll=UNROLL)
        outLs_ref[:, pl.ds(col, BLK)] = ls_blk
        row0 = tblk * BLK
        cpM = pltpu.make_async_copy(
            blkM, outM.at[pl.ds(g * SUB, SUB), pl.ds(row0, BLK), :], sems.at[0])
        cpI = pltpu.make_async_copy(
            blkI, outI.at[pl.ds(g * SUB, SUB), pl.ds(row0, BLK), :], sems.at[1])
        cpD = pltpu.make_async_copy(
            blkD, outD.at[pl.ds(g * SUB, SUB), pl.ds(row0, BLK), :], sems.at[2])
        cpM.start()
        cpI.start()
        cpD.start()
        cpM.wait()
        cpI.wait()
        cpD.wait()
        return bM, bI, bD, rc, j

    jax.lax.fori_loop(0, Q // BLK, outer, (bM, bI, bD, rc, j0))


@functools.partial(jax.jit, static_argnames=("W", "Q", "interpret"))
def _pallas_fwd_tables(emis, shifts, inc, rc0, j0, m0, i0, d0, qlp, tlp,
                       strand, trans, trans2,
                       W: int, Q: int, interpret: bool):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B = shifts.shape[0]

    def row_spec(ncols):
        return pl.BlockSpec((SUB, ncols), lambda g: (g, 0),
                            memory_space=pltpu.VMEM)

    def rep_spec(shape):
        return pl.BlockSpec(shape, lambda g: tuple(0 for _ in shape),
                            memory_space=pltpu.VMEM)

    hbm = getattr(pltpu, "HBM", pl.ANY)
    any_spec = pl.BlockSpec(memory_space=hbm)
    outs = pl.pallas_call(
        _fwd_tables_kernel,
        grid=(B // SUB,),
        in_specs=[row_spec(5 * Q), row_spec(Q), row_spec(Q), row_spec(W),
                  row_spec(W), row_spec(W), row_spec(W), row_spec(W),
                  row_spec(1), row_spec(1), row_spec(1),
                  rep_spec((8, 8)), rep_spec((8, 8))],
        out_specs=[any_spec, any_spec, any_spec, row_spec(Q)],
        out_shape=[jax.ShapeDtypeStruct((B, Q, W), jnp.float32)] * 3
        + [jax.ShapeDtypeStruct((B, Q), jnp.float32)],
        scratch_shapes=[pltpu.VMEM((SUB, BLK, W), jnp.float32)] * 3
        + [pltpu.SemaphoreType.DMA((3,))],
        interpret=interpret,
    )(emis, shifts, inc, rc0, j0, m0, i0, d0, qlp, tlp, strand,
      trans, trans2)
    return outs


@functools.partial(jax.jit, static_argnames=("W", "Q", "interpret"))
def _pallas_bwd_tables(emis, shifts, inc, rcq, jq, bm0, bi0, bd0,
                       qlp, tlp, strand, trans, trans2,
                       W: int, Q: int, interpret: bool):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B = shifts.shape[0]

    def row_spec(ncols):
        return pl.BlockSpec((SUB, ncols), lambda g: (g, 0),
                            memory_space=pltpu.VMEM)

    def rep_spec(shape):
        return pl.BlockSpec(shape, lambda g: tuple(0 for _ in shape),
                            memory_space=pltpu.VMEM)

    hbm = getattr(pltpu, "HBM", pl.ANY)
    any_spec = pl.BlockSpec(memory_space=hbm)
    outs = pl.pallas_call(
        _bwd_tables_kernel,
        grid=(B // SUB,),
        in_specs=[row_spec(5 * Q), row_spec(Q), row_spec(Q),
                  row_spec(W), row_spec(W), row_spec(W), row_spec(W),
                  row_spec(W),
                  row_spec(1), row_spec(1), row_spec(1),
                  rep_spec((8, 8)), rep_spec((8, 8))],
        out_specs=[any_spec, any_spec, any_spec, row_spec(Q)],
        out_shape=[jax.ShapeDtypeStruct((B, Q, W), jnp.float32)] * 3
        + [jax.ShapeDtypeStruct((B, Q), jnp.float32)],
        scratch_shapes=[pltpu.VMEM((SUB, BLK, W), jnp.float32)] * 3
        + [pltpu.SemaphoreType.DMA((3,))],
        interpret=interpret,
    )(emis, shifts, inc, rcq, jq, bm0, bi0, bd0, qlp, tlp, strand,
      trans, trans2)
    return outs


def _prep_tables_inputs(qs, template, offsets, q_lens, t_len,
                        params: PHMMParams, W: int,
                        strands=None, params_rev: PHMMParams | None = None):
    """Host-side prep, kept COMPACT for slow host links: only the padded
    reads (int8), the padded per-pair templates (int8), the 0/1 offset
    deltas (uint8), per-read scalars and the tiny parameter tables cross to
    the device; everything else (band streams, row-0 / backward-init closed
    forms) is expanded in-jit.

    ``template`` may be one (T,) array shared by the batch or per-pair
    (B0, T) rows with ``t_len`` a (B0,) vector.  Returns
    (prep_dict, B0, Qpad, Q, B)."""
    B0, Qpad = qs.shape
    Q = ((Qpad + BLK - 1) // BLK) * BLK
    B = ((B0 + SUB - 1) // SUB) * SUB
    template = np.asarray(template, np.int8)
    if template.ndim == 1:
        t_lens = np.full(B0, int(t_len), np.int32)
        templates = np.broadcast_to(template, (B0, len(template)))
    else:
        t_lens = np.asarray(t_len, np.int32)
        templates = template
    Tmax = ((templates.shape[1] + 3) // 4) * 4
    # 2-bit packed transfers (reads/templates are pure ACGT; the padding
    # beyond q_len/t_len is re-masked to 4 on device)
    qs_p = np.zeros((B, Q), np.int8)
    qs_p[:B0, :Qpad] = np.where(
        np.arange(Qpad) < np.asarray(q_lens)[:, None], qs, 0)
    r_p = np.zeros((B, Tmax), np.int8)
    r_p[:B0, :templates.shape[1]] = np.where(
        np.arange(templates.shape[1]) < t_lens[:, None], templates, 0)
    # pack2bit is 2-bit only: an in-length code 4 (N) would bleed its high
    # bit into the neighbouring base's slot.  Entry rejects non-ACGT reads so
    # this is defensive — score a stray N as 'A' rather than corrupt two
    # positions (the scan path would give N emission prob 0 = -inf anyway).
    np.clip(qs_p, 0, 3, out=qs_p)
    np.clip(r_p, 0, 3, out=r_p)
    t_lens_p = np.ones(B, np.int32)
    t_lens_p[:B0] = t_lens
    offs = np.zeros((B, Q + 1), np.int64)
    offs[:B0, :Qpad + 1] = offsets
    offs[:B0, Qpad + 1:] = offsets[:, -1:]
    offs[B0:] = offs[:1] if B0 else 0
    q_lens_p = np.ones(B, np.int32)
    q_lens_p[:B0] = q_lens
    def _tables(par):
        t = np.asarray(par.trans, np.float32)
        trans = np.zeros((8, 8), np.float32)
        trans[:3, :3] = t
        me8 = np.zeros((8, 8), np.float32)
        me8[:4, :4] = np.asarray(par.mat_emit, np.float32)
        ie8 = np.zeros((8, 8), np.float32)
        ie8[:5, :4] = np.asarray(par.ins_emit, np.float32)
        return trans, me8, ie8

    trans, me8, ie8 = _tables(params)
    trans2, me28, ie28 = _tables(params_rev) if params_rev is not None \
        else (trans, me8, ie8)
    strand_p = np.zeros(B, np.int32)
    if strands is not None:
        # flag 1 selects the SECOND (reverse-strand) parameter set;
        # reads on the forward strand use set 1
        strand_p[:B0] = (~np.asarray(strands, bool)).astype(np.int32)
    from .banded_align import pack2bit
    prep = dict(
        qs_packed=pack2bit(qs_p),
        r_packed=pack2bit(r_p),
        shifts=np.diff(offs, axis=1).astype(np.uint8),
        off0=offs[:, 0].astype(np.int32),
        q_lens_p=q_lens_p,
        t_len=t_lens_p,
        strand=strand_p,
        trans=trans, me8=me8, ie8=ie8,
        trans2=trans2, me28=me28, ie28=ie28,
    )
    return prep, B0, Qpad, Q, B


def _tables_traced(prep, W: int, Q: int, interpret: bool):
    """Device-side prep expansion + both Pallas passes + stitching,
    traceable inside an outer jit.  Per-pair templates and t_lens.
    Returns (lk, (fM,fI,fD), fcum, rcs, (bM,bI,bD), bcum, offs)."""
    from .banded_align import _unpack2bit
    p = prep
    q_lens_p = p["q_lens_p"]
    t_lens = p["t_len"]                       # (B,)
    qs_p = jnp.where(np.arange(Q) < q_lens_p[:, None],
                     _unpack2bit(p["qs_packed"], Q), 4).astype(jnp.int32)
    B = qs_p.shape[0]
    Tmax = p["r_packed"].shape[1] * 4
    r_full = jnp.where(np.arange(Tmax) < t_lens[:, None],
                       _unpack2bit(p["r_packed"], Tmax), 4).astype(jnp.int8)
    sf = p["strand"].astype(jnp.float32)[:, None]
    tr1, tr2 = p["trans"], p["trans2"]
    tmd = (1.0 - sf) * tr1[0, 2] + sf * tr2[0, 2]   # (B,1)
    tdd = (1.0 - sf) * tr1[2, 2] + sf * tr2[2, 2]
    tid = (1.0 - sf) * tr1[1, 2] + sf * tr2[1, 2]
    ks = np.arange(W)
    kf = np.arange(W, dtype=np.float32)
    shifts32 = p["shifts"].astype(jnp.int32)
    offs = jnp.concatenate(
        [p["off0"][:, None],
         p["off0"][:, None] + jnp.cumsum(shifts32, axis=1)], axis=1)
    # per-pair band character streams from the padded template rows:
    # r_pad[b, x] == 4 for x == 0, r[b, x-1] otherwise (front sentinel), and
    # r_pad2[b, x] == r[b, x] (suffix chars), both padded with 4s
    pad_tail = np.full((1, W + Q + 3), 4, np.int8)
    r_pad = jnp.concatenate(
        [np.full((1, 1), 4, np.int8).repeat(B, 0), r_full,
         jnp.broadcast_to(pad_tail, (B, pad_tail.shape[1]))], axis=1)
    r_pad2 = jnp.concatenate(
        [r_full, jnp.broadcast_to(pad_tail, (B, pad_tail.shape[1])),
         np.full((1, 1), 4, np.int8).repeat(B, 0)], axis=1)

    def gat(arr, idx):
        return jnp.take_along_axis(arr, idx, axis=1)

    inc_f = gat(r_pad, offs[:, 1:] + W - 1).astype(jnp.int32)
    rc0 = gat(r_pad, offs[:, :1] + ks[None]).astype(jnp.int32)
    j0 = (offs[:, :1] + ks[None]).astype(jnp.int32)
    tl_col = t_lens[:, None]
    # forward row 0 (closed form: M at j=0, D chain along the row)
    M0 = (j0 == 0).astype(jnp.float32)
    logtdd = jnp.log(jnp.maximum(tdd, 1e-30))    # (B,1)
    D0 = jnp.where(ks[None] >= 1,
                   tmd * jnp.exp(logtdd * jnp.maximum(kf[None] - 1, 0)),
                   0.0) * (j0 <= tl_col)
    D0 = jnp.where(j0 >= 1, D0, 0.0).astype(jnp.float32)
    s0 = M0.sum(1, keepdims=True) + D0.sum(1, keepdims=True) + 1e-30
    M0n, D0n = (M0 / s0).astype(jnp.float32), (D0 / s0).astype(jnp.float32)
    I0n = jnp.zeros_like(M0n)
    ls0 = jnp.log(s0[:, 0]).astype(jnp.float32)
    qlp = q_lens_p[:, None].astype(jnp.int32)
    tlp = tl_col.astype(jnp.int32)

    strand_col = p["strand"][:, None].astype(jnp.int32)
    # precomputed per-row emission streams (shared by fwd and bwd kernels):
    # stream v<4 at index x = emit(ref=v, q[x]); stream 4 at x =
    # ins_emit(q[x-1], q[x]); strand selection folded in here (sf is exactly
    # 0/1, so the mix IS a select — bit-identical to the in-kernel version)
    me_mix = ((1.0 - sf) * p["me8"].reshape(-1)[None, :]
              + sf * p["me28"].reshape(-1)[None, :])          # (B, 64)
    ie_mix = ((1.0 - sf) * p["ie8"].reshape(-1)[None, :]
              + sf * p["ie28"].reshape(-1)[None, :])
    qcq = jnp.clip(qs_p, 0, 3)
    qpv = jnp.clip(jnp.concatenate(
        [jnp.full((B, 1), 4, jnp.int32), qs_p[:, :-1]], axis=1), 0, 4)
    emis = jnp.concatenate(
        [jnp.take_along_axis(me_mix, r * 8 + qcq, axis=1) for r in range(4)]
        + [jnp.take_along_axis(ie_mix, qpv * 8 + qcq, axis=1)],
        axis=1).astype(jnp.float32)                           # (B, 5*Q)
    fM_r, fI_r, fD_r, f_ls = _pallas_fwd_tables(
        emis, shifts32, inc_f, rc0, j0, M0n, I0n, D0n, qlp, tlp, strand_col,
        p["trans"], p["trans2"], W, Q, interpret)

    # backward init at the frozen row (offsets beyond q_len are constant)
    bidx = np.arange(B)
    offQ = offs[bidx, q_lens_p]
    jQ = offQ[:, None] + ks[None]
    kT = (t_lens - offQ)[:, None].astype(jnp.float32)
    expo = jnp.maximum(kT - kf[None], 0.0)
    bD0 = jnp.where(kf[None] <= kT, jnp.exp(logtdd * expo), 0.0)
    bD_next = jnp.concatenate([bD0[:, 1:], jnp.zeros((B, 1))], axis=1)
    bM0 = jnp.where(kf[None] == kT, 1.0, tmd * bD_next)
    bI0 = jnp.where(kf[None] == kT, 1.0, tid * bD_next)
    valid = jQ <= tl_col
    bM0 = jnp.where(valid, bM0, 0.0)
    bI0 = jnp.where(valid, bI0, 0.0)
    bD0 = jnp.where(valid, bD0, 0.0)
    sI = jnp.max(bM0 + bI0 + bD0, axis=1, keepdims=True) + 1e-30
    bM0n = (bM0 / sI).astype(jnp.float32)
    bI0n = (bI0 / sI).astype(jnp.float32)
    bD0n = (bD0 / sI).astype(jnp.float32)
    lsI = jnp.log(sI[:, 0]).astype(jnp.float32)
    inc_b = gat(r_pad2, jnp.maximum(offs[:, :-1], 0)).astype(jnp.int32)
    rcq = gat(r_pad2, offs[:, -1:] + ks[None]).astype(jnp.int32)
    jq = (offs[:, -1:] + ks[None]).astype(jnp.int32)

    bM_r, bI_r, bD_r, b_ls = _pallas_bwd_tables(
        emis, shifts32, inc_b, rcq, jq, bM0n, bI0n, bD0n,
        qlp, tlp, strand_col,
        p["trans"], p["trans2"], W, Q, interpret)

    fM = jnp.concatenate([M0n[:, None], fM_r], axis=1)
    fI = jnp.concatenate([I0n[:, None], fI_r], axis=1)
    fD = jnp.concatenate([D0n[:, None], fD_r], axis=1)
    lss = jnp.concatenate([ls0[:, None], f_ls], axis=1)
    fcum = jnp.cumsum(lss, axis=1)
    bM = jnp.concatenate([bM_r, bM0n[:, None]], axis=1)
    bI = jnp.concatenate([bI_r, bI0n[:, None]], axis=1)
    bD = jnp.concatenate([bD_r, bD0n[:, None]], axis=1)
    bM = bM.at[bidx, q_lens_p].set(bM0n)
    bI = bI.at[bidx, q_lens_p].set(bI0n)
    bD = bD.at[bidx, q_lens_p].set(bD0n)
    zcol = np.zeros((B, 1), np.float32)
    b_lss = jnp.concatenate([b_ls, zcol], axis=1)
    b_lss = b_lss.at[bidx, q_lens_p].set(lsI)
    bcum = jnp.flip(jnp.cumsum(jnp.flip(b_lss, 1), axis=1), 1)
    k_end = jnp.clip(t_lens - offQ, 0, W - 1)
    fin = (fM[bidx, q_lens_p, k_end] + fI[bidx, q_lens_p, k_end]
           + fD[bidx, q_lens_p, k_end])
    lk = jnp.log(fin + 1e-30) + fcum[bidx, q_lens_p]
    rcs = gat(r_pad, (offs[:, :, None] + ks[None, None, :])
              .reshape(B, -1)).reshape(B, Q + 1, W)
    return lk, (fM, fI, fD), fcum, rcs, (bM, bI, bD), bcum, offs


@functools.partial(jax.jit, static_argnames=("W", "Q", "interpret"))
def _tables_jit(prep, W: int, Q: int, interpret: bool):
    return _tables_traced(prep, W, Q, interpret)


def pallas_tables_batch(qs, template, offsets, q_lens, t_len,
                        params: PHMMParams, W: int, interpret: bool = False):
    """Batched banded fwd/bwd tables via the Pallas kernels, shaped exactly
    like vmapped ops.phmm.forward_banded/backward_banded outputs:
    (lk, (fM,fI,fD) (B,Q+1,W), fcum (B,Q+1), rcs (B,Q+1,W),
    (bM,bI,bD) (B,Q+1,W), bcum (B,Q+1), B0, Qpad)."""
    prep, B0, Qpad, Q, _B = _prep_tables_inputs(
        qs, template, offsets, q_lens, t_len, params, W)
    lk, f_tabs, fcum, rcs, b_tabs, bcum, _offs = _tables_jit(
        prep, W, Q, interpret)
    return lk, f_tabs, fcum, rcs, b_tabs, bcum, B0, Qpad


def pallas_likelihood_pileup(reads, template: np.ndarray,
                             params: PHMMParams, W: int = 128,
                             interpret: bool = False) -> np.ndarray:
    """Per-read forward log-likelihood against one template (Pallas path).

    Host precomputes band offsets, per-row incoming ref chars, and the row-0
    ref band, so the kernel is gather-free.
    """
    from .banded_align import linear_offsets
    from .polish import effective_band

    t_len = len(template)
    q_lens = np.array([len(r) for r in reads], np.int32)
    W = effective_band(W, q_lens, t_len)
    Q = ((int(q_lens.max()) + 127) // 128) * 128
    B = ((len(reads) + SUB - 1) // SUB) * SUB
    qs = np.full((B, Q), 4, np.int32)
    shifts = np.zeros((B, Q), np.int32)
    inc = np.full((B, Q), 4, np.int32)
    rc0 = np.full((B, W), 4, np.int32)
    j0 = np.zeros((B, W), np.int32)
    qlp = np.ones((B, 1), np.int32)
    tlp = np.ones((B, 1), np.int32)
    r_pad = np.concatenate([np.full(1, 4, np.int8),
                            np.asarray(template, np.int8),
                            np.full(W + Q + 2, 4, np.int8)])
    ks = np.arange(W)
    for i, r in enumerate(reads):
        qs[i, :len(r)] = r
        off = linear_offsets(int(q_lens[i]), t_len, Q, W)
        shifts[i, :] = np.diff(off)
        # rc[k] = r[off+k-1] = r_pad[off+k]; char entering lane W-1 on a
        # shift at row i is r_pad[off[i] + W - 1]
        inc[i, :] = r_pad[off[1:] + W - 1]
        rc0[i, :] = r_pad[off[0] + ks]
        j0[i, :] = off[0] + ks
        qlp[i, 0] = q_lens[i]
        tlp[i, 0] = t_len
    par_trans = np.zeros((8, 8), np.float32)
    par_trans[:3, :3] = np.asarray(params.trans, np.float32)
    me = np.zeros((8, 8), np.float32)
    me[:4, :4] = np.asarray(params.mat_emit, np.float32)
    ie = np.zeros((8, 8), np.float32)
    ie[:5, :4] = np.asarray(params.ins_emit, np.float32)
    out = _pallas_fwd(qs, shifts, inc, rc0, j0, qlp, tlp, par_trans, me, ie,
                      W, interpret)
    return np.asarray(out)[: len(reads), 0]

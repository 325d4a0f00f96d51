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

SUB = 8  # pairs per program (sublane dimension)


def _rollr(x, n, fill):
    return jnp.concatenate(
        [jnp.full_like(x[:, :n], fill), x[:, :-n]], axis=1)


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

        return jax.lax.fori_loop(0, 128, body, carry)

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

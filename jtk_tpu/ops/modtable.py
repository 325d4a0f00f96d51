"""K2 — modification table: LK(read | 1-edit of template) for every edit.

Replaces kiley's ``modification_table_antidiagonal`` (SURVEY.md §2.4): the
machinery behind both template polishing (best-edit search, summed over a
pileup) and variant discovery in local clustering (per-read LK-gain profiles,
``pseudo_mcmc.rs:45-68``).

Math (conditional 3-state pair-HMM; column jc consumes template char r[jc-1]):
every global path consumes template char jc exactly once, in state M or D, so
for any jc:  LK = sum_i [fM(i,jc) bM(i,jc) + fD(i,jc) bD(i,jc)].
Each 1-edit changes only one column's emission/wiring, giving closed forms in
the unmodified forward/backward tables:

  sub(j=jc-1 -> b): sum_i [ me[b,q_i] A(i,jc) bM(i,jc) + fD(i,jc) bD(i,jc) ]
  del(j=jc-1):      sum_i [ me[r_jc,q_i] A(i,jc) bM(i,jc+1)
                            + Dnew(i,jc) bD(i,jc+1) ]          (jc < T)
  ins(before j=jc, base b):
                    sum_i [ me[b,q_i] Anext(i,jc) bM(i,jc) + Dnext(i,jc) bD(i,jc) ]

  A(i,jc)    = tmm fM(i-1,jc-1) + tim fI(i-1,jc-1) + tdm fD(i-1,jc-1)
  Anext(i,jc)= same but with column jc (transition source is the cell before
               the inserted column)
  Dnew(i,jc) = tmd fM(i,jc-1) + tid fI(i,jc-1) + tdd fD(i,jc-1)
  Dnext(i,jc)= tmd fM(i,jc)   + tid fI(i,jc)   + tdd fD(i,jc)

All terms are elementwise in the shared banded (row, lane) layout (same band
offsets for forward and backward), then segment-summed per template column —
no per-edit DP re-runs.  Output layout: (Tpad+1, 9) with columns
[sub A,C,G,T | del | ins A,C,G,T]; row j holds sub/del at template position j
and ins-before-position j (so row Tpad alone can hold a trailing insertion).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .phmm import EPS, PHMMParams, _emit_pad, backward_banded, forward_banded

NUM_EDIT = 9  # 4 sub + 1 del + 4 ins


def _row_shift(tab, shift_per_row, W):
    """tab[i, k] -> tab[i, k + shift_per_row[i]] with 0 fill."""
    ks = jnp.arange(W, dtype=jnp.int32)
    idx = ks[None, :] + shift_per_row[:, None]
    ok = (idx >= 0) & (idx < W)
    g = jnp.take_along_axis(tab, jnp.clip(idx, 0, W - 1), axis=1)
    return jnp.where(ok, g, 0.0)


@functools.partial(jax.jit, static_argnames=("W", "Tpad"))
def modification_table(q, r, offsets, q_len, t_len, params: PHMMParams,
                       W: int, Tpad: int):
    """Returns (lk, table) — baseline log-likelihood and (Tpad+1, NUM_EDIT)
    table of log-likelihoods of each single template edit.  Invalid positions
    (>= t_len for sub/del, > t_len for ins) hold -inf-ish values."""
    Q = q.shape[0]
    T = r.shape[0]
    lk, (fM, fI, fD), fcum = forward_banded(q, r, offsets, q_len, t_len, params, W)
    (bM, bI, bD), bcum = backward_banded(q, r, offsets, q_len, t_len, params, W)

    t = params.trans
    tmm, tmi, tmd = t[0, 0], t[0, 1], t[0, 2]
    tim, tii, tid = t[1, 0], t[1, 1], t[1, 2]
    tdm, tdi, tdd = t[2, 0], t[2, 1], t[2, 2]
    me, _ = _emit_pad(params)

    ks = jnp.arange(W, dtype=jnp.int32)
    rows = jnp.arange(Q + 1, dtype=jnp.int32)
    jc = offsets[:, None] + ks[None, :]          # (Q+1, W) column index
    live_row = (rows <= q_len)[:, None]

    # previous-row tables aligned to current rows: value at (i,k) is
    # f*(i-1, jc-1) and f*(i-1, jc).
    s = jnp.concatenate([jnp.zeros(1, jnp.int32), offsets[1:] - offsets[:-1]])
    zrow = jnp.zeros((1, W))
    fMp = jnp.concatenate([zrow, fM[:-1]], 0)
    fIp = jnp.concatenate([zrow, fI[:-1]], 0)
    fDp = jnp.concatenate([zrow, fD[:-1]], 0)
    # (i-1, jc-1): row i-1 band index of (jc-1) is k + s_i - 1
    fMd = _row_shift(fMp, s - 1, W)
    fId = _row_shift(fIp, s - 1, W)
    fDd = _row_shift(fDp, s - 1, W)
    # (i-1, jc): index k + s_i
    fMu = _row_shift(fMp, s, W)
    fIu = _row_shift(fIp, s, W)
    fDu = _row_shift(fDp, s, W)
    # same-row previous column (i, jc-1): index k-1
    fMl = _row_shift(fM, jnp.full(Q + 1, -1, jnp.int32), W)
    fIl = _row_shift(fI, jnp.full(Q + 1, -1, jnp.int32), W)
    fDl = _row_shift(fD, jnp.full(Q + 1, -1, jnp.int32), W)
    # backward next column (i, jc+1): index k+1
    bMn = _row_shift(bM, jnp.full(Q + 1, +1, jnp.int32), W)
    bDn = _row_shift(bD, jnp.full(Q + 1, +1, jnp.int32), W)

    A = tmm * fMd + tim * fId + tdm * fDd          # arrive in M at column jc
    Anext = tmm * fMu + tim * fIu + tdm * fDu      # arrive in M at inserted col
    Dnew = tmd * fMl + tid * fIl + tdd * fDl       # arrive in D skipping jc
    Dnext = tmd * fM + tid * fI + tdd * fD         # arrive in D at inserted col

    # row-scale corrections (f*b products): A-terms use fcum[i-1]+bcum[i],
    # fD/Dnext-terms use fcum[i]+bcum[i].  All are ~lk, so shift by lk.
    fcum_p = jnp.concatenate([jnp.array([-jnp.inf]), fcum[:-1]])
    cA = jnp.exp(jnp.clip(fcum_p + bcum - lk, -80.0, 80.0))[:, None]
    cB = jnp.exp(jnp.clip(fcum + bcum - lk, -80.0, 80.0))[:, None]
    cA = jnp.where(live_row, cA, 0.0)
    cB = jnp.where(live_row, cB, 0.0)

    # per-row query emission row: me[b, q[i-1]] for b=0..3 -> (Q+1, 4)
    qprev_char = jnp.concatenate([jnp.array([4], jnp.int8), q])  # q[i-1] at row i
    em_q = me[:4, :][:, qprev_char].T                            # (Q+1, 4)
    em_q = em_q * (rows >= 1)[:, None]

    valid = (jc >= 0) & (jc <= t_len)
    seg = jnp.where(valid, jc, Tpad + 1).astype(jnp.int32).reshape(-1)
    nseg = Tpad + 2

    def colsum(x):
        return jax.ops.segment_sum(x.reshape(-1), seg, num_segments=nseg)[:Tpad + 1]

    # --- substitutions: for each base b ---
    AbM = A * bM * cA            # (Q+1, W) without the emission factor
    fDbD_B = fD * bD * cB
    sub_cols = []
    for b in range(4):
        term = em_q[:, b:b + 1] * AbM
        sub_cols.append(colsum(term))
    sub_base = colsum(fDbD_B)
    # sub table at position j corresponds to jc = j+1 -> shift by one
    sub_tab = jnp.stack(sub_cols, axis=1) + sub_base[:, None]      # (Tpad+1, 4) by jc
    sub_tab = sub_tab[1:, :]                                       # index by j
    sub_tab = jnp.concatenate([sub_tab, jnp.zeros((1, 4))], axis=0)

    # --- deletion of t[j] (jc = j+1 < T): uses next column's b tables ---
    rc_next = r[jnp.clip(jc, 0, T - 1)]         # r[jc] = char of column jc+1
    em_next = me[rc_next, qprev_char[:, None]]  # (Q+1, W)
    del_term = em_next * A * bMn * cA + Dnew * bDn * cB
    del_col = colsum(del_term)                  # by jc
    del_tab = del_col[1:]
    del_tab = jnp.concatenate([del_tab, jnp.zeros((1,))])
    # deleting the LAST char (jc == t_len): LK = f-sum at (q_len, t_len-1)
    k_last = jnp.clip(t_len - 1 - offsets[q_len], 0, W - 1)
    f_last = (fM[q_len, k_last] + fI[q_len, k_last] + fD[q_len, k_last])
    lk_del_last = jnp.log(f_last + EPS) + fcum[q_len]
    # (applied after log below)

    # --- insertion before position j (jc = j): paths through the new column ---
    DnB = Dnext * bD * cB
    ins_cols = []
    for b in range(4):
        term = em_q[:, b:b + 1] * Anext * bM * cA + 0.0
        ins_cols.append(colsum(term))
    ins_base = colsum(DnB)
    ins_tab = jnp.stack(ins_cols, axis=1) + ins_base[:, None]      # by jc == j

    table = jnp.concatenate([sub_tab, del_tab[:, None], ins_tab], axis=1)
    ltable = jnp.log(jnp.maximum(table, EPS)) + lk
    ltable = ltable.at[:, 4].set(
        jnp.where(jnp.arange(Tpad + 1) == t_len - 1, lk_del_last, ltable[:, 4]))

    # mask invalid positions
    pos = jnp.arange(Tpad + 1)
    neg = jnp.float32(-1e30)
    sub_ok = pos[:, None] < t_len
    ins_ok = pos[:, None] <= t_len
    mask = jnp.concatenate(
        [jnp.repeat(sub_ok, 4, 1), sub_ok, jnp.repeat(ins_ok, 4, 1)], axis=1)
    ltable = jnp.where(mask, ltable, neg)
    return lk, ltable


modification_table_pileup = jax.jit(
    jax.vmap(modification_table, in_axes=(0, None, 0, 0, None, None, None, None)),
    static_argnames=("W", "Tpad"),
)

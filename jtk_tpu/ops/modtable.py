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


def _shl2(tab, fill=0.0):
    """index k reads old k+1 along axis 1 (static shift)."""
    col = np.full((tab.shape[0], 1), fill, tab.dtype)  # numpy: no device const
    return jnp.concatenate([tab[:, 1:], col], axis=1)


def _shr2(tab, fill=0.0):
    """index k reads old k-1 along axis 1 (static shift)."""
    col = np.full((tab.shape[0], 1), fill, tab.dtype)
    return jnp.concatenate([col, tab[:, :-1]], axis=1)


def _row_shift_unit(tab, one_col, minus: bool):
    """tab[i, k] -> tab[i, k + s_i - (1 if minus else 0)] for s_i in {0,1}.

    one_col: (Q+1, 1) bool (s_i == 1).  minus=True gives index k+s-1,
    minus=False gives k+s."""
    if minus:
        return jnp.where(one_col, tab, _shr2(tab))
    return jnp.where(one_col, _shl2(tab), tab)


@functools.partial(jax.jit, static_argnames=("W", "Tpad"))
def modification_table(q, r, offsets, q_len, t_len, params: PHMMParams,
                       W: int, Tpad: int):
    """Returns (lk, table) — baseline log-likelihood and (Tpad+1, NUM_EDIT)
    table of log-likelihoods of each single template edit.  Invalid positions
    (>= t_len for sub/del, > t_len for ins) hold -inf-ish values."""
    Q = q.shape[0]
    T = r.shape[0]
    lk, (fM, fI, fD), fcum, rcs = forward_banded(q, r, offsets, q_len, t_len,
                                                 params, W)
    (bM, bI, bD), bcum = backward_banded(q, r, offsets, q_len, t_len, params, W)

    t = params.trans
    tmm, tmi, tmd = t[0, 0], t[0, 1], t[0, 2]
    tim, tii, tid = t[1, 0], t[1, 1], t[1, 2]
    tdm, tdi, tdd = t[2, 0], t[2, 1], t[2, 2]
    me, _ = _emit_pad(params)

    ks = np.arange(W, dtype=np.int32)
    rows = np.arange(Q + 1, dtype=np.int32)
    jc = offsets[:, None] + ks[None, :]          # (Q+1, W) column index
    live_row = (rows <= q_len)[:, None]

    # previous-row tables aligned to current rows: value at (i,k) is
    # f*(i-1, jc-1) and f*(i-1, jc).  s_i in {0,1} -> selects of static shifts.
    s = jnp.concatenate([np.zeros(1, np.int32), offsets[1:] - offsets[:-1]])
    one_col = (s == 1)[:, None]
    zrow = np.zeros((1, W), np.float32)
    fMp = jnp.concatenate([zrow, fM[:-1]], 0)
    fIp = jnp.concatenate([zrow, fI[:-1]], 0)
    fDp = jnp.concatenate([zrow, fD[:-1]], 0)
    # (i-1, jc-1): row i-1 band index of (jc-1) is k + s_i - 1
    fMd = _row_shift_unit(fMp, one_col, True)
    fId = _row_shift_unit(fIp, one_col, True)
    fDd = _row_shift_unit(fDp, one_col, True)
    # (i-1, jc): index k + s_i
    fMu = _row_shift_unit(fMp, one_col, False)
    fIu = _row_shift_unit(fIp, one_col, False)
    fDu = _row_shift_unit(fDp, one_col, False)
    # same-row previous column (i, jc-1): index k-1
    fMl = _shr2(fM)
    fIl = _shr2(fI)
    fDl = _shr2(fD)
    # backward next column (i, jc+1): index k+1
    bMn = _shl2(bM)
    bDn = _shl2(bD)

    A = tmm * fMd + tim * fId + tdm * fDd          # arrive in M at column jc
    Anext = tmm * fMu + tim * fIu + tdm * fDu      # arrive in M at inserted col
    Dnew = tmd * fMl + tid * fIl + tdd * fDl       # arrive in D skipping jc
    Dnext = tmd * fM + tid * fI + tdd * fD         # arrive in D at inserted col

    # row-scale corrections (f*b products): A-terms use fcum[i-1]+bcum[i],
    # fD/Dnext-terms use fcum[i]+bcum[i].  All are ~lk, so shift by lk.
    fcum_p = jnp.concatenate([np.array([-np.inf], np.float32), fcum[:-1]])
    cA = jnp.exp(jnp.clip(fcum_p + bcum - lk, -80.0, 80.0))[:, None]
    cB = jnp.exp(jnp.clip(fcum + bcum - lk, -80.0, 80.0))[:, None]
    cA = jnp.where(live_row, cA, 0.0)
    cB = jnp.where(live_row, cB, 0.0)

    # per-row query emission row: me[b, q[i-1]] for b=0..4 -> (Q+1, 5)
    qprev_char = jnp.concatenate([np.array([4], np.int8), q])  # q[i-1] at row i
    qp_oh = (qprev_char[:, None] ==
             np.arange(5, dtype=qprev_char.dtype)).astype(jnp.float32)
    em_q5 = qp_oh @ me.T                                         # (Q+1, 5)
    em_q5 = em_q5 * (rows >= 1)[:, None]
    em_q = em_q5[:, :4]

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
    sub_tab = jnp.concatenate([sub_tab, np.zeros((1, 4), np.float32)], axis=0)

    # --- deletion of t[j] (jc = j+1 < T): uses next column's b tables ---
    # rc_next[i,k] = r[jc] = r[off_i + k] = rcs[i, k+1] (edge fill 4 -> em 0)
    rc_next = _shl2(rcs, fill=4)
    rc_oh = (rc_next[..., None] ==
             np.arange(5, dtype=rc_next.dtype)).astype(jnp.float32)
    em_next = jnp.einsum("ikb,ib->ik", rc_oh, em_q5)  # me[rc_next, q[i-1]]
    del_term = em_next * A * bMn * cA + Dnew * bDn * cB
    del_col = colsum(del_term)                  # by jc
    del_tab = del_col[1:]
    del_tab = jnp.concatenate([del_tab, np.zeros((1,), np.float32)])
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
        jnp.where(np.arange(Tpad + 1) == t_len - 1, lk_del_last, ltable[:, 4]))

    # mask invalid positions
    pos = np.arange(Tpad + 1)
    neg = np.float32(-1e30)
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

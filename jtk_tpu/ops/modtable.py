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

Multi-length edits (kiley's NUM_ROW row set, ``pseudo_mcmc.rs:167-177``):

  del(t[j..j+d]), d=1..DEL_SIZE: same shape as del-1 but the backward tables
  and the replacement emission char shift by d columns — still closed-form.

  copy(t[j..j+c]), c=1..COPY_SIZE (tandem duplication, equivalent to
  inserting the segment t[j..j+c] after column j+c): the extension walks the
  c copied columns with a short M/D recursion seeded by Anext/Dnext,
  bucketed by the number of query chars consumed (so per-row rescaling stays
  exact: bucket u joins fcum[i-u] with bcum[i]).  c=1 is exact (it is an
  insertion of t[j]); for c>=2 query-insertion states *between* the copied
  columns are dropped — a deliberate approximation whose missing paths carry
  O(p_ins) mass; kiley recomputes these exactly, we trade that for a table
  that still comes from the single shared fwd/bwd pass.

All terms are elementwise in the shared banded (row, lane) layout (same band
offsets for forward and backward), then segment-summed per template column —
no per-edit DP re-runs.  Output layout: (Tpad+1, 14) with columns
[sub A,C,G,T | ins A,C,G,T | copy len 1..3 | del len 1..3] (kiley row
order); row j holds sub/del/copy at template position j and
ins-before-position j (so row Tpad alone can hold a trailing insertion).
"""

from __future__ import annotations

import functools
import logging

import jax
import jax.numpy as jnp
import numpy as np

logger = logging.getLogger(__name__)

from .phmm import EPS, PHMMParams, _emit_pad, backward_banded, forward_banded

COPY_SIZE = 3
DEL_SIZE = 3
NUM_EDIT = 8 + COPY_SIZE + DEL_SIZE  # 4 sub + 4 ins + copies + dels = 14


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
    lk, (fM, fI, fD), fcum, rcs = forward_banded(q, r, offsets, q_len, t_len,
                                                 params, W)
    (bM, bI, bD), bcum = backward_banded(q, r, offsets, q_len, t_len, params, W)
    return modification_table_from_tables(
        q, offsets, q_len, t_len, params, W, Tpad,
        lk, (fM, fI, fD), fcum, rcs, (bM, bI, bD), bcum)


def modification_table_from_tables(q, offsets, q_len, t_len,
                                   params: PHMMParams, W: int, Tpad: int,
                                   lk, f_tabs, fcum, rcs, b_tabs, bcum):
    """The closed-form edit-table assembly, given precomputed banded
    forward/backward tables (shared by the XLA-scan and Pallas engines)."""
    Q = q.shape[0]
    fM, fI, fD = f_tabs
    bM, bI, bD = b_tabs

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

    # Band-to-column reduction WITHOUT scatters (segment_sum lowers to
    # scatter-adds that serialize on TPU — they were ~90% of the fused
    # dispatch time).  Exploit the band structure: offsets are monotone
    # with unit increments, so rows sharing an offset are CONTIGUOUS:
    #   G[o, k] = sum_{i: offsets[i]=o} x[i, k]   (cumsum + boundary gather)
    #   out[j]  = sum_k G[j-k, k]                 (W static shifted adds)
    _pending_terms: list = []

    def colsum(x):
        # deferred: all terms flush through ONE cumsum/gather pass
        _pending_terms.append(x)
        return len(_pending_terms) - 1

    def _flush_colsums():
        T = len(_pending_terms)
        o_vals = jnp.arange(Tpad + 1)
        hi = jnp.searchsorted(offsets, o_vals, side="right")   # last+1
        lo = jnp.searchsorted(offsets, o_vals, side="left")    # first
        # term-axis grouping bounds the (Tpad+1, W, Tc) gather temps: the
        # vmapped batch keeps ~3 live copies, so cap a group's gather at
        # ~10 MB per pair (a 192-pair slice then peaks at ~6 GB)
        per_term = (Tpad + 1) * W * 4
        Tc = max(1, min(T, int(10e6) // per_term))
        outs = []
        for g0 in range(0, T, Tc):
            x = jnp.stack(_pending_terms[g0:g0 + Tc], axis=-1)
            x = jnp.where(valid[..., None], x, 0.0)
            C = jnp.cumsum(x, axis=0)                   # (Q+1, W, Tc)
            Cz = jnp.concatenate([jnp.zeros_like(C[:1]), C], axis=0)
            G = Cz[hi] - Cz[lo]                         # (Tpad+1, W, Tc)
            # D[j] = sum_k G[j-k, k]: log2(W) doubling levels — each merges
            # adjacent k-blocks with a row shift of the block width
            H, shift = G, 1
            while H.shape[1] > 1:
                if H.shape[1] % 2:
                    H = jnp.pad(H, ((0, 0), (0, 1), (0, 0)))
                odd = jnp.pad(H[:, 1::2], ((shift, 0), (0, 0), (0, 0)))
                H = H[:, 0::2] + odd[:Tpad + 1]
                shift *= 2
            outs.append(H[:, 0])
        out = jnp.concatenate(outs, axis=1)
        return [out[:, t] for t in range(T)]

    # --- substitutions: for each base b ---
    AbM = A * bM * cA            # (Q+1, W) without the emission factor
    fDbD_B = fD * bD * cB
    sub_cols = []
    for b in range(4):
        term = em_q[:, b:b + 1] * AbM
        sub_cols.append(colsum(term))
    sub_base = colsum(fDbD_B)
    # (table construction deferred until every colsum term is registered)

    # --- deletions of t[j..j+d], d = 1..DEL_SIZE (jc = j+1) ---
    def em_of(rc_codes):
        oh = (rc_codes[..., None] ==
              np.arange(5, dtype=rc_codes.dtype)).astype(jnp.float32)
        return jnp.einsum("ikb,ib->ik", oh, em_q5)   # me[rc, q[i-1]]

    del_tabs = []
    lk_del_last = []
    bM_d, bD_d, rc_d = bM, bD, rcs
    for d in range(1, DEL_SIZE + 1):
        bM_d = _shl2(bM_d)               # b tables at (i, jc+d)
        bD_d = _shl2(bD_d)
        rc_d = _shl2(rc_d, fill=4)       # r[jc+d-1] (char after the block)
        em_d = em_of(rc_d)
        term = em_d * A * bM_d * cA + Dnew * bD_d * cB
        del_tabs.append(colsum(term))    # by jc (handle; resolved at flush)
        # deleting a block that ends the template (j + d == t_len):
        # LK = f-sum at (q_len, t_len - d)
        k_last = jnp.clip(t_len - d - offsets[q_len], 0, W - 1)
        f_last = (fM[q_len, k_last] + fI[q_len, k_last] + fD[q_len, k_last])
        lk_del_last.append(jnp.log(f_last + EPS) + fcum[q_len])

    # --- insertion before position j (jc = j): paths through the new column ---
    DnB = Dnext * bD * cB
    ins_cols = []
    for b in range(4):
        term = em_q[:, b:b + 1] * Anext * bM * cA + 0.0
        ins_cols.append(colsum(term))
    ins_base = colsum(DnB)

    # --- copies of t[j..j+c], c = 1..COPY_SIZE (tandem dup; anchored at
    # column J = j+c, i.e. segment inserted after column J) ---
    # scale factor per consumed-query-chars bucket u: fcum[i-u] + bcum[i]
    cU = [cB, cA]
    fcum_u = fcum_p
    for _u in range(2, COPY_SIZE + 1):
        fcum_u = jnp.concatenate([np.array([-np.inf], np.float32),
                                  fcum_u[:-1]])
        cu = jnp.exp(jnp.clip(fcum_u + bcum - lk, -80.0, 80.0))[:, None]
        cU.append(jnp.where(live_row, cu, 0.0))

    def row_down(tab):
        """value at (i, k) = tab(i-1, k + s_i) (column-anchored row shift)."""
        prev = jnp.concatenate([zrow, tab[:-1]], 0)
        return _row_shift_unit(prev, one_col, False)

    copy_tabs = []
    for c in range(1, COPY_SIZE + 1):
        Mb: dict = {}
        Db: dict = {}
        for m in range(1, c + 1):
            # m-th copied char, anchored at column J: r[J - c + m - 1]
            rc_m = rcs
            for _ in range(c - m):
                rc_m = _shr2(rc_m, fill=4)
            em_m = em_of(rc_m)
            if m == 1:
                Mb = {1: em_m * Anext}
                Db = {0: Dnext}
            else:
                newM: dict = {}
                for u, tab in Mb.items():
                    newM[u + 1] = newM.get(u + 1, 0.0) + tmm * row_down(tab)
                for u, tab in Db.items():
                    newM[u + 1] = newM.get(u + 1, 0.0) + tdm * row_down(tab)
                newM = {u: em_m * tab for u, tab in newM.items()}
                newD = {u: tmd * Mb.get(u, 0.0) + tdd * Db.get(u, 0.0)
                        for u in set(Mb) | set(Db)}
                Mb, Db = newM, newD
        term = 0.0
        for u, tab in Mb.items():
            term = term + tab * bM * cU[u]
        for u, tab in Db.items():
            term = term + tab * bD * cU[u]
        copy_tabs.append(colsum(term))   # by jc = J = j + c

    cols = _flush_colsums()
    # sub table at position j corresponds to jc = j+1 -> shift by one
    sub_tab = jnp.stack([cols[h] for h in sub_cols], axis=1) \
        + cols[sub_base][:, None]
    sub_tab = jnp.concatenate([sub_tab[1:, :],
                               np.zeros((1, 4), np.float32)], axis=0)
    ins_tab = jnp.stack([cols[h] for h in ins_cols], axis=1) \
        + cols[ins_base][:, None]                     # by jc == j
    del_arrs = [jnp.concatenate([cols[h][1:], np.zeros((1,), np.float32)])
                for h in del_tabs]
    copy_arrs = [jnp.concatenate([cols[h][c + 1:],
                                  np.zeros((c + 1,), np.float32)])
                 for c, h in enumerate(copy_tabs)]
    table = jnp.concatenate(
        [sub_tab, ins_tab, jnp.stack(copy_arrs, 1), jnp.stack(del_arrs, 1)],
        axis=1)
    ltable = jnp.log(jnp.maximum(table, EPS)) + lk
    pos = np.arange(Tpad + 1)
    for d in range(1, DEL_SIZE + 1):
        colidx = 8 + COPY_SIZE + d - 1
        ltable = ltable.at[:, colidx].set(
            jnp.where(pos == t_len - d, lk_del_last[d - 1],
                      ltable[:, colidx]))

    # mask invalid positions
    neg = np.float32(-1e30)
    sub_ok = pos[:, None] < t_len
    ins_ok = pos[:, None] <= t_len
    copy_ok = jnp.concatenate(
        [pos[:, None] + c <= t_len for c in range(1, COPY_SIZE + 1)], axis=1)
    del_ok = jnp.concatenate(
        [pos[:, None] + d <= t_len for d in range(1, DEL_SIZE + 1)], axis=1)
    mask = jnp.concatenate(
        [jnp.repeat(sub_ok, 4, 1), jnp.repeat(ins_ok, 4, 1), copy_ok, del_ok],
        axis=1)
    ltable = jnp.where(mask, ltable, neg)
    return lk, ltable


modification_table_pileup = jax.jit(
    jax.vmap(modification_table, in_axes=(0, None, 0, 0, None, None, None, None)),
    static_argnames=("W", "Tpad"),
)


_table_assembly_batch = jax.jit(
    jax.vmap(modification_table_from_tables,
             in_axes=(0, 0, 0, 0, None, None, None,
                      0, (0, 0, 0), 0, 0, (0, 0, 0), 0)),
    static_argnames=("W", "Tpad"),
)

# per-pair parameter sets (strand-selected): params leaves carry a leading
# batch dim so reverse-strand rows are assembled with the reverse-strand
# transitions/emissions matching their fwd/bwd tables
_table_assembly_batch_perpair = jax.jit(
    jax.vmap(modification_table_from_tables,
             in_axes=(0, 0, 0, 0, 0, None, None,
                      0, (0, 0, 0), 0, 0, (0, 0, 0), 0)),
    static_argnames=("W", "Tpad"),
)

# scan engine with per-pair templates (cross-chunk batching)
modification_table_pairs = jax.jit(
    jax.vmap(modification_table,
             in_axes=(0, 0, 0, 0, 0, None, None, None)),
    static_argnames=("W", "Tpad"),
)


def modification_table_pairs_sharded(qs, tpl, offs, q_lens, t_lens, par,
                                     W: int, Tpad: int):
    """modification_table_pairs with the pair batch sharded over the
    ``data`` mesh axis (pads B up to a device multiple by repeating row 0;
    rows are independent, so results are bit-identical at any mesh size).
    The vmapped scan is pure GSPMD-friendly batching — sharding the inputs
    is all XLA needs to split it (SURVEY §2.5)."""
    from ..parallel import get_mesh, shard_leading
    mesh = get_mesh()
    B0 = qs.shape[0]
    if mesh is None or B0 == 0:
        return modification_table_pairs(qs, tpl, offs, q_lens, t_lens, par,
                                        W, Tpad)
    pad = (-B0) % mesh.size
    if pad:
        sl = np.concatenate([np.arange(B0), np.zeros(pad, np.int64)])
        qs, tpl, offs = qs[sl], tpl[sl], offs[sl]
        q_lens, t_lens = q_lens[sl], t_lens[sl]
    qs, tpl, offs, q_lens, t_lens = shard_leading(mesh, qs, tpl, offs,
                                                  q_lens, t_lens)
    lk, tab = modification_table_pairs(qs, tpl, offs, q_lens, t_lens, par,
                                       W, Tpad)
    return np.asarray(lk)[:B0], np.asarray(tab)[:B0]


def modification_table_pileup_sharded(qs, tpl, offs, q_lens, t_len, par,
                                      W: int, Tpad: int):
    """modification_table_pileup (one shared template) with the read batch
    sharded over ``data`` — see modification_table_pairs_sharded."""
    from ..parallel import get_mesh, replicate, shard_leading
    mesh = get_mesh()
    B0 = qs.shape[0]
    if mesh is None or B0 == 0:
        return modification_table_pileup(qs, tpl, offs, q_lens, t_len, par,
                                         W, Tpad)
    pad = (-B0) % mesh.size
    if pad:
        sl = np.concatenate([np.arange(B0), np.zeros(pad, np.int64)])
        qs, offs, q_lens = qs[sl], offs[sl], q_lens[sl]
    qs, offs, q_lens = shard_leading(mesh, qs, offs, q_lens)
    tpl, = replicate(mesh, np.asarray(tpl))
    lk, tab = modification_table_pileup(qs, tpl, offs, q_lens, t_len, par,
                                        W, Tpad)
    return np.asarray(lk)[:B0], np.asarray(tab)[:B0]


def use_pallas() -> bool:
    """Pallas engine switch: JTK_TPU_PALLAS=1/0 overrides; default on for a
    real TPU backend, off elsewhere (the XLA scan is the CPU reference)."""
    import os
    env = os.environ.get("JTK_TPU_PALLAS")
    if env is not None:
        return env not in ("0", "", "false")
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # noqa: BLE001
        return False


@functools.partial(jax.jit,
                   static_argnames=("W", "Q", "Tpad", "interpret"))
def _pallas_modtable_fused(prep, params, W: int, Q: int, Tpad: int,
                           interpret: bool):
    """One dispatch: both Pallas table passes + stitching + the closed-form
    edit-table assembly over the whole (padded) batch.

    The assembly uses per-pair strand-selected parameters (prep['strand']==1
    selects the second/reverse set), matching the strand-selected fwd/bwd
    tables `_tables_traced` produced — reverse-strand reads must NOT be
    scored with forward-strand transitions/emissions."""
    from .banded_align import _unpack2bit
    from .pallas_phmm import _tables_traced
    lk, f_tabs, fcum, rcs, b_tabs, bcum, offs = _tables_traced(
        prep, W, Q, interpret)
    qs_p = jnp.where(np.arange(Q) < prep["q_lens_p"][:, None],
                     _unpack2bit(prep["qs_packed"], Q), 4).astype(jnp.int8)
    sf = prep["strand"].astype(jnp.float32)[:, None, None]   # (B,1,1)
    params_b = PHMMParams(
        (1.0 - sf) * prep["trans"][:3, :3] + sf * prep["trans2"][:3, :3],
        (1.0 - sf) * prep["me8"][:4, :4] + sf * prep["me28"][:4, :4],
        (1.0 - sf) * prep["ie8"][:5, :4] + sf * prep["ie28"][:5, :4])
    lk2, tab = _table_assembly_batch_perpair(
        qs_p, offs, prep["q_lens_p"],
        prep["t_len"], params_b, W, Tpad,
        lk, f_tabs, fcum, rcs, b_tabs, bcum)
    return lk2, tab


def modification_table_pileup_pallas(qs, tpl, offs, q_lens, t_len, params,
                                     W: int, Tpad: int,
                                     interpret: bool = False,
                                     strands=None,
                                     params_rev=None,
                                     seg_ids=None, n_seg=None,
                                     sparse_k=None, min_gain=0.0,
                                     finish=True, defer=False):
    """Pallas-engine modification tables: the banded fwd/bwd wavefronts run
    in the fused VMEM-resident kernels (ops.pallas_phmm) streaming tables to
    HBM; the oracle-tested closed-form assembly then reads them — all in a
    single device dispatch.  Output matches modification_table_pileup.

    ``tpl`` may be one template (T,) with scalar ``t_len``, or per-pair
    templates (B, T) with a (B,) ``t_len`` vector (cross-chunk batching).

    With ``seg_ids`` + ``sparse_k``: returns (lk, SparseGains) — per-segment
    top-k (gain, position, edit) triples plus the count of positions above
    ``min_gain`` and the still-resident dense device array for the rare
    count>k fallback.  The dense totals never cross the link."""
    from .pallas_phmm import _prep_tables_inputs
    # Mosaic targets TPUs; anywhere else (tests, CPU golden runs) the
    # kernels execute in interpreter mode
    interpret = interpret or jax.default_backend() != "tpu"
    # lanes come in 128s: round the band UP to a lane multiple (the extra
    # lanes only add paths the narrow band clipped; Mosaic rejects sub-tile
    # or non-multiple widths like 64 or 192 with memref_slice errors)
    W = ((int(W) + 127) // 128) * 128
    tpl = np.asarray(tpl)
    if tpl.ndim == 1:
        tpl = tpl[:Tpad]
    else:
        tpl = tpl[:, :Tpad]
    qs = np.asarray(qs)
    offs = np.asarray(offs)
    q_lens = np.asarray(q_lens, np.int32)
    B_all = qs.shape[0]
    # cap the fused batch: the tables + assembly intermediates are
    # O(B * Q * W) in HBM, so the cap scales inversely with the band
    # (192 pairs fit at W<=256; W=384 OOMed — use 128 there)
    import os
    _cap = int(os.environ.get("JTK_TPU_MAXB", 192))
    MAXB = max(16, min(_cap, (_cap * 256 // W) // 8 * 8))
    # fixed-size slices, tail padded by repeating row 0: batch sizes land in
    # a handful of compiled shapes {8,16,32,64,128,MAXB} regardless of the
    # pileup (recompiles cost ~a minute on the tunneled TPU)
    if B_all > MAXB * 2 // 3:
        B_slice = MAXB
    else:
        B_slice = max(8, 1 << int(np.ceil(np.log2(max(B_all, 1)))))
    reduce = seg_ids is not None
    n_seg_b = _bucket_nseg(n_seg) if reduce else n_seg
    from ..parallel import get_mesh
    if reduce and get_mesh() is None and B_all > B_slice:
        # single-dispatch path: every slice rides one lax.scan'd jit
        from .pallas_phmm import _prep_tables_inputs
        preps, segs, n_reals = [], [], []
        Q = None
        for s in range(0, B_all, B_slice):
            e = min(B_all, s + B_slice)
            pad = B_slice - (e - s)
            sl = np.concatenate([np.arange(s, e), np.zeros(pad, np.int64)])
            tpl_s = tpl if tpl.ndim == 1 else tpl[sl]
            tl_s = t_len if np.ndim(t_len) == 0 else np.asarray(t_len)[sl]
            st_s = None if strands is None else np.asarray(strands)[sl]
            prep, B0, _Qp, Q, B = _prep_tables_inputs(
                qs[sl], tpl_s, offs[sl], q_lens[sl], tl_s, params,
                ((int(W) + 127) // 128) * 128,
                strands=st_s, params_rev=params_rev)
            seg_p = np.full(B, n_seg_b, np.int32)
            seg_p[:e - s] = np.asarray(seg_ids)[s:e]
            preps.append(prep)
            segs.append(seg_p)
            n_reals.append(e - s)
        # bound the per-dispatch scan length: one giant lax.scan (~100
        # slices at COX-class pileups) runs minutes inside a single XLA
        # program and trips the tunnel worker's deadline ("TPU worker
        # crashed").  Groups of SCAN_MAX keep a dispatch under ~10 s, and
        # ragged tails pad with a repeat of the last slice routed to the
        # dump segment.
        SCAN_MAX = 8
        Wr = ((int(W) + 127) // 128) * 128
        lk_handles, grp_S = [], []
        tot = None  # device-resident accumulator: dense totals stay on HBM
        for g0 in range(0, len(preps), SCAN_MAX):
            pg = preps[g0:g0 + SCAN_MAX]
            sg = segs[g0:g0 + SCAN_MAX]
            S = len(pg)
            # pad ragged tail groups to one stable compiled shape
            if g0 and S < SCAN_MAX:
                dump = np.full_like(sg[0], n_seg_b)
                while len(pg) < SCAN_MAX:
                    pg = pg + [pg[-1]]
                    sg = sg + [dump]
            stacked = {k: np.stack([p[k] for p in pg]) for k in pg[0]}
            lks_s, t = _fused_reduced_scan(stacked, np.stack(sg), Wr, Q,
                                           Tpad, interpret, n_seg_b)
            if not defer:
                # per-group sync: bounds how many enqueued programs the
                # backend holds at once (all-async OOMed HBM at ~8k pairs)
                lks_s = np.asarray(lks_s)
            lk_handles.append(lks_s)
            grp_S.append(S)
            tot = t if tot is None else jnp.add(tot, t)

        def collect_lk():
            parts = (jax.device_get(lk_handles) if defer else lk_handles)
            lk_parts = []
            for arr, S in zip(parts, grp_S):
                lk_parts.extend(np.asarray(arr)[:S])
            return np.concatenate([lk_parts[i][:n]
                                   for i, n in enumerate(n_reals)])

        if not finish:
            if defer:  # device-resident tot; lks fetched by the caller
                return collect_lk, tot
            return collect_lk(), tot
        return collect_lk(), _finish_gains(tot, n_seg, sparse_k, min_gain)
    lks, tabs = [], []
    totals = None
    for s in range(0, B_all, B_slice):
        e = min(B_all, s + B_slice)
        pad = B_slice - (e - s)
        sl = np.concatenate([np.arange(s, e),
                             np.zeros(pad, np.int64)])
        tpl_s = tpl if tpl.ndim == 1 else tpl[sl]
        tl_s = t_len if np.ndim(t_len) == 0 else np.asarray(t_len)[sl]
        st_s = None if strands is None else np.asarray(strands)[sl]
        seg_s = None
        if reduce:
            # padding rows repeat row 0's DATA but must not pollute its
            # segment — they point at the dump segment instead
            seg_s = np.concatenate([np.asarray(seg_ids)[s:e],
                                    np.full(pad, n_seg_b, np.int64)])
        lk, tab = _pileup_pallas_exact(
            qs[sl], tpl_s, offs[sl], q_lens[sl], tl_s, params, W,
            Tpad, interpret, st_s, params_rev, seg_ids=seg_s, n_seg=n_seg_b)
        if not defer:  # per-slice sync (see the scan path)
            lk = np.asarray(lk)
        lks.append((lk, e - s))
        if reduce:
            totals = tab if totals is None else jnp.add(totals, tab)
        else:
            tabs.append(np.asarray(tab)[:e - s])

    def collect_lk():
        parts = ([h for h, _n in lks] if not defer
                 else jax.device_get([h for h, _n in lks]))
        return np.concatenate([np.asarray(a)[:n]
                               for a, (_h, n) in zip(parts, lks)])

    if reduce:
        if not finish:
            if defer:
                return collect_lk, totals
            return collect_lk(), totals
        return collect_lk(), _finish_gains(totals, n_seg, sparse_k,
                                           min_gain)
    return collect_lk(), np.concatenate(tabs)


class SparseGains:
    """Top-k edit-gain candidates per template (host arrays, desc by gain)
    with a device-resident dense fallback for templates whose above-min_gain
    candidate count exceeds k (then ``dense_row(i)`` pays the full fetch for
    that row only)."""

    def __init__(self, vals, idx, ev, counts, dense_dev):
        self.vals = vals
        self.idx = idx
        self.ev = ev
        self.counts = counts
        self._dense_dev = dense_dev

    @property
    def k(self):
        return self.vals.shape[1]

    def dense_row(self, i):
        return np.asarray(self._dense_dev[i], np.float64)


def finish_gains(tot_dev, n_seg, sparse_k, min_gain):
    """Materialize accumulated device gain totals (e.g. summed across the
    band-bucketed calls of ``modification_table_pileup_pallas(finish=False)``):
    dense, or as SparseGains when ``sparse_k`` is set."""
    return _finish_gains(tot_dev, n_seg, sparse_k, min_gain)


def _finish_gains(tot_dev, n_seg, sparse_k, min_gain):
    """Materialize the accumulated device totals: dense (exact previous
    behaviour) or as SparseGains."""
    if sparse_k is None:
        return np.asarray(tot_dev, np.float64)[:n_seg]
    vals, idx, ev, counts = _topk_gain(tot_dev, np.float32(min_gain),
                                       int(sparse_k))
    return SparseGains(np.asarray(vals)[:n_seg], np.asarray(idx)[:n_seg],
                       np.asarray(ev)[:n_seg], np.asarray(counts)[:n_seg],
                       tot_dev)


_PREP_BATCH_KEYS = ("qs_packed", "r_packed", "shifts", "off0", "q_lens_p",
                    "t_len", "strand")


def _bucket_nseg(n: int) -> int:
    """Segment-count bucket for the fused reduced/stats paths.  n_seg is a
    STATIC jit arg, so every distinct template count would otherwise compile
    its own scan program (~minutes each on the tunneled TPU) — at 1 Mb scale
    polish rounds shrink the active-template set every round and the stats
    groups split arbitrarily, so raw counts almost never repeat.  POWER-OF-
    TWO buckets (from 8) keep the compile space tiny and STABLE as the
    chunk set drifts across a run (413 -> 409 -> ... all land on 512);
    padding rows land in unused segments sliced off host-side — the dense
    totals stay device-resident, so the waste is HBM rows, not transfer."""
    b = 8
    while b < n:
        b *= 2
    return b


def _segsum_matmul(x, seg, n_rows: int):
    """Segment sum over the leading axis as a one-hot MATMUL: segment_sum
    lowers to scatter-adds that serialize on TPU (they were ~40% of the
    fused slice and ~2/3 of the stats slice); a (n_rows, B) one-hot times
    the flattened batch rides the MXU and reads the operand once."""
    B = x.shape[0]
    oh = (jnp.asarray(seg)[None, :] ==
          jnp.arange(n_rows)[:, None]).astype(jnp.float32)
    flat = x.reshape(B, -1)
    out = jax.lax.dot(oh, flat, precision=jax.lax.Precision.HIGHEST)
    return out.reshape((n_rows,) + x.shape[1:])


def _gain_segments(lk, tab, seg, n_seg: int):
    """Per-pair gain (tab - lk, masked entries pinned at -1e30) reduced into
    per-template totals ON DEVICE — the (B, Tpad+1, NUM_EDIT) table never
    crosses the host link (23 MB per 192-pair slice on the tunnel; the
    totals are n_tpl/B of that).  Segment n_seg is the dump row for padding
    pairs."""
    gain = jnp.where(tab < jnp.float32(-1e29), jnp.float32(-1e30),
                     tab - lk[:, None, None])
    tot = _segsum_matmul(gain, seg, n_seg + 1)
    return lk, tot[:n_seg]


@functools.partial(jax.jit,
                   static_argnames=("W", "Q", "Tpad", "interpret", "n_seg"))
def _pallas_modtable_fused_reduced(prep, seg, W: int, Q: int, Tpad: int,
                                   interpret: bool, n_seg: int):
    lk, tab = _pallas_modtable_fused(prep, None, W, Q, Tpad, interpret)
    return _gain_segments(lk, tab, seg, n_seg)


@functools.partial(jax.jit, static_argnames=("k",))
def _topk_gain(tot, min_gain, k: int):
    """Per-template top-k edit candidates from the device-resident gain
    totals: (vals desc, position idx, edit code, count of positions whose
    best gain clears ``min_gain``).  Only O(n_seg * k) crosses the host
    link instead of the dense (n_seg, Tpad+1, NUM_EDIT) table — on the
    tunneled TPU the dense fetch (50+ MB per polish round at 1 Mb scale)
    dominated consensus wall-clock.  choose_edits only ever inspects
    positions above min_gain in descending-gain order, so when count <= k
    the sparse fetch is exact (lax.top_k ties break to the lower index)."""
    best_g = jnp.max(tot, axis=-1)                       # (n_seg, Tpad+1)
    best_e = jnp.argmax(tot, axis=-1).astype(jnp.int32)
    kk = min(k, best_g.shape[-1])
    vals, idx = jax.lax.top_k(best_g, kk)
    ev = jnp.take_along_axis(best_e, idx, axis=1)
    counts = jnp.sum(best_g > min_gain, axis=-1).astype(jnp.int32)
    return vals, idx.astype(jnp.int32), ev, counts


POS_THR_DEV = 1e-5  # == ops.cluster.POS_THR (variant-support threshold)


def _compressed_prof(tab, lk, seg, exp_mat):
    """Per-pair gain profile and its small-gain-compressed form (masked
    entries -> 0; |gain| below half the homopolymer-conditioned expectation
    -> 0; compress_small_gains, pseudo_mcmc.rs:141-165)."""
    prof = jnp.where(tab < jnp.float32(-1e29), 0.0,
                     tab - lk[:, None, None])
    comp = jnp.where(jnp.abs(prof) < 0.5 * exp_mat[seg], 0.0, prof)
    return prof, comp


@functools.partial(jax.jit,
                   static_argnames=("W", "Q", "Tpad", "interpret", "n_seg"))
def _pallas_modtable_fused_stats(prep, seg, exp_mat, fwd, W: int, Q: int,
                                 Tpad: int, interpret: bool, n_seg: int):
    """Fused modtable + per-template VARIANT STATS, reduced on device.

    Returns (lk (B,), stats (n_seg, Tpad+1, NUM_EDIT, 6), tab) where the
    stats planes are [support count, supported gain total, strand/sign
    contingency (rev-,rev+,fwd-,fwd+)] — everything filter_variants needs
    except the per-read candidate columns, which a later `_gather_prof_cols`
    call fetches from the still-resident ``tab``.  ``fwd`` is 1.0 for
    forward-strand rows; ``exp_mat`` rows are per SEGMENT (+1 dump row)."""
    lk, tab = _pallas_modtable_fused(prep, None, W, Q, Tpad, interpret)
    prof, comp = _compressed_prof(tab, lk, seg, exp_mat)
    pos = comp > POS_THR_DEV
    nz = jnp.abs(comp) > 1e-4
    sgn = comp > 0.0
    f = fwd[:, None, None] > 0.5
    planes = jnp.stack([
        pos.astype(jnp.float32),
        jnp.where(pos, comp, 0.0),
        (nz & ~f & ~sgn).astype(jnp.float32),
        (nz & ~f & sgn).astype(jnp.float32),
        (nz & f & ~sgn).astype(jnp.float32),
        (nz & f & sgn).astype(jnp.float32),
    ], axis=-1)
    stats = _segsum_matmul(planes, seg, n_seg + 1)
    return lk, stats[:n_seg], tab


@functools.partial(jax.jit, static_argnames=())
def _gather_prof_cols(tab, lk, seg, exp_mat, cols):
    """(B, n_cols) raw and compressed profile values at flat columns
    ``cols`` (index into the (Tpad+1)*NUM_EDIT flattened table)."""
    prof, comp = _compressed_prof(tab, lk, seg, exp_mat)
    B = tab.shape[0]
    return (prof.reshape(B, -1)[:, cols], comp.reshape(B, -1)[:, cols])


@functools.partial(jax.jit,
                   static_argnames=("W", "Q", "Tpad", "interpret", "n_seg"))
def _fused_reduced_scan(preps, segs, W: int, Q: int, Tpad: int,
                        interpret: bool, n_seg: int):
    """All MAXB slices in ONE dispatch: lax.scan over stacked slice preps,
    accumulating the per-segment gain totals.  Kernel intermediates (the
    O(B·Q·W) fwd/bwd tables) are live for one slice at a time, so the HBM
    cap that forces MAXB still holds — but the tunnel RPC floor is paid
    once instead of per slice."""
    def body(carry, xs):
        prep, seg = xs
        lk, tab = _pallas_modtable_fused(prep, None, W, Q, Tpad, interpret)
        lk2, tot = _gain_segments(lk, tab, seg, n_seg)
        return carry + tot, lk2

    tot0 = jnp.zeros((n_seg, Tpad + 1, NUM_EDIT), jnp.float32)
    tot, lks = jax.lax.scan(body, tot0, (preps, segs))
    return lks, tot


@functools.partial(jax.jit,
                   static_argnames=("W", "Q", "Tpad", "interpret", "n_seg"))
def _fused_stats_scan(preps, segs, exp_mat, fwds, W: int, Q: int, Tpad: int,
                      interpret: bool, n_seg: int):
    """Scanned variant-stats: one dispatch for every slice; the per-slice
    tabs are stacked (still device-resident) for the later column gather."""
    def body(carry, xs):
        prep, seg, fwd = xs
        lk, st, tab = _pallas_modtable_fused_stats(prep, seg, exp_mat, fwd,
                                                   W, Q, Tpad, interpret,
                                                   n_seg)
        return carry + st, (lk, tab)

    st0 = jnp.zeros((n_seg, Tpad + 1, NUM_EDIT, 6), jnp.float32)
    stats, (lks, tabs) = jax.lax.scan(body, st0, (preps, segs, fwds))
    return lks, stats, tabs


@functools.lru_cache(maxsize=32)
def _fused_sharded_reduced_fn(mesh_key, W: int, Q: int, Tpad: int,
                              interpret: bool, ranks, n_seg: int):
    """Sharded fused modtable + in-jit per-template gain reduction: each
    device reduces its own pair rows, XLA inserts the cross-device sum."""
    from jax.sharding import PartitionSpec as P
    mesh = _MESHES[mesh_key]
    in_specs = {k: P("data", *([None] * (r - 1))) if k in _PREP_BATCH_KEYS
                else P() for k, r in ranks}
    fn = functools.partial(_pallas_modtable_fused, params=None, W=W, Q=Q,
                           Tpad=Tpad, interpret=interpret)
    sm = jax.shard_map(fn, mesh=mesh, in_specs=(in_specs,),
                       out_specs=(P("data"), P("data", None, None)),
                       check_vma=False)

    def reduced(prep, seg):
        lk, tab = sm(prep)
        return _gain_segments(lk, tab, seg, n_seg)

    return jax.jit(reduced)


@functools.lru_cache(maxsize=32)
def _fused_sharded_fn(mesh_key, W: int, Q: int, Tpad: int, interpret: bool,
                      ranks):
    """shard_map-wrapped fused modtable: pair rows split over ``data``, the
    tiny parameter tables replicated.  Pallas calls are opaque to GSPMD, so
    the split must be explicit — each device runs the kernels on its own
    B/n_devices slice of the pileup (SURVEY §2.5/§5.8: the TPU counterpart
    of the reference's rayon pool over local_clustering pileups,
    local_clustering/mod.rs:64-72)."""
    from jax.sharding import PartitionSpec as P
    mesh = _MESHES[mesh_key]
    in_specs = {k: P("data", *([None] * (r - 1))) if k in _PREP_BATCH_KEYS
                else P() for k, r in ranks}
    fn = functools.partial(_pallas_modtable_fused, params=None, W=W, Q=Q,
                           Tpad=Tpad, interpret=interpret)
    # check_vma=False: pallas_call outputs carry no varying-mesh-axes
    # annotation, which the default check rejects
    return jax.jit(jax.shard_map(fn, mesh=mesh, in_specs=(in_specs,),
                                 out_specs=(P("data"), P("data", None, None)),
                                 check_vma=False))


_MESHES: dict = {}


def modtable_pileup_stats_pallas(qs, tpl, offs, q_lens, t_len, params,
                                 W: int, Tpad: int, strands, params_rev,
                                 seg_ids, n_seg: int, exp_mat,
                                 interpret: bool = False,
                                 defer: bool = False):
    """Variant-stats flavour of modification_table_pileup_pallas: one fused
    dispatch per MAXB slice computes the modtables AND reduces them to
    per-template variant statistics on device; the per-pair tables stay
    resident so candidate columns can be fetched afterwards without ever
    shipping the full (B, Tpad+1, NUM_EDIT) block over the host link.

    Returns (lks (B,), stats (n_seg, Tpad+1, NUM_EDIT, 6),
    gather(flat_cols) -> (raw (B, U), comp (B, U))).
    stats planes: [support count, supported gain, rev-, rev+, fwd-, fwd+].

    With ``defer=True`` returns (collect, gather) where ``collect()`` ->
    (lks, stats): the device work is dispatched (async) but NOT waited on,
    so a caller looping over band buckets can enqueue every bucket before
    paying any round-trip — on the tunneled link a tiny tail bucket's RPC
    floor otherwise serializes behind the main bucket's compute.
    """
    from .pallas_phmm import _prep_tables_inputs
    interpret = interpret or jax.default_backend() != "tpu"
    W = ((int(W) + 127) // 128) * 128
    tpl = np.asarray(tpl)
    tpl = tpl[:Tpad] if tpl.ndim == 1 else tpl[:, :Tpad]
    qs = np.asarray(qs)
    offs = np.asarray(offs)
    q_lens = np.asarray(q_lens, np.int32)
    seg_ids = np.asarray(seg_ids, np.int64)
    B_all = qs.shape[0]
    import os
    _cap = int(os.environ.get("JTK_TPU_MAXB", 192))
    MAXB = max(16, min(_cap, (_cap * 256 // W) // 8 * 8))
    if B_all > MAXB * 2 // 3:
        B_slice = MAXB
    else:
        B_slice = max(8, 1 << int(np.ceil(np.log2(max(B_all, 1)))))
    import time as _time
    _t0 = _time.time()
    n_seg_b = _bucket_nseg(n_seg)
    exp_pad = np.concatenate(  # pad segments + 1 dump row for padding pairs
        [np.asarray(exp_mat, np.float32),
         np.zeros((n_seg_b - n_seg + 1,) + np.shape(exp_mat)[1:],
                  np.float32)])
    preps, segs, fwds, n_reals = [], [], [], []
    Q = None
    for s in range(0, B_all, B_slice):
        e = min(B_all, s + B_slice)
        pad = B_slice - (e - s)
        sl = np.concatenate([np.arange(s, e), np.zeros(pad, np.int64)])
        tpl_s = tpl if tpl.ndim == 1 else tpl[sl]
        tl_s = t_len if np.ndim(t_len) == 0 else np.asarray(t_len)[sl]
        st_s = None if strands is None else np.asarray(strands)[sl]
        seg_s = np.concatenate([seg_ids[s:e],
                                np.full(pad, n_seg_b, np.int64)])
        prep, B0, _Qpad, Q, B = _prep_tables_inputs(
            qs[sl], tpl_s, offs[sl], q_lens[sl], tl_s, params, W,
            strands=st_s, params_rev=params_rev)
        seg_p = np.full(B, n_seg_b, np.int32)
        seg_p[:B0] = seg_s
        fwd_p = np.ones(B, np.float32)
        if st_s is not None:
            fwd_p[:B0] = np.asarray(st_s, bool).astype(np.float32)
        preps.append(prep)
        segs.append(seg_p)
        fwds.append(fwd_p)
        n_reals.append(e - s)
    # dispatch every slice/group WITHOUT waiting on results; ``collect``
    # materializes them in one blocking fetch
    tabs, lk_d, seg_d, grp_sizes = [], [], [], []
    st_parts, lk_parts_h = [], []  # host (eager) or device (defer) handles
    if len(preps) == 1:
        lk, st_out, tab = _pallas_modtable_fused_stats(
            preps[0], segs[0], exp_pad, fwds[0], W, Q, Tpad, interpret,
            n_seg_b)
        if not defer:
            st_out, lk_h = np.asarray(st_out), np.asarray(lk)
        else:
            lk_h = lk
        st_parts.append(st_out)
        lk_parts_h.append(lk_h[None] if lk_h.ndim == 1 else lk_h)
        tabs, lk_d, seg_d = [tab[None]], [lk[None]], [segs[0][None]]
        grp_sizes = [1]
    else:
        # grouped scans (see the reduced path: one giant scan trips the
        # tunnel worker's deadline)
        SCAN_MAX = 8
        for g0 in range(0, len(preps), SCAN_MAX):
            pg = preps[g0:g0 + SCAN_MAX]
            sg = segs[g0:g0 + SCAN_MAX]
            fg = fwds[g0:g0 + SCAN_MAX]
            S = len(pg)
            if g0 and S < SCAN_MAX:
                dump = np.full_like(sg[0], n_seg_b)
                while len(pg) < SCAN_MAX:
                    pg = pg + [pg[-1]]
                    sg = sg + [dump]
                    fg = fg + [fg[-1]]
            stacked = {k: np.stack([p[k] for p in pg]) for k in pg[0]}
            lkg, st_out, tabg = _fused_stats_scan(
                stacked, np.stack(sg), exp_pad, np.stack(fg), W, Q, Tpad,
                interpret, n_seg_b)
            if not defer:
                # per-group sync: bounds enqueued-program buffers (the
                # all-async variant OOMed HBM at ~8k-pair stats passes)
                st_out, lkg_h = np.asarray(st_out), np.asarray(lkg)
            else:
                lkg_h = lkg
            st_parts.append(st_out)
            lk_parts_h.append(lkg_h)
            tabs.append(tabg)
            lk_d.append(lkg)
            seg_d.append(np.stack(sg))
            grp_sizes.append(S)
    _t_disp = _time.time() - _t0

    def collect():
        if defer:
            fetched = jax.device_get([st_parts, lk_parts_h])
        else:
            fetched = (st_parts, lk_parts_h)
        stats = None
        lk_parts = []
        for st_np, lkg_np, S in zip(fetched[0], fetched[1], grp_sizes):
            t = np.asarray(st_np, np.float64)[:n_seg]
            stats = t if stats is None else stats + t
            lk_parts.extend(np.asarray(lkg_np)[:S])
        lks = np.concatenate([lk_parts[i][:n]
                              for i, n in enumerate(n_reals)])
        logger.info("modtable stats: %d pairs, %d slices, W=%d Q=%d "
                    "n_seg=%d->%d dispatch %.1fs total %.1fs", B_all,
                    len(preps), W, Q, n_seg, n_seg_b, _t_disp,
                    _time.time() - _t0)
        return lks, stats

    Bs = preps[0]["q_lens_p"].shape[0]

    def gather(flat_cols):
        cols = np.asarray(flat_cols, np.int64)
        U = ((len(cols) + 127) // 128) * 128
        cols_p = np.concatenate([cols, np.zeros(U - len(cols), np.int64)])
        raws, comps = [], []
        slice_i = 0  # global real-slice counter across groups
        for tabg, lkg, segg, S in zip(tabs, lk_d, seg_d, grp_sizes):
            r, c = _gather_prof_cols(
                jnp.reshape(tabg, (-1,) + tuple(tabg.shape[2:])),
                jnp.reshape(lkg, (-1,)),
                np.reshape(segg, -1), exp_pad, cols_p)
            r, c = np.asarray(r), np.asarray(c)
            rows = np.concatenate(
                [k * Bs + np.arange(n_reals[slice_i + k])
                 for k in range(S)])
            slice_i += S
            raws.append(r[rows][:, :len(cols)])
            comps.append(c[rows][:, :len(cols)])
        return np.concatenate(raws), np.concatenate(comps)

    if defer:
        return collect, gather
    lks, stats = collect()
    return lks, stats, gather


def _pileup_pallas_exact(qs, tpl, offs, q_lens, t_len, params, W, Tpad,
                         interpret, strands, params_rev,
                         seg_ids=None, n_seg=None):
    """seg_ids/n_seg: when given, returns (lk[:B0], per-segment gain totals)
    instead of (lk[:B0], per-pair tables) — the reduction runs on device."""
    from .pallas_phmm import SUB, _prep_tables_inputs
    prep, B0, _Qpad, Q, B = _prep_tables_inputs(
        qs, tpl, offs, q_lens, t_len, params, W,
        strands=strands, params_rev=params_rev)
    from ..parallel import get_mesh
    mesh = get_mesh()
    reduce = seg_ids is not None
    if reduce:
        seg = np.full(B, n_seg, np.int32)
        seg[:B0] = seg_ids
    if mesh is not None and B % (mesh.size * SUB) == 0:
        key = id(mesh)
        _MESHES[key] = mesh
        ranks = tuple(sorted((k, np.ndim(v)) for k, v in prep.items()))
        if reduce:
            fn = _fused_sharded_reduced_fn(key, W, Q, Tpad, interpret, ranks,
                                           n_seg)
            lk, out = fn(prep, seg)
            return lk[:B0], out
        fn = _fused_sharded_fn(key, W, Q, Tpad, interpret, ranks)
        lk, tab = fn(prep)
        return lk[:B0], tab[:B0]
    if reduce:
        lk, out = _pallas_modtable_fused_reduced(prep, seg, W, Q, Tpad,
                                                 interpret, n_seg)
        return lk[:B0], out
    lk, tab = _pallas_modtable_fused(prep, params, W, Q, Tpad, interpret)
    return lk[:B0], tab[:B0]

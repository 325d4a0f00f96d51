"""K1 — banded pair-HMM forward/backward (device kernel).

Replaces the reference's kiley pair-HMM kernels
(``PairHiddenMarkovModel(OnStrands)::likelihood_antidiagonal_bootstrap`` etc.,
SURVEY.md §2.4): 3-state (Match/Ins/Del) conditional pair-HMM over
(template=chunk, query=read), banded around the guide diagonal.

TPU-native design:
  * Row wavefront over the query; the band (width ``W``) is the vector lane
    dimension.  Probability space with per-row rescaling (no per-cell log/exp),
    log scale factors accumulated on the side — the standard production
    pair-HMM trick; f32 throughout.
  * The within-row Del-state dependency ``D[j] = c[j] + t_dd * D[j-1]`` is a
    first-order linear recurrence solved by ``lax.associative_scan`` (O(log W)
    depth per row), forward and (flipped) backward.
  * Static shapes: sequences padded, lengths traced, rows past ``q_len``
    frozen so the final row is the carry.

Parameter layout mirrors ``definitions/src/lib.rs:95-125``: transitions 3x3,
``mat_emit[ref, query]`` (4,4), ``ins_emit[prev_query_or_start, query]`` (5,4).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

EPS = 1e-30


class PHMMParams(NamedTuple):
    trans: jnp.ndarray     # (3,3) f32 [from, to]; states M=0, I=1, D=2
    mat_emit: jnp.ndarray  # (4,4) f32 [ref, query]
    ins_emit: jnp.ndarray  # (5,4) f32 [prev query base (4=start), query]

    @classmethod
    def from_hmmparam(cls, hp) -> "PHMMParams":
        t = jnp.array(
            [[hp.mat_mat, hp.mat_ins, hp.mat_del],
             [hp.ins_mat, hp.ins_ins, hp.ins_del],
             [hp.del_mat, hp.del_ins, hp.del_del]], dtype=jnp.float32)
        me = jnp.array(hp.mat_emit, dtype=jnp.float32).reshape(4, 4)
        ie = jnp.array(hp.ins_emit, dtype=jnp.float32).reshape(5, 4)
        return cls(t, me, ie)

    @classmethod
    def default(cls) -> "PHMMParams":
        from ..datamodel import HMMParam
        return cls.from_hmmparam(HMMParam())


def _emit_pad(p: PHMMParams):
    """Emission tables padded so code 4 (N/pad) is a safe index (prob 0)."""
    me = jnp.zeros((5, 5), jnp.float32).at[:4, :4].set(p.mat_emit)
    ie = jnp.zeros((5, 5), jnp.float32).at[:, :4].set(
        jnp.concatenate([p.ins_emit, jnp.zeros((0, 4))], axis=0))
    return me, ie


def _linrec(c, a):
    """Solve y[k] = c[k] + a * y[k-1], y[-1] = 0, along the last axis."""
    av = jnp.full_like(c, a)
    def comb(x, y):
        a1, b1 = x
        a2, b2 = y
        return a1 * a2, a2 * b1 + b2
    _, y = jax.lax.associative_scan(comb, (av, c), axis=-1)
    return y


def _linrec_rev(c, a):
    """Solve y[k] = c[k] + a * y[k+1], y[W] = 0."""
    return jnp.flip(_linrec(jnp.flip(c, -1), a), -1)


def _shift(v, idx, W):
    ok = (idx >= 0) & (idx < W)
    return jnp.where(ok, v[jnp.clip(idx, 0, W - 1)], 0.0)


@functools.partial(jax.jit, static_argnames=("W",))
def forward_banded(q, r, offsets, q_len, t_len, params: PHMMParams, W: int):
    """Banded forward pass.

    Returns (lk, (Ms, Is, Ds), fcum) where the tables are (Q+1, W) row-scaled
    and ``fcum`` (Q+1,) are cumulative log scales; true f(i,j) =
    table[i, j-off[i]] * exp(fcum[i]).  ``lk`` = total log-likelihood
    Pr(q | r) ending at (q_len, t_len) in any state.
    """
    Q = q.shape[0]
    T = r.shape[0]
    ks = jnp.arange(W, dtype=jnp.int32)
    me, ie = _emit_pad(params)
    t = params.trans
    tmm, tmi, tmd = t[0, 0], t[0, 1], t[0, 2]
    tim, tii, tid = t[1, 0], t[1, 1], t[1, 2]
    tdm, tdi, tdd = t[2, 0], t[2, 1], t[2, 2]

    # row 0: start in M at (0,0); D chain along the row.
    j0 = offsets[0] + ks
    M0 = jnp.where(j0 == 0, 1.0, 0.0)
    I0 = jnp.zeros(W)
    c0 = tmd * _shift(M0, ks - 1, W)
    D0 = _linrec(c0, tdd)
    D0 = jnp.where((j0 >= 1) & (j0 <= t_len), D0, 0.0)
    s0 = jnp.sum(M0 + I0 + D0) + EPS
    M0, I0, D0 = M0 / s0, I0 / s0, D0 / s0
    ls0 = jnp.log(s0)

    def step(carry, inp):
        Mp, Ip, Dp = carry
        qc, qprev, off_prev, off_cur, i = inp
        s = off_cur - off_prev
        Md = _shift(Mp, ks + s - 1, W)
        Id = _shift(Ip, ks + s - 1, W)
        Dd = _shift(Dp, ks + s - 1, W)
        Mu = _shift(Mp, ks + s, W)
        Iu = _shift(Ip, ks + s, W)
        Du = _shift(Dp, ks + s, W)
        j = off_cur + ks
        rc = r[jnp.clip(j - 1, 0, T - 1)]
        em = me[rc, qc]
        em = jnp.where((j >= 1) & (j <= t_len), em, 0.0)
        Mrow = em * (tmm * Md + tim * Id + tdm * Dd)
        ei = ie[qprev, qc]
        Irow = ei * (tmi * Mu + tii * Iu + tdi * Du)
        Irow = jnp.where(j <= t_len, Irow, 0.0)
        c = tmd * _shift(Mrow, ks - 1, W) + tid * _shift(Irow, ks - 1, W)
        Drow = _linrec(c, tdd)
        Drow = jnp.where((j >= 1) & (j <= t_len), Drow, 0.0)
        sc = jnp.sum(Mrow + Irow + Drow) + EPS
        Mrow, Irow, Drow = Mrow / sc, Irow / sc, Drow / sc
        ls = jnp.log(sc)
        live = i <= q_len
        Mrow = jnp.where(live, Mrow, Mp)
        Irow = jnp.where(live, Irow, Ip)
        Drow = jnp.where(live, Drow, Dp)
        ls = jnp.where(live, ls, 0.0)
        return (Mrow, Irow, Drow), (Mrow, Irow, Drow, ls)

    ii = jnp.arange(1, Q + 1, dtype=jnp.int32)
    qprev = jnp.concatenate([jnp.array([4], jnp.int8), q[:-1]])
    (Mf, If, Df), (Ms, Is, Ds, lss) = jax.lax.scan(
        step, (M0, I0, D0), (q, qprev, offsets[:-1], offsets[1:], ii))
    Ms = jnp.concatenate([M0[None], Ms], 0)
    Is = jnp.concatenate([I0[None], Is], 0)
    Ds = jnp.concatenate([D0[None], Ds], 0)
    lss = jnp.concatenate([ls0[None], lss], 0)
    fcum = jnp.cumsum(lss)
    k_end = jnp.clip(t_len - offsets[q_len], 0, W - 1)
    fin = Mf[k_end] + If[k_end] + Df[k_end]
    lk = jnp.log(fin + EPS) + fcum[q_len]
    return lk, (Ms, Is, Ds), fcum


@functools.partial(jax.jit, static_argnames=("W",))
def backward_banded(q, r, offsets, q_len, t_len, params: PHMMParams, W: int):
    """Banded backward pass with the same band offsets as forward.

    Returns ((bM, bI, bD), bcum): true b(i,j) = table[i, j-off[i]] *
    exp(bcum[i]); b(i,j,s) = Pr(q[i+1..], t[j+1..] | state s at (i,j)).
    """
    Q = q.shape[0]
    T = r.shape[0]
    ks = jnp.arange(W, dtype=jnp.int32)
    me, ie = _emit_pad(params)
    t = params.trans
    tmm, tmi, tmd = t[0, 0], t[0, 1], t[0, 2]
    tim, tii, tid = t[1, 0], t[1, 1], t[1, 2]
    tdm, tdi, tdd = t[2, 0], t[2, 1], t[2, 2]

    # init: row q_len (no query left).  bD chain: bD[Q,j] = tdd*bD[Q,j+1],
    # bD[Q,t_len]=1; bM/bI via one D step; all states 1 at j == t_len.
    offQ = offsets[q_len]
    jQ = offQ + ks
    cQ = jnp.where(jQ == t_len, 1.0, 0.0)
    # y[k] = c[k] + tdd*y[k+1]  gives bD with bD[t_len] = 1 (since c there =1)
    bD_init = _linrec_rev(cQ, tdd)
    bD_next = _shift(bD_init, ks + 1, W)  # bD[Q, j+1]
    bM_init = jnp.where(jQ == t_len, 1.0, tmd * bD_next)
    bI_init = jnp.where(jQ == t_len, 1.0, tid * bD_next)
    valid = jQ <= t_len
    bM_init = jnp.where(valid, bM_init, 0.0)
    bI_init = jnp.where(valid, bI_init, 0.0)
    bD_init = jnp.where(valid, bD_init, 0.0)
    sI = jnp.max(bM_init + bI_init + bD_init) + EPS
    bM_init, bI_init, bD_init = bM_init / sI, bI_init / sI, bD_init / sI
    lsI = jnp.log(sI)

    def step(carry, inp):
        bM1, bI1, bD1 = carry  # row i+1 (band offset off[i+1])
        qc_next, qprev_next, off_cur, off_next, i = inp
        s = off_next - off_cur
        j = off_cur + ks
        # u[k] = em(i+1, j+1) * bM[i+1, j+1]; row i+1 index of j+1 is k+1-s
        rc = r[jnp.clip(j, 0, T - 1)]  # t[j+1-1] = r[j]
        em = me[rc, qc_next]
        em = jnp.where(j + 1 <= t_len, em, 0.0)
        u = em * _shift(bM1, ks + 1 - s, W)
        ei = ie[qprev_next, qc_next]
        v = ei * _shift(bI1, ks - s, W)
        c = tdm * u + tdi * v
        bDrow = _linrec_rev(c, tdd)
        # note: the rev linrec handles bD[i,j] = c[j] + tdd*bD[i,j+1]
        w = _shift(bDrow, ks + 1, W)
        bMrow = tmm * u + tmi * v + tmd * w
        bIrow = tim * u + tii * v + tid * w
        ok = j <= t_len
        bMrow = jnp.where(ok, bMrow, 0.0)
        bIrow = jnp.where(ok, bIrow, 0.0)
        bDrow = jnp.where(ok, bDrow, 0.0)
        sc = jnp.max(bMrow + bIrow + bDrow) + EPS
        bMrow, bIrow, bDrow = bMrow / sc, bIrow / sc, bDrow / sc
        ls = jnp.log(sc)
        live = i < q_len
        bMrow = jnp.where(live, bMrow, bM1)
        bIrow = jnp.where(live, bIrow, bI1)
        bDrow = jnp.where(live, bDrow, bD1)
        ls = jnp.where(live, ls, 0.0)
        return (bMrow, bIrow, bDrow), (bMrow, bIrow, bDrow, ls)

    ii = jnp.arange(Q - 1, -1, -1, dtype=jnp.int32)  # row index i
    qc_next = jnp.flip(q)            # q[i] is the char consumed into row i+1
    qprev = jnp.concatenate([jnp.array([4], jnp.int8), q[:-1]])
    qprev_next = jnp.flip(qprev)
    off_cur = jnp.flip(offsets[:-1])
    off_next = jnp.flip(offsets[1:])
    (_, _, _), (bMs, bIs, bDs, lss) = jax.lax.scan(
        step, (bM_init, bI_init, bD_init),
        (qc_next, qprev_next, off_cur, off_next, ii))
    # outputs are rows Q-1..0; flip to 0..Q-1 and append the init row, then
    # overwrite row q_len with the init (rows > q_len are frozen copies).
    bMs = jnp.flip(bMs, 0)
    bIs = jnp.flip(bIs, 0)
    bDs = jnp.flip(bDs, 0)
    lss = jnp.flip(lss, 0)
    bMs = jnp.concatenate([bMs, bM_init[None]], 0)
    bIs = jnp.concatenate([bIs, bI_init[None]], 0)
    bDs = jnp.concatenate([bDs, bD_init[None]], 0)
    lss = jnp.concatenate([lss, jnp.zeros((1,))], 0)
    bMs = bMs.at[q_len].set(bM_init)
    bIs = bIs.at[q_len].set(bI_init)
    bDs = bDs.at[q_len].set(bD_init)
    # bcum[i] = total log scale applied to row i = lsI + sum of scales of rows i..Q-1
    # rows processed: row i gets scales of steps for rows i..q_len-1 plus init.
    lss = lss.at[jnp.clip(q_len, 0, Q)].set(lsI)  # fold init scale in at q_len
    rev = jnp.flip(jnp.cumsum(jnp.flip(lss)))
    bcum = rev
    return (bMs, bIs, bDs), bcum


def likelihood(q, r, offsets, q_len, t_len, params: PHMMParams, W: int):
    lk, _, _ = forward_banded(q, r, offsets, q_len, t_len, params, W)
    return lk


# batched: many queries vs one template (a pileup)
likelihood_pileup = jax.jit(
    jax.vmap(likelihood, in_axes=(0, None, 0, 0, None, None, None)),
    static_argnames=("W",),
)

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
  * Band offsets have unit increments (off[i+1]-off[i] in {0,1}), so band
    realignment is a select between static shifts — no gathers; the ref window
    per row is a contiguous ``dynamic_slice``; emission lookups are one-hot
    matmuls against the tiny emission tables (VPU-friendly, gather-free).
  * The within-row Del-state dependency ``D[j] = c[j] + t_dd * D[j-1]`` is a
    first-order linear recurrence solved by ``lax.associative_scan`` (O(log W)
    depth per row), forward and (flipped) backward.
  * Static shapes: sequences padded, lengths traced, rows past ``q_len``
    frozen so the final row is the carry.
  * All compile-time constants are NumPy (a jnp constant would be embedded by
    fetching it back from the device — ruinous over a remote TPU link).

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
        t = np.array(
            [[hp.mat_mat, hp.mat_ins, hp.mat_del],
             [hp.ins_mat, hp.ins_ins, hp.ins_del],
             [hp.del_mat, hp.del_ins, hp.del_del]], dtype=np.float32)
        me = np.array(hp.mat_emit, dtype=np.float32).reshape(4, 4)
        ie = np.array(hp.ins_emit, dtype=np.float32).reshape(5, 4)
        return cls(jnp.asarray(t), jnp.asarray(me), jnp.asarray(ie))

    @classmethod
    def default(cls) -> "PHMMParams":
        from ..datamodel import HMMParam
        return cls.from_hmmparam(HMMParam())


def _emit_pad(p: PHMMParams):
    """Emission tables padded so code 4 (N/pad) is a safe index (prob 0)."""
    me = jnp.pad(p.mat_emit, ((0, 1), (0, 1)))
    ie = jnp.pad(p.ins_emit, ((0, 0), (0, 1)))
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


def _shl(v):
    """index k reads old k+1; 0 fill."""
    z = np.zeros((1,), np.float32)
    return jnp.concatenate([v[1:], z.astype(v.dtype)])


def _shr(v):
    """index k reads old k-1; 0 fill."""
    z = np.zeros((1,), np.float32)
    return jnp.concatenate([z.astype(v.dtype), v[:-1]])


def _onehot5(codes):
    """(W,) int codes -> (W, 5) f32 one-hot (compare against numpy iota)."""
    return (codes[..., None] == np.arange(5, dtype=codes.dtype)).astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("W",))
def forward_banded(q, r, offsets, q_len, t_len, params: PHMMParams, W: int):
    """Banded forward pass.

    offsets must have unit increments (linear_offsets guarantees this).
    Returns (lk, (Ms, Is, Ds), fcum, rcs) where tables are (Q+1, W) row-scaled,
    ``fcum`` (Q+1,) cumulative log scales (true f(i,j) =
    table[i, j-off[i]] * exp(fcum[i])), and ``rcs[i, k]`` = r[off[i]+k-1]
    (code 4 out of range).  ``lk`` = log Pr(q | r) ending at (q_len, t_len).
    """
    Q = q.shape[0]
    ks = np.arange(W, dtype=np.int32)
    me, ie = _emit_pad(params)
    t = params.trans
    tmm, tmi, tmd = t[0, 0], t[0, 1], t[0, 2]
    tim, tii, tid = t[1, 0], t[1, 1], t[1, 2]
    tdm, tdi, tdd = t[2, 0], t[2, 1], t[2, 2]
    # r_pad[off + k] == r[off + k - 1]
    r_pad = jnp.concatenate([np.full((1,), 4, np.int8), r,
                             np.full((W + 1,), 4, np.int8)])

    # row 0: start in M at (0,0); D chain along the row.
    j0 = offsets[0] + ks
    M0 = jnp.where(j0 == 0, 1.0, 0.0)
    I0 = jnp.zeros_like(M0)
    c0 = tmd * _shr(M0)
    D0 = _linrec(c0, tdd)
    D0 = jnp.where((j0 >= 1) & (j0 <= t_len), D0, 0.0)
    s0 = jnp.sum(M0 + I0 + D0) + EPS
    M0, I0, D0 = M0 / s0, I0 / s0, D0 / s0
    ls0 = jnp.log(s0)
    rc0 = jax.lax.dynamic_slice(r_pad, (offsets[0],), (W,))

    def step(carry, inp):
        Mp, Ip, Dp = carry
        qc, qprev, off_cur, s, i = inp
        one = s == 1
        # diag: prev index k+s-1 (s=1 -> k, s=0 -> k-1)
        Md = jnp.where(one, Mp, _shr(Mp))
        Id = jnp.where(one, Ip, _shr(Ip))
        Dd = jnp.where(one, Dp, _shr(Dp))
        # up: prev index k+s (s=1 -> k+1, s=0 -> k)
        Mu = jnp.where(one, _shl(Mp), Mp)
        Iu = jnp.where(one, _shl(Ip), Ip)
        Du = jnp.where(one, _shl(Dp), Dp)
        j = off_cur + ks
        rc = jax.lax.dynamic_slice(r_pad, (off_cur,), (W,))  # r[j-1]
        me_col = me[:, qc]                                   # (5,) tiny gather
        em = _onehot5(rc) @ me_col
        em = jnp.where((j >= 1) & (j <= t_len), em, 0.0)
        Mrow = em * (tmm * Md + tim * Id + tdm * Dd)
        ei = ie[qprev, qc]                                   # scalar
        Irow = ei * (tmi * Mu + tii * Iu + tdi * Du)
        Irow = jnp.where(j <= t_len, Irow, 0.0)
        c = tmd * _shr(Mrow) + tid * _shr(Irow)
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
        return (Mrow, Irow, Drow), (Mrow, Irow, Drow, ls, rc)

    ii = np.arange(1, Q + 1, dtype=np.int32)
    qprev = jnp.concatenate([np.array([4], np.int8), q[:-1]])
    shifts = offsets[1:] - offsets[:-1]
    (Mf, If, Df), (Ms, Is, Ds, lss, rcs) = jax.lax.scan(
        step, (M0, I0, D0), (q, qprev, offsets[1:], shifts, ii))
    Ms = jnp.concatenate([M0[None], Ms], 0)
    Is = jnp.concatenate([I0[None], Is], 0)
    Ds = jnp.concatenate([D0[None], Ds], 0)
    lss = jnp.concatenate([ls0[None], lss], 0)
    rcs = jnp.concatenate([rc0[None], rcs], 0)
    fcum = jnp.cumsum(lss)
    k_end = jnp.clip(t_len - offsets[q_len], 0, W - 1)
    fin = Mf[k_end] + If[k_end] + Df[k_end]
    lk = jnp.log(fin + EPS) + fcum[q_len]
    return lk, (Ms, Is, Ds), fcum, rcs


@functools.partial(jax.jit, static_argnames=("W",))
def backward_banded(q, r, offsets, q_len, t_len, params: PHMMParams, W: int):
    """Banded backward pass with the same band offsets as forward.

    Returns ((bM, bI, bD), bcum): true b(i,j) = table[i, j-off[i]] *
    exp(bcum[i]); b(i,j,s) = Pr(q[i+1..], t[j+1..] | state s at (i,j)).
    """
    Q = q.shape[0]
    ks = np.arange(W, dtype=np.int32)
    me, ie = _emit_pad(params)
    t = params.trans
    tmm, tmi, tmd = t[0, 0], t[0, 1], t[0, 2]
    tim, tii, tid = t[1, 0], t[1, 1], t[1, 2]
    tdm, tdi, tdd = t[2, 0], t[2, 1], t[2, 2]
    # r_pad2[off + k] == r[off + k]  (char of column j+1)
    r_pad2 = jnp.concatenate([r, np.full((W + 1,), 4, np.int8)])

    # init: row q_len (no query left).
    offQ = offsets[q_len]
    jQ = offQ + ks
    cQ = jnp.where(jQ == t_len, 1.0, 0.0)
    bD_init = _linrec_rev(cQ, tdd)
    bD_next = _shl(bD_init)
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
        bM1, bI1, bD1 = carry  # row i+1 (band offset off[i+1] = off[i]+s)
        qc_next, qprev_next, off_cur, s, i = inp
        one = s == 1
        j = off_cur + ks
        # u[k] = em(i+1, j+1) * bM[i+1, j+1]; row i+1 index k+1-s
        rc = jax.lax.dynamic_slice(r_pad2, (off_cur,), (W,))  # r[j]
        me_col = me[:, qc_next]
        em = _onehot5(rc) @ me_col
        em = jnp.where(j + 1 <= t_len, em, 0.0)
        bM1_at = jnp.where(one, bM1, _shl(bM1))   # k+1-s
        bI1_at = jnp.where(one, _shr(bI1), bI1)   # k-s
        u = em * bM1_at
        ei = ie[qprev_next, qc_next]
        v = ei * bI1_at
        c = tdm * u + tdi * v
        bDrow = _linrec_rev(c, tdd)
        w = _shl(bDrow)
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

    ii = np.arange(Q - 1, -1, -1, dtype=np.int32)
    qc_next = jnp.flip(q)
    qprev = jnp.concatenate([np.array([4], np.int8), q[:-1]])
    qprev_next = jnp.flip(qprev)
    off_cur = jnp.flip(offsets[:-1])
    shifts = jnp.flip(offsets[1:] - offsets[:-1])
    (_, _, _), (bMs, bIs, bDs, lss) = jax.lax.scan(
        step, (bM_init, bI_init, bD_init),
        (qc_next, qprev_next, off_cur, shifts, ii))
    bMs = jnp.flip(bMs, 0)
    bIs = jnp.flip(bIs, 0)
    bDs = jnp.flip(bDs, 0)
    lss = jnp.flip(lss, 0)
    bMs = jnp.concatenate([bMs, bM_init[None]], 0)
    bIs = jnp.concatenate([bIs, bI_init[None]], 0)
    bDs = jnp.concatenate([bDs, bD_init[None]], 0)
    lss = jnp.concatenate([lss, np.zeros((1,), np.float32)], 0)
    bMs = bMs.at[q_len].set(bM_init)
    bIs = bIs.at[q_len].set(bI_init)
    bDs = bDs.at[q_len].set(bD_init)
    lss = lss.at[jnp.clip(q_len, 0, Q)].set(lsI)
    bcum = jnp.flip(jnp.cumsum(jnp.flip(lss)))
    return (bMs, bIs, bDs), bcum


def likelihood(q, r, offsets, q_len, t_len, params: PHMMParams, W: int):
    lk, _, _, _ = forward_banded(q, r, offsets, q_len, t_len, params, W)
    return lk


# batched: many queries vs one template (a pileup)
likelihood_pileup = jax.jit(
    jax.vmap(likelihood, in_axes=(0, None, 0, 0, None, None, None)),
    static_argnames=("W",),
)

# batched: independent (query, template) pairs (gain calibration sweeps)
likelihood_pairs_dense = jax.jit(
    jax.vmap(likelihood, in_axes=(0, 0, 0, 0, 0, None, None)),
    static_argnames=("W",),
)

@functools.partial(jax.jit, static_argnames=("W", "Qpad", "Tpad"))
def _likelihood_pairs_packed(qs_packed, rs_packed, off0, shifts, q_lens,
                             t_lens, params, W: int, Qpad: int, Tpad: int):
    from .banded_align import _unpack2bit
    qs = jnp.where(np.arange(Qpad) < q_lens[:, None],
                   _unpack2bit(qs_packed, Qpad), 4)
    rs = jnp.where(np.arange(Tpad) < t_lens[:, None],
                   _unpack2bit(rs_packed, Tpad), 4)
    offs = jnp.concatenate(
        [off0[:, None],
         off0[:, None] + jnp.cumsum(shifts.astype(jnp.int32), axis=1)],
        axis=1)
    return likelihood_pairs_dense(qs, rs, offs, q_lens, t_lens, params, W)


def likelihood_pairs(qs, rs, offs, q_lens, t_lens, params, W: int):
    """Pair LKs with compact host->device transfer when inputs allow
    (pure-ACGT, unit-increment offsets, 4-multiple pads): 2-bit bases +
    uint8 offset deltas, expanded on device — ~8x fewer bytes on the link."""
    qs = np.asarray(qs)
    rs = np.asarray(rs)
    offs = np.asarray(offs)
    q_lens = np.asarray(q_lens, np.int32)
    t_lens = np.asarray(t_lens, np.int32)
    shifts = np.diff(offs, axis=1)
    qm = np.where(np.arange(qs.shape[1]) < q_lens[:, None], qs, 0)
    rm = np.where(np.arange(rs.shape[1]) < t_lens[:, None], rs, 0)
    if (qs.shape[1] % 4 == 0 and rs.shape[1] % 4 == 0
            and shifts.min(initial=0) >= 0 and shifts.max(initial=0) <= 1
            and qm.max(initial=0) <= 3 and rm.max(initial=0) <= 3):
        from .banded_align import pack2bit
        return _likelihood_pairs_packed(
            pack2bit(qm.astype(np.int8)), pack2bit(rm.astype(np.int8)),
            offs[:, 0].astype(np.int32), shifts.astype(np.uint8),
            q_lens, t_lens, params, W, qs.shape[1], rs.shape[1])
    return likelihood_pairs_dense(qs, rs, offs, q_lens, t_lens, params, W)


def hmm_generate(rng: np.random.Generator, template: np.ndarray,
                 params: PHMMParams) -> np.ndarray:
    """Sample a read from the pair-HMM (kiley gen_seq Generate counterpart):
    walk M/I/D by the transition matrix, emit query bases from the emission
    tables.  Host-side numpy; used by the gain-calibration simulators."""
    t = np.asarray(params.trans)
    me = np.asarray(params.mat_emit)
    me = me / np.maximum(me.sum(1, keepdims=True), 1e-9)
    ie = np.asarray(params.ins_emit)
    ie = ie / np.maximum(ie.sum(1, keepdims=True), 1e-9)
    out = []
    state = 0
    i = 0
    prev = 4
    T = len(template)
    while i < T:
        if state == 0:   # M: consume template, emit
            b = int(rng.choice(4, p=me[template[i]]))
            out.append(b)
            prev = b
            i += 1
        elif state == 1:  # I: emit only
            b = int(rng.choice(4, p=ie[prev]))
            out.append(b)
            prev = b
        else:            # D: consume template silently
            i += 1
        state = int(rng.choice(3, p=t[state] / t[state].sum()))
    return np.array(out, np.int8)

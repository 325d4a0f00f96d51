"""NumPy scalar oracles for kernel unit tests.

Unbanded, O(QT) reference implementations of the device kernels
(SURVEY.md §7.2 step 1: kernels ship with scalar oracles + property tests).
"""

from __future__ import annotations

import numpy as np

INF = 10 ** 9


def edit_dp(q: np.ndarray, r: np.ndarray, mode: str = "global"):
    """Full edit-distance DP.

    Returns (score, ops, ref_start, ref_end).  ``mode``:
      * ``global``: both sequences end-to-end (edlib Global).
      * ``infix`` : free gaps at the start AND end of ``r`` (edlib Infix —
        query contained in reference).
    """
    Q, T = len(q), len(r)
    E = np.zeros((Q + 1, T + 1), dtype=np.int64)
    E[:, 0] = np.arange(Q + 1)
    if mode == "global":
        E[0, :] = np.arange(T + 1)
    else:
        E[0, :] = 0
    for i in range(1, Q + 1):
        sub = (q[i - 1] != r).astype(np.int64)
        for j in range(1, T + 1):
            E[i, j] = min(E[i - 1, j - 1] + sub[j - 1], E[i - 1, j] + 1, E[i, j - 1] + 1)
    if mode == "global":
        jend = T
    else:
        jend = int(np.argmin(E[Q, :]))
    score = int(E[Q, jend])
    # traceback
    ops = []
    i, j = Q, jend
    while i > 0 or (mode == "global" and j > 0):
        if i > 0 and j > 0 and E[i, j] == E[i - 1, j - 1] + (q[i - 1] != r[j - 1]):
            ops.append("M"); i -= 1; j -= 1
        elif i > 0 and E[i, j] == E[i - 1, j] + 1:
            ops.append("I"); i -= 1
        elif j > 0 and E[i, j] == E[i, j - 1] + 1:
            ops.append("D"); j -= 1
        else:  # infix at i==0: free ref prefix
            break
    ops.reverse()
    return score, ops, j, jend


def phmm_forward(q, r, par, mode: str = "global"):
    """Unbanded pair-HMM forward log-likelihood (scalar, log-space).

    3 states M/I/D; start in M at (0,0); end = logsumexp over states at (Q,T).
    ``par`` is a dict-like with transition scalars, ``mat_emit`` (4,4) and
    ``ins_emit`` (5,4) probability arrays (see datamodel.HMMParam).
    """
    Q, T = len(q), len(r)
    me = np.asarray(par["mat_emit"], dtype=np.float64).reshape(4, 4)
    ie = np.asarray(par["ins_emit"], dtype=np.float64).reshape(5, 4)
    NEG = -np.inf
    M = np.full((Q + 1, T + 1), NEG)
    I = np.full((Q + 1, T + 1), NEG)
    D = np.full((Q + 1, T + 1), NEG)
    M[0, 0] = 0.0

    def lse(*xs):
        xs = [x for x in xs if x > NEG]
        if not xs:
            return NEG
        m = max(xs)
        return m + np.log(sum(np.exp(x - m) for x in xs))

    lg = np.log
    t = {k: lg(par[k]) for k in
         ("mat_mat", "mat_ins", "mat_del", "ins_mat", "ins_ins", "ins_del",
          "del_mat", "del_ins", "del_del")}
    for i in range(Q + 1):
        for j in range(T + 1):
            if i == 0 and j == 0:
                continue
            if i > 0 and j > 0:
                e = lg(me[r[j - 1], q[i - 1]])
                M[i, j] = e + lse(t["mat_mat"] + M[i - 1, j - 1],
                                  t["ins_mat"] + I[i - 1, j - 1],
                                  t["del_mat"] + D[i - 1, j - 1])
            if i > 0:
                ctx = q[i - 2] if i >= 2 else 4
                e = lg(ie[ctx, q[i - 1]])
                I[i, j] = e + lse(t["mat_ins"] + M[i - 1, j],
                                  t["ins_ins"] + I[i - 1, j],
                                  t["del_ins"] + D[i - 1, j])
            if j > 0:
                D[i, j] = lse(t["mat_del"] + M[i, j - 1],
                              t["ins_del"] + I[i, j - 1],
                              t["del_del"] + D[i, j - 1])
    def final(j):
        return lse(M[Q, j], I[Q, j], D[Q, j])
    if mode == "global":
        return final(T)
    raise ValueError(mode)


def apply_edit(template: np.ndarray, op: str, pos: int, base: int = 0):
    """Apply a single template edit: 'S' substitute, 'I' insert-before,
    'D' delete ``base`` chars (default 1), 'C' tandem-copy ``base`` chars."""
    t = list(template)
    if op == "S":
        t[pos] = base
    elif op == "I":
        t.insert(pos, base)
    elif op == "D":
        d = max(base, 1)
        del t[pos:pos + d]
    elif op == "C":
        c = max(base, 1)
        t = t[:pos + c] + t[pos:pos + c] + t[pos + c:]
    return np.array(t, dtype=template.dtype)

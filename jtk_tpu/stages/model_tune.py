"""HMM fitting: strand-specific pair-HMM parameters by gradient EM.

Reference: ``haplotyper/src/model_tune.rs:94-156`` — picks <=5 median-coverage
chunk pileups, then iterates (polish -> Baum-Welch fit) with kiley's
``fit_antidiagonal_par_multiple``.

TPU-native replacement: gradient EM.  The gradient of the forward
log-likelihood w.r.t. log-domain (softmax) parameters IS the expected-count
Baum-Welch statistic, so plain gradient ascent on sum-of-read log-likelihoods
(jax.value_and_grad through the K1 scan, Adam-style steps) converges to the
same fixed points — and runs batched on device, data-parallel under pjit for
multi-chip (see jtk_tpu.parallel.make_train_step).
"""

from __future__ import annotations

import logging

import numpy as np

from .. import seq as seqmod
from ..datamodel import DataSet, HMMParam, ReadType
from ..ops.banded_align import linear_offsets
from ..ops.phmm import PHMMParams
from ..ops.polish import effective_band, polish_until_converge

logger = logging.getLogger(__name__)


PAD_MULTIPLE = 8  # fixed so batch shapes (and numerics) match any mesh size


def _fit_strand(reads: list[np.ndarray], template: np.ndarray,
                init: PHMMParams, W: int, steps: int = 60,
                lr: float = 0.05, clip: float = 1.0):
    """Fit one strand's HMM with the data-parallel train step
    (jtk_tpu.parallel.make_train_step) — sharded over the production mesh
    when more than one device is present, bit-identical at any mesh size."""
    import jax
    from ..parallel import (get_mesh, make_mesh, params_to_theta, replicate,
                            shard_leading, theta_to_params)

    if not reads:
        return init
    t_len = len(template)
    Qpad = ((max(len(r) for r in reads) + 63) // 64) * 64
    qs = np.full((len(reads), Qpad), 4, np.int8)
    for i, r in enumerate(reads):
        qs[i, :len(r)] = r
    q_lens = np.array([len(r) for r in reads], np.int32)
    W = effective_band(W, q_lens, t_len)
    offs = np.stack([linear_offsets(int(l), t_len, Qpad, W) for l in q_lens])

    # drop outlier reads that barely fit the template (their underflowed
    # forward rows produce non-finite gradients)
    from ..ops.phmm import likelihood_pileup
    lks = np.asarray(likelihood_pileup(qs, template, offs, q_lens,
                                       np.int32(t_len), init, W))
    keep = lks / np.maximum(q_lens, 1) > -2.0
    if keep.sum() < 2:
        return init
    qs, offs, q_lens = qs[keep], offs[keep], q_lens[keep]

    # pad the batch to a fixed multiple with weight-0 stub reads
    n = len(qs)
    N = ((n + PAD_MULTIPLE - 1) // PAD_MULTIPLE) * PAD_MULTIPLE
    wts = np.zeros(N, np.float32)
    wts[:n] = 1.0
    if N > n:
        # weight-0 duplicates of the first read keep every row's band valid
        qs = np.concatenate([qs, np.tile(qs[:1], (N - n, 1))])
        offs = np.concatenate([offs, np.tile(offs[:1], (N - n, 1))])
        q_lens = np.concatenate(
            [q_lens, np.full(N - n, q_lens[0], np.int32)])

    mesh = get_mesh() or make_mesh(1)
    from ..parallel import make_train_steps
    N_INNER = 10
    steps_fn = make_train_steps(mesh, W, lr=lr, clip=clip, n_inner=N_INNER)
    if mesh.size > 1:
        qs_d, offs_d, ql_d, wts_d = shard_leading(mesh, qs, offs, q_lens, wts)
        template_d, = replicate(mesh, np.asarray(template, np.int8))
    else:
        qs_d, offs_d, ql_d, wts_d = qs, offs, q_lens, wts
        template_d = np.asarray(template, np.int8)

    theta = params_to_theta(init)
    prev = None
    best = theta
    # N_INNER steps per dispatch: the per-step host sync is what costs on a
    # high-latency link; convergence/divergence is checked between chunks
    for it in range(0, steps, N_INNER):
        theta, losses = steps_fn(theta, qs_d, template_d, offs_d, ql_d,
                                 np.int32(t_len), wts_d)
        losses = np.asarray(losses, np.float64)
        if not np.all(np.isfinite(losses)) or any(
                not np.all(np.isfinite(np.asarray(x)))
                for x in jax.tree.leaves(theta)):
            logger.warning("model fit diverged in steps %d..%d; keeping "
                           "previous", it, it + N_INNER)
            theta = best
            break
        best = theta
        seq = ([prev] if prev is not None else []) + losses.tolist()
        if any(abs(b - a) < 1e-4 for a, b in zip(seq, seq[1:])):
            break
        prev = losses[-1]
    out = theta_to_params(theta)
    if any(not np.all(np.isfinite(np.asarray(x))) for x in out):
        return init
    return out


def _params_to_hmmparam(p: PHMMParams) -> HMMParam:
    t = np.asarray(p.trans, np.float64)
    return HMMParam(
        mat_mat=float(t[0, 0]), mat_ins=float(t[0, 1]), mat_del=float(t[0, 2]),
        ins_mat=float(t[1, 0]), ins_ins=float(t[1, 1]), ins_del=float(t[1, 2]),
        del_mat=float(t[2, 0]), del_ins=float(t[2, 1]), del_del=float(t[2, 2]),
        mat_emit=np.asarray(p.mat_emit, np.float64).reshape(-1).tolist(),
        ins_emit=np.asarray(p.ins_emit, np.float64).reshape(-1).tolist(),
    )


def update_models_on_both_strands(ds: DataSet, n_chunks: int = 3,
                                  cap: int = 40, seed: int = 42,
                                  polish_rounds: int = 2) -> DataSet:
    """Fit forward/reverse HMMs on median-coverage chunk pileups."""
    pileups: dict[int, list] = {}
    for er in ds.encoded_reads:
        for n in er.nodes:
            pileups.setdefault(n.chunk, []).append(
                (seqmod.encode(n.seq), n.is_forward))
    if not pileups:
        return ds
    sizes = sorted(pileups.items(), key=lambda kv: len(kv[1]))
    mid = len(sizes) // 2
    chosen = sizes[max(0, mid - n_chunks // 2): mid + (n_chunks + 1) // 2]
    chunks = {c.id: c for c in ds.selected_chunks}
    params_f = PHMMParams.from_hmmparam(ds.model_param.forward)
    params_r = PHMMParams.from_hmmparam(ds.model_param.reverse)
    rng = np.random.default_rng(seed)
    for _ in range(polish_rounds):
        for cid, pu in chosen:
            chunk = chunks[cid]
            reads = [s for s, _ in pu]
            strands = [f for _, f in pu]
            band = max(ReadType.band_width(ds.read_type, len(chunk.seq)), 64)
            band = ((band + 63) // 64) * 64
            sel = rng.permutation(len(reads))[:cap]
            template, _ = polish_until_converge(
                chunk.codes(), [reads[i] for i in sel], params_f, W=band,
                max_rounds=4)
            chunk.seq = seqmod.decode(template).decode()
            fwd = [r for r, s in zip(reads, strands) if s][:cap]
            rev = [r for r, s in zip(reads, strands) if not s][:cap]
            params_f = _fit_strand(fwd, template, params_f, band)
            params_r = _fit_strand(rev, template, params_r, band)
    ds.model_param.forward = _params_to_hmmparam(params_f)
    ds.model_param.reverse = _params_to_hmmparam(params_r)
    logger.info("model_tune: fitted on %d pileups", len(chosen))
    ds.push_stage("ModelFit", [])
    return ds

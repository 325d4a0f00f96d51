"""Device-mesh parallelism: sharded encode/clustering + HMM fitting.

The reference's only parallelism is a rayon thread pool over independent items
(SURVEY.md §2.5).  The TPU-native equivalent: reads are sharded over a 1-D
``data`` mesh axis (ICI within a host, DCN across hosts), the chunk set and
HMM parameters are replicated, and merges ride XLA collectives:
``psum`` for k-mer histograms / Baum-Welch statistics, ``all_gather`` for
per-chunk pileup regrouping.

``train_step`` is the flagship multi-chip computation: a gradient-EM step for
the pair-HMM (the gradient of the forward log-likelihood w.r.t. log-domain
HMM parameters equals the expected-count Baum-Welch statistics), data-parallel
over reads with a ``psum`` gradient merge — replacing kiley's
``fit_antidiagonal_par_multiple`` (model_tune.rs:94-156).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.phmm import PHMMParams, forward_banded


def make_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.array(devices), ("data",))


_MESH_CACHE: list = []


def get_mesh() -> Mesh | None:
    """The production mesh: all local devices when there are >1 (set
    JTK_TPU_DISABLE_MESH=1 to force single-device execution)."""
    import os
    if os.environ.get("JTK_TPU_DISABLE_MESH"):
        return None
    if not _MESH_CACHE:
        devs = jax.devices()
        _MESH_CACHE.append(make_mesh() if len(devs) > 1 else None)
    return _MESH_CACHE[0]


def shard_leading(mesh: Mesh, *arrays):
    """device_put each array sharded on its leading axis over ``data``."""
    from jax.sharding import NamedSharding
    out = []
    for a in arrays:
        spec = P("data", *([None] * (np.ndim(a) - 1)))
        out.append(jax.device_put(a, NamedSharding(mesh, spec)))
    return out


def replicate(mesh: Mesh, *arrays):
    from jax.sharding import NamedSharding
    return [jax.device_put(a, NamedSharding(mesh, P())) for a in arrays]


# ---------------------------------------------------------------------------
# HMM parameterization for gradient EM
# ---------------------------------------------------------------------------


def params_to_theta(params: PHMMParams):
    """Probability tables -> unconstrained log-domain parameters."""
    return {
        "trans": jnp.log(params.trans + 1e-9),
        "mat_emit": jnp.log(params.mat_emit + 1e-9),
        "ins_emit": jnp.log(params.ins_emit + 1e-9),
    }


def theta_to_params(theta) -> PHMMParams:
    """Softmax rows back to stochastic matrices."""
    return PHMMParams(
        trans=jax.nn.softmax(theta["trans"], axis=-1),
        mat_emit=jax.nn.softmax(theta["mat_emit"], axis=-1),
        ins_emit=jax.nn.softmax(theta["ins_emit"], axis=-1),
    )


def _batch_neg_lk(theta, qs, template, offsets, q_lens, t_len, W: int):
    params = theta_to_params(theta)

    def one(q, off, ql):
        lk, _, _, _ = forward_banded(q, template, off, ql, t_len, params, W)
        return lk

    lks = jax.vmap(one)(qs, offsets, q_lens)
    return -jnp.sum(lks), jnp.asarray(qs.shape[0], jnp.float32)


def make_train_step(mesh: Mesh, W: int, lr: float = 0.05,
                    clip: float = 1.0):
    """Data-parallel gradient-EM step over a read shard.

    Reads (qs/offsets/q_lens/weights) are sharded over ``data``; theta and
    the template are replicated.  Per-read gradients are all_gathered and
    reduced in a REPLICATED fixed-shape sum, so the update is bit-identical
    at any mesh size (a psum of per-shard partials would reorder the float
    reduction and break the golden determinism guarantee).  Weights mask out
    padding reads.  The gradient is sanitized, per-base-pair normalized and
    globally clipped — the production model_tune semantics.
    """

    def step(theta, qs, template, offsets, q_lens, t_len, wts):
        def per_read_neglk(th, q, off, ql, w):
            params = theta_to_params(th)
            lk, _, _, _ = forward_banded(q, template, off, ql, t_len,
                                         params, W)
            return -lk * w

        def one(q, off, ql, w):
            loss, g = jax.value_and_grad(per_read_neglk)(theta, q, off, ql, w)
            return loss, g

        losses, grads = jax.vmap(one)(qs, offsets, q_lens, wts)
        losses = jax.lax.all_gather(losses, "data", tiled=True)
        grads = jax.tree.map(
            lambda g: jax.lax.all_gather(g, "data", tiled=True), grads)
        ql_all = jax.lax.all_gather(q_lens, "data", tiled=True)
        w_all = jax.lax.all_gather(wts, "data", tiled=True)
        n = jnp.sum(w_all)
        total_bp = jnp.sum(ql_all.astype(jnp.float32) * w_all)
        g = jax.tree.map(lambda x: jnp.sum(x, axis=0), grads)
        g = jax.tree.map(
            lambda gg: jnp.where(jnp.isfinite(gg), gg, 0.0)
            / jnp.maximum(total_bp, 1.0), g)
        gnorm = jnp.sqrt(sum(jnp.sum(gg ** 2) for gg in jax.tree.leaves(g)))
        scale = jnp.minimum(1.0, clip / (gnorm + 1e-9))
        new_theta = jax.tree.map(lambda t, gg: t - lr * scale * gg, theta, g)
        loss = jnp.sum(losses) / jnp.maximum(n, 1.0)
        return new_theta, loss

    shard_map = jax.shard_map
    return jax.jit(shard_map(
        step, mesh=mesh,
        in_specs=(P(), P("data"), P(), P("data"), P("data"), P(), P("data")),
        out_specs=(P(), P()),
        check_vma=False,
    ))


def make_train_steps(mesh: Mesh, W: int, lr: float = 0.05, clip: float = 1.0,
                     n_inner: int = 10):
    """``n_inner`` train steps fused in one dispatch (lax.scan over the
    single-step body): on high-latency links the per-step host sync of
    make_train_step dominates fitting time.  Returns (theta, losses
    (n_inner,)); the host checks convergence between dispatches."""
    step_sharded = make_train_step(mesh, W, lr=lr, clip=clip)

    def many(theta, qs, template, offsets, q_lens, t_len, wts):
        def body(th, _):
            th2, loss = step_sharded(th, qs, template, offsets, q_lens,
                                     t_len, wts)
            return th2, loss
        return jax.lax.scan(body, theta, None, length=n_inner)

    return jax.jit(many)


def make_sharded_pileup_lk(mesh: Mesh, W: int):
    """Sharded per-read likelihood: reads split over the mesh, per-read LKs
    all-gathered back (the merge pattern used by encode/clustering)."""

    def shard_fn(qs, template, offsets, q_lens, t_len):
        def one(q, off, ql):
            lk, _, _, _ = forward_banded(q, template, off, ql, t_len,
                                      PHMMParams.default(), W)
            return lk

        lks = jax.vmap(one)(qs, offsets, q_lens)
        return jax.lax.all_gather(lks, "data", tiled=True)

    shard_map = jax.shard_map
    return jax.jit(shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P("data"), P(), P("data"), P("data"), P()),
        out_specs=P(),
        check_vma=False,
    ))


def make_sharded_kmer_hist(mesh: Mesh, n_bins: int):
    """Sharded k-mer histogram: per-shard bincount + psum merge (the repeat-
    masking counting pattern, repeat_masking.rs:162-194)."""

    def shard_fn(kmers):
        hist = jnp.zeros(n_bins, jnp.int32).at[kmers % n_bins].add(1)
        return jax.lax.psum(hist, "data")

    shard_map = jax.shard_map
    return jax.jit(shard_map(
        shard_fn, mesh=mesh, in_specs=(P("data"),), out_specs=P(),
        check_vma=False,
    ))

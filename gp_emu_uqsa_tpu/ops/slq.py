"""Stochastic Lanczos quadrature: matrix-free log-determinants.

The missing piece of the matrix-free (BBMM/GPyTorch-style, PAPERS.md)
training loop: the concentrated NLL needs log|A|, which the CG path
(ops/cg.py) cannot provide. SLQ estimates

    log|A| = tr(log A) ~= (n/p) sum_z  e1^T log(T_z) e1 * ||z||^2/n

with T_z the k-step Lanczos tridiagonalization of A started at probe z:
each probe costs k matvecs (chunked kernel matvecs — A never materialized)
plus an eigh of a tiny k x k tridiagonal. Rademacher probes, full
reorthogonalization (k <= 64 keeps the (k, n) basis cheap and the estimate
stable in fp32).

All loops are lax.fori/vmap — one jit program per (n, k, p) shape.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from gp_emu_uqsa_tpu.ops.precision import fp32_exact


@fp32_exact
def lanczos(matvec, v0, k: int):
    """k-step Lanczos with full reorthogonalization.

    Returns (alphas (k,), betas (k-1,), q_basis (k, n)). Breakdown
    (invariant subspace hit early) is handled by zeroing the offending
    beta and padding the remaining diagonal with 1.0 — the padded block
    decouples from e1, so quadrature weights for its spurious eigenpairs
    vanish and log-quadrature is unaffected.
    """
    n = v0.shape[0]
    dtype = v0.dtype
    eps = jnp.asarray(1e-12 if dtype == jnp.float64 else 1e-6, dtype)
    q0 = v0 / jnp.linalg.norm(v0)

    qs = jnp.zeros((k, n), dtype).at[0].set(q0)
    alphas = jnp.ones((k,), dtype)     # padding value: log 1 = 0
    betas = jnp.zeros((k,), dtype)     # betas[j] couples step j -> j+1

    def body(j, s):
        qs, alphas, betas, alive = s
        q = qs[j]
        w = matvec(q)
        alpha = jnp.dot(q, w)
        w = w - alpha * q
        # full reorthogonalization: rows >= j+1 of qs are zero, so the
        # full-basis projection is exact for the first j+1 vectors
        w = w - qs.T @ (qs @ w)
        w = w - qs.T @ (qs @ w)        # twice is enough (Parlett)
        beta = jnp.linalg.norm(w)
        ok = jnp.logical_and(alive, beta > eps)
        alphas = alphas.at[j].set(jnp.where(alive, alpha, 1.0))
        betas = betas.at[j].set(jnp.where(ok, beta, 0.0))
        q_next = jnp.where(ok, w / jnp.maximum(beta, eps), 0.0)
        qs = lax.cond(
            j + 1 < k,
            lambda qs: qs.at[j + 1].set(q_next),
            lambda qs: qs,
            qs,
        )
        return qs, alphas, betas, ok

    qs, alphas, betas, _ = lax.fori_loop(
        0, k, body, (qs, alphas, betas, jnp.asarray(True))
    )
    return alphas, betas[: k - 1], qs


def _logdet_quadrature(alphas, betas, znorm2):
    """e1-weighted Gauss quadrature of log on the Lanczos tridiagonal."""
    k = alphas.shape[0]
    t = (
        jnp.diag(alphas)
        + jnp.diag(betas, 1)
        + jnp.diag(betas, -1)
    )
    lam, u = jnp.linalg.eigh(t)
    w1 = u[0, :] ** 2
    lam_safe = jnp.maximum(lam, 1e-30)
    return znorm2 * jnp.sum(w1 * jnp.log(lam_safe))


@fp32_exact
def slq_logdet(matvec, n: int, key, *, num_probes: int = 16, k: int = 32,
               dtype=jnp.float64):
    """Estimate log|A| for SPD A given only matvecs.

    Standard error scales ~ 1/sqrt(num_probes); k bounds the quadrature
    bias (k=32 is ample for nugget-regularized correlation matrices).
    """
    z = jax.random.rademacher(key, (num_probes, n), dtype=dtype)

    def one(zi):
        alphas, betas, _ = lanczos(matvec, zi, k)
        return _logdet_quadrature(alphas, betas, jnp.sum(zi * zi))

    return jnp.mean(jax.vmap(one)(z))


@fp32_exact
def slq_logdet_preconditioned(matvec, wops: dict, n: int, key, *,
                              num_probes: int = 16, k: int = 32,
                              dtype=jnp.float64):
    """log|A| = log|M| (exact) + SLQ estimate of log|B^-1 A B^-T|.

    wops comes from ops.cg.woodbury_ops on a pivoted-Cholesky
    preconditioner M = L L^T + shift I with B B^T = M. The residual
    operator B^-1 A B^-T has its dominant spectrum compressed toward 1,
    so both the Lanczos quadrature bias (small k suffices) and the probe
    variance drop sharply vs plain SLQ at small nuggets.
    """
    binv, binv_t = wops["apply_binv"], wops["apply_binv_t"]

    def mv_bar(v):
        return binv(matvec(binv_t(v)))

    return wops["logdet_m"] + slq_logdet(
        mv_bar, n, key, num_probes=num_probes, k=k, dtype=dtype
    )

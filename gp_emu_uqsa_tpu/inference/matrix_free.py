"""Matrix-free MLE: BBMM-style training past the Cholesky memory wall.

Completes the iterative stack (ops/cg.py solves, ops/slq.py logdets) with
the concentrated (MUCM) NLL and its gradient, computed from kernel
matvecs only — A is never materialized. This is the GPyTorch "blackbox
matrix-matrix inference" recipe (PAPERS.md) recast for TPU: every pass is
chunked (chunk, n) correlation blocks = MXU GEMMs.

Estimator structure (mirrors gp.py::_nll_mucm_bwd's exact adjoint):

  dNLL/dA = W = 1/2 A^-1 - 1/2 C C^T - c e e^T
      C = (A^-1 H) Lg^-T,  c = (n-q)/(2 resid),  e = A^-1 (y - H beta)

  * the LOW-RANK part of W (C, e from CG solves) is contracted against
    dA/dtheta EXACTLY in one chunked O(n^2 (q + d)) pass;
  * the 1/2 A^-1 part needs tr(A^-1 dA/dtheta): Hutchinson probes with
    CG solves W_z = A^-1 Z, contracted in the same chunked pass;
  * log|A| for the value: SLQ on the same matvec.

Gradients are stochastic (probe noise ~1/sqrt(p)); `mle_fit_matrix_free`
fixes the probe set per fit (sample-average approximation) so Adam sees a
smooth deterministic objective.
"""
from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from gp_emu_uqsa_tpu.kernels import GPParams, gaussian_corr
from gp_emu_uqsa_tpu.ops.cg import (
    cg_solve, make_corr_matvec, pivoted_cholesky, woodbury_ops,
)
from gp_emu_uqsa_tpu.ops.slq import slq_logdet, slq_logdet_preconditioned
from gp_emu_uqsa_tpu.ops.precision import fp32_exact


@dataclasses.dataclass(frozen=True)
class MFConfig:
    num_probes: int = 16
    lanczos_k: int = 32
    cg_tol: float = 1e-8
    cg_maxiter: int = 512
    chunk: int = 1024
    precond_rank: int = 0        # >0: pivoted-Cholesky PCG (ops/cg.py)


@fp32_exact
def nll_and_grad_matrix_free(params: GPParams, x, y, h, key,
                             cfg: MFConfig = MFConfig()):
    """Concentrated NLL estimate + stochastic gradient, matrix-free.

    Returns (nll, GPParams cotangents for (log_delta, log_sigma2=0,
    log_nugget), aux dict). One jit-able program; cost ~ (q + 2 +
    num_probes) CG solves + num_probes Lanczos runs + one O(n^2(q+d))
    contraction pass.
    """
    x = jnp.asarray(x)
    y = jnp.asarray(y)
    h = jnp.asarray(h)
    n, q = h.shape
    d = x.shape[1]
    dtype = x.dtype
    matvec = make_corr_matvec(x, params, chunk=cfg.chunk)

    # ---- solves: A^-1 [y | H | Z] in ONE batched CG ----------------------
    kz, kl = jax.random.split(key)
    z = jax.random.rademacher(kz, (n, cfg.num_probes), dtype=dtype)
    rhs = jnp.concatenate([y[:, None], h, z], axis=1)
    wops = None
    precond = None
    if cfg.precond_rank > 0:
        l_piv, _ = pivoted_cholesky(x, params, cfg.precond_rank)
        wops = woodbury_ops(l_piv, jnp.full((n,), jnp.exp(params.log_nugget),
                                            dtype))
        precond = wops["apply_minv"]
    sol, cg_info = cg_solve(matvec, rhs, tol=cfg.cg_tol,
                            maxiter=cfg.cg_maxiter, precond=precond)
    ainv_y, ainv_h, wz = sol[:, 0], sol[:, 1 : 1 + q], sol[:, 1 + q :]

    g = h.T @ ainv_h
    g = 0.5 * (g + g.T)
    lg = jnp.linalg.cholesky(g)
    beta = jnp.linalg.solve(g, h.T @ ainv_y)
    e = ainv_y - ainv_h @ beta
    resid = jnp.maximum(y @ e, 1e-30)
    dof = n - q - 2
    sigma2 = resid / dof

    # ---- value: SLQ logdet (operator-preconditioned when PCG is on) -------
    if wops is not None:
        logdet_a = slq_logdet_preconditioned(
            matvec, wops, n, kl, num_probes=cfg.num_probes,
            k=cfg.lanczos_k, dtype=dtype)
    else:
        logdet_a = slq_logdet(matvec, n, kl, num_probes=cfg.num_probes,
                              k=cfg.lanczos_k, dtype=dtype)
    logdet_g = 2.0 * jnp.sum(jnp.log(jnp.maximum(jnp.diagonal(lg), 1e-30)))
    nll = 0.5 * (n - q) * jnp.log(sigma2) + 0.5 * logdet_a + 0.5 * logdet_g

    # ---- gradient: one chunked contraction pass ---------------------------
    # C = (A^-1 H) Lg^-T  ->  C C^T = (A^-1 H) G^-1 (A^-1 H)^T
    c_mat = lax.linalg.triangular_solve(
        lg, ainv_h.T, left_side=True, lower=True
    ).T                                                    # (n, q)
    c_coef = (n - q) / (2.0 * resid)
    delta2 = jnp.exp(2.0 * params.log_delta)
    inv_p = 1.0 / cfg.num_probes

    n_chunks = -(-n // cfg.chunk)
    n_pad = n_chunks * cfg.chunk

    def pad(a):
        return jnp.pad(a, ((0, n_pad - a.shape[0]),) + ((0, 0),) * (a.ndim - 1))

    xc = pad(x).reshape(n_chunks, cfg.chunk, d)
    cc = pad(c_mat).reshape(n_chunks, cfg.chunk, q)
    ec = pad(e).reshape(n_chunks, cfg.chunk)
    zc = pad(z).reshape(n_chunks, cfg.chunk, cfg.num_probes)
    wc = pad(wz).reshape(n_chunks, cfg.chunk, cfg.num_probes)
    # padded rows: x rows are zero -> corr entries vs real rows are
    # harmless because every weight row (c_mat, e, z, wz) is zero there.

    def chunk_terms(args):
        x_c, c_c, e_c, z_c, w_c = args
        a_c = gaussian_corr(x_c, x, params)               # (chunk, n)
        # low-rank W2 rows: -1/2 C_c C^T - c e_c e^T
        w2_c = -0.5 * (c_c @ c_mat.T) - c_coef * jnp.outer(e_c, e)
        m2_c = w2_c * a_c
        # per-dim contraction pieces for  sum_ij M_ij (x_il - x_jl)^2
        row_sum = jnp.sum(m2_c, axis=1)                   # (chunk,)
        col_sum = jnp.sum(m2_c, axis=0)                   # (n,)
        mx = m2_c @ x                                     # (chunk, d)
        quad = jnp.sum(x_c * mx, axis=0)                  # (d,)
        t1_row = row_sum @ (x_c * x_c)                    # (d,)
        # Hutchinson piece: (1/p) sum_z w_z^T (dA_l z) with dA_l =
        # A o (2 (xi_l - xj_l)^2 / delta_l^2); expand the square:
        #   sum_ij Wp_ij A_ij (x_il - x_jl)^2
        # with Wp = (1/p) W_z Z^T (rank-p, never formed): same identity.
        wp_c = inv_p * (w_c @ z.T)                        # (chunk, n)
        mp_c = 0.5 * wp_c * a_c
        row_sum_p = jnp.sum(mp_c, axis=1)
        col_sum_p = jnp.sum(mp_c, axis=0)
        mxp = mp_c @ x
        quad_p = jnp.sum(x_c * mxp, axis=0)
        t1_row_p = row_sum_p @ (x_c * x_c)
        return (t1_row + t1_row_p, col_sum + col_sum_p, quad + quad_p)

    t1_rows, col_sums, quads = lax.map(
        chunk_terms, (xc, cc, ec, zc, wc)
    )
    t1 = jnp.sum(t1_rows, axis=0) + jnp.sum(col_sums, axis=0) @ (x * x)
    quad = jnp.sum(quads, axis=0)
    grad_log_delta = (2.0 / delta2) * (t1 - 2.0 * quad)

    # nugget: nugget * tr(W); tr(A^-1) by Hutchinson, low-rank traces exact
    tr_ainv = inv_p * jnp.sum(z * wz)
    tr_w = (
        0.5 * tr_ainv
        - 0.5 * jnp.sum(c_mat * c_mat)
        - c_coef * jnp.sum(e * e)
    )
    grad_log_nugget = params.nugget * tr_w

    grads = GPParams(
        grad_log_delta,
        jnp.zeros_like(params.log_sigma2),
        grad_log_nugget,
    )
    aux = {"sigma2": sigma2, "beta": beta, "e": e, "resid": resid,
           "logdet_a": logdet_a, "cg_info": cg_info}
    return nll, grads, aux


@fp32_exact
def mle_fit_matrix_free(key, x, y, h, *, steps: int = 150,
                        learning_rate: float = 0.05,
                        init: GPParams | None = None,
                        train_nugget: bool = True,
                        min_nugget: float = 1e-5,
                        delta_bounds: tuple = (1e-3, 1e3),
                        cfg: MFConfig = MFConfig()):
    """Adam on the matrix-free concentrated NLL (SAA: probes fixed per fit).

    For n where gp.fit/mle_fit are feasible prefer those (exact, faster);
    this is the path for n past the factorization wall. Returns
    (GPParams, info dict with the NLL trace).

    Iterates are PROJECTED into [min_nugget, inf) x delta_bounds after
    every update: CG/SLQ need the conditioning the nugget provides — an
    unconstrained step into a tiny nugget stalls CG, corrupts the
    gradient estimate, and sends the optimizer off the rails (observed).
    Initialize from a subset MLE (gp.mle_fit on a few thousand points)
    when possible.
    """
    import optax

    x = jnp.asarray(x)
    y = jnp.asarray(y)
    h = jnp.asarray(h)
    d = x.shape[1]
    dtype = x.dtype
    if init is None:
        init = GPParams(
            jnp.zeros(d, dtype), jnp.zeros((), dtype),
            jnp.asarray(jnp.log(1e-4), dtype),
        )
    k_probe, _ = jax.random.split(key)

    opt = optax.adam(learning_rate)

    def loss_grad(p):
        nll, grads, _ = nll_and_grad_matrix_free(p, x, y, h, k_probe, cfg)
        if not train_nugget:
            grads = GPParams(grads.log_delta,
                             jnp.zeros_like(grads.log_sigma2),
                             jnp.zeros_like(grads.log_nugget))
        return nll, grads

    lo_d = jnp.log(jnp.asarray(delta_bounds[0], dtype))
    hi_d = jnp.log(jnp.asarray(delta_bounds[1], dtype))
    lo_n = jnp.log(jnp.asarray(min_nugget, dtype))

    def project(p):
        return GPParams(
            jnp.clip(p.log_delta, lo_d, hi_d),
            p.log_sigma2,
            jnp.maximum(p.log_nugget, lo_n),
        )

    def step(carry, _):
        p, opt_state = carry
        nll, grads = loss_grad(p)
        updates, opt_state = opt.update(grads, opt_state, p)
        p = project(optax.apply_updates(p, updates))
        return (p, opt_state), nll

    init = project(init)
    run = jax.jit(lambda c: lax.scan(step, c, None, length=steps))
    (p_final, _), trace = run((init, opt.init(init)))
    return p_final, {"nll_trace": trace}

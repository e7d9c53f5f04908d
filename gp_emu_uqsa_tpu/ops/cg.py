"""Matrix-free kernel matvecs + batched conjugate gradients.

Beyond-reference capability (GPyTorch-style "blackbox matrix-matrix"
inference, PAPERS.md): at n = 64k the correlation matrix is 16 GB fp32 and
cannot be materialized, but A @ v only needs (chunk, n) correlation blocks
built on the fly — O(n) memory, O(n^2 d) FLOPs, all MXU GEMMs. Combined
with batched CG this gives solves A^-1 B without any factorization, which
unlocks mean-serving and GLS estimation far past the Cholesky memory wall.

Two matvec backends:
  * XLA chunked (`make_corr_matvec`): lax.map over row chunks; runs on any
    backend, used by tests;
  * the fused Pallas kernel (`ops/serve.corr_matvec_pallas`) computes the
    same contraction with the correlation tile kept in VMEM — plug it in as
    `matvec=lambda v: corr_matvec_pallas(x, x, delta, v) + shift * v` on TPU.

Logdet/NLL live elsewhere in the matrix-free stack: `ops/slq.py` (stochastic
Lanczos quadrature) and `inference/matrix_free.py` (BBMM-style NLL+gradient
and Adam MLE) build on these matvecs/solves.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from gp_emu_uqsa_tpu.kernels import GPParams, gaussian_corr
from gp_emu_uqsa_tpu.ops.precision import fp32_exact


@fp32_exact
def make_corr_matvec(x, params: GPParams, *, noise_diag=None,
                     chunk: int = 4096):
    """Matvec closure v -> (C(x,x) + (nugget + noise) I) v, O(chunk*n) memory.

    v may be (n,) or (n, k). Row chunks of the correlation matrix are built
    on the fly inside lax.map (compiled loop, no host round-trips).
    """
    x = jnp.asarray(x)
    n = x.shape[0]
    nugget = jnp.exp(params.log_nugget)
    shift = nugget if noise_diag is None else nugget + jnp.asarray(noise_diag)
    n_chunks = -(-n // chunk)
    n_pad = n_chunks * chunk
    x_rows = jnp.pad(x, ((0, n_pad - n), (0, 0))).reshape(n_chunks, chunk, -1)

    def matvec(v):
        squeeze = v.ndim == 1
        vv = v[:, None] if squeeze else v

        def one(x_chunk):
            c = gaussian_corr(x_chunk, x, params)      # (chunk, n)
            return c @ vv

        av = lax.map(one, x_rows).reshape(n_pad, vv.shape[1])[:n]
        av = av + shift[:, None] * vv if shift.ndim else av + shift * vv
        return av[:, 0] if squeeze else av

    return matvec


@partial(jax.jit, static_argnames=("matvec", "maxiter", "precond"))
@fp32_exact
def cg_solve(matvec, b, *, tol: float = 1e-6, maxiter: int = 256,
             precond=None):
    """Batched (preconditioned) conjugate gradients, column-independent.

    b: (n,) or (n, k). `precond`, if given, applies M^-1 (e.g. from
    `pivoted_chol_precond`). Stops when every column's relative residual
    is below tol (checked inside one lax.while_loop) or at maxiter.
    Returns (x, info) with info = {"iters", "rel_resid" (k,)}.
    """
    squeeze = b.ndim == 1
    bb = b[:, None] if squeeze else b
    bnorm = jnp.maximum(jnp.linalg.norm(bb, axis=0), 1e-30)   # (k,)
    apply_m = precond if precond is not None else (lambda v: v)

    x0 = jnp.zeros_like(bb)
    r0 = bb - matvec(x0)
    z0 = apply_m(r0)
    p0 = z0
    rz0 = jnp.sum(r0 * z0, axis=0)                            # (k,)
    rs0 = jnp.sum(r0 * r0, axis=0)

    def cond(s):
        i, _, r, _, rz, rs = s
        return jnp.logical_and(
            i < maxiter,
            jnp.any(jnp.sqrt(rs) / bnorm > tol),
        )

    def body(s):
        i, x, r, p, rz, rs = s
        ap = matvec(p)
        denom = jnp.sum(p * ap, axis=0)
        alpha = jnp.where(denom > 0, rz / jnp.maximum(denom, 1e-30), 0.0)
        x = x + alpha * p
        r = r - alpha * ap
        z = apply_m(r)
        rz_new = jnp.sum(r * z, axis=0)
        beta = rz_new / jnp.maximum(rz, 1e-30)
        p = z + beta * p
        return i + 1, x, r, p, rz_new, jnp.sum(r * r, axis=0)

    i, x, r, p, rz, rs = lax.while_loop(
        cond, body, (jnp.asarray(0), x0, r0, p0, rz0, rs0)
    )
    info = {"iters": i, "rel_resid": jnp.sqrt(rs) / bnorm}
    return (x[:, 0] if squeeze else x), info


@fp32_exact
def pivoted_cholesky(x, params: GPParams, rank: int):
    """Rank-r pivoted (partial) Cholesky of the correlation matrix.

    Greedy max-residual-diagonal pivoting; each step touches one
    correlation COLUMN built on the fly — O(n r (d + r)) total, no n^2
    object. Returns (l (n, rank), pivots (rank,)). This is the GPyTorch
    preconditioner construction for CG on kernel systems.
    """
    x = jnp.asarray(x)
    n = x.shape[0]
    dtype = x.dtype

    def body(j, s):
        l, diag_res, pivots = s
        i_star = jnp.argmax(diag_res)
        col = gaussian_corr(x, x[i_star][None, :], params)[:, 0]   # (n,)
        proj = l @ l[i_star]                                       # (n,)
        d_star = jnp.maximum(diag_res[i_star], 1e-30)
        l_new = (col - proj) / jnp.sqrt(d_star)
        # numerically clean: the pivot row of the residual must vanish
        l = l.at[:, j].set(l_new)
        diag_res = jnp.maximum(diag_res - l_new * l_new, 0.0)
        diag_res = diag_res.at[i_star].set(0.0)
        return l, diag_res, pivots.at[j].set(i_star.astype(jnp.int32))

    l0 = jnp.zeros((n, rank), dtype)
    diag0 = jnp.ones((n,), dtype)       # corr(x_i, x_i) = 1
    piv0 = jnp.zeros((rank,), jnp.int32)
    l, _, pivots = lax.fori_loop(0, rank, body, (l0, diag0, piv0))
    return l, pivots


@fp32_exact
def woodbury_ops(l, d):
    """Factored operators for M = L L^T + diag(d)  (preconditioner algebra).

    Writing M = D^1/2 (I + W W^T) D^1/2 with W = D^-1/2 L, and
    W^T W = V diag(s) V^T (r x r eigh), any power of (I + W W^T) is
    I + W V diag((1+s)^a - 1)/s V^T W^T — identity off range(W). Returns:

      apply_minv(v)   : M^-1 v                      (Woodbury)
      apply_binv(v)   : B^-1 v,  B = D^1/2 (I+WW^T)^1/2  (so B B^T = M)
      apply_binv_t(v) : B^-T v
      logdet_m        : log|M| = sum log d + sum log(1+s)

    B^-1 A B^-T is SPD and similar to M^-1 A — the operator preconditioned
    SLQ runs Lanczos on. All applies are O(n r).
    """
    d = jnp.asarray(d)
    rank = l.shape[1]
    sqrt_d = jnp.sqrt(d)
    w = l / sqrt_d[:, None]
    s, v = jnp.linalg.eigh(w.T @ w)                  # (r,), (r, r)
    s = jnp.maximum(s, 0.0)
    logdet_m = jnp.sum(jnp.log(d)) + jnp.sum(jnp.log1p(s))

    def _pow_apply(vv, a):
        # (I + W W^T)^a vv
        coef = (jnp.power(1.0 + s, a) - 1.0) / jnp.maximum(s, 1e-30)
        t = v.T @ (w.T @ vv)                         # (r, k)
        return vv + w @ (v @ (coef[:, None] * t))

    def apply_minv(vv):
        squeeze = vv.ndim == 1
        u = vv[:, None] if squeeze else vv
        out = _pow_apply(u / sqrt_d[:, None], -1.0) / sqrt_d[:, None]
        return out[:, 0] if squeeze else out

    def apply_binv(vv):
        squeeze = vv.ndim == 1
        u = vv[:, None] if squeeze else vv
        out = _pow_apply(u / sqrt_d[:, None], -0.5)
        return out[:, 0] if squeeze else out

    def apply_binv_t(vv):
        squeeze = vv.ndim == 1
        u = vv[:, None] if squeeze else vv
        out = _pow_apply(u, -0.5) / sqrt_d[:, None]
        return out[:, 0] if squeeze else out

    return {"apply_minv": apply_minv, "apply_binv": apply_binv,
            "apply_binv_t": apply_binv_t, "logdet_m": logdet_m}


def pivoted_chol_precond(x, params: GPParams, rank: int = 64,
                         *, noise_diag=None):
    """M^-1 closure for cg_solve, M = L_r L_r^T + (nugget + noise) I.

    Woodbury: M^-1 v = D^-1 v - D^-1 L (I + L^T D^-1 L)^-1 L^T D^-1 v
    with D the diagonal shift — O(n r) per apply after an O(n r^2) setup.
    """
    l, _ = pivoted_cholesky(x, params, rank)
    nugget = jnp.exp(params.log_nugget)
    d = nugget if noise_diag is None else nugget + jnp.asarray(noise_diag)
    d = jnp.broadcast_to(jnp.asarray(d), (l.shape[0],))
    dinv_l = l / d[:, None]                                   # (n, r)
    small = jnp.eye(rank, dtype=l.dtype) + l.T @ dinv_l       # (r, r)
    small_chol = jnp.linalg.cholesky(small)

    def apply_m(v):
        squeeze = v.ndim == 1
        vv = v[:, None] if squeeze else v
        dv = vv / d[:, None]
        t = dinv_l.T @ vv                                     # (r, k)
        t = jax.scipy.linalg.cho_solve((small_chol, True), t)
        out = dv - dinv_l @ t
        return out[:, 0] if squeeze else out

    return apply_m


@fp32_exact
def fit_matrix_free(params: GPParams, x, y, h, *, noise_diag=None,
                    chunk: int = 4096, tol: float = 1e-6, maxiter: int = 512,
                    precond_rank: int = 0):
    """Factorization-free GP 'fit' at fixed hyperparameters.

    Computes via CG: A^-1 [y | H], GLS beta, the serving weights
    e = A^-1 (y - H beta), and the MUCM sigma2-hat — everything the
    mean-serving path needs, with A never materialized. No logdet, so no
    NLL: use the factorized paths (gp.fit / parallel.fit_large) to CHOOSE
    hyperparameters, this to APPLY them at scales past the Cholesky wall.

    Returns dict(beta, e, sigma2, g, info).
    """
    x = jnp.asarray(x)
    y = jnp.asarray(y)
    h = jnp.asarray(h)
    n, q = h.shape
    matvec = make_corr_matvec(x, params, noise_diag=noise_diag, chunk=chunk)
    rhs = jnp.concatenate([y[:, None], h], axis=1)
    precond = (pivoted_chol_precond(x, params, rank=precond_rank,
                                    noise_diag=noise_diag)
               if precond_rank > 0 else None)
    sol, info = cg_solve(matvec, rhs, tol=tol, maxiter=maxiter,
                         precond=precond)
    ainv_y, ainv_h = sol[:, 0], sol[:, 1:]
    g = h.T @ ainv_h
    g = 0.5 * (g + g.T)
    beta = jnp.linalg.solve(g, h.T @ ainv_y)
    e = ainv_y - ainv_h @ beta
    resid = jnp.maximum(y @ e, 0.0)      # y^T A^-1 (y - H beta) = e-form
    sigma2 = resid / (n - q - 2)
    return {"beta": beta, "e": e, "sigma2": sigma2, "g": g, "info": info,
            "ainv_h": ainv_h}


@fp32_exact
def predict_mean_matrix_free(fit: dict, x, xstar, hstar, params: GPParams,
                             *, chunk: int = 65536):
    """Posterior mean at xstar from a fit_matrix_free result.

    Streams (chunk, n) cross-correlation blocks; on TPU prefer
    ops.serve.corr_matvec_pallas for the fused version of the same
    contraction.
    """
    x = jnp.asarray(x)
    xstar = jnp.asarray(xstar)
    hstar = jnp.asarray(hstar)
    m = xstar.shape[0]
    n_chunks = -(-m // chunk)
    m_pad = n_chunks * chunk
    xs = jnp.pad(xstar, ((0, m_pad - m), (0, 0))).reshape(n_chunks, chunk, -1)

    def one(xc):
        return gaussian_corr(xc, x, params) @ fit["e"]

    ce = lax.map(one, xs).reshape(m_pad)[:m]
    return hstar @ fit["beta"] + ce

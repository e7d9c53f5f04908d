"""Pure-functional GP core: likelihoods, fit state, universal-kriging posterior.

Mathematical spec (SURVEY.md S7, MUCM toolkit; reference behavior lives in
`_emulatorclasses.py::Optimize/Posterior`):

  model      y(x) = h(x)^T beta + Z(x),  cov[Z] = sigma^2 c(x,x'),
             c the Gaussian correlation (kernels.py) + nugget nu on the diag.
  beta       GLS:  beta_hat = G^{-1} H^T A^{-1} y,  G = H^T A^{-1} H.
  sigma^2    MUCM mode: profiled analytically,
             sigma2_hat = y^T (A^{-1} - A^{-1} H G^{-1} H^T A^{-1}) y / (n-q-2).
  NLL mucm   (n-q)/2 log sigma2_hat + 1/2 log|A| + 1/2 log|G|   (+const).
  NLL gp4ml  full marginal likelihood with explicit sigma^2 and beta profiled:
             1/2 [ resid/sigma^2 + n log sigma^2 + log|A| + n log 2pi ].
  posterior  m*(x)  = h(x)^T beta_hat + t(x)^T e,  e = A^{-1}(y - H beta_hat)
             v*(x,x') = sigma2 [ c(x,x') - t(x)^T A^{-1} t(x')
                                 + R(x) G^{-1} R(x')^T ],
             R(x) = h(x)^T - t(x)^T A^{-1} H.
  validation standardized errors; Mahalanobis D = err^T V*^{-1} err with
             E[D] = n_V, Var[D] = 2 n_V (n_V + n - q - 2)/(n - q - 4).

Everything is expressed through one Cholesky of A (and of the q x q G), via
triangular solves only — no explicit inverses — so a single factorization is
reused across NLL, posterior, diagnostics and the UQSA integrals. All
functions are jit/vmap/grad-safe (NaN-guarded NLLs return +inf on failed
factorizations so multi-restart optimization and HMC skip bad regions).
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from gp_emu_uqsa_tpu.kernels import GPParams, corr, corr_self, gaussian_corr_self
from gp_emu_uqsa_tpu.ops.cholesky import (
    cholesky_with_jitter, tri_inverse, tri_solve, tri_solve_auto,
)
from gp_emu_uqsa_tpu.ops.precision import fp32_exact

_LOG2PI = 1.8378770664093453


class FitState(NamedTuple):
    """Sufficient statistics of a fitted GP, reused by posterior & UQSA.

    Shapes: n training points, q basis functions, d active dims.
    """

    params: GPParams
    l: jax.Array          # (n, n) lower Cholesky of A (+jitter)
    lg: jax.Array         # (q, q) lower Cholesky of G = H^T A^-1 H
    beta: jax.Array       # (q,)   GLS beta_hat
    e: jax.Array          # (n,)   A^-1 (y - H beta_hat)
    sigma2: jax.Array     # ()     sigma2_hat (mucm) or explicit sigma2 (gp4ml)
    ainv_h: jax.Array     # (n, q) A^-1 H
    jitter: jax.Array     # ()     jitter added to factorize A
    nll: jax.Array        # ()     NLL at these params


@fp32_exact
def _common(params: GPParams, x, y, h, noise_diag=None, ladder=True,
            family: str = "gaussian"):
    """Shared pipeline: factorize A, whiten y and H, GLS beta, residual.

    Returns everything both likelihood modes and the fit state need.
    noise_diag: optional per-point noise variances added to the diagonal
    (heteroscedastic nugget, in correlation units) — the Goldberg-style
    noise-fit path (noise_fit/).
    ladder=False uses a single plain Cholesky (no jitter retry): required in
    code that compiles under shard_map — the retry while_loop (cholesky in
    its cond) makes the SPMD partitioner pathologically slow — and fine for
    samplers, which reject non-finite energies anyway.
    """
    a = corr_self(x, params, family)
    if noise_diag is not None:
        a = a + jnp.diag(jnp.asarray(noise_diag, a.dtype))
    if ladder:
        l, jitter = cholesky_with_jitter(a)
    else:
        l = lax.linalg.cholesky(a, symmetrize_input=False)
        jitter = jnp.asarray(0.0, a.dtype)
    # one multi-RHS TRSM for [y | H]: skinny triangular solves on TPU are
    # latency-bound, so batching RHS is ~free (measured in fit_total)
    linv_yh = tri_solve_auto(l, jnp.concatenate([y[:, None], h], axis=1))
    linv_y = linv_yh[:, 0]                           # L^-1 y
    linv_h = linv_yh[:, 1:]                          # L^-1 H
    g = linv_h.T @ linv_h                            # H^T A^-1 H
    q = h.shape[1]
    lg = jax.lax.linalg.cholesky(
        g + jnp.asarray(0.0, g.dtype) * jnp.eye(q, dtype=g.dtype),
        symmetrize_input=True,
    )
    hty = linv_h.T @ linv_y                          # H^T A^-1 y
    lg_inv_hty = tri_solve(lg, hty[:, None])[:, 0]   # Lg^-1 H^T A^-1 y
    beta = tri_solve(lg, lg_inv_hty[:, None], trans=True)[:, 0]
    # y^T A^-1 y - (H^T A^-1 y)^T G^-1 (H^T A^-1 y)  (>=0 up to rounding)
    resid = jnp.maximum(
        jnp.sum(linv_y * linv_y) - jnp.sum(lg_inv_hty * lg_inv_hty), 0.0
    )
    logdet_a = 2.0 * jnp.sum(jnp.log(jnp.diagonal(l)))
    logdet_g = 2.0 * jnp.sum(jnp.log(jnp.diagonal(lg)))
    return a, l, jitter, linv_y, linv_h, lg, beta, resid, logdet_a, logdet_g


def _guard(nll: jax.Array) -> jax.Array:
    return jnp.where(jnp.isfinite(nll), nll, jnp.asarray(jnp.inf, nll.dtype))


def nll_mucm_ad(params: GPParams, x, y, h, noise_diag=None,
                ladder=True, family: str = "gaussian") -> jax.Array:
    """Concentrated NLL via plain autodiff (reference for the custom VJP)."""
    n, q = h.shape[0], h.shape[1]
    (_, _, _, _, _, _, _, resid, logdet_a, logdet_g) = _common(
        params, x, y, h, noise_diag, ladder, family
    )
    dof = n - q - 2
    sigma2_hat = resid / dof
    nll = 0.5 * (n - q) * jnp.log(sigma2_hat) + 0.5 * logdet_a + 0.5 * logdet_g
    return _guard(nll)


@partial(jax.custom_vjp, nondiff_argnums=(4,))
def _nll_mucm_cvjp(params: GPParams, x, y, h, ladder=True):
    return nll_mucm_ad(params, x, y, h, ladder=ladder)


def _nll_mucm_fwd(params, x, y, h, ladder=True):
    n, q = h.shape[0], h.shape[1]
    (_, l, _, linv_y, linv_h, lg, beta, resid, logdet_a, logdet_g) = _common(
        params, x, y, h, None, ladder
    )
    dof = n - q - 2
    nll = 0.5 * (n - q) * jnp.log(resid / dof) + 0.5 * logdet_a + 0.5 * logdet_g
    e = tri_solve_auto(l, (linv_y - linv_h @ beta)[:, None], trans=True)[:, 0]
    return _guard(nll), (params, x, l, linv_h, lg, e, resid)


@fp32_exact
def _nll_mucm_bwd(ladder, res, ct):
    """Analytic adjoint (SURVEY.md S9.4 'custom VJP re-using the factor').

    dNLL/dA = 1/2 A^-1 - 1/2 (A^-1 H) G^-1 (A^-1 H)^T
              - (n-q)/(2 resid) e e^T
    then chained through A(delta, nugget):
      dA_ij/dlog delta_l = A_ij * 2 ((x_il-x_jl)/delta_l)^2
      dA/dlog nugget     = nugget * I
    The per-dim contraction collapses to rank-1 reductions:
      sum_ij M_ij (x_il-x_jl)^2 = (r+c)^T x_l^2 - 2 x_l^T M x_l,
    with M = W (*) A, r/c the row/col sums of M — O(n^2 d) total, all
    GEMM-shaped, reusing the forward factor (no Cholesky adjoint pass).
    """
    params, x, l, linv_h, lg, e, resid = res
    n = x.shape[0]
    q = linv_h.shape[1]
    dtype = x.dtype
    linv = tri_inverse(l)
    ainv = linv.T @ linv
    ainv_h = tri_solve_auto(l, linv_h, trans=True)            # (n, q)
    lg_inv_ah = tri_solve(lg, ainv_h.T)                  # (q, n) = Lg^-1 H^T A^-T
    w = (
        0.5 * ainv
        - 0.5 * (lg_inv_ah.T @ lg_inv_ah)
        - ((n - q) / (2.0 * resid)) * jnp.outer(e, e)
    )
    delta2 = jnp.exp(2.0 * params.log_delta)
    a_mat = gaussian_corr_self(x, params)
    m = w * a_mat
    rc = jnp.sum(m, axis=0) + jnp.sum(m, axis=1)         # r + c (symmetric M)
    t1 = rc @ (x * x)                                     # (d,)
    t2 = jnp.sum(x * (m @ x), axis=0)                     # (d,)
    grad_log_delta = (2.0 / delta2) * (t1 - 2.0 * t2) * ct
    grad_log_nugget = params.nugget * jnp.trace(w) * ct
    grad_params = GPParams(
        grad_log_delta,
        jnp.zeros_like(params.log_sigma2),
        grad_log_nugget,
    )
    # dNLL/dy = (n-q)/resid * P y = (n-q)/resid * e  (exact, cheap).
    grad_y = ((n - q) / resid) * e * ct
    # x and h cotangents are not needed by any caller (hyperparameter
    # optimization/sampling differentiates w.r.t. params only); returning
    # zeros keeps them formally defined.
    return (grad_params, jnp.zeros_like(x), grad_y, jnp.zeros((n, q), dtype))


_nll_mucm_cvjp.defvjp(_nll_mucm_fwd, _nll_mucm_bwd)


def nll_mucm(params: GPParams, x, y, h, noise_diag=None,
             ladder: bool = True, family: str = "gaussian") -> jax.Array:
    """Concentrated (MUCM) negative log-likelihood; sigma^2 profiled out.

    Reference: `Optimize.loglikelihood_mucm` (SURVEY.md S3/S4.2). Uses the
    analytic custom VJP (factor-reusing adjoint) on the no-noise_diag hot
    path; the heteroscedastic path falls back to autodiff.
    """
    if noise_diag is None and family == "gaussian":
        return _nll_mucm_cvjp(params, x, y, h, ladder)
    return nll_mucm_ad(params, x, y, h, noise_diag, ladder, family)


def nll_gp4ml(params: GPParams, x, y, h, noise_diag=None,
              ladder: bool = True, family: str = "gaussian") -> jax.Array:
    """Full marginal NLL with explicit sigma^2 (beta profiled via GLS).

    Reference: `Optimize.loglikelihood_gp4ml` (SURVEY.md S3/S4.2).
    """
    n = h.shape[0]
    (_, _, _, _, _, _, _, resid, logdet_a, _) = _common(
        params, x, y, h, noise_diag, ladder, family
    )
    s2 = params.sigma2
    nll = 0.5 * (resid / s2 + n * jnp.log(s2) + logdet_a + n * _LOG2PI)
    return _guard(nll)


def nll(params: GPParams, x, y, h, *, mode: str = "mucm",
        noise_diag=None, ladder: bool = True,
        family: str = "gaussian") -> jax.Array:
    if mode == "mucm":
        return nll_mucm(params, x, y, h, noise_diag, ladder, family)
    if mode == "gp4ml":
        return nll_gp4ml(params, x, y, h, noise_diag, ladder, family)
    raise ValueError(f"unknown likelihood mode {mode!r}")


@fp32_exact
def fit(params: GPParams, x, y, h, *, mode: str = "mucm",
        noise_diag=None, family: str = "gaussian",
        refine: int = 0) -> FitState:
    """Build the posterior sufficient statistics at fixed hyperparameters.

    `family` selects the correlation family (kernels.CORR_FAMILIES); it is a
    static Python string, NOT stored in the (pytree) fit state — pass the
    same family to predict()/validate() (the Emulator facade does this).

    `refine`: mixed-precision iterative-refinement sweeps on the A-solves
    for e and A^-1 H (the quantities every downstream prediction reuses).
    The fp32-at-scale path (n >= 8k on TPU) should pass refine=1: each
    sweep costs one n^2 (q+1) twice-working-precision residual (fp32 work:
    compensated-fp32 Dot2, ops/compensated.py — no fp64 unit or
    jax_enable_x64 needed; fp64 work: fp64 GEMM) + one cho_solve —
    O(n^2) vs the O(n^3/3) factorization — and cuts the solve's forward
    error by ~kappa(A) * eps_f32 per sweep (docs/numerics.md).
    """
    n, q = h.shape[0], h.shape[1]
    (a, l, jitter, linv_y, linv_h, lg, beta, resid, logdet_a, logdet_g) = _common(
        params, x, y, h, noise_diag, True, family
    )
    if mode == "mucm":
        sigma2 = resid / (n - q - 2)
        nll_val = 0.5 * (n - q) * jnp.log(sigma2) + 0.5 * logdet_a + 0.5 * logdet_g
    else:
        sigma2 = params.sigma2
        nll_val = 0.5 * (resid / sigma2 + n * jnp.log(sigma2) + logdet_a + n * _LOG2PI)
    # e = A^-1 (y - H beta) = L^-T (L^-1 y - L^-1 H beta); fused with the
    # A^-1 H backward solve (one multi-RHS TRSM, see _common)
    back = tri_solve_auto(
        l,
        jnp.concatenate([(linv_y - linv_h @ beta)[:, None], linv_h], axis=1),
        trans=True,
    )
    if refine:
        # mixed-precision iterative refinement on A_eff [e | A^-1 H] =
        # [y-Hb | H], A_eff = a + jitter I (what the factor factorizes).
        # Residual at ~twice working precision: in working precision the
        # sweep stalls at the Skeel limit (docs/numerics.md, Wilkinson).
        from gp_emu_uqsa_tpu.ops.cholesky import cho_solve

        if a.dtype == jnp.float64:
            rt = jnp.float64
            a_r = a.astype(rt)
            jit_r = jitter.astype(rt)
            rhs = jnp.concatenate(
                [(y.astype(rt) - h.astype(rt) @ beta.astype(rt))[:, None],
                 h.astype(rt)], axis=1,
            )
            hi = lax.Precision.HIGHEST
            for _ in range(refine):
                back_r = back.astype(rt)
                r = (rhs - (jnp.matmul(a_r, back_r, precision=hi)
                            + jit_r * back_r)).astype(back.dtype)
                back = back + cho_solve(l, r)
        else:
            # compensated-fp32 path (no fp64 unit / x64 flag needed):
            # the y - H beta RHS itself is formed as a double-word pair
            # via Dot2 so its formation rounding does not cap the floor
            from gp_emu_uqsa_tpu.ops.compensated import (
                residual_compensated, two_sum, dot2,
            )

            hb_hi, hb_lo = dot2(h, beta)
            s0, e0 = two_sum(y, -hb_hi)
            rhs_hi = jnp.concatenate([s0[:, None], h], axis=1)
            rhs_lo = jnp.concatenate(
                [(e0 - hb_lo)[:, None], jnp.zeros_like(h)], axis=1)
            for _ in range(refine):
                r = residual_compensated(a, back, rhs_hi, jitter=jitter,
                                         b_lo=rhs_lo)
                back = back + cho_solve(l, r)
    e = back[:, 0]
    ainv_h = back[:, 1:]
    return FitState(params, l, lg, beta, e, sigma2, ainv_h, jitter, _guard(nll_val))


@fp32_exact
def _posterior_pieces(state: FitState, x, h, xstar, hstar,
                      family: str = "gaussian"):
    """Cross-correlation and whitened solves shared by mean/var paths."""
    c_star = corr(xstar, x, state.params, family)     # (m, n)
    mean = hstar @ state.beta + c_star @ state.e
    linv_t = tri_solve_auto(state.l, c_star.T)             # (n, m) = L^-1 t(x*)
    r = hstar - c_star @ state.ainv_h                 # (m, q) R(x*)
    lg_inv_r = tri_solve(state.lg, r.T)               # (q, m)
    return c_star, mean, linv_t, r, lg_inv_r


@fp32_exact
def predict(
    state: FitState,
    x,
    h,
    xstar,
    hstar,
    *,
    full_cov: bool = False,
    include_nugget: bool = False,
    family: str = "gaussian",
):
    """Universal-kriging posterior mean and (co)variance at xstar.

    Returns (mean (m,), var (m,) or cov (m, m)). In MUCM mode state.sigma2
    already carries the n-q-2 divisor, so `var` is the Student-t predictive
    variance with n-q degrees of freedom, matching the reference.
    """
    _, mean, linv_t, _, lg_inv_r = _posterior_pieces(
        state, x, h, xstar, hstar, family
    )
    prior_diag = 1.0 + (state.params.nugget if include_nugget else 0.0)
    if full_cov:
        c_ss = corr(xstar, xstar, state.params, family)
        if include_nugget:
            c_ss = c_ss + state.params.nugget * jnp.eye(
                xstar.shape[0], dtype=c_ss.dtype
            )
        cov = c_ss - linv_t.T @ linv_t + lg_inv_r.T @ lg_inv_r
        cov = state.sigma2 * 0.5 * (cov + cov.T)
        return mean, cov
    var = prior_diag - jnp.sum(linv_t * linv_t, axis=0) + jnp.sum(
        lg_inv_r * lg_inv_r, axis=0
    )
    return mean, state.sigma2 * jnp.maximum(var, 0.0)


class Predictor(NamedTuple):
    """Serving-path state: everything prediction needs, GEMM-only.

    TPU-first design: the exact predict() path pays an O(n^2 m) triangular
    solve per batch — TRSM maps poorly onto the MXU. Precomputing
    W = L^-1 (one O(n^3) cost at fit time) turns the variance term
    t(x)^T A^-1 t(x) into the WHITENED quadratic |W t(x)|^2 — a plain GEMM
    + cancellation-free sum of squares — and the R-term likewise, so
    batched prediction runs at matmul speed.

    Round-4 note: the previous layout stored A^-1 and computed
    sum((c @ A^-1) * c, 1). That form cancels 1/nugget-scale entries down
    to O(1 - quad): adjudicated against an fp64 reference at n=16384
    (nugget at the fp32 ladder floor), its median quadratic error was
    6.1e-2 — i.e. O(100%) of the predictive variance — while the whitened
    form measures 6.1e-6 max at identical FLOP cost (docs/numerics.md).
    The |.|^2 reduction cannot cancel, so every term it sums is exact-
    positive; all the cancellation happens inside the fp32 MXU
    accumulator of one GEMM row.
    """

    params: GPParams
    beta: jax.Array       # (q,)
    e: jax.Array          # (n,)
    linv: jax.Array       # (n, n) lower-triangular W = L^-1
    ainv_h_w: jax.Array   # (n, q) A^-1 H G^-1 (half of the R-term quadratic)
    ainv_h: jax.Array     # (n, q)
    w_chol: jax.Array     # (q, q) lower chol of G^-1
    sigma2: jax.Array


@fp32_exact
def predictor(state: FitState, x=None, h=None) -> Predictor:
    """Build the GEMM-only serving predictor from a fit state.

    One O(n^3/2) triangular inversion (OOM-safe blocked recursion above
    BLOCKED_TRSM_THRESHOLD — the one-shot (n, n) TRSM made XLA:TPU
    materialize 65 GB of update-slice temps at n=16k); the round-3 layout
    additionally paid an n^3 HIGHEST GEMM to square it into A^-1, which
    the whitened form no longer needs.
    """
    dtype = state.l.dtype
    from gp_emu_uqsa_tpu.ops.cholesky import tri_inverse

    linv = jnp.tril(tri_inverse(state.l))
    q = state.lg.shape[0]
    lg_inv = tri_solve(state.lg, jnp.eye(q, dtype=dtype))
    w = lg_inv.T @ lg_inv                      # G^-1
    w_chol = lax.linalg.cholesky(w, symmetrize_input=True)
    return Predictor(
        state.params, state.beta, state.e, linv, state.ainv_h @ w,
        state.ainv_h, w_chol, state.sigma2,
    )


@fp32_exact
def predict_fast(pred: Predictor, x, xstar, hstar, *, include_nugget=False,
                 family: str = "gaussian", quad_precision: str = "highest"):
    """Batched posterior mean/var via GEMMs only (serving hot path).

    The variance quadratic runs in whitened form |W c|^2 (see Predictor) —
    same GEMM shape as the old c @ A^-1 form, ~4 orders of magnitude more
    accurate at n=16k.

    quad_precision: "highest" (default; fp32-exact bf16x6 on TPU) or
    "high" (bf16x3: ~2x the quadratic's MXU throughput at ~2^-17-relative
    operand rounding — safe ONLY because the whitened reduction is
    cancellation-free; the Pallas tier of the same algorithm measured
    <= 4.7e-5 absolute quad error at n=16k, docs/numerics.md).
    """
    prec = {"highest": lax.Precision.HIGHEST,
            "high": lax.Precision.HIGH}[quad_precision]
    c_star = corr(xstar, x, pred.params, family)           # (m, n)
    mean = hstar @ pred.beta + c_star @ pred.e
    u = jnp.matmul(c_star, pred.linv.T, precision=prec)    # (m, n) = (W c)^T
    quad_t = jnp.sum(u * u, axis=1)
    r = hstar - c_star @ pred.ainv_h                       # (m, q)
    rw = r @ pred.w_chol                                   # (m, q)
    quad_r = jnp.sum(rw * rw, axis=1)
    prior = 1.0 + (pred.params.nugget if include_nugget else 0.0)
    var = pred.sigma2 * jnp.maximum(prior - quad_t + quad_r, 0.0)
    return mean, var


@fp32_exact
def predict_batched(pred: Predictor, x, xstar, hstar, *, batch: int = 65536,
                    include_nugget: bool = False, family: str = "gaussian",
                    quad_precision: str = "highest"):
    """predict_fast over query chunks: bounds peak memory at O(batch * n).

    The m x n cross-correlation block never materializes for the full query
    set (1M-point serving at n=16k would need 64 GB otherwise). Chunks run
    under lax.map inside one jit, so the loop is compiled, not host-driven.
    """
    xstar = jnp.asarray(xstar)
    hstar = jnp.asarray(hstar)
    m = xstar.shape[0]
    if m <= batch:
        return predict_fast(pred, x, xstar, hstar,
                            include_nugget=include_nugget, family=family,
                            quad_precision=quad_precision)
    n_chunks = -(-m // batch)
    m_pad = n_chunks * batch
    xs_p = jnp.pad(xstar, ((0, m_pad - m), (0, 0)))
    hs_p = jnp.pad(hstar, ((0, m_pad - m), (0, 0)))
    xs_c = xs_p.reshape(n_chunks, batch, -1)
    hs_c = hs_p.reshape(n_chunks, batch, -1)

    def one(args):
        xs, hs = args
        return predict_fast(pred, x, xs, hs, include_nugget=include_nugget,
                            family=family, quad_precision=quad_precision)

    means, variances = jax.lax.map(one, (xs_c, hs_c))
    return means.reshape(m_pad)[:m], variances.reshape(m_pad)[:m]


@fp32_exact
def sample_posterior(key, state: FitState, x, h, xstar, hstar, n_draws: int = 1,
                     *, include_nugget: bool = False, student_t: bool = True,
                     family: str = "gaussian"):
    """Joint draws from the predictive distribution at xstar, shape (n_draws, m).

    MUCM-mode fits have a multivariate Student-t predictive with dof = n - q
    (SURVEY.md S7 'Student-t posterior with n-q dof'); draws use the scale-
    mixture form  y* = mean + sqrt(dof/g) * Ls z,  z ~ N(0, I),
    g ~ chi^2_dof, with Ls the Cholesky of the t *scale* matrix
    Sigma_scale = cov * (dof-2)/dof (predict() returns the t covariance,
    which already carries the n-q-2 divisor through state.sigma2).
    `student_t=False` gives plain Gaussian draws (gp4ml-mode fits).

    The reference exposes no sampling API (its plots use mean/sd bands);
    this is a capability extension used by the Bayes and noise-fit paths.
    """
    mean, cov = predict(
        state, x, h, xstar, hstar, full_cov=True,
        include_nugget=include_nugget, family=family,
    )
    m = mean.shape[0]
    n, q = state.l.shape[0], state.lg.shape[0]
    dof = n - q
    if student_t and dof <= 2:
        raise ValueError(
            f"student_t draws need n - q > 2 (got n={n}, q={q}: the t scale "
            "matrix (dof-2)/dof * cov would be non-positive). Pass "
            "student_t=False (gp4ml-mode Gaussian draws) or add data."
        )
    zkey, gkey = jax.random.split(key)
    scale = cov * ((dof - 2.0) / dof) if student_t else cov
    ls, _ = cholesky_with_jitter(scale)
    z = jax.random.normal(zkey, (n_draws, m), dtype=mean.dtype)
    colored = z @ ls.T
    if student_t:
        g = 2.0 * jax.random.gamma(gkey, 0.5 * dof, (n_draws, 1),
                                   dtype=mean.dtype)
        colored = jnp.sqrt(dof / g) * colored
    return mean[None, :] + colored


@fp32_exact
def validate(state: FitState, x, h, xv, hv, yv, family: str = "gaussian"):
    """Held-out validation diagnostics (reference `Posterior` diagnostics).

    Returns dict with standardized errors, Mahalanobis distance and its
    theoretical mean/variance under the Student-t reference distribution.
    """
    mean, cov = predict(
        state, x, h, xv, hv, full_cov=True, include_nugget=True, family=family
    )
    err = yv - mean
    sd = jnp.sqrt(jnp.maximum(jnp.diagonal(cov), 1e-30))
    lv, _ = cholesky_with_jitter(cov)
    white = tri_solve(lv, err[:, None])[:, 0]
    mahal = jnp.sum(white * white)
    n, q = h.shape[0], h.shape[1]
    nv = yv.shape[0]
    mahal_mean = jnp.asarray(float(nv), mean.dtype)
    denom = max(n - q - 4, 1)
    mahal_var = jnp.asarray(2.0 * nv * (nv + n - q - 2) / denom, mean.dtype)
    return {
        "mean": mean,
        "std_err": err / sd,
        "mahalanobis": mahal,
        "mahalanobis_mean": mahal_mean,
        "mahalanobis_sd": jnp.sqrt(mahal_var),
    }


@fp32_exact
def loo_diagnostics(state: FitState, x, h, y):
    """Leave-one-out cross-validation means/variances from one factorization.

    Uses the closed-form LOO identities on K = sigma2 * A:
      mu_i = y_i - [K^-1 (y - H beta)]_i / [K^-1]_ii   (fixed-beta form)
      v_i  = 1 / [K^-1]_ii
    (Sundararajan & Keerthi; beta held at the full-data GLS estimate.)
    """
    # K^-1 diag via L^-1: K = s2 (L L^T) => K^-1 = (1/s2) L^-T L^-1.
    n = x.shape[0]
    linv = tri_inverse(state.l)
    kinv_diag = jnp.sum(linv * linv, axis=0) / state.sigma2
    kinv_resid = state.e / state.sigma2
    loo_mean = y - kinv_resid / kinv_diag
    loo_var = 1.0 / kinv_diag
    return loo_mean, loo_var

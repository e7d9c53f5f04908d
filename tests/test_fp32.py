"""fp32 robustness: the TPU-realistic dtype must stay accurate & stable.

TPU has no fp64 matmul path (SURVEY.md S9.4), so the entire stack must hold
up in fp32 with the jitter ladder and inf-not-NaN guards. These tests run
the core paths in fp32 on CPU and pin the achievable tolerances — the
budget table lives in docs/numerics.md; the n=4096 tests below enforce it
at scale (VERDICT r1 missing-item #3).
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from gp_emu_uqsa_tpu import gp
from gp_emu_uqsa_tpu.basis import basis_matrix, linear_basis
from gp_emu_uqsa_tpu.inference import MLEConfig, mle_fit
from gp_emu_uqsa_tpu.kernels import make_params
from gp_emu_uqsa_tpu.sensitivity._core import Sensitivity

import oracle


def _problem(n=60, d=2, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.uniform(size=(n, d)).astype(np.float32)
    y = (np.sin(3 * x[:, 0]) + x[:, 1] ** 2).astype(np.float32)
    return x, y


def test_fit_predict_fp32_vs_fp64():
    x, y = _problem()
    delta = np.array([0.6, 1.0])
    spec = linear_basis(2)
    h64 = np.asarray(basis_matrix(jnp.asarray(x, jnp.float64), spec))
    p32 = make_params(delta, nugget=1e-4, dtype=jnp.float32)
    st32 = gp.fit(p32, jnp.asarray(x, jnp.float32), jnp.asarray(y, jnp.float32),
                  basis_matrix(jnp.asarray(x, jnp.float32), spec))
    xs = np.random.default_rng(1).uniform(size=(25, 2)).astype(np.float32)
    hs32 = basis_matrix(jnp.asarray(xs, jnp.float32), spec)
    mean32, var32 = gp.predict(st32, jnp.asarray(x, jnp.float32),
                               basis_matrix(jnp.asarray(x, jnp.float32), spec),
                               jnp.asarray(xs, jnp.float32), hs32)
    omean, ocov, _, osig2 = oracle.posterior(
        x.astype(np.float64), y.astype(np.float64), h64,
        xs.astype(np.float64), np.c_[np.ones(25), xs.astype(np.float64)],
        delta, 1e-4,
    )
    scale = np.abs(omean).max()
    assert np.max(np.abs(np.asarray(mean32) - omean)) / scale < 1e-3
    np.testing.assert_allclose(float(st32.sigma2), osig2, rtol=1e-2)
    # variances: relative to the prior scale sigma2 (small vars lose digits)
    assert np.max(np.abs(np.asarray(var32) - np.diag(ocov))) / osig2 < 1e-2


def test_mle_fp32_converges():
    x, y = _problem(n=80)
    h = basis_matrix(jnp.asarray(x, jnp.float32), linear_basis(2))
    cfg = MLEConfig(tries=4, nugget=1e-4)
    params, info = mle_fit(jax.random.key(0), jnp.asarray(x, jnp.float32),
                           jnp.asarray(y, jnp.float32), h, cfg)
    assert np.isfinite(float(info["best_nll"]))
    assert params.log_delta.dtype == jnp.float32
    delta = np.exp(np.asarray(params.log_delta))
    assert np.all(delta > 1e-3) and np.all(delta < 1e3)


def test_sensitivity_fp32():
    x, y = _problem(n=50)
    spec = linear_basis(2)
    h32 = basis_matrix(jnp.asarray(x, jnp.float32), spec)
    p32 = make_params(np.array([0.6, 1.0]), nugget=1e-4, dtype=jnp.float32)
    st = gp.fit(p32, jnp.asarray(x, jnp.float32), jnp.asarray(y, jnp.float32), h32)
    m = np.array([0.5, 0.5], np.float32)
    v = np.array([0.03, 0.03], np.float32)
    sens32 = Sensitivity(st, x, spec, m, v)
    si32 = np.asarray(sens32.sensitivity()["S_i"])
    # fp64 reference
    h64 = basis_matrix(jnp.asarray(x, jnp.float64), spec)
    p64 = make_params(np.array([0.6, 1.0]), nugget=1e-4, dtype=jnp.float64)
    st64 = gp.fit(p64, jnp.asarray(x, jnp.float64),
                  jnp.asarray(y, jnp.float64), h64)
    sens64 = Sensitivity(st64, x.astype(np.float64), spec,
                         m.astype(np.float64), v.astype(np.float64))
    si64 = np.asarray(sens64.sensitivity()["S_i"])
    np.testing.assert_allclose(si32, si64, atol=0.02)


def _clustered_kernel_system(n, d=4, nugget=1e-2, seed=3):
    """fp64 kernel system with clustered inputs: kappa = lmax/nugget.

    Inputs come in near-duplicate pairs (offset 1e-3); lmax ~ 0.65 n for
    these length-scales (measured), so nugget=1e-2 at n=4096 gives
    kappa ~ 2.7e5 — solidly in the regime where plain fp32 solves lose
    ~4 digits but the factorization still succeeds without the jitter
    ladder (docs/numerics.md 'Error model').
    """
    rng = np.random.default_rng(seed)
    base = rng.uniform(size=(n // 2, d))
    x = np.vstack([base, base + 1e-3 * rng.standard_normal((n // 2, d))])
    delta = np.full(d, 1.2)
    aa = x / delta
    d2 = ((aa * aa).sum(1)[:, None] + (aa * aa).sum(1)[None, :]
          - 2.0 * aa @ aa.T)
    a = np.exp(-np.maximum(d2, 0.0)) + nugget * np.eye(n)
    b = rng.standard_normal(n)
    return x, delta, a, b


@pytest.mark.slow
def test_refined_solve_error_bound_n4096():
    """docs/numerics.md budget row 1: fp32 solve of a kappa~3e5 system.

    Plain fp32 cho_solve loses ~kappa*eps32 relative accuracy; ONE
    extended-precision-residual refinement sweep must recover <= 1e-5
    (and improve the plain solve >= 10x, proving the sweep acted).
    """
    from gp_emu_uqsa_tpu.ops.cholesky import (
        cho_solve, cho_solve_refined, cholesky_with_jitter,
    )

    n = 4096
    _, _, a64_built, b64 = _clustered_kernel_system(n)
    a32 = jnp.asarray(a64_built, jnp.float32)
    b32 = jnp.asarray(b64, jnp.float32)
    # The oracle solves the SAME fp32-rounded matrix in fp64: rounding A's
    # entries to fp32 already moves the exact solution by O(kappa*eps32)
    # ~ 1e-4 here — a separate, modeled term (docs/numerics.md) that
    # refinement neither can nor should fix. Its contract is the solve of
    # the matrix actually factored.
    a64 = np.asarray(a32, np.float64)
    x_true = np.linalg.solve(a64, np.asarray(b32, np.float64))
    xnorm = np.linalg.norm(x_true)

    l32, jit_used = cholesky_with_jitter(a32)
    assert float(jit_used) == 0.0  # kappa~3e5 must factorize as-is in fp32

    x0 = np.asarray(cho_solve(l32, b32), np.float64)
    x1 = np.asarray(
        jax.jit(lambda l, a, b: cho_solve_refined(l, a, b, iters=1))(
            l32, a32, b32
        ),
        np.float64,
    )
    err0 = np.linalg.norm(x0 - x_true) / xnorm
    err1 = np.linalg.norm(x1 - x_true) / xnorm
    assert err0 <= 3e-2          # budget: unrefined stays bounded
    assert err1 <= 1e-5          # budget: one sweep restores the solve
    assert err1 < err0 / 10      # and the sweep demonstrably acted


@pytest.mark.slow
def test_fit_refine_fp32_n4096():
    """gp.fit(refine=1) at n=4096: e = A^-1 (y-H beta) must match fp64.

    e is the vector every downstream prediction contracts against. This
    test enforces the END-TO-END budget: the oracle's matrix is an
    eagerly-built fp32 corr_self promoted to fp64, which differs from the
    matrix the jitted fit actually factored by O(eps32) per entry (XLA
    fuses/rounds the distance GEMM differently per program), so the
    comparison floors at the kernel-BUILD rounding term O(kappa*eps32)
    ~ 3e-4 here — measured 2.9e-4, and refine cannot (and should not) go
    below it. The precise solve-level contract (refined solve of the
    matrix actually factored, <= 1e-5) is enforced separately by
    test_refined_solve_error_bound_n4096. docs/numerics.md budget rows 1-2.
    """
    import scipy.linalg as sla

    from gp_emu_uqsa_tpu.basis import basis_matrix, linear_basis
    from gp_emu_uqsa_tpu.kernels import corr_self

    n, d = 4096, 4
    x64, delta, _, _ = _clustered_kernel_system(n, d=d)
    rng = np.random.default_rng(7)
    y64 = np.sin(3 * x64[:, 0]) + x64[:, 1] * x64[:, 2] \
        + 0.05 * rng.standard_normal(n)

    x32 = jnp.asarray(x64, jnp.float32)
    p32 = make_params(delta, nugget=1e-2, dtype=jnp.float32)
    # the exact (fp32-rounded) matrix gp.fit will factor, promoted to fp64
    a64 = np.asarray(corr_self(x32, p32), np.float64)

    spec = linear_basis(d)
    y32 = jnp.asarray(y64, jnp.float32)
    h32 = basis_matrix(x32, spec)

    st0 = jax.jit(lambda p: gp.fit(p, x32, y32, h32))(p32)
    st1 = jax.jit(lambda p: gp.fit(p, x32, y32, h32, refine=1))(p32)
    # refine never touches beta (it refines the solves at fixed beta)
    np.testing.assert_array_equal(np.asarray(st0.beta), np.asarray(st1.beta))

    # fp64 oracle: e = A^-1 (y - H beta) on the SAME fp32-rounded system,
    # at the fit's own beta — isolates exactly the solve refine targets
    beta_fit = np.asarray(st1.beta, np.float64)
    rhs = np.asarray(y32, np.float64) - np.asarray(h32, np.float64) @ beta_fit
    cf = sla.cho_factor(a64, lower=True)
    e64 = sla.cho_solve(cf, rhs)
    enorm = np.linalg.norm(e64)

    err0 = np.linalg.norm(np.asarray(st0.e, np.float64) - e64) / enorm
    err1 = np.linalg.norm(np.asarray(st1.e, np.float64) - e64) / enorm
    assert err1 <= 5e-4               # end-to-end floor: build rounding
    assert err1 < err0 / 5            # refine still buys >= 5x at fit level
    # beta itself stays within the fp32 GLS budget of an fp64 re-solve
    ainv_h64 = sla.cho_solve(cf, np.asarray(h32, np.float64))
    g64 = np.asarray(h32, np.float64).T @ ainv_h64
    beta64 = np.linalg.solve(
        g64, ainv_h64.T @ np.asarray(y32, np.float64))
    np.testing.assert_allclose(beta_fit, beta64, rtol=5e-3, atol=1e-3)


def test_jitter_ladder_gradients():
    """Ladder factor gradient: bit-equal to XLA's on the healthy branch,
    finite (not NaN) when the ladder engages.

    Round 3 regression: the old structure differentiated the failed NaN
    probe factor on the untaken healthy branch, so NaN * 0 cotangents
    poisoned every gradient whenever the ladder ran."""
    import jax
    from jax import lax
    from gp_emu_uqsa_tpu.ops.cholesky import cholesky_with_jitter
    from gp_emu_uqsa_tpu.kernels import gaussian_corr_self

    rng = np.random.default_rng(0)
    m = rng.standard_normal((24, 24))
    ah = jnp.asarray((m @ m.T + 24 * np.eye(24)).astype(np.float32))
    g1 = jax.grad(lambda a: jnp.sum(jnp.sin(cholesky_with_jitter(a)[0])))(ah)
    g2 = jax.grad(lambda a: jnp.sum(jnp.sin(
        lax.linalg.cholesky(a, symmetrize_input=False))))(ah)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-6)

    # clustered fp32 inputs + zero nugget: the plain factorization fails
    x = jnp.asarray(np.repeat(rng.uniform(size=(50, 2)), 4, axis=0)
                    .astype(np.float32))
    x = x + 1e-5 * jnp.asarray(rng.standard_normal(x.shape).astype(np.float32))
    p = make_params(np.array([0.5, 0.5]), nugget=0.0, dtype=jnp.float32)
    a = gaussian_corr_self(x, p)
    assert bool(jnp.any(jnp.isnan(
        lax.linalg.cholesky(a, symmetrize_input=False))))
    l, j = cholesky_with_jitter(a)
    assert float(j) > 0 and bool(jnp.all(jnp.isfinite(l)))
    # first rung n*eps*diag succeeds immediately (no extra escalation)
    assert float(j) <= 1.1 * a.shape[0] * 1e-6 * float(jnp.mean(jnp.diag(a)))
    g = jax.grad(lambda a: jnp.sum(cholesky_with_jitter(a)[0] ** 2))(a)
    assert bool(jnp.all(jnp.isfinite(g)))


def test_jitter_ladder_explicit_growth():
    """Regression (ADVICE r3): an explicitly passed `growth` must not become
    a tracer inside the jit wrapper (it is a static of the custom_vjp)."""
    from gp_emu_uqsa_tpu.ops.cholesky import cholesky_with_jitter

    rng = np.random.default_rng(3)
    m = rng.standard_normal((16, 16))
    a = jnp.asarray((m @ m.T + 16 * np.eye(16)).astype(np.float32))
    l, j = cholesky_with_jitter(a, growth=20.0)
    assert bool(jnp.all(jnp.isfinite(l))) and float(j) == 0.0


def test_whitened_quadratic_beats_ainv_form_fp32():
    """Round-4 regression guard: the Predictor's variance quadratic must be
    the whitened |W c|^2 form, NOT c @ A^-1 c.

    Adjudicated on TPU at n=16384 (docs/numerics.md): the A^-1 form's
    1/nugget-scale cancellation put a median 6.1e-2 error on a quadratic
    whose complement is ~1e-3 — O(100%) of the predictive variance — while
    the whitened form measured 6.1e-6 max. This test reproduces the effect
    at CPU scale: fp32 predict_fast must match an fp64 oracle to the
    whitened form's accuracy, which the A^-1 form cannot do.
    """
    import jax
    from gp_emu_uqsa_tpu.ops.cholesky import cholesky_with_jitter

    rng = np.random.default_rng(0)
    n, d, m = 1500, 4, 200
    x = rng.uniform(size=(n, d)).astype(np.float32)
    y = (np.sin(3 * x[:, 0]) + x[:, 1] * x[:, 2]).astype(np.float32)
    nugget = 1e-5                      # small: A^-1 entries ~ 1e5
    h = basis_matrix(jnp.asarray(x), linear_basis(d))
    p = make_params(np.full(d, 0.8), nugget=nugget, dtype=jnp.float32)
    st = gp.fit(p, jnp.asarray(x), jnp.asarray(y), h)
    jitter = float(st.jitter)
    pred = gp.predictor(st)
    xs = rng.uniform(size=(m, d)).astype(np.float32)
    hs = basis_matrix(jnp.asarray(xs), linear_basis(d))
    mean32, var32 = gp.predict_fast(pred, jnp.asarray(x), jnp.asarray(xs), hs)

    # fp64 oracle of the same (jitter-matched) model
    x64 = x.astype(np.float64); xs64 = xs.astype(np.float64)
    def corr64(a, b):
        aa = a / 0.8; bb = b / 0.8
        d2 = ((aa*aa).sum(1)[:, None] + (bb*bb).sum(1)[None, :]
              - 2.0 * aa @ bb.T)
        return np.exp(-np.maximum(d2, 0.0))
    a64 = corr64(x64, x64) + (nugget + jitter) * np.eye(n)
    l64 = np.linalg.cholesky(a64)
    c64 = corr64(xs64, x64)
    z = np.linalg.solve(l64, c64.T)
    quad64 = (z * z).sum(0)
    h64 = np.asarray(h, np.float64); hs64 = np.asarray(hs, np.float64)
    ainv_h64 = np.linalg.solve(l64.T, np.linalg.solve(l64, h64))
    g64 = h64.T @ ainv_h64
    r64 = hs64 - c64 @ ainv_h64
    quad_r64 = (r64 * np.linalg.solve(g64, r64.T).T).sum(1)
    var64 = float(st.sigma2) * np.maximum(1.0 - quad64 + quad_r64, 0.0)
    # whitened-form accuracy: ~1e-4 * sigma2; the A^-1 form fails this by
    # orders of magnitude at this conditioning
    err = np.abs(np.asarray(var32, np.float64) - var64)
    assert err.max() < 2e-4 * float(st.sigma2), err.max()


def test_degenerate_inputs_fp32_no_nan():
    """Duplicate points + tiny nugget in fp32: jitter ladder must save it."""
    x, y = _problem(n=30)
    x = np.vstack([x, x[:5]]).astype(np.float32)
    y = np.concatenate([y, y[:5]]).astype(np.float32)
    h = basis_matrix(jnp.asarray(x, jnp.float32), linear_basis(2))
    p = make_params(np.array([0.6, 1.0]), nugget=1e-7, dtype=jnp.float32)
    st = gp.fit(p, jnp.asarray(x, jnp.float32), jnp.asarray(y, jnp.float32), h)
    assert np.isfinite(float(st.nll))
    assert float(st.jitter) > 0  # ladder engaged
    mean, var = gp.predict(st, jnp.asarray(x, jnp.float32), h,
                           jnp.asarray(x[:3], jnp.float32), h[:3])
    assert np.all(np.isfinite(np.asarray(mean)))
    assert np.all(np.asarray(var) >= 0)

"""Matrix-free CG path vs the factorized oracle path."""
import numpy as np
import jax
import jax.numpy as jnp

from gp_emu_uqsa_tpu import gp
from gp_emu_uqsa_tpu.basis import basis_matrix, linear_basis
from gp_emu_uqsa_tpu.kernels import gaussian_corr_self, make_params
from gp_emu_uqsa_tpu.ops.cg import (
    cg_solve, fit_matrix_free, make_corr_matvec, predict_mean_matrix_free,
)


def _problem(n=150, d=3, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.uniform(size=(n, d)))
    y = jnp.sin(3 * x[:, 0]) + x[:, 1] * x[:, 2]
    spec = linear_basis(d)
    h = basis_matrix(x, spec)
    p = make_params(np.full(d, 0.7), nugget=1e-3, dtype=jnp.float64)
    return x, y, h, p, spec


def test_corr_matvec_matches_dense():
    x, y, h, p, _ = _problem()
    a = gaussian_corr_self(x, p)
    mv = make_corr_matvec(x, p, chunk=64)     # chunk not dividing n
    rng = np.random.default_rng(1)
    v = jnp.asarray(rng.standard_normal((x.shape[0], 4)))
    np.testing.assert_allclose(np.asarray(mv(v)), np.asarray(a @ v),
                               rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(np.asarray(mv(v[:, 0])), np.asarray(a @ v[:, 0]),
                               rtol=1e-12, atol=1e-12)


def test_cg_solves_spd_system():
    x, y, h, p, _ = _problem()
    a = gaussian_corr_self(x, p)
    rng = np.random.default_rng(2)
    b = jnp.asarray(rng.standard_normal((x.shape[0], 3)))
    mv = make_corr_matvec(x, p, chunk=128)
    sol, info = cg_solve(mv, b, tol=1e-10, maxiter=2000)
    np.testing.assert_allclose(np.asarray(a @ sol), np.asarray(b),
                               rtol=1e-7, atol=1e-7)
    assert float(jnp.max(info["rel_resid"])) < 1e-9


def test_pivoted_cholesky_preconditioner_cuts_iterations():
    from gp_emu_uqsa_tpu.ops.cg import pivoted_chol_precond, pivoted_cholesky

    rng = np.random.default_rng(5)
    n, d = 300, 2
    x = jnp.asarray(rng.uniform(size=(n, d)))
    p = make_params(np.full(d, 0.6), nugget=1e-4, dtype=jnp.float64)
    a = gaussian_corr_self(x, p)
    b = jnp.asarray(rng.standard_normal((n, 2)))
    mv = make_corr_matvec(x, p, chunk=128)

    sol0, info0 = cg_solve(mv, b, tol=1e-8, maxiter=3000)
    apply_m = pivoted_chol_precond(x, p, rank=48)
    sol1, info1 = cg_solve(mv, b, tol=1e-8, maxiter=3000, precond=apply_m)
    # both solve the system
    np.testing.assert_allclose(np.asarray(a @ sol1), np.asarray(b),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(sol0), np.asarray(sol1),
                               rtol=1e-4, atol=1e-6)
    assert int(info1["iters"]) < int(info0["iters"]) / 2, (
        int(info0["iters"]), int(info1["iters"]))
    # the partial factor reproduces the kernel's dominant range
    l, piv = pivoted_cholesky(x, p, rank=48)
    assert np.unique(np.asarray(piv)).size == 48


def test_fit_matrix_free_matches_factorized():
    x, y, h, p, spec = _problem()
    ff = fit_matrix_free(p, x, y, h, tol=1e-12, maxiter=4000)
    st = gp.fit(p, x, y, h)
    np.testing.assert_allclose(np.asarray(ff["beta"]), np.asarray(st.beta),
                               rtol=1e-7)
    np.testing.assert_allclose(np.asarray(ff["e"]), np.asarray(st.e),
                               rtol=1e-6, atol=1e-9)
    np.testing.assert_allclose(float(ff["sigma2"]), float(st.sigma2),
                               rtol=1e-8)
    # mean serving
    rng = np.random.default_rng(3)
    xs = jnp.asarray(rng.uniform(size=(31, x.shape[1])))
    hs = basis_matrix(xs, spec)
    mean_ff = predict_mean_matrix_free(ff, x, xs, hs, p, chunk=16)
    mean_ref, _ = gp.predict(st, x, h, xs, hs)
    np.testing.assert_allclose(np.asarray(mean_ff), np.asarray(mean_ref),
                               rtol=1e-7, atol=1e-9)

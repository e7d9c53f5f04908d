"""GP core vs the NumPy oracle + property tests (SURVEY.md S9.5 unit tier)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gp_emu_uqsa_tpu import gp
from gp_emu_uqsa_tpu.basis import basis_matrix, linear_basis, const_basis
from gp_emu_uqsa_tpu.kernels import make_params, gaussian_corr_self

import oracle


def _problem(n=30, d=3, seed=0, noise=0.0):
    rng = np.random.default_rng(seed)
    x = rng.uniform(size=(n, d))
    y = np.sin(3 * x[:, 0]) + x[:, 1] ** 2 + 0.5 * x[:, 2 % d]
    if noise:
        y = y + noise * rng.standard_normal(n)
    return x, y


DELTA = np.array([0.7, 1.3, 0.9])
NUGGET = 1e-6


class TestKernel:
    def test_matches_oracle(self):
        x, _ = _problem()
        p = make_params(DELTA, nugget=NUGGET, dtype=jnp.float64)
        a = gaussian_corr_self(jnp.asarray(x), p)
        np.testing.assert_allclose(a, oracle.corr_self(x, DELTA, NUGGET), atol=1e-12)

    def test_psd(self):
        x, _ = _problem(n=50)
        p = make_params(DELTA, nugget=1e-8, dtype=jnp.float64)
        a = np.asarray(gaussian_corr_self(jnp.asarray(x), p))
        w = np.linalg.eigvalsh(a)
        assert w.min() > 0


class TestNLL:
    @pytest.mark.parametrize("spec_fn", [linear_basis, lambda d: const_basis()])
    def test_mucm_matches_oracle(self, spec_fn):
        x, y = _problem()
        spec = spec_fn(x.shape[1])
        h = np.asarray(basis_matrix(jnp.asarray(x), spec))
        p = make_params(DELTA, nugget=NUGGET, dtype=jnp.float64)
        got = gp.nll_mucm(p, jnp.asarray(x), jnp.asarray(y), jnp.asarray(h))
        want, sigma2, beta = oracle.nll_mucm(x, y, h, DELTA, NUGGET)
        np.testing.assert_allclose(got, want, rtol=1e-9)

    def test_gp4ml_matches_oracle(self):
        x, y = _problem()
        h = np.asarray(basis_matrix(jnp.asarray(x), linear_basis(x.shape[1])))
        p = make_params(DELTA, sigma2=0.8, nugget=NUGGET, dtype=jnp.float64)
        got = gp.nll_gp4ml(p, jnp.asarray(x), jnp.asarray(y), jnp.asarray(h))
        want = oracle.nll_gp4ml(x, y, h, DELTA, 0.8, NUGGET)
        np.testing.assert_allclose(got, want, rtol=1e-7)

    def test_grad_finite(self):
        x, y = _problem()
        h = basis_matrix(jnp.asarray(x), linear_basis(x.shape[1]))
        p = make_params(DELTA, nugget=NUGGET, dtype=jnp.float64)
        grads = jax.grad(lambda q: gp.nll_mucm(q, jnp.asarray(x), jnp.asarray(y), h))(p)
        for leaf in jax.tree.leaves(grads):
            assert np.all(np.isfinite(leaf))

    def test_bad_params_give_inf_not_nan(self):
        x, y = _problem()
        h = basis_matrix(jnp.asarray(x), linear_basis(x.shape[1]))
        # absurdly long lengthscales + ~zero nugget => singular A
        p = make_params(np.full(3, 1e8), nugget=1e-300, dtype=jnp.float64)
        val = gp.nll_mucm(p, jnp.asarray(x), jnp.asarray(y), h)
        assert np.isinf(val) or np.isfinite(val)  # never NaN
        assert not np.isnan(val)


class TestPosterior:
    def test_matches_oracle(self):
        x, y = _problem()
        xs = np.random.default_rng(1).uniform(size=(17, 3))
        spec = linear_basis(3)
        h = np.asarray(basis_matrix(jnp.asarray(x), spec))
        hs = np.asarray(basis_matrix(jnp.asarray(xs), spec))
        p = make_params(DELTA, nugget=NUGGET, dtype=jnp.float64)
        st = gp.fit(p, jnp.asarray(x), jnp.asarray(y), jnp.asarray(h))
        mean, var = gp.predict(st, jnp.asarray(x), jnp.asarray(h), jnp.asarray(xs), jnp.asarray(hs))
        omean, ocov, obeta, osig2 = oracle.posterior(x, y, h, xs, hs, DELTA, NUGGET)
        np.testing.assert_allclose(st.beta, obeta, rtol=1e-8)
        np.testing.assert_allclose(st.sigma2, osig2, rtol=1e-8)
        np.testing.assert_allclose(mean, omean, rtol=1e-7, atol=1e-9)
        np.testing.assert_allclose(var, np.diag(ocov), rtol=1e-6, atol=1e-10)

    def test_full_cov_matches_oracle(self):
        x, y = _problem(n=20)
        xs = np.random.default_rng(2).uniform(size=(9, 3))
        spec = linear_basis(3)
        h = np.asarray(basis_matrix(jnp.asarray(x), spec))
        hs = np.asarray(basis_matrix(jnp.asarray(xs), spec))
        p = make_params(DELTA, nugget=NUGGET, dtype=jnp.float64)
        st = gp.fit(p, jnp.asarray(x), jnp.asarray(y), jnp.asarray(h))
        mean, cov = gp.predict(
            st, jnp.asarray(x), jnp.asarray(h), jnp.asarray(xs), jnp.asarray(hs),
            full_cov=True,
        )
        _, ocov, _, _ = oracle.posterior(x, y, h, xs, hs, DELTA, NUGGET)
        np.testing.assert_allclose(cov, ocov, rtol=1e-6, atol=1e-10)

    def test_interpolates_training_points(self):
        """As nugget -> 0 the posterior mean interpolates and var -> 0."""
        x, y = _problem(n=25)
        spec = linear_basis(3)
        h = basis_matrix(jnp.asarray(x), spec)
        p = make_params(DELTA, nugget=1e-12, dtype=jnp.float64)
        st = gp.fit(p, jnp.asarray(x), jnp.asarray(y), h)
        mean, var = gp.predict(st, jnp.asarray(x), h, jnp.asarray(x), h)
        np.testing.assert_allclose(mean, y, atol=1e-6)
        assert np.max(np.asarray(var)) < 1e-6

    def test_validation_diagnostics_calibrated(self):
        """Draws from the GP itself should give D ~ n_V and |std err| mostly < 2."""
        rng = np.random.default_rng(5)
        n, nv, d = 60, 20, 2
        delta = np.array([0.5, 0.8])
        xall = rng.uniform(size=(n + nv, d))
        a = oracle.corr_self(xall, delta, 1e-8)
        yall = np.linalg.cholesky(a) @ rng.standard_normal(n + nv)
        x, xv = xall[:n], xall[n:]
        y, yv = yall[:n], yall[n:]
        spec = linear_basis(d)
        h = basis_matrix(jnp.asarray(x), spec)
        hv = basis_matrix(jnp.asarray(xv), spec)
        p = make_params(delta, nugget=1e-8, dtype=jnp.float64)
        st = gp.fit(p, jnp.asarray(x), jnp.asarray(y), h)
        diag = gp.validate(st, jnp.asarray(x), h, jnp.asarray(xv), hv, jnp.asarray(yv))
        d_stat = float(diag["mahalanobis"])
        lo = float(diag["mahalanobis_mean"] - 4 * diag["mahalanobis_sd"])
        hi = float(diag["mahalanobis_mean"] + 4 * diag["mahalanobis_sd"])
        assert lo < d_stat < hi
        assert np.mean(np.abs(np.asarray(diag["std_err"])) < 2.5) > 0.8

    def test_sample_posterior_moments(self):
        """Draw moments converge to predict()'s mean/cov (t and Gaussian)."""
        x, y = _problem(n=20)
        xs = np.random.default_rng(3).uniform(size=(5, 3))
        spec = linear_basis(3)
        h = basis_matrix(jnp.asarray(x), spec)
        hs = basis_matrix(jnp.asarray(xs), spec)
        p = make_params(DELTA, nugget=1e-4, dtype=jnp.float64)
        st = gp.fit(p, jnp.asarray(x), jnp.asarray(y), h)
        mean, cov = gp.predict(
            st, jnp.asarray(x), h, jnp.asarray(xs), hs, full_cov=True
        )
        sd = np.sqrt(np.diagonal(np.asarray(cov)))
        for student_t in (True, False):
            draws = gp.sample_posterior(
                jax.random.key(0), st, jnp.asarray(x), h, jnp.asarray(xs), hs,
                n_draws=40000, student_t=student_t,
            )
            draws = np.asarray(draws)
            assert draws.shape == (40000, 5)
            np.testing.assert_allclose(draws.mean(0), mean, atol=4e-2 * sd.max())
            # t draws have covariance == predict()'s cov (the t covariance);
            # Gaussian draws treat cov as the Gaussian covariance directly.
            np.testing.assert_allclose(
                np.cov(draws.T), np.asarray(cov),
                atol=6e-2 * float(sd.max()) ** 2 + 1e-12,
            )

    def test_loo(self):
        """LOO closed form matches brute-force refitting without point i."""
        x, y = _problem(n=18, d=2)
        x = x[:, :2]
        delta = np.array([0.6, 0.9])
        spec = linear_basis(2)
        h = np.asarray(basis_matrix(jnp.asarray(x), spec))
        p = make_params(delta, nugget=1e-4, dtype=jnp.float64)
        st = gp.fit(p, jnp.asarray(x), jnp.asarray(y), jnp.asarray(h))
        loo_mean, loo_var = gp.loo_diagnostics(st, jnp.asarray(x), jnp.asarray(h), jnp.asarray(y))
        # brute force with beta/sigma2 fixed at full-data estimates
        beta = np.asarray(st.beta)
        sig2 = float(st.sigma2)
        a = oracle.corr_self(x, delta, 1e-4)
        for i in [0, 7, 17]:
            mask = np.arange(len(y)) != i
            ai = a[np.ix_(mask, mask)] * sig2
            ti = sig2 * a[i, mask]
            ri = y[mask] - h[mask] @ beta
            mu = h[i] @ beta + ti @ np.linalg.solve(ai, ri)
            v = sig2 * a[i, i] - ti @ np.linalg.solve(ai, ti)
            np.testing.assert_allclose(loo_mean[i], mu, rtol=1e-6)
            np.testing.assert_allclose(loo_var[i], v, rtol=1e-6)


class TestFastPredictor:
    def test_matches_exact_path(self):
        x, y = _problem()
        xs = np.random.default_rng(9).uniform(size=(33, 3))
        spec = linear_basis(3)
        h = basis_matrix(jnp.asarray(x), spec)
        hs = basis_matrix(jnp.asarray(xs), spec)
        p = make_params(DELTA, nugget=1e-6, dtype=jnp.float64)
        st = gp.fit(p, jnp.asarray(x), jnp.asarray(y), h)
        pred = gp.predictor(st)
        mf, vf = gp.predict_fast(pred, jnp.asarray(x), jnp.asarray(xs), hs)
        me, ve = gp.predict(st, jnp.asarray(x), h, jnp.asarray(xs), hs)
        np.testing.assert_allclose(np.asarray(mf), np.asarray(me), rtol=1e-10)
        np.testing.assert_allclose(np.asarray(vf), np.asarray(ve),
                                   rtol=1e-6, atol=1e-12)


class TestCustomVJP:
    def test_analytic_gradient_matches_autodiff(self):
        x, y = _problem(n=35)
        h = basis_matrix(jnp.asarray(x), linear_basis(3))
        p = make_params(DELTA, nugget=1e-4, dtype=jnp.float64)
        xj, yj = jnp.asarray(x), jnp.asarray(y)
        g_custom = jax.grad(lambda q: gp.nll_mucm(q, xj, yj, h))(p)
        g_auto = jax.grad(lambda q: gp.nll_mucm_ad(q, xj, yj, h))(p)
        np.testing.assert_allclose(np.asarray(g_custom.log_delta),
                                   np.asarray(g_auto.log_delta), rtol=1e-7)
        np.testing.assert_allclose(float(g_custom.log_nugget),
                                   float(g_auto.log_nugget), rtol=1e-6)
        # values also identical
        v1 = float(gp.nll_mucm(p, xj, yj, h))
        v2 = float(gp.nll_mucm_ad(p, xj, yj, h))
        np.testing.assert_allclose(v1, v2, rtol=1e-12)

    def test_finite_differences(self):
        x, y = _problem(n=25)
        h = basis_matrix(jnp.asarray(x), linear_basis(3))
        xj, yj = jnp.asarray(x), jnp.asarray(y)
        p = make_params(DELTA, nugget=1e-4, dtype=jnp.float64)
        g = jax.grad(lambda q: gp.nll_mucm(q, xj, yj, h))(p)
        eps = 1e-6
        for l in range(3):
            ld = p.log_delta.at[l].add(eps)
            v_plus = float(gp.nll_mucm(p._replace(log_delta=ld), xj, yj, h))
            ld = p.log_delta.at[l].add(-eps)
            v_minus = float(gp.nll_mucm(p._replace(log_delta=ld), xj, yj, h))
            fd = (v_plus - v_minus) / (2 * eps)
            np.testing.assert_allclose(float(g.log_delta[l]), fd, rtol=1e-4)

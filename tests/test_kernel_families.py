"""Matern/exponential correlation families (capability extension).

The reference lineage kept a pluggable kernel list (`_emulatorkernels.py`,
SURVEY.md S3); only the Gaussian family has analytic UQSA. These tests pin
the family formulas against the NumPy oracle and exercise the full
fit -> predict -> MLE path per family.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gp_emu_uqsa_tpu import gp
from gp_emu_uqsa_tpu.basis import basis_matrix, linear_basis
from gp_emu_uqsa_tpu.inference import MLEConfig, mle_fit
from gp_emu_uqsa_tpu.kernels import corr, corr_self, make_params

import oracle

FAMILIES = ["matern52", "matern32", "exponential", "gaussian"]
DELTA = np.array([0.7, 1.3])


def _problem(n=24, d=2, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.uniform(size=(n, d))
    y = np.sin(3 * x[:, 0]) + x[:, 1] ** 2
    return x, y


@pytest.mark.parametrize("family", FAMILIES)
def test_corr_matches_oracle(family):
    x, _ = _problem()
    xs = np.random.default_rng(1).uniform(size=(7, 2))
    p = make_params(DELTA, dtype=jnp.float64)
    got = corr(jnp.asarray(xs), jnp.asarray(x), p, family)
    want = oracle.corr_family(xs, x, DELTA, family)
    np.testing.assert_allclose(got, want, atol=1e-12)


@pytest.mark.parametrize("family", FAMILIES)
def test_psd_and_unit_diagonal(family):
    x, _ = _problem(n=40)
    p = make_params(DELTA, nugget=1e-10, dtype=jnp.float64)
    a = np.asarray(corr_self(jnp.asarray(x), p, family))
    np.testing.assert_allclose(np.diagonal(a), 1.0 + 1e-10, atol=1e-12)
    assert np.linalg.eigvalsh(a).min() > 0


@pytest.mark.parametrize("family", ["matern52", "matern32", "exponential"])
def test_grad_finite_at_coincident_points(family):
    """safe-dist double-where: gradients stay finite despite r=0 pairs."""
    x, y = _problem()
    x[1] = x[0]  # coincident pair => d2 == 0 off-diagonal
    h = basis_matrix(jnp.asarray(x), linear_basis(2))
    p = make_params(DELTA, nugget=1e-6, dtype=jnp.float64)
    g = jax.grad(
        lambda pp: gp.nll_mucm(pp, jnp.asarray(x), jnp.asarray(y), h,
                               family=family)
    )(p)
    assert np.all(np.isfinite(np.asarray(g.log_delta)))


@pytest.mark.parametrize("family", ["matern52", "exponential"])
def test_fit_predict_interpolates(family):
    x, y = _problem()
    h = basis_matrix(jnp.asarray(x), linear_basis(2))
    p = make_params(DELTA, nugget=1e-10, dtype=jnp.float64)
    st = gp.fit(p, jnp.asarray(x), jnp.asarray(y), h, family=family)
    mean, var = gp.predict(st, jnp.asarray(x), h, jnp.asarray(x), h,
                           family=family)
    np.testing.assert_allclose(mean, y, atol=1e-5)
    assert float(jnp.max(var)) < 1e-5


def test_posterior_matches_oracle_matern52():
    """Full universal-kriging posterior under matern52 vs explicit NumPy."""
    x, y = _problem()
    xs = np.random.default_rng(2).uniform(size=(9, 2))
    spec = linear_basis(2)
    h = np.asarray(basis_matrix(jnp.asarray(x), spec))
    hs = np.asarray(basis_matrix(jnp.asarray(xs), spec))
    nug = 1e-6
    st = gp.fit(make_params(DELTA, nugget=nug, dtype=jnp.float64),
                jnp.asarray(x), jnp.asarray(y), jnp.asarray(h),
                family="matern52")
    mean, var = gp.predict(st, jnp.asarray(x), jnp.asarray(h),
                           jnp.asarray(xs), jnp.asarray(hs), family="matern52")
    # oracle, explicit-inverse style
    a = oracle.corr_family(x, x, DELTA, "matern52") + nug * np.eye(len(x))
    ainv = np.linalg.inv(a)
    g = h.T @ ainv @ h
    beta = np.linalg.solve(g, h.T @ ainv @ y)
    s2 = (y @ ainv @ y - (h.T @ ainv @ y) @ np.linalg.solve(g, h.T @ ainv @ y)) / (
        len(y) - h.shape[1] - 2
    )
    t = oracle.corr_family(xs, x, DELTA, "matern52")
    omean = hs @ beta + t @ ainv @ (y - h @ beta)
    r = hs - t @ ainv @ h
    ovar = s2 * (
        1.0 - np.sum((t @ ainv) * t, 1) + np.sum((r @ np.linalg.inv(g)) * r, 1)
    )
    np.testing.assert_allclose(mean, omean, rtol=1e-8)
    np.testing.assert_allclose(var, ovar, rtol=1e-6, atol=1e-12)


def test_mle_fit_runs_per_family():
    """Multi-restart MLE (AD path, no custom VJP) works for every family."""
    x, y = _problem(n=30)
    h = basis_matrix(jnp.asarray(x), linear_basis(2))
    for family in ["matern52", "exponential"]:
        cfg = MLEConfig(tries=2, max_iters=30, nugget=1e-6, family=family)
        params, info = mle_fit(jax.random.key(0), jnp.asarray(x),
                               jnp.asarray(y), h, cfg)
        assert np.isfinite(float(info["best_nll"]))
        st = gp.fit(params, jnp.asarray(x), jnp.asarray(y), h, family=family)
        assert np.isfinite(float(st.nll))


def test_families_differ_from_gaussian():
    x, _ = _problem()
    p = make_params(DELTA, dtype=jnp.float64)
    a_g = corr(jnp.asarray(x), jnp.asarray(x), p, "gaussian")
    for family in ["matern52", "matern32", "exponential"]:
        a_f = corr(jnp.asarray(x), jnp.asarray(x), p, family)
        assert float(jnp.max(jnp.abs(a_f - a_g))) > 1e-3


def test_beliefs_kernel_family_parse(tmp_path):
    from gp_emu_uqsa_tpu.configs import Beliefs

    b = Beliefs(kernel="matern_5_2()")
    assert b.kernel_family() == "matern52"
    assert Beliefs(kernel="gaussian()").kernel_family() == "gaussian"
    with pytest.raises(ValueError):
        Beliefs(kernel="periodic()").kernel_family()


def test_sensitivity_rejects_non_gaussian():
    from gp_emu_uqsa_tpu import Emulator, sensitivity

    x, y = _problem(n=30)
    emul = Emulator.from_arrays(x, y, kernel="matern52", tries=2,
                                tv_config=(10, 0, 1))
    emul.train_full()
    with pytest.raises(ValueError, match="gaussian"):
        sensitivity.setup(emul, m=[0.5, 0.5], v=[0.02, 0.02])


def test_fast_self_build_analytic_grads_match_autodiff():
    """The Pallas fast-build custom VJP's analytic (x, delta, nugget)
    adjoints must equal autodiff of the XLA build for an arbitrary
    (asymmetric) cotangent. (The fast path is TPU-gated; this pins the
    math, including the input-slot cotangents — code-review r4b #2.)"""
    import jax
    from gp_emu_uqsa_tpu.kernels import (
        _gaussian_self_grads, corr_self, make_params,
    )

    rng = np.random.default_rng(3)
    n, d = 40, 3
    x = jnp.asarray(rng.uniform(size=(n, d)))
    ct = jnp.asarray(rng.standard_normal((n, n)))   # deliberately asymmetric
    delta0 = np.array([0.6, 1.1, 0.9])
    nug0 = 1e-3

    def loss(x_, delta, nugget):
        p = make_params(delta, nugget=nugget, dtype=jnp.float64)
        return jnp.sum(ct * corr_self(x_, p))

    g_x, g_delta, g_nug = jax.grad(loss, argnums=(0, 1, 2))(
        x, jnp.asarray(delta0), jnp.asarray(nug0))
    p = make_params(delta0, nugget=nug0, dtype=jnp.float64)
    a = corr_self(x, p)
    gx, gd, gn = _gaussian_self_grads(x, jnp.asarray(delta0),
                                      jnp.asarray(nug0), a, ct)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(g_x),
                               rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(np.asarray(gd), np.asarray(g_delta),
                               rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(float(gn), float(g_nug), rtol=1e-9)


def test_fast_self_build_gate_off_on_cpu():
    """The TPU-gated fast build must not engage on CPU (grad paths through
    the generic families rely on autodiff of the XLA build)."""
    from gp_emu_uqsa_tpu.kernels import _fast_self_ok

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(size=(600, 4)).astype(np.float32))
    assert not _fast_self_ok(x)   # CPU backend in tests


def test_fast_cross_build_analytic_grads_match_autodiff():
    """Cross-build custom VJP adjoints (BOTH input slots + delta) ==
    autodiff of the XLA build."""
    import jax
    from gp_emu_uqsa_tpu.kernels import (
        _gaussian_cross_grads, gaussian_corr, make_params,
    )

    rng = np.random.default_rng(5)
    x1 = jnp.asarray(rng.uniform(size=(30, 3)))
    x2 = jnp.asarray(rng.uniform(size=(45, 3)))
    ct = jnp.asarray(rng.standard_normal((30, 45)))
    delta0 = np.array([0.7, 1.2, 0.5])

    def loss(x1_, x2_, delta):
        p = make_params(delta, dtype=jnp.float64)
        return jnp.sum(ct * gaussian_corr(x1_, x2_, p))

    g1, g2, gd_ref = jax.grad(loss, argnums=(0, 1, 2))(
        x1, x2, jnp.asarray(delta0))
    p = make_params(delta0, dtype=jnp.float64)
    c = gaussian_corr(x1, x2, p)
    gx1, gx2, gd = _gaussian_cross_grads(x1, x2, jnp.asarray(delta0), c, ct)
    np.testing.assert_allclose(np.asarray(gx1), np.asarray(g1),
                               rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(np.asarray(gx2), np.asarray(g2),
                               rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(np.asarray(gd), np.asarray(gd_ref),
                               rtol=1e-9, atol=1e-12)


def test_gaussian_corr_pallas_matches_xla():
    from gp_emu_uqsa_tpu.ops.kernel_matrix import gaussian_corr_pallas
    from gp_emu_uqsa_tpu.kernels import gaussian_corr, make_params

    rng = np.random.default_rng(6)
    m, n, d = 300, 513, 5                # not tile aligned
    x1 = rng.uniform(size=(m, d)).astype(np.float32)
    x2 = rng.uniform(size=(n, d)).astype(np.float32)
    delta = np.array([0.5, 0.8, 1.2, 0.3, 2.0], np.float32)
    got = gaussian_corr_pallas(x1, x2, delta, interpret=True)
    p = make_params(delta, dtype=jnp.float32)
    want = gaussian_corr(jnp.asarray(x1), jnp.asarray(x2), p)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-6)
    # d > 20 falls back to the in-kernel fp32 HIGHEST path
    d2 = 25
    x1b = rng.uniform(size=(40, d2)).astype(np.float32)
    x2b = rng.uniform(size=(50, d2)).astype(np.float32)
    db = np.full(d2, 0.9, np.float32)
    got2 = gaussian_corr_pallas(x1b, x2b, db, interpret=True)
    want2 = gaussian_corr(jnp.asarray(x1b), jnp.asarray(x2b),
                          make_params(db, dtype=jnp.float32))
    np.testing.assert_allclose(np.asarray(got2), np.asarray(want2),
                               rtol=2e-5, atol=2e-6)

"""Multi-restart MLE recovers hyperparameters on synthetic GP draws."""
import numpy as np
import jax
import jax.numpy as jnp

from gp_emu_uqsa_tpu import gp
from gp_emu_uqsa_tpu.basis import basis_matrix, linear_basis
from gp_emu_uqsa_tpu.inference import MLEConfig, mle_fit
from gp_emu_uqsa_tpu.kernels import make_params

import oracle


def _draw_gp(seed, n, d, delta, nugget=1e-8):
    rng = np.random.default_rng(seed)
    x = rng.uniform(size=(n, d))
    a = oracle.corr_self(x, delta, nugget)
    y = np.linalg.cholesky(a) @ rng.standard_normal(n)
    return x, y


def test_mle_recovers_lengthscales_mucm():
    delta_true = np.array([0.3, 0.8])
    x, y = _draw_gp(0, 120, 2, delta_true)
    h = basis_matrix(jnp.asarray(x), linear_basis(2))
    cfg = MLEConfig(tries=6, nugget=1e-8, delta_bounds=(1e-2, 1e2))
    params, info = mle_fit(jax.random.key(0), x, y, h, cfg)
    # NLL at the fit must beat NLL at truth minus tolerance
    nll_fit = float(info["best_nll"])
    nll_true = float(
        gp.nll_mucm(make_params(delta_true, nugget=1e-8, dtype=jnp.float64),
                    jnp.asarray(x), jnp.asarray(y), h)
    )
    assert nll_fit <= nll_true + 1e-3
    # lengthscales within a factor ~2 of truth (n=120 draws)
    ratio = np.exp(np.asarray(params.log_delta)) / delta_true
    assert np.all(ratio > 0.45) and np.all(ratio < 2.5)


def test_mle_gp4ml_mode():
    delta_true = np.array([0.5])
    x, y = _draw_gp(3, 80, 1, delta_true)
    y = 2.0 * y  # sigma2 = 4
    h = basis_matrix(jnp.asarray(x), linear_basis(1))
    cfg = MLEConfig(mode="gp4ml", tries=4, nugget=1e-8)
    params, info = mle_fit(jax.random.key(1), x, y, h, cfg)
    assert np.isfinite(float(info["best_nll"]))
    sigma2 = float(np.exp(params.log_sigma2))
    assert 1.0 < sigma2 < 16.0


def test_mle_trains_nugget():
    delta_true = np.array([0.4])
    x, y = _draw_gp(7, 100, 1, delta_true)
    y = y + 0.05 * np.random.default_rng(8).standard_normal(len(y))
    h = basis_matrix(jnp.asarray(x), linear_basis(1))
    cfg = MLEConfig(tries=4, train_nugget=True, nugget_bounds=(1e-8, 1.0))
    params, info = mle_fit(jax.random.key(2), x, y, h, cfg)
    nug = float(np.exp(params.log_nugget))
    assert 1e-5 < nug < 0.2  # should find ~noise/signal variance ratio
    assert np.isfinite(float(info["best_nll"]))


def test_restarts_consistent():
    """Most restarts should converge to similar NLL on an easy problem."""
    x, y = _draw_gp(11, 60, 2, np.array([0.5, 0.5]))
    h = basis_matrix(jnp.asarray(x), linear_basis(2))
    cfg = MLEConfig(tries=5)
    _, info = mle_fit(jax.random.key(3), x, y, h, cfg)
    nlls = np.asarray(info["nlls"])
    finite = nlls[np.isfinite(nlls)]
    assert len(finite) >= 3
    assert finite.min() <= np.median(finite) + 5.0

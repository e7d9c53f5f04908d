"""fp32 robustness: the TPU-realistic dtype must stay accurate & stable.

TPU has no fp64 matmul path (SURVEY.md S9.4), so the entire stack must hold
up in fp32 with the jitter ladder and inf-not-NaN guards. These tests run
the core paths in fp32 on CPU and pin the achievable tolerances.
"""
import numpy as np
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

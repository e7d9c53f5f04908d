"""Engine UQSA vs the independent literal-formula NumPy oracle.

VERDICT r4 weak #6 / next-step #8: the sensitivity integrals were verified
by quadrature of the same emulator machinery plus one external golden;
this file closes the loop with tests/oracle.py's explicit-loop fp64
implementation of the MUCM U/S/Q integral set — no shared code with
`sensitivity/_core.py` (which runs cancellation-free delta forms and lazy
GEMM-shaped subset sums; the oracle runs the direct per-element formulas
with explicit inverses).
"""
import numpy as np
import jax.numpy as jnp
import pytest

import oracle
from gp_emu_uqsa_tpu import gp
from gp_emu_uqsa_tpu.basis import BasisSpec, basis_matrix, linear_basis
from gp_emu_uqsa_tpu.kernels import make_params
from gp_emu_uqsa_tpu.sensitivity._core import Sensitivity

N, D = 26, 3
NUGGET = 1e-6
DELTA = np.array([0.7, 1.1, 0.5])
M = np.array([0.45, 0.5, 0.6])
V = np.array([0.02, 0.03, 0.015])


def _problem(spec):
    rng = np.random.default_rng(7)
    x = rng.uniform(size=(N, D))
    y = (np.sin(2.5 * x[:, 0]) + 0.8 * x[:, 1] * x[:, 2]
         + 0.3 * x[:, 2] ** 2)
    params = make_params(DELTA, nugget=NUGGET, dtype=jnp.float64)
    h = basis_matrix(jnp.asarray(x), spec)
    state = gp.fit(params, jnp.asarray(x), jnp.asarray(y), h)
    sens = Sensitivity(state, x, spec, M, V)
    h_cols = ([None] if spec.include_const else []) + list(spec.linear_dims)
    return x, y, h_cols, sens


@pytest.fixture(scope="module")
def full_linear():
    return _problem(linear_basis(D))


def test_uncertainty_matches_oracle(full_linear):
    x, y, h_cols, sens = full_linear
    m0, v0 = oracle.uqsa_uncertainty(x, y, h_cols, DELTA, NUGGET, M, V)
    unc = sens.uncertainty()
    np.testing.assert_allclose(float(unc["E_EY"]), m0, rtol=1e-9)
    np.testing.assert_allclose(float(unc["V_EY"]), v0, rtol=1e-7)


def test_first_order_variances_match_oracle(full_linear):
    x, y, h_cols, sens = full_linear
    res = sens.sensitivity()
    for i in range(D):
        want = oracle.uqsa_sensitivity_variance(
            x, y, h_cols, DELTA, NUGGET, M, V, (i,))
        np.testing.assert_allclose(float(res["V_i"][i]), want, rtol=1e-6,
                                   err_msg=f"V_{i}")
    want_tot = oracle.uqsa_sensitivity_variance(
        x, y, h_cols, DELTA, NUGGET, M, V, tuple(range(D)))
    np.testing.assert_allclose(float(res["V_total"]), want_tot, rtol=1e-6)


def test_pair_subset_and_total_effects_match_oracle(full_linear):
    x, y, h_cols, sens = full_linear
    want01 = oracle.uqsa_sensitivity_variance(
        x, y, h_cols, DELTA, NUGGET, M, V, (0, 1))
    got01 = float(sens.sensitivity_variance((0, 1)))
    np.testing.assert_allclose(got01, want01, rtol=1e-6)
    tot = sens.totaleffectvariance()
    for i in range(D):
        comp = tuple(j for j in range(D) if j != i)
        want = (oracle.uqsa_sensitivity_variance(
                    x, y, h_cols, DELTA, NUGGET, M, V, tuple(range(D)))
                - oracle.uqsa_sensitivity_variance(
                    x, y, h_cols, DELTA, NUGGET, M, V, comp))
        np.testing.assert_allclose(float(tot["V_Ti"][i]), want, rtol=1e-5,
                                   err_msg=f"V_T{i}")


def test_effect_curves_match_oracle(full_linear):
    x, y, h_cols, sens = full_linear
    grid = np.linspace(M[1] - 0.3, M[1] + 0.3, 7)[:, None]
    mean, var = sens.effect_curve((1,), jnp.asarray(grid))
    o_mean, o_var = oracle.uqsa_effect_curve(
        x, y, h_cols, DELTA, NUGGET, M, V, (1,), grid)
    np.testing.assert_allclose(np.asarray(mean), o_mean, rtol=1e-8)
    np.testing.assert_allclose(np.asarray(var), o_var, rtol=1e-6, atol=1e-12)
    # pair curve exercises the joint-subset T/R path
    gg = np.stack([np.full(5, M[0]), np.linspace(0.4, 0.6, 5)], axis=1)
    mean2, var2 = sens.effect_curve((0, 1), jnp.asarray(gg))
    o_mean2, o_var2 = oracle.uqsa_effect_curve(
        x, y, h_cols, DELTA, NUGGET, M, V, (0, 1), gg)
    np.testing.assert_allclose(np.asarray(mean2), o_mean2, rtol=1e-8)
    np.testing.assert_allclose(np.asarray(var2), o_var2, rtol=1e-6, atol=1e-12)


def test_const_only_basis_matches_oracle():
    x, y, h_cols, sens = _problem(BasisSpec(True, ()))
    assert h_cols == [None]
    m0, v0 = oracle.uqsa_uncertainty(x, y, h_cols, DELTA, NUGGET, M, V)
    unc = sens.uncertainty()
    np.testing.assert_allclose(float(unc["E_EY"]), m0, rtol=1e-9)
    np.testing.assert_allclose(float(unc["V_EY"]), v0, rtol=1e-7)
    want = oracle.uqsa_sensitivity_variance(
        x, y, h_cols, DELTA, NUGGET, M, V, (2,))
    np.testing.assert_allclose(
        float(sens.sensitivity_variance((2,))), want, rtol=1e-6)


def test_partial_linear_basis_matches_oracle():
    # basis [1, x_0, x_2] — exercises the column-subset bookkeeping
    x, y, h_cols, sens = _problem(BasisSpec(True, (0, 2)))
    assert h_cols == [None, 0, 2]
    for w in [(0,), (1,), (0, 2)]:
        want = oracle.uqsa_sensitivity_variance(
            x, y, h_cols, DELTA, NUGGET, M, V, w)
        np.testing.assert_allclose(
            float(sens.sensitivity_variance(w)), want, rtol=1e-6,
            err_msg=f"w={w}")

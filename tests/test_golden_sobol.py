"""External golden values for the UQSA engine (VERDICT r3 next-step #7).

Unlike the quadrature tests in test_sensitivity.py (which verify the
closed-form MUCM integrals against numerical integration OF THE EMULATOR,
i.e. against machinery we also wrote), this file anchors the end-to-end
pipeline to EXTERNALLY PUBLISHED analytic truths about the SIMULATOR:

  For Y = a1 x1 + a2 x2 + b x1 x2 with independent x_i ~ N(0, 1), the
  Sobol-Hoeffding ANOVA decomposition [Sobol' 1993, "Sensitivity estimates
  for nonlinear mathematical models", MMCE 1(4); Saltelli et al. 2008,
  "Global Sensitivity Analysis: The Primer", ch. 1; the decomposition
  underlying the MUCM/Oakley-O'Hagan GP-based SA, JRSS-B 66(3) 2004] gives

      f0 = 0,  f1 = a1 x1,  f2 = a2 x2,  f12 = b x1 x2
      V   = a1^2 + a2^2 + b^2          (all terms orthonormal under N(0,1))
      V1  = a1^2,  V2 = a2^2,  V12 = b^2
      S1  = a1^2 / V,   S2  = a2^2 / V
      ST1 = (a1^2 + b^2) / V,   ST2 = (a2^2 + b^2) / V
      E[Y] = 0

  With a1 = 1, a2 = 0.5, b = 0.75 the targets are exact rationals:
      V = 1.8125, S1 = 16/29, S2 = 4/29, ST1 = 25/29, ST2 = 13/29.

The test trains a real emulator on the simulator (MLE hyperparameters, the
production path) and demands the ANALYTIC MUCM indices of the emulator hit
these external numbers. Nothing on the right-hand side of an assert below
was produced by code in this repository.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gp_emu_uqsa_tpu import gp
from gp_emu_uqsa_tpu.basis import basis_matrix, linear_basis
from gp_emu_uqsa_tpu.inference import MLEConfig, mle_fit
from gp_emu_uqsa_tpu.sensitivity._core import Sensitivity

A1, A2, B = 1.0, 0.5, 0.75
V_TOTAL = A1**2 + A2**2 + B**2                   # 1.8125
S1, S2 = A1**2 / V_TOTAL, A2**2 / V_TOTAL        # 16/29, 4/29
ST1, ST2 = (A1**2 + B**2) / V_TOTAL, (A2**2 + B**2) / V_TOTAL


def _simulator(x):
    return A1 * x[:, 0] + A2 * x[:, 1] + B * x[:, 0] * x[:, 1]


@pytest.fixture(scope="module")
def sens():
    # stratified (LHS-style) design over +-3 sd of the input distribution
    rng = np.random.default_rng(7)
    n = 100
    cols = []
    for _ in range(2):
        strata = (np.arange(n) + rng.uniform(size=n)) / n
        cols.append(rng.permutation(strata))
    x = -3.0 + 6.0 * np.stack(cols, axis=1)
    y = _simulator(x)
    spec = linear_basis(2)
    xj = jnp.asarray(x)
    h = basis_matrix(xj, spec)
    params, _ = mle_fit(jax.random.key(0), xj, jnp.asarray(y), h,
                        MLEConfig(tries=4, nugget=1e-8))
    state = gp.fit(params, xj, jnp.asarray(y), h)
    return Sensitivity(state, x, spec, m=np.zeros(2), v=np.ones(2))


def test_first_order_indices_match_published_decomposition(sens):
    si = np.asarray(sens.sensitivity()["S_i"])
    np.testing.assert_allclose(si, [S1, S2], atol=5e-3)


def test_total_effect_indices_match_published_decomposition(sens):
    sti = np.asarray(sens.totaleffectvariance()["S_Ti"])
    np.testing.assert_allclose(sti, [ST1, ST2], atol=5e-3)


def test_uncertainty_matches_published_moments(sens):
    unc = sens.uncertainty()
    assert abs(float(unc["E_EY"])) < 2e-2
    np.testing.assert_allclose(float(unc["E_VarY"]), V_TOTAL, rtol=2e-2)


def test_interaction_variance_is_the_anova_remainder(sens):
    """V12 = b^2: the pairwise sensitivity variance minus both mains."""
    v12 = (float(sens.sensitivity_variance((0, 1)))
           - float(sens.sensitivity_variance((0,)))
           - float(sens.sensitivity_variance((1,))))
    np.testing.assert_allclose(v12, B**2, rtol=3e-2, atol=5e-3)

"""blocked_tri_solve vs XLA triangular_solve (ops/cholesky.py).

The blocked recursion exists because XLA:TPU's one-shot TRSM with an
(n, n) RHS keeps ~4n^2 * n/block update-slice temporaries live (65 GB at
n=16k on a 16 GB v5e — round-2 bench OOM); `gp.predictor` routes through
it for n > 4096.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gp_emu_uqsa_tpu.ops.cholesky import blocked_tri_solve, tri_solve


@pytest.mark.parametrize("n,m", [(512, 300), (1000, 64), (96, 7)])
@pytest.mark.parametrize("trans", [False, True])
def test_matches_xla_solve(n, m, trans):
    rng = np.random.default_rng(0)
    a = rng.standard_normal((n, n))
    a = a @ a.T + n * np.eye(n)
    l = np.linalg.cholesky(a)
    b = rng.standard_normal((n, m))
    want = np.asarray(tri_solve(jnp.asarray(l), jnp.asarray(b), trans=trans))
    got = np.asarray(
        blocked_tri_solve(jnp.asarray(l), jnp.asarray(b), trans=trans,
                          leaf=128))
    err = np.max(np.abs(got - want)) / np.max(np.abs(want))
    assert err < (1e-12 if want.dtype == np.float64 else 1e-5)


@pytest.mark.parametrize("n,m", [(512, 300), (96, 7)])
def test_right_side_matches_xla_solve(n, m):
    """blocked_tri_solve_right (X L^T = B — the blocked-Cholesky panel
    step) == XLA's right-side TRSM."""
    from gp_emu_uqsa_tpu.ops.cholesky import blocked_tri_solve_right

    rng = np.random.default_rng(3)
    a = rng.standard_normal((n, n))
    a = a @ a.T + n * np.eye(n)
    l = np.linalg.cholesky(a)
    b = rng.standard_normal((m, n))
    want = np.asarray(jax.lax.linalg.triangular_solve(
        jnp.asarray(l), jnp.asarray(b), left_side=False, lower=True,
        transpose_a=True))
    got = np.asarray(blocked_tri_solve_right(
        jnp.asarray(l), jnp.asarray(b), leaf=128))
    err = np.max(np.abs(got - want)) / np.max(np.abs(want))
    assert err < (1e-12 if want.dtype == np.float64 else 1e-5)


def test_predictor_large_n_path_matches_small_path():
    """The n > 4096 predictor branch must agree with the direct solve.

    Exercised at small n by calling the blocked solve directly with a tiny
    leaf (the branch itself is a one-line dispatch on n).
    """
    from gp_emu_uqsa_tpu import gp
    from gp_emu_uqsa_tpu.basis import basis_matrix, linear_basis
    from gp_emu_uqsa_tpu.kernels import make_params

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.uniform(size=(64, 2)))
    y = jnp.sin(3.0 * x[:, 0]) + x[:, 1]
    h = basis_matrix(x, linear_basis(2))
    params = make_params(np.full(2, 0.7), nugget=1e-4, dtype=x.dtype)
    state = gp.fit(params, x, y, h)
    linv_direct = tri_solve(state.l, jnp.eye(64, dtype=state.l.dtype))
    linv_blocked = blocked_tri_solve(
        state.l, jnp.eye(64, dtype=state.l.dtype), leaf=16)
    np.testing.assert_allclose(
        np.asarray(linv_blocked), np.asarray(linv_direct), rtol=1e-9,
        atol=1e-9)

"""Pallas kernels vs the XLA reference path (interpret mode on CPU)."""
import numpy as np
import jax.numpy as jnp

from gp_emu_uqsa_tpu.kernels import gaussian_corr_self, make_params
from gp_emu_uqsa_tpu.ops.kernel_matrix import gaussian_corr_self_pallas


def test_fused_kernel_matrix_matches_xla():
    rng = np.random.default_rng(0)
    n, d = 300, 5   # deliberately not tile-aligned
    x = rng.uniform(size=(n, d)).astype(np.float32)
    delta = np.array([0.5, 0.8, 1.2, 0.3, 2.0], np.float32)
    nugget = 1e-4
    got = gaussian_corr_self_pallas(x, delta, nugget, interpret=True)
    p = make_params(delta, nugget=nugget, dtype=jnp.float32)
    want = gaussian_corr_self(jnp.asarray(x), p)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-6)
    # exact symmetric + unit diagonal (+nugget)
    a = np.asarray(got)
    np.testing.assert_allclose(a, a.T, atol=2e-6)
    np.testing.assert_allclose(np.diag(a), 1.0 + nugget, rtol=1e-5)


def test_corr_matvec_fused_matches_xla():
    from gp_emu_uqsa_tpu.kernels import gaussian_corr
    from gp_emu_uqsa_tpu.ops.serve import corr_matvec_pallas

    rng = np.random.default_rng(2)
    m, n, d, r = 513, 300, 3, 5       # nothing tile-aligned
    xstar = rng.uniform(size=(m, d)).astype(np.float32)
    x = rng.uniform(size=(n, d)).astype(np.float32)
    delta = np.array([0.5, 1.5, 0.9], np.float32)
    rhs = rng.standard_normal((n, r)).astype(np.float32)
    got = corr_matvec_pallas(xstar, x, delta, rhs, interpret=True)
    p = make_params(delta, nugget=0.0, dtype=jnp.float32)
    c = gaussian_corr(jnp.asarray(xstar), jnp.asarray(x), p)
    want = np.asarray(c @ jnp.asarray(rhs))
    np.testing.assert_allclose(np.asarray(got), want, rtol=3e-5, atol=3e-5)
    # vector RHS round-trips shape
    got_v = corr_matvec_pallas(xstar, x, delta, rhs[:, 0], interpret=True)
    assert got_v.shape == (m,)
    np.testing.assert_allclose(np.asarray(got_v), want[:, 0],
                               rtol=3e-5, atol=3e-5)


def test_serve_mean_pallas_matches_predict_fast():
    import jax
    from gp_emu_uqsa_tpu import gp
    from gp_emu_uqsa_tpu.basis import basis_matrix, linear_basis
    from gp_emu_uqsa_tpu.ops.serve import serve_mean_pallas

    rng = np.random.default_rng(3)
    n, d, m = 80, 2, 200
    x = jnp.asarray(rng.uniform(size=(n, d)), jnp.float32)
    y = jnp.sin(3 * x[:, 0]) + x[:, 1]
    spec = linear_basis(d)
    h = basis_matrix(x, spec)
    xs = jnp.asarray(rng.uniform(size=(m, d)), jnp.float32)
    hs = basis_matrix(xs, spec)
    params = make_params(np.full(d, 0.7, np.float32), nugget=1e-4,
                         dtype=jnp.float32)
    state = gp.fit(params, x, y, h)
    pred = gp.predictor(state)
    want_mean, _ = gp.predict_fast(pred, x, xs, hs)
    got_mean = serve_mean_pallas(pred, x, xs, hs, interpret=True)
    np.testing.assert_allclose(np.asarray(got_mean), np.asarray(want_mean),
                               rtol=2e-4, atol=2e-4)


def test_blocked_cholesky_matches_lapack():
    import jax.numpy as jnp
    from gp_emu_uqsa_tpu.ops.cholesky import cholesky_blocked_padded

    rng = np.random.default_rng(1)
    for n in (100, 512, 700, 1024):
        m = rng.standard_normal((n, n))
        a = m @ m.T + n * np.eye(n)
        l_ref = np.linalg.cholesky(a)
        l_got = np.asarray(cholesky_blocked_padded(jnp.asarray(a), leaf=256))
        np.testing.assert_allclose(l_got, l_ref, rtol=1e-8, atol=1e-8)
        # exactly lower triangular
        assert np.allclose(np.triu(l_got, 1), 0.0)

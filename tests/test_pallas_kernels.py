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

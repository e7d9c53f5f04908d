"""2D block-cyclic distributed Cholesky vs dense oracle (SURVEY.md S9.4)."""
import numpy as np
import jax.numpy as jnp
import pytest

from gp_emu_uqsa_tpu.parallel import make_mesh
from gp_emu_uqsa_tpu.ops.block_cyclic import block_cyclic_cholesky


def _spd(n, seed=0):
    rng = np.random.default_rng(seed)
    m = rng.standard_normal((n, n))
    return m @ m.T + n * np.eye(n)


@pytest.mark.parametrize("n,mesh_shape", [
    (256, {"mr": 2, "mc": 4}),   # divisible grid
    (200, {"mr": 4, "mc": 2}),   # padding path (200 not divisible by 256)
    (96, {"mr": 8, "mc": 1}),    # degenerate 1D column mesh
])
def test_block_cyclic_matches_dense(n, mesh_shape):
    a = _spd(n)
    mesh = make_mesh(mesh_shape)
    l = block_cyclic_cholesky(jnp.asarray(a), mesh, block=32)
    ref = np.linalg.cholesky(a)
    np.testing.assert_allclose(np.asarray(l), ref, rtol=1e-12, atol=1e-12)


def test_block_cyclic_fit_large_matches_gp_fit():
    """fit_large(factorization='block2d') == single-chip gp.fit."""
    from gp_emu_uqsa_tpu import gp
    from gp_emu_uqsa_tpu.basis import basis_matrix, linear_basis
    from gp_emu_uqsa_tpu.kernels import make_params
    from gp_emu_uqsa_tpu.parallel.large_fit import fit_large

    rng = np.random.default_rng(1)
    n, d = 72, 2
    x = jnp.asarray(rng.uniform(size=(n, d)))
    y = jnp.sin(3 * x[:, 0]) + x[:, 1]
    h = basis_matrix(x, linear_basis(d))
    p = make_params(np.full(d, 0.6), nugget=1e-4, dtype=jnp.float64)
    mesh = make_mesh({"mr": 2, "mc": 4})
    st_d = fit_large(p, x, y, h, mesh, block=16, factorization="block2d")
    st_l = gp.fit(p, x, y, h)
    np.testing.assert_allclose(
        np.asarray(st_d.beta), np.asarray(st_l.beta), rtol=1e-9)
    np.testing.assert_allclose(
        float(st_d.sigma2), float(st_l.sigma2), rtol=1e-9)
    np.testing.assert_allclose(
        float(st_d.nll), float(st_l.nll), rtol=1e-9)

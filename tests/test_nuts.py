"""NUTS: stationarity on known targets + GP posterior + sharded chains."""
import numpy as np
import jax
import jax.numpy as jnp

from jax.sharding import Mesh, PartitionSpec as P

from gp_emu_uqsa_tpu.basis import basis_matrix, linear_basis
from gp_emu_uqsa_tpu.inference import MLEConfig
from gp_emu_uqsa_tpu.inference.hmc import HMCConfig, split_rhat
from gp_emu_uqsa_tpu.inference.nuts import nuts_sample

import oracle


def test_gaussian_target_moments():
    var = jnp.asarray([0.5, 4.0, 0.02])
    mean = jnp.asarray([1.0, -2.0, 0.3])

    def logdensity(z):
        return -0.5 * jnp.sum((z - mean) ** 2 / var)

    cfg = HMCConfig(n_warmup=300, n_samples=500, init_step_size=0.2)
    z0 = jax.random.normal(jax.random.key(1), (6, 3), jnp.float64)
    samples, stats = nuts_sample(jax.random.key(0), logdensity, z0, cfg,
                                 max_depth=7)
    flat = np.asarray(samples).reshape(-1, 3)
    np.testing.assert_allclose(flat.mean(0), np.asarray(mean), atol=0.25)
    np.testing.assert_allclose(flat.var(0), np.asarray(var), rtol=0.35)
    assert float(stats["divergence_rate"]) < 0.05
    assert np.all(np.asarray(split_rhat(samples)) < 1.15)


def test_correlated_gaussian():
    """Strongly correlated 2D Gaussian — the case NUTS exists for."""
    rho = 0.95
    cov = jnp.asarray([[1.0, rho], [rho, 1.0]])
    prec = jnp.linalg.inv(cov)

    def logdensity(z):
        return -0.5 * z @ prec @ z

    cfg = HMCConfig(n_warmup=400, n_samples=600, init_step_size=0.2)
    z0 = 0.1 * jax.random.normal(jax.random.key(2), (6, 2), jnp.float64)
    samples, stats = nuts_sample(jax.random.key(3), logdensity, z0, cfg,
                                 max_depth=8)
    flat = np.asarray(samples).reshape(-1, 2)
    emp_rho = np.corrcoef(flat.T)[0, 1]
    assert abs(emp_rho - rho) < 0.08, emp_rho
    np.testing.assert_allclose(flat.var(0), 1.0, rtol=0.35)


def test_gp_posterior_nuts():
    rng = np.random.default_rng(3)
    x = rng.uniform(size=(30, 2))
    a = oracle.corr_self(x, np.array([0.4, 0.7]), 1e-6)
    y = np.linalg.cholesky(a) @ rng.standard_normal(30)
    h = basis_matrix(jnp.asarray(x), linear_basis(2))
    from gp_emu_uqsa_tpu.inference.hmc import make_gp_logdensity
    ld = make_gp_logdensity(x, y, h, MLEConfig(nugget=1e-6))
    z0 = jnp.log(0.5) + 0.1 * jax.random.normal(jax.random.key(4), (4, 2),
                                                jnp.float64)
    cfg = HMCConfig(n_warmup=150, n_samples=150, init_step_size=0.1)
    samples, stats = nuts_sample(jax.random.key(5), ld, z0, cfg, max_depth=6)
    assert np.all(np.isfinite(np.asarray(samples)))
    assert float(stats["divergence_rate"]) < 0.2
    post_delta = np.exp(np.asarray(samples).reshape(-1, 2).mean(0))
    assert np.all(post_delta > 0.05) and np.all(post_delta < 10.0)


def test_sharded_nuts():
    var = jnp.asarray([1.0, 0.25])

    def logdensity(z):
        return -0.5 * jnp.sum(z * z / var)

    cfg = HMCConfig(n_warmup=200, n_samples=300)
    z0 = jax.random.normal(jax.random.key(7), (8, 2), jnp.float64)
    mesh = Mesh(np.array(jax.devices()), ("chains",))

    def sharded(key, z0):
        return jax.shard_map(
            lambda k, z: nuts_sample(k, logdensity, z, cfg, max_depth=6,
                                     axis_name="chains"),
            mesh=mesh,
            in_specs=(P(), P("chains")),
            out_specs=(P("chains"), P()),
            check_vma=False,
        )(key, z0)

    samples, stats = jax.jit(sharded)(jax.random.key(8), z0)
    flat = np.asarray(samples).reshape(-1, 2)
    np.testing.assert_allclose(flat.mean(0), 0.0, atol=0.25)
    np.testing.assert_allclose(flat.var(0), np.asarray(var), rtol=0.4)

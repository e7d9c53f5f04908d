"""HMC: stationarity on a known Gaussian, GP posterior smoke, sharded chains."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from jax.sharding import Mesh, PartitionSpec as P

from gp_emu_uqsa_tpu.basis import basis_matrix, linear_basis
from gp_emu_uqsa_tpu.inference import MLEConfig, mle_fit
from gp_emu_uqsa_tpu.inference.hmc import (
    HMCConfig, ess, hmc_sample, make_gp_logdensity, predict_marginalized,
    split_rhat,
)

import oracle


def test_gaussian_target_moments():
    """Chains must recover mean/cov of an anisotropic Gaussian target."""
    var = jnp.asarray([0.5, 4.0, 0.02])
    mean = jnp.asarray([1.0, -2.0, 0.3])

    def logdensity(z):
        return -0.5 * jnp.sum((z - mean) ** 2 / var)

    cfg = HMCConfig(n_warmup=400, n_samples=600, n_leapfrog=8,
                    init_step_size=0.2)
    z0 = jax.random.normal(jax.random.key(1), (8, 3), jnp.float64)
    samples, stats = jax.jit(
        lambda k, z: hmc_sample(k, logdensity, z, cfg)
    )(jax.random.key(0), z0)
    flat = np.asarray(samples).reshape(-1, 3)
    np.testing.assert_allclose(flat.mean(0), np.asarray(mean), atol=0.25)
    np.testing.assert_allclose(flat.var(0), np.asarray(var), rtol=0.35)
    assert 0.6 < float(stats["accept_rate"]) <= 1.0
    assert float(stats["divergence_rate"]) < 0.05
    rhat = np.asarray(split_rhat(samples))
    assert np.all(rhat < 1.15), rhat
    # mass adaptation should have learned the scale ordering
    inv_mass = np.asarray(stats["inv_mass"])
    assert inv_mass[1] > inv_mass[2]


def test_ess_reasonable():
    """ESS of iid samples ~ total draws; of constant-ish series, small."""
    rng = np.random.default_rng(0)
    iid = jnp.asarray(rng.standard_normal((4, 200, 2)))
    e = np.asarray(ess(iid))
    assert np.all(e > 300)  # 800 total draws, iid => near 800


def _gp_problem():
    rng = np.random.default_rng(3)
    x = rng.uniform(size=(40, 2))
    a = oracle.corr_self(x, np.array([0.4, 0.7]), 1e-6)
    y = np.linalg.cholesky(a) @ rng.standard_normal(40)
    h = np.asarray(basis_matrix(jnp.asarray(x), linear_basis(2)))
    return x, y, h


def test_gp_hyperparameter_posterior():
    x, y, h = _gp_problem()
    cfg = MLEConfig(mode="mucm", nugget=1e-6)
    logdensity = make_gp_logdensity(x, y, h, cfg)
    z0 = jnp.log(0.5) + 0.1 * jax.random.normal(
        jax.random.key(2), (6, 2), jnp.float64
    )
    hmc_cfg = HMCConfig(n_warmup=200, n_samples=200, n_leapfrog=10,
                        init_step_size=0.1)
    samples, stats = hmc_sample(jax.random.key(3), logdensity, z0, hmc_cfg)
    assert np.all(np.isfinite(np.asarray(samples)))
    assert float(stats["accept_rate"]) > 0.5
    # posterior should concentrate near the MLE lengthscales
    params_mle, _ = mle_fit(jax.random.key(4), x, y, h, cfg)
    post_mean = np.asarray(samples).reshape(-1, 2).mean(0)
    mle_ld = np.asarray(params_mle.log_delta)
    assert np.all(np.abs(post_mean - mle_ld) < 1.0), (post_mean, mle_ld)
    # marginalized prediction runs and matches point-prediction scale
    xs = np.random.default_rng(5).uniform(size=(7, 2))
    hs = np.asarray(basis_matrix(jnp.asarray(xs), linear_basis(2)))
    pm, pv = predict_marginalized(samples, x, y, h, xs, hs, cfg, max_draws=16)
    assert np.all(np.isfinite(np.asarray(pm)))
    assert np.all(np.asarray(pv) >= 0)


def test_sharded_chains_match_unsharded():
    """shard_map over 8 CPU devices: same code, statistically same result."""
    var = jnp.asarray([1.0, 0.25])

    def logdensity(z):
        return -0.5 * jnp.sum(z * z / var)

    cfg = HMCConfig(n_warmup=400, n_samples=700, n_leapfrog=8)
    n_chains = 16
    z0 = jax.random.normal(jax.random.key(7), (n_chains, 2), jnp.float64)

    devices = jax.devices()
    assert len(devices) == 8, "conftest must provide 8 virtual CPU devices"
    mesh = Mesh(np.array(devices), ("chains",))

    def sharded(key, z0):
        return jax.shard_map(
            lambda k, z: hmc_sample(k, logdensity, z, cfg, axis_name="chains"),
            mesh=mesh,
            in_specs=(P(), P("chains")),
            out_specs=(P("chains"), P()),
            check_vma=False,
        )(key, z0)

    samples_sh, stats_sh = jax.jit(sharded)(jax.random.key(8), z0)
    assert samples_sh.shape[0] == n_chains
    flat = np.asarray(samples_sh).reshape(-1, 2)
    np.testing.assert_allclose(flat.mean(0), 0.0, atol=0.2)
    np.testing.assert_allclose(flat.var(0), np.asarray(var), rtol=0.35)
    # cross-chain adaptation produced a single consistent step size
    assert float(stats_sh["accept_rate"]) > 0.5


def test_sharded_shards_decorrelated():
    """Shards fed IDENTICAL local z0 must still produce distinct chains.

    Regression for the round-1 RNG bug: the same key reaches every shard
    under in_specs=(P(), P("chains")); without fold_in(axis_index) each
    device replays the same momenta/uniforms and the mesh runs 8 copies of
    the same trajectories. Moment tests cannot catch that — direct
    inter-shard comparison can.
    """

    def logdensity(z):
        return -0.5 * jnp.sum(z * z)

    cfg = HMCConfig(n_warmup=20, n_samples=30, n_leapfrog=4)
    devices = jax.devices()
    n_dev = len(devices)
    per_shard = 2
    # identical starting positions on every shard
    z_local = jnp.asarray([[0.5, -0.5], [1.0, 0.25]], jnp.float64)
    z0 = jnp.tile(z_local, (n_dev, 1))
    mesh = Mesh(np.array(devices), ("chains",))

    def run(key, z0):
        return jax.shard_map(
            lambda k, z: hmc_sample(k, logdensity, z, cfg, axis_name="chains"),
            mesh=mesh, in_specs=(P(), P("chains")),
            out_specs=(P("chains"), P()), check_vma=False,
        )(key, z0)

    samples, _ = jax.jit(run)(jax.random.key(11), z0)
    s = np.asarray(samples).reshape(n_dev, per_shard, -1)
    for a in range(n_dev):
        for b in range(a + 1, n_dev):
            assert not np.allclose(s[a], s[b]), (
                f"shards {a} and {b} produced identical trajectories: "
                "per-shard RNG is correlated"
            )


def test_config4_sharded_gp_hmc():
    """BASELINE config 4 shape: GP-hyperparameter HMC, chains sharded."""
    rng = np.random.default_rng(0)
    x = rng.uniform(size=(60, 3))
    y = np.sin(5 * x[:, 0]) * np.exp(-x[:, 1]) + x[:, 2] ** 2
    h = basis_matrix(jnp.asarray(x), linear_basis(3))
    from gp_emu_uqsa_tpu.inference.hmc import make_gp_logdensity
    ld = make_gp_logdensity(x, y, h, MLEConfig(nugget=1e-6))
    mesh = Mesh(np.array(jax.devices()), ("chains",))
    cfg = HMCConfig(n_warmup=100, n_samples=100, n_leapfrog=8)
    z0 = jnp.log(0.5) + 0.2 * jax.random.normal(jax.random.key(0), (16, 3),
                                                jnp.float64)

    def run(key, z0):
        return jax.shard_map(
            lambda k, z: hmc_sample(k, ld, z, cfg, axis_name="chains"),
            mesh=mesh, in_specs=(P(), P("chains")),
            out_specs=(P("chains"), P()), check_vma=False,
        )(key, z0)

    samples, stats = jax.jit(run)(jax.random.key(1), z0)
    assert samples.shape[:2] == (16, 100)
    assert np.all(np.isfinite(np.asarray(samples)))
    assert float(stats["accept_rate"]) > 0.4
    rhat = np.asarray(split_rhat(samples))
    assert np.all(rhat < 1.3), rhat


def test_mcmc_continue_exact_resume_and_stationarity():
    """Sampling-only continuation (round-5): re-running a segment from its
    checkpointed (z, eps, inv_mass, key) is bit-exact, and a chain built
    from k chained segments keeps sampling the target (the chunked-
    dispatch pattern production TPU chains use — docs/samplers.md)."""
    from gp_emu_uqsa_tpu.inference.hmc import (
        HMCConfig, hmc_continue, hmc_sample,
    )

    sd = jnp.asarray([1.0, 0.5, 2.0])

    def logdensity(z):
        return -0.5 * jnp.sum((z / sd) ** 2)

    n_chains, d = 8, 3
    z0 = jnp.zeros((n_chains, d))
    cfg = HMCConfig(n_warmup=150, n_samples=1, n_leapfrog=8)
    warm, stats = hmc_sample(jax.random.key(0), logdensity, z0, cfg)
    z = warm[:, -1]
    eps, im = stats["step_size"], stats["inv_mass"]

    # bit-exact segment resume
    s1, _, k1 = hmc_continue(jax.random.key(5), logdensity, z, eps, im, 16,
                             cfg)
    s1b, _, k1b = hmc_continue(jax.random.key(5), logdensity, z, eps, im, 16,
                               cfg)
    np.testing.assert_array_equal(np.asarray(s1), np.asarray(s1b))
    np.testing.assert_array_equal(
        np.asarray(jax.random.key_data(k1)),
        np.asarray(jax.random.key_data(k1b)))

    # chained segments: 10 x 40 draws -> stationary moments
    key = jax.random.key(5)
    chunks = []
    for _ in range(10):
        seg, seg_stats, key = hmc_continue(key, logdensity, z, eps, im, 40,
                                           cfg)
        z = seg[:, -1]
        chunks.append(np.asarray(seg))
        assert float(seg_stats["accept_rate"]) > 0.5
    flat = np.concatenate(chunks, axis=1).reshape(-1, d)
    np.testing.assert_allclose(flat.std(axis=0), np.asarray(sd), rtol=0.15)
    np.testing.assert_allclose(flat.mean(axis=0), 0.0, atol=0.25)


def test_nuts_continue_matches_target():
    from gp_emu_uqsa_tpu.inference.hmc import HMCConfig
    from gp_emu_uqsa_tpu.inference.nuts import nuts_continue, nuts_sample

    sd = jnp.asarray([1.0, 2.0])

    def logdensity(z):
        return -0.5 * jnp.sum((z / sd) ** 2)

    z0 = jnp.zeros((8, 2))
    cfg = HMCConfig(n_warmup=150, n_samples=1)
    warm, stats = nuts_sample(jax.random.key(0), logdensity, z0, cfg,
                              max_depth=5)
    z = warm[:, -1]
    key = jax.random.key(3)
    chunks = []
    for _ in range(6):
        seg, seg_stats, key = nuts_continue(
            key, logdensity, z, stats["step_size"], stats["inv_mass"], 50,
            max_depth=5)
        z = seg[:, -1]
        chunks.append(np.asarray(seg))
    flat = np.concatenate(chunks, axis=1).reshape(-1, 2)
    np.testing.assert_allclose(flat.std(axis=0), np.asarray(sd), rtol=0.15)
    np.testing.assert_allclose(flat.mean(axis=0), 0.0, atol=0.3)

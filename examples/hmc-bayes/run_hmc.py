"""BASELINE config 4: HMC/NUTS posterior over kernel hyperparameters,
64 chains sharded across the device mesh.

On a TPU slice the `chains` axis spans all chips (8 chains/chip at 64
chains on v5p-8); on this CPU sandbox the same program runs on the virtual
8-device mesh. Cross-chain step-size/mass adaptation rides pmean
collectives either way.

Run: XLA_FLAGS=--xla_force_host_platform_device_count=8 python run_hmc.py
"""
import numpy as np

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gp_emu_uqsa_tpu.basis import basis_matrix, linear_basis
from gp_emu_uqsa_tpu.design_inputs import optLatinHyperCube
from gp_emu_uqsa_tpu.inference import MLEConfig
from gp_emu_uqsa_tpu.inference.hmc import (
    HMCConfig, ess, hmc_sample, make_gp_logdensity, predict_marginalized,
    split_rhat,
)


def simulator(x):
    return np.sin(5 * x[:, 0]) * np.exp(-x[:, 1]) + x[:, 2] ** 2


def main(n=120, n_chains=64, n_warmup=400, n_samples=400, verbose=True):
    x = optLatinHyperCube(3, n, 80, [[0, 1]] * 3, seed=0)
    y = simulator(x)
    h = basis_matrix(jnp.asarray(x), linear_basis(3))
    cfg = MLEConfig(nugget=1e-6)
    logdensity = make_gp_logdensity(x, y, h, cfg)

    devices = jax.devices()
    mesh = Mesh(np.array(devices), ("chains",))
    assert n_chains % len(devices) == 0

    z0 = jnp.log(0.5) + 0.2 * jax.random.normal(
        jax.random.key(0), (n_chains, 3), jnp.float64
    )
    hmc_cfg = HMCConfig(n_warmup=n_warmup, n_samples=n_samples, n_leapfrog=12)

    def run(key, z0):
        return jax.shard_map(
            lambda k, z: hmc_sample(k, logdensity, z, hmc_cfg,
                                    axis_name="chains"),
            mesh=mesh,
            in_specs=(P(), P("chains")),
            out_specs=(P("chains"), P()),
            check_vma=False,
        )(key, z0)

    import time

    t0 = time.perf_counter()
    samples, stats = jax.jit(run)(
        jax.random.key(1), jax.device_put(z0, NamedSharding(mesh, P("chains")))
    )
    samples.block_until_ready()
    wall = time.perf_counter() - t0
    total = n_chains * n_samples
    if verbose:
        print(f"{n_chains} chains x {n_samples} samples in {wall:.1f}s "
              f"({total / wall:.0f} samples/s incl warmup+compile)")
        print("accept:", float(stats["accept_rate"]),
              "divergence rate:", float(stats["divergence_rate"]))
        print("R-hat:", np.asarray(split_rhat(samples)))
        print("ESS:", ess(samples))
    return samples, stats


if __name__ == "__main__":
    main()

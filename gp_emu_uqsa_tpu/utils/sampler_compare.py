"""NUTS-vs-HMC measurement harness (VERDICT r1 next-step #7).

The BASELINE north star names "HMC/NUTS over kernel hyperparameters"; round
1 shipped both but demoted NUTS for sharded many-chain runs on compile-cost
grounds without a measurement. This harness produces the numbers the
decision needs, on the REAL target posterior (a marginalized-GP
hyperparameter log-density):

  * compile seconds (jit trace+lower+compile, the shard_map pain point)
  * sampling seconds for a fixed draw budget
  * min/median bulk-ESS per second (quality-adjusted throughput — NUTS
    spends more gradient evaluations per draw but decorrelates better)
  * split R-hat (sanity: both must actually converge)

Run: python -m gp_emu_uqsa_tpu.utils.sampler_compare
Recorded results + the resulting default live in docs/samplers.md.
"""
from __future__ import annotations

import json
import time

import numpy as np


def compare(n: int = 128, d: int = 4, n_chains: int = 16,
            n_warmup: int = 300, n_samples: int = 500,
            n_leapfrog: int = 32, max_depth: int = 6,
            sharded: bool = False, seed: int = 0) -> dict:
    """Measure HMC vs NUTS on a GP-hyperparameter posterior.

    n_leapfrog=32 for HMC vs max_depth=6 (<=63 leapfrogs, dynamic) for
    NUTS keeps the per-draw gradient budgets comparable; ESS/s is the
    decision metric, not raw samples/s.
    """
    import jax
    import jax.numpy as jnp

    from gp_emu_uqsa_tpu.basis import basis_matrix, linear_basis
    from gp_emu_uqsa_tpu.inference import MLEConfig
    from gp_emu_uqsa_tpu.inference.hmc import (
        HMCConfig, ess, hmc_sample, make_gp_logdensity, split_rhat,
    )
    from gp_emu_uqsa_tpu.inference.nuts import nuts_sample

    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.uniform(size=(n, d)))
    y = jnp.sin(3.0 * x[:, 0]) + x[:, 1] * x[:, 2]
    h = basis_matrix(x, linear_basis(d))
    # nugget by working precision: at fp32 (TPU) 1e-6 makes the Cholesky
    # fail and the NLL +inf BY DESIGN (likelihood contract), so every HMC
    # proposal rejects — measured accept_rate 0.0 / all-NaN ESS on chip
    nugget = 1e-6 if x.dtype == jnp.float64 else 1e-4
    ld = make_gp_logdensity(x, y, h, MLEConfig(mode="mucm", nugget=nugget))
    cfg = HMCConfig(n_warmup=n_warmup, n_samples=n_samples,
                    n_leapfrog=n_leapfrog)
    z0 = jnp.zeros((n_chains, d), x.dtype)

    def wrap(sample_fn):
        if not sharded:
            return jax.jit(lambda k: sample_fn(k, ld, z0, cfg))
        from jax.sharding import Mesh, PartitionSpec as P

        mesh = Mesh(np.array(jax.devices()), ("chains",))
        inner = jax.shard_map(
            lambda k, z: sample_fn(k, ld, z, cfg, axis_name="chains"),
            mesh=mesh, in_specs=(P(), P("chains")),
            out_specs=(P("chains"), P()), check_vma=False,
        )
        return jax.jit(lambda k: inner(k, z0))

    def bench(name, sample_fn):
        run = wrap(sample_fn)
        t0 = time.perf_counter()
        samples, stats = run(jax.random.key(1))
        jax.block_until_ready(samples)
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        samples, stats = run(jax.random.key(2))
        jax.block_until_ready(samples)
        run_s = time.perf_counter() - t0
        e = ess(samples)                 # (dim,) bulk ESS across chains
        return {
            "compile_s": round(compile_s - run_s, 2),
            "run_s": round(run_s, 3),
            "ess_min": round(float(np.min(e)), 1),
            "ess_median": round(float(np.median(e)), 1),
            "ess_min_per_s": round(float(np.min(e)) / run_s, 2),
            "rhat_max": round(float(np.max(np.asarray(split_rhat(samples)))), 4),
            "accept_rate": round(float(stats["accept_rate"]), 3),
        }

    out = {
        "posterior": f"gp-hyper n={n} d={d}",
        "chains": n_chains,
        "draws": n_samples,
        "sharded": sharded,
        "device": str(jax.devices()[0]),
        "hmc": bench("hmc", hmc_sample),
    }
    # stream the HMC half immediately: the NUTS shard_map compile can take
    # tens of minutes on the CPU sandbox, and a killed run must not lose
    # the numbers already measured (same contract as bench.py round 3)
    print(json.dumps({("sharded" if sharded else "unsharded") + "_hmc":
                      out["hmc"]}), flush=True)
    out["nuts"] = bench(
        "nuts",
        lambda k, ld_, z, c, **kw: nuts_sample(
            k, ld_, z, c, max_depth=max_depth, **kw),
    )
    return out


if __name__ == "__main__":
    import os

    # SAMPLER_COMPARE_FAST=1 quarters the draw budget (still ~4k total
    # draws across 16 chains — plenty for a stable min-ESS/s comparison)
    kw = {}
    if os.environ.get("SAMPLER_COMPARE_FAST"):
        kw = dict(n_warmup=150, n_samples=250)
    res = {"unsharded": compare(sharded=False, **kw)}
    print(json.dumps(res), flush=True)         # land the artifact per part
    import jax

    if len(jax.devices()) > 1:
        res["sharded"] = compare(sharded=True, **kw)
    print(json.dumps(res, indent=1), flush=True)

"""Virtual-device scaling-efficiency harness (VERDICT r3 next-step #5).

BASELINE's north star is >=80% HMC scaling efficiency across hosts; real
multi-chip hardware is not reachable from this sandbox, so this harness
measures the free proxy the CPU mesh makes possible: the SAME fixed-size
problem run sharded over 1 / 2 / 4 / 8 virtual CPU devices
(`--xla_force_host_platform_device_count=N`) on one physical machine.

What the proxy does and does not measure:
  * All virtual devices share the host's physical cores, so wall-clock
    SPEEDUP with N is impossible by construction — total compute capacity
    is constant. For a perfectly partitioned program T(N) ~= T(1).
  * What the run therefore isolates is the PARTITIONING + COLLECTIVE
    OVERHEAD of the sharded program: efficiency(N) = T(1) / T(N). Values
    near 1.0 mean the shard_map/GSPMD decomposition adds little overhead
    on top of the math — the part of scaling the framework controls; the
    ICI/DCN transfer cost that real chips add is hardware, not program,
    and is explicitly out of reach here (documented in
    docs/parallelism.md).

Workloads (both flagship sharded paths):
  hmc        64 chains sharded over the `chains` axis, cross-chain pmean
             adaptation (the DP analog; BASELINE config 4 shape, small n)
  fit_large  distributed build + recursive distributed Cholesky +
             distributed TRSMs over `mr` (the TP analog; BASELINE config 5
             shape, small n)

Run: python tools/scaling_efficiency.py  -> writes SCALING.json at repo
root and prints it. Each device count runs in a fresh subprocess (the
device count is fixed at backend init).
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DEVICE_COUNTS = (1, 2, 4, 8)

_CHILD = r"""
import json, os, sys, time
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

n_dev = int(sys.argv[1])
devices = jax.devices()
assert len(devices) == n_dev, (len(devices), n_dev)

from jax.sharding import NamedSharding, PartitionSpec as P
from gp_emu_uqsa_tpu.basis import basis_matrix, linear_basis
from gp_emu_uqsa_tpu.inference import MLEConfig
from gp_emu_uqsa_tpu.inference.hmc import HMCConfig, hmc_sample, make_gp_logdensity
from gp_emu_uqsa_tpu.kernels import make_params
from gp_emu_uqsa_tpu.parallel import make_mesh
from gp_emu_uqsa_tpu.parallel.large_fit import fit_large

def timeit(fn, reps=3):
    fn()                      # warm (compile)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best

rng = np.random.default_rng(0)
out = {"n_dev": n_dev}

# --- hmc: 64 chains sharded over `chains` ------------------------------
n, d, n_chains = 128, 4, 64
x = jnp.asarray(rng.uniform(size=(n, d)), jnp.float32)
y = jnp.sin(3.0 * x[:, 0]) + x[:, 1]
h = basis_matrix(x, linear_basis(d))
ld = make_gp_logdensity(x, y, h, MLEConfig(mode="mucm", nugget=1e-4))
cfg = HMCConfig(n_warmup=16, n_samples=16, n_leapfrog=4)
mesh = make_mesh({"chains": n_dev}, devices=devices)
z0 = jax.device_put(jnp.zeros((n_chains, d), jnp.float32),
                    NamedSharding(mesh, P("chains")))
run = jax.jit(jax.shard_map(
    lambda k, z: hmc_sample(k, ld, z, cfg, axis_name="chains"),
    mesh=mesh, in_specs=(P(), P("chains")),
    out_specs=(P("chains"), P()), check_vma=False))
out["hmc_s"] = timeit(
    lambda: jax.block_until_ready(run(jax.random.key(0), z0)[0]))

# --- fit_large: recursive distributed Cholesky over `mr` ---------------
n, d = 2048, 4
x = jnp.asarray(rng.uniform(size=(n, d)), jnp.float32)
y = jnp.sin(3.0 * x[:, 0]) + x[:, 1]
h = basis_matrix(x, linear_basis(d))
p = make_params(np.full(d, 0.8), nugget=1e-4, dtype=jnp.float32)
mesh_mr = make_mesh({"mr": n_dev}, devices=devices)
fit = jax.jit(lambda pp, xx, yy, hh: fit_large(pp, xx, yy, hh, mesh_mr,
                                               block=128))
out["fit_large_s"] = timeit(
    lambda: jax.block_until_ready(fit(p, x, y, h).nll))

print(json.dumps(out))
"""


def run_one(n_dev: int, timeout_s: float = 900.0) -> dict | None:
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                        + f" --xla_force_host_platform_device_count={n_dev}")
    try:
        r = subprocess.run([sys.executable, "-c", _CHILD, str(n_dev)],
                           env=env, capture_output=True, text=True,
                           timeout=timeout_s)
    except subprocess.TimeoutExpired:
        return None
    if r.returncode != 0:
        sys.stderr.write(r.stderr[-2000:])
        return None
    for line in reversed(r.stdout.strip().splitlines()):
        if line.startswith("{"):
            return json.loads(line)
    return None


def main() -> dict:
    results = {}
    for n_dev in DEVICE_COUNTS:
        t0 = time.time()
        out = run_one(n_dev)
        if out is None:
            print(f"# n_dev={n_dev} FAILED", file=sys.stderr)
            continue
        out["wall_s"] = round(time.time() - t0, 1)
        results[str(n_dev)] = out
        print(f"# n_dev={n_dev}: hmc {out['hmc_s']:.3f}s, "
              f"fit_large {out['fit_large_s']:.3f}s", file=sys.stderr)
    cores = os.cpu_count() or 1
    payload = {"device_counts": list(results), "runs": results,
               "physical_cores": cores,
               "note": ("fixed-size problems on shared physical cores: "
                        "raw efficiency(N) = T(1)/T(N) is meaningful only "
                        "while N <= cores; beyond that the host itself is "
                        "oversubscribed N/cores-fold, so the corrected "
                        "figure divides out that forced serialization "
                        "(see module docstring; neither includes ICI "
                        "transfer cost)")}
    if "1" in results:
        for metric in ("hmc_s", "fit_large_s"):
            base = results["1"][metric]
            eff = {}
            eff_corr = {}
            for k, v in results.items():
                eff[k] = round(base / v[metric], 3)
                oversub = max(1.0, int(k) / cores)
                eff_corr[k] = round(base * oversub / v[metric], 3)
            payload[metric.replace("_s", "_efficiency")] = eff
            payload[metric.replace("_s", "_efficiency_corrected")] = eff_corr
    with open(os.path.join(REPO, "SCALING.json"), "w") as f:
        json.dump(payload, f, indent=1)
    print(json.dumps(payload))
    return payload


if __name__ == "__main__":
    main()

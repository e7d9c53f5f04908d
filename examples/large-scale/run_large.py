"""BASELINE config 5: distributed kernel build + blocked Cholesky + batched
prediction at scale (n=16k training, 1M query points on a pod slice).

The same program runs at sandbox scale on the virtual 8-device CPU mesh
(pass small n/m); on a TPU pod slice set n=16384, m=1_000_000 and the
training matrix shards over `mr` while queries stream in chunks.

Run (sandbox): XLA_FLAGS=--xla_force_host_platform_device_count=8 \
               python run_large.py --n 1024 --m 20000
"""
import argparse
import time

import numpy as np

import jax
import jax.numpy as jnp

from gp_emu_uqsa_tpu import gp
from gp_emu_uqsa_tpu.basis import basis_matrix, linear_basis
from gp_emu_uqsa_tpu.kernels import make_params
from gp_emu_uqsa_tpu.parallel import (
    fit_large, make_mesh, predictor_large, ring_predict,
)


def main(n=1024, m=20000, d=8, block=256, verbose=True):
    dtype = jnp.float32 if jax.default_backend() == "tpu" else jnp.float64
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(size=(n, d)), dtype)
    y = jnp.sin(3 * x[:, 0]) + x[:, 1] * x[:, 2]
    spec = linear_basis(d)
    h = basis_matrix(x, spec)
    params = make_params(np.full(d, 0.8), nugget=1e-4, dtype=dtype)

    n_dev = len(jax.devices())
    mesh = make_mesh({"mr": n_dev})

    t0 = time.perf_counter()
    state = fit_large(params, x, y, h, mesh, block=block)
    float(state.nll)
    fit_s = time.perf_counter() - t0

    # serving predictor built SHARDED: W = L^-1 via the shard_map
    # distributed TRSM — no (n, n) object ever gathers to one device
    # (round-5; parallel.predictor_large docstring)
    pred = predictor_large(state, mesh, block=block)
    float(pred.sigma2)
    xs = jnp.asarray(rng.uniform(size=(m, d)), dtype)
    hs = basis_matrix(xs, spec)
    t0 = time.perf_counter()
    mean, var = ring_predict(pred, x, xs, hs, make_mesh({"data": n_dev}))
    float(var[-1])
    pred_s = time.perf_counter() - t0

    # fused serving on TPU: Pallas streams the (m, n) cross-correlation
    # block through VMEM — measured at m=1M, n=16k on a single v5e
    # (docs/perf_tpu.md): 5.9M points/s mean-only; 201k points/s
    # mean+variance with the whitened bf16x3 quadratic (3.6x the XLA
    # GEMM path, and ~4 orders of magnitude more accurate than the old
    # c @ A^-1 form — docs/numerics.md)
    if jax.devices()[0].platform == "tpu":
        from gp_emu_uqsa_tpu.ops.serve import (
            serve_mean_pallas_batched, serve_meanvar_pallas_batched,
        )

        t0 = time.perf_counter()
        mean_srv = serve_mean_pallas_batched(pred, x, xs, hs,
                                             batch=min(m, 131072))
        float(mean_srv[-1])
        serve_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        mean_mv, var_mv = serve_meanvar_pallas_batched(
            pred, x, xs, hs, batch=min(m, 131072), quad_precision="high")
        float(var_mv[-1])
        mv_s = time.perf_counter() - t0
        if verbose:
            print(f"fused mean serve m={m}: {serve_s:.2f}s "
                  f"({m / serve_s:,.0f} points/s mean-only)")
            print(f"fused mean+var serve m={m}: {mv_s:.2f}s "
                  f"({m / mv_s:,.0f} points/s mean+var, bf16x3 quad)")

    if verbose:
        print(f"distributed fit  n={n} on {n_dev} devices: {fit_s:.2f}s "
              f"(NLL={float(state.nll):.4g})")
        print(f"ring predict     m={m}: {pred_s:.2f}s "
              f"({m / pred_s:,.0f} points/s mean+var)")
    return state, float(mean[0]), float(var[0])


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1024)
    ap.add_argument("--m", type=int, default=20000)
    ap.add_argument("--block", type=int, default=256)
    args = ap.parse_args()
    main(n=args.n, m=args.m, block=args.block)

"""Hardware (Mosaic) validation of the two Pallas kernels vs XLA.

Round-1 verified `ops/kernel_matrix.gaussian_corr_self_pallas` and
`ops/serve.corr_matvec_pallas` only in interpret mode on CPU; Mosaic
compilation on a real TPU is a different failure surface (tiling, VMEM
limits) — VERDICT r1 "What's missing" #2. This script compiles both
non-interpret on the attached TPU, checks them against the XLA lowering of
the same math, and times both paths.

Run on a live relay:  timeout 900 python tools/tpu_pallas_check.py
Prints one JSON line; recorded results land in docs/perf_tpu.md.
"""
from __future__ import annotations

import json
import time

import numpy as np


def _timed(fn, sync, reps=8):
    out = fn()
    sync(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn()
    sync(out)
    total = time.perf_counter() - t0
    t1 = time.perf_counter()
    sync(out)
    rtt = time.perf_counter() - t1
    return max((total - rtt) / reps, 1e-9)


def main() -> dict:
    import jax
    import jax.numpy as jnp

    from gp_emu_uqsa_tpu.kernels import GPParams, gaussian_corr
    from gp_emu_uqsa_tpu.ops.kernel_matrix import gaussian_corr_self_pallas
    from gp_emu_uqsa_tpu.ops.serve import corr_matvec_pallas

    dev = jax.devices()[0]
    out: dict = {"device": str(dev), "platform": dev.platform}
    rng = np.random.default_rng(0)
    n, m, d = 4096, 16384, 8
    x = jnp.asarray(rng.uniform(size=(n, d)).astype(np.float32))
    xs = jnp.asarray(rng.uniform(size=(m, d)).astype(np.float32))
    delta = jnp.full((d,), 0.8, jnp.float32)
    nugget = jnp.float32(1e-4)
    rhs = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    params = GPParams(jnp.log(delta), jnp.zeros(()), jnp.log(nugget))

    # ---- kernel-matrix build: Pallas vs XLA --------------------------------
    xla_build = jax.jit(
        lambda x: gaussian_corr(x, x, params) + nugget * jnp.eye(n, dtype=x.dtype)
    )
    pl_build = jax.jit(lambda x: gaussian_corr_self_pallas(x, delta, nugget))
    a_xla = xla_build(x)
    a_pl = pl_build(x)
    err = float(jnp.max(jnp.abs(a_xla - a_pl)))
    t_xla = _timed(lambda: xla_build(x), lambda o: float(o[0, 0]))
    t_pl = _timed(lambda: pl_build(x), lambda o: float(o[0, 0]))
    flops = 2.0 * n * n * d  # distance GEMM dominates
    out["kernel_build"] = {
        "n": n, "max_abs_err": err,
        "xla_ms": round(t_xla * 1e3, 3), "pallas_ms": round(t_pl * 1e3, 3),
        "pallas_speedup": round(t_xla / t_pl, 2),
        "pallas_tflops": round(flops / t_pl / 1e12, 2),
    }

    # ---- fused mean-serve matvec: Pallas vs XLA ----------------------------
    xla_serve = jax.jit(lambda xs, x, rhs: gaussian_corr(xs, x, params) @ rhs)
    pl_serve = jax.jit(
        lambda xs, x, rhs: corr_matvec_pallas(xs, x, delta, rhs))
    y_xla = xla_serve(xs, x, rhs)
    y_pl = pl_serve(xs, x, rhs)
    err = float(jnp.max(jnp.abs(y_xla - y_pl)))
    t_xla = _timed(lambda: xla_serve(xs, x, rhs), lambda o: float(o[-1]))
    t_pl = _timed(lambda: pl_serve(xs, x, rhs), lambda o: float(o[-1]))
    out["serve_matvec"] = {
        "m": m, "n": n, "max_abs_err": err,
        "xla_ms": round(t_xla * 1e3, 3), "pallas_ms": round(t_pl * 1e3, 3),
        "pallas_speedup": round(t_xla / t_pl, 2),
        "points_per_s_pallas": round(m / t_pl, 1),
    }
    return out


if __name__ == "__main__":
    print(json.dumps(main()))

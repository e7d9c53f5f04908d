"""Hardware (Mosaic) validation of the two Pallas kernels vs XLA.

Round-1 verified `ops/kernel_matrix.gaussian_corr_self_pallas` and
`ops/serve.corr_matvec_pallas` only in interpret mode on CPU; Mosaic
compilation on a real TPU is a different failure surface (tiling, VMEM
limits) — VERDICT r1 "What's missing" #2. This script compiles both
non-interpret on the attached TPU, checks them against an fp64 NumPy
ground truth (round 2 compared against the XLA DEFAULT-precision lowering,
whose own single-bf16-pass error swamped the comparison), and times them
against the XLA path at BOTH precisions:

  * xla_highest_ms — jax.default_matmul_precision('highest'), the
    framework's actual fp32-exact serving/likelihood semantics
    (ops/precision.py) — the apples-to-apples baseline;
  * xla_default_ms — single bf16 pass, for context (it is faster but
    carries ~1e-1-level error on a n=4096 serve matvec, measured).

Run on a live relay:  timeout 900 python tools/tpu_pallas_check.py
Prints one JSON line; recorded results land in docs/perf_tpu.md.
"""
from __future__ import annotations

import json
import time

import numpy as np


def _timed(fn, sync, reps=8):
    from gp_emu_uqsa_tpu.utils.timing import timed

    return timed(fn, sync, start_reps=reps)


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
    x_np = rng.uniform(size=(n, d)).astype(np.float32)
    xs_np = rng.uniform(size=(m, d)).astype(np.float32)
    delta_np = np.full(d, 0.8, np.float32)
    rhs_np = rng.standard_normal(n).astype(np.float32)
    x = jnp.asarray(x_np)
    xs = jnp.asarray(xs_np)
    delta = jnp.asarray(delta_np)
    nugget = jnp.float32(1e-4)
    rhs = jnp.asarray(rhs_np)
    params = GPParams(jnp.log(delta), jnp.zeros(()), jnp.log(nugget))

    # fp64 ground truth on host
    a64 = (x_np / delta_np).astype(np.float64)
    d2_64 = ((a64 * a64).sum(1)[:, None] + (a64 * a64).sum(1)[None, :]
             - 2.0 * a64 @ a64.T)
    a_true = np.exp(-np.maximum(d2_64, 0.0)) + 1e-4 * np.eye(n)
    b64 = (xs_np / delta_np).astype(np.float64)
    c64 = np.exp(-np.maximum(
        (b64 * b64).sum(1)[:, None] + (a64 * a64).sum(1)[None, :]
        - 2.0 * b64 @ a64.T, 0.0))
    serve_true = c64 @ rhs_np.astype(np.float64)

    def xla_pair(make):
        """jit `make` under default and highest matmul precision.

        fp32_exact wraps the *function* so the precision context is live at
        trace time (a bare `with` around jax.jit() would exit before the
        lazy first-call trace).
        """
        from gp_emu_uqsa_tpu.ops.precision import fp32_exact

        return jax.jit(make), jax.jit(fp32_exact(make))

    # ---- kernel-matrix build: Pallas vs XLA --------------------------------
    def build_xla(x):
        return gaussian_corr(x, x, params) + nugget * jnp.eye(n, dtype=x.dtype)

    xla_def, xla_hi = xla_pair(build_xla)
    pl_build = jax.jit(lambda x: gaussian_corr_self_pallas(x, delta, nugget))
    a_pl = pl_build(x)
    err_pl = float(np.max(np.abs(np.asarray(a_pl) - a_true)))
    err_hi = float(np.max(np.abs(np.asarray(xla_hi(x)) - a_true)))
    t_def = _timed(lambda: xla_def(x), lambda o: float(o[0, 0]))
    t_hi = _timed(lambda: xla_hi(x), lambda o: float(o[0, 0]))
    t_pl = _timed(lambda: pl_build(x), lambda o: float(o[0, 0]))
    flops = 2.0 * n * n * d  # distance GEMM dominates (true-feature count)
    out["kernel_build"] = {
        "n": n,
        "max_abs_err_vs_fp64": err_pl,
        "xla_highest_err_vs_fp64": err_hi,
        "xla_highest_ms": round(t_hi * 1e3, 3),
        "xla_default_ms": round(t_def * 1e3, 3),
        "pallas_ms": round(t_pl * 1e3, 3),
        "pallas_speedup_vs_highest": round(t_hi / t_pl, 2),
        "pallas_tflops": round(flops / t_pl / 1e12, 2),
    }

    # ---- fused mean-serve matvec: Pallas vs XLA ----------------------------
    def serve_xla(xs, x, rhs):
        return gaussian_corr(xs, x, params) @ rhs

    xla_def, xla_hi = xla_pair(serve_xla)
    pl_serve = jax.jit(
        lambda xs, x, rhs: corr_matvec_pallas(xs, x, delta, rhs))
    y_pl = np.asarray(pl_serve(xs, x, rhs))
    scale = float(np.max(np.abs(serve_true)))
    err_pl = float(np.max(np.abs(y_pl - serve_true)))
    err_hi = float(np.max(np.abs(np.asarray(xla_hi(xs, x, rhs)) - serve_true)))
    err_def = float(np.max(np.abs(np.asarray(xla_def(xs, x, rhs)) - serve_true)))
    t_def = _timed(lambda: xla_def(xs, x, rhs), lambda o: float(o[-1]))
    t_hi = _timed(lambda: xla_hi(xs, x, rhs), lambda o: float(o[-1]))
    t_pl = _timed(lambda: pl_serve(xs, x, rhs), lambda o: float(o[-1]))
    out["serve_matvec"] = {
        "m": m, "n": n, "result_scale": round(scale, 2),
        "max_abs_err_vs_fp64": err_pl,
        "xla_highest_err_vs_fp64": err_hi,
        "xla_default_err_vs_fp64": err_def,
        "xla_highest_ms": round(t_hi * 1e3, 3),
        "xla_default_ms": round(t_def * 1e3, 3),
        "pallas_ms": round(t_pl * 1e3, 3),
        "pallas_speedup_vs_highest": round(t_hi / t_pl, 2),
        "points_per_s_pallas": round(m / t_pl, 1),
    }
    return out


if __name__ == "__main__":
    print(json.dumps(main()))

"""Headline benchmark: GP emulator train + posterior-predict throughput.

Measures, on the default JAX backend (the real TPU chip under the driver):
  * fit time at n=4096, d=8 (kernel-matrix build + Cholesky + solves)
  * posterior predict (mean AND variance) throughput in points/s

vs_baseline compares against a NumPy/LAPACK implementation of the identical
math on this host — a stand-in for the reference, which is pure NumPy with
no published benchmarks (BASELINE.md: "published: {}"); the NumPy run uses a
smaller query batch and extrapolates linearly in m (predict is O(n^2 m)).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time

import numpy as np

N_TRAIN = 4096
N_PRED = 16384
DIM = 8
N_PRED_NUMPY = 256


def _problem():
    rng = np.random.default_rng(0)
    x = rng.uniform(size=(N_TRAIN, DIM)).astype(np.float32)
    y = np.sin(3 * x[:, 0]) + x[:, 1] * x[:, 2] + 0.1 * x.sum(1)
    xs = rng.uniform(size=(N_PRED, DIM)).astype(np.float32)
    delta = np.full(DIM, 0.8, np.float32)
    return x, y.astype(np.float32), xs, delta


def _tpu_relay_alive(timeout_s: float = 150.0) -> bool:
    """Probe the remote-TPU relay in a SUBPROCESS with a hard timeout.

    When the axon relay is down, `import jax` itself hangs in the parent
    (sitecustomize registration), so the probe must happen in a child we
    can kill. A tiny matmul is forced through the device to catch relays
    that accept connections but stall on execution.
    """
    if not os.environ.get("PALLAS_AXON_POOL_IPS"):
        return False
    code = (
        "import jax, jax.numpy as jnp;"
        "assert jax.devices()[0].platform != 'cpu';"
        "x = jnp.ones((128, 128), jnp.bfloat16);"
        "print(float((x @ x)[0, 0]))"
    )
    try:
        r = subprocess.run(
            [sys.executable, "-c", code],
            timeout=timeout_s,
            capture_output=True,
        )
        return r.returncode == 0
    except (subprocess.TimeoutExpired, OSError):
        return False


def bench_jax():
    if not _tpu_relay_alive():
        # CPU fallback: drop the axon pool var BEFORE importing jax so the
        # relay registration (which would hang) is skipped entirely.
        os.environ.pop("PALLAS_AXON_POOL_IPS", None)
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp

    from gp_emu_uqsa_tpu import gp
    from gp_emu_uqsa_tpu.basis import basis_matrix, linear_basis
    from gp_emu_uqsa_tpu.kernels import make_params

    x_np, y_np, xs_np, delta = _problem()
    dtype = jnp.float32
    x = jnp.asarray(x_np, dtype)
    y = jnp.asarray(y_np, dtype)
    xs = jnp.asarray(xs_np, dtype)
    spec = linear_basis(DIM)
    h = basis_matrix(x, spec)
    hs = basis_matrix(xs, spec)
    params = make_params(delta, nugget=1e-4, dtype=dtype)

    fit_jit = jax.jit(lambda p, x, y, h: gp.fit(p, x, y, h))
    predictor_jit = jax.jit(gp.predictor)
    predict_jit = jax.jit(lambda pr, x, xs, hs: gp.predict_fast(pr, x, xs, hs))

    # warm up compiles; sync via a host scalar (block_until_ready alone can
    # under-report on remote-tunnel backends)
    state = fit_jit(params, x, y, h)
    float(state.nll)
    pred = predictor_jit(state)
    float(pred.sigma2)
    out = predict_jit(pred, x, xs, hs)
    float(out[1][-1])

    def timed(fn, sync, reps):
        """Enqueue reps asynchronously, sync once, subtract the measured
        round-trip — a per-rep sync costs one ~25 ms tunnel RTT each and
        swamps millisecond ops on the remote backend."""
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

    fit_s = timed(lambda: fit_jit(params, x, y, h),
                  lambda o: float(o.nll), reps=5)
    pred_s = timed(lambda: predict_jit(pred, x, xs, hs),
                   lambda o: float(o[1][-1]), reps=8)

    # mean-only serving via the fused Pallas kernel (ops/serve.py): the
    # (m, n) cross-correlation block never touches HBM. TPU-only (the
    # compiled kernel has no CPU backend); report 0.0 when unavailable.
    serve_pps = 0.0
    try:
        from gp_emu_uqsa_tpu.ops.serve import serve_mean_pallas

        serve_jit = jax.jit(lambda pr, x, xs, hs: serve_mean_pallas(pr, x, xs, hs))
        m_out = serve_jit(pred, x, xs, hs)
        float(m_out[-1])
        serve_s = timed(lambda: serve_jit(pred, x, xs, hs),
                        lambda o: float(o[-1]), reps=8)
        serve_pps = N_PRED / serve_s
    except Exception:
        pass
    return fit_s, N_PRED / pred_s, serve_pps, str(jax.devices()[0])


def bench_numpy():
    """Reference-style NumPy/LAPACK implementation of the same math."""
    import scipy.linalg as sla

    x, y, xs, delta = _problem()
    x = x.astype(np.float64)
    y = y.astype(np.float64)
    xs = xs.astype(np.float64)[:N_PRED_NUMPY]
    h = np.c_[np.ones(len(x)), x]
    hs = np.c_[np.ones(len(xs)), xs]

    def corr(a, b):
        aa = a / delta
        bb = b / delta
        d2 = (
            (aa * aa).sum(1)[:, None]
            + (bb * bb).sum(1)[None, :]
            - 2.0 * aa @ bb.T
        )
        return np.exp(-np.maximum(d2, 0.0))

    t0 = time.perf_counter()
    a = corr(x, x) + 1e-4 * np.eye(len(x))
    cf = sla.cho_factor(a, lower=True)
    ainv_y = sla.cho_solve(cf, y)
    ainv_h = sla.cho_solve(cf, h)
    g = h.T @ ainv_h
    beta = np.linalg.solve(g, h.T @ ainv_y)
    e = sla.cho_solve(cf, y - h @ beta)
    fit_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    t = corr(xs, x)
    mean = hs @ beta + t @ e
    linv_t = sla.solve_triangular(cf[0], t.T, lower=True)
    r = hs - t @ ainv_h
    var = 1.0 - (linv_t * linv_t).sum(0) + (r * np.linalg.solve(g, r.T).T).sum(1)
    pred_s = time.perf_counter() - t0
    assert np.all(np.isfinite(mean)) and np.all(np.isfinite(var))
    return fit_s, len(xs) / pred_s


def main():
    fit_jax, pps_jax, serve_pps, device = bench_jax()
    fit_np, pps_np = bench_numpy()
    print(
        json.dumps(
            {
                "metric": f"posterior_predict_points_per_s_n{N_TRAIN}_d{DIM}",
                "value": round(pps_jax, 1),
                "unit": "points/s (mean+var)",
                "vs_baseline": round(pps_jax / pps_np, 2),
                "fit_seconds_n4096": round(fit_jax, 4),
                "serve_mean_points_per_s_pallas": round(serve_pps, 1),
                "numpy_baseline_points_per_s": round(pps_np, 1),
                "numpy_fit_seconds": round(fit_np, 4),
                "device": device,
            }
        )
    )


if __name__ == "__main__":
    main()

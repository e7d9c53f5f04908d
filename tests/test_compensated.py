"""Compensated-fp32 residuals (ops/compensated.py) — the x64-free IR path.

Round-2 VERDICT weak #3 / next-step #4: iterative refinement's extended-
precision residual used an fp64 GEMM that silently no-ops when
jax_enable_x64 is off. The compensated path must (a) hit twice-working-
precision accuracy, (b) survive XLA compilation — the error-free
transforms are algebraic no-ops a compiler can destroy (and XLA:CPU's
256-bit vectorized fusion emitter DID corrupt a k-broadcast formulation;
see _pair_dot_vec docstring) — and (c) restore the refined-solve bound in
an x64-OFF process, which is the exact configuration that degraded before.
"""
import subprocess
import sys

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from gp_emu_uqsa_tpu.ops.compensated import (
    dot2, residual_compensated, two_prod, two_sum,
)


def _kernel_system(n, d=4, nugget=1e-2, seed=3):
    """Clustered-input Gaussian kernel matrix (ill-conditioned, fp32)."""
    rng = np.random.default_rng(seed)
    base = rng.uniform(size=(n // 2, d))
    x = np.vstack([base, base + 1e-3 * rng.standard_normal((n // 2, d))])
    aa = x / 1.2
    sq = (aa * aa).sum(1)
    d2 = sq[:, None] + sq[None, :] - 2.0 * aa @ aa.T
    a = np.exp(-np.maximum(d2, 0.0)) + nugget * np.eye(n)
    return a


def test_eft_primitives_exact_under_jit():
    """TwoSum/TwoProd identities must hold exactly INSIDE a jitted graph."""
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.standard_normal(4096).astype(np.float32))
    b = jnp.asarray((rng.standard_normal(4096) * 1e3).astype(np.float32))
    s, e = jax.jit(two_sum)(a, b)
    exact = np.asarray(a, np.float64) + np.asarray(b, np.float64)
    np.testing.assert_array_equal(
        np.asarray(s, np.float64) + np.asarray(e, np.float64), exact)
    p, e = jax.jit(two_prod)(a, b)
    exact = np.asarray(a, np.float64) * np.asarray(b, np.float64)
    np.testing.assert_array_equal(
        np.asarray(p, np.float64) + np.asarray(e, np.float64), exact)


def test_dot2_twice_precision_kernel_data():
    """dot2 pair must reproduce the fp64 product to ~n*eps32^2 — the
    kernel-matrix x solution-vector case is the production workload and
    the one the miscompiled broadcast formulation failed on."""
    n = 1024
    a64 = _kernel_system(n)
    a32 = jnp.asarray(a64, jnp.float32)
    rng = np.random.default_rng(1)
    x32 = jnp.asarray((rng.standard_normal((n, 3)) * 300).astype(np.float32))
    want = np.asarray(a32, np.float64) @ np.asarray(x32, np.float64)
    hi, lo = jax.jit(dot2)(a32, x32)
    got = np.asarray(hi, np.float64) + np.asarray(lo, np.float64)
    scale = np.abs(np.asarray(a32, np.float64)).sum(1).max() * 300
    assert np.abs(got - want).max() / scale < 1e-11


def test_jit_matches_eager_canary():
    """Compiled == op-by-op for the pair dot (regression canary).

    Eager execution never fuses across ops, so it cannot hit compiler
    rewrites of the EFT identities; if a future XLA version re-breaks the
    compiled path (simplifier, FMA contraction, vectorizer), this canary
    trips while the pure-accuracy tests might still pass by luck.
    """
    n = 512
    a32 = jnp.asarray(_kernel_system(n), jnp.float32)
    rng = np.random.default_rng(2)
    x32 = jnp.asarray((rng.standard_normal((n, 2)) * 100).astype(np.float32))
    hi_e, lo_e = dot2(a32, x32)        # still lax.map-compiled inside...
    hi_j, lo_j = jax.jit(dot2)(a32, x32)
    pe = np.asarray(hi_e, np.float64) + np.asarray(lo_e, np.float64)
    pj = np.asarray(hi_j, np.float64) + np.asarray(lo_j, np.float64)
    want = np.asarray(a32, np.float64) @ np.asarray(x32, np.float64)
    scale = np.abs(want).max()
    # ...so ALSO pin both against the fp64 truth, not just each other
    assert np.abs(pe - want).max() / scale < 1e-10
    assert np.abs(pj - want).max() / scale < 1e-10


def test_residual_compensated_vs_fp64_oracle():
    n = 1000
    a64b = _kernel_system(n)
    a32 = jnp.asarray(a64b, jnp.float32)
    a64 = np.asarray(a32, np.float64)
    rng = np.random.default_rng(4)
    b32 = jnp.asarray(rng.standard_normal((n, 3)).astype(np.float32))
    b64 = np.asarray(b32, np.float64)
    xs = np.linalg.solve(a64, b64) + 1e-4 * rng.standard_normal((n, 3))
    x32 = jnp.asarray(xs, jnp.float32)
    x64 = np.asarray(x32, np.float64)

    r_true = b64 - a64 @ x64
    r = np.asarray(jax.jit(residual_compensated)(a32, x32, b32), np.float64)
    rel = np.linalg.norm(r - r_true) / np.linalg.norm(r_true)
    assert rel < 1e-6  # floor: rounding r itself to fp32

    jit_amt = np.float32(1e-3)
    r_true_j = b64 - (a64 + float(jit_amt) * np.eye(n)) @ x64
    r_j = np.asarray(
        jax.jit(lambda A, x, b: residual_compensated(
            A, x, b, jitter=jnp.float32(1e-3)))(a32, x32, b32),
        np.float64,
    )
    relj = np.linalg.norm(r_j - r_true_j) / np.linalg.norm(r_true_j)
    assert relj < 1e-6

    # vector RHS path
    rv = np.asarray(
        jax.jit(residual_compensated)(a32, x32[:, 0], b32[:, 0]), np.float64)
    relv = np.linalg.norm(rv - r_true[:, 0]) / np.linalg.norm(r_true[:, 0])
    assert relv < 1e-6


_X64_OFF_SCRIPT = r"""
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
assert jax.config.jax_enable_x64 is False, "this run must be x64-OFF"
import jax.numpy as jnp
from gp_emu_uqsa_tpu.ops.cholesky import (
    cho_solve, cho_solve_refined, cholesky_with_jitter,
)

n, d, nugget = 1024, 4, 2.2e-3   # kappa ~ 0.65*n/nugget ~ 3e5
rng = np.random.default_rng(3)
base = rng.uniform(size=(n // 2, d))
x = np.vstack([base, base + 1e-3 * rng.standard_normal((n // 2, d))])
aa = x / 1.2
sq = (aa * aa).sum(1)
d2 = sq[:, None] + sq[None, :] - 2.0 * aa @ aa.T
a64 = np.exp(-np.maximum(d2, 0.0)) + nugget * np.eye(n)
b64 = rng.standard_normal(n)
a32 = jnp.asarray(a64, jnp.float32)
b32 = jnp.asarray(b64, jnp.float32)
# NumPy fp64 oracle of the fp32-rounded system (NumPy ignores jax x64)
a64r = np.asarray(a32, np.float64)
x_true = np.linalg.solve(a64r, np.asarray(b32, np.float64))
xnorm = np.linalg.norm(x_true)

l32, jit_used = cholesky_with_jitter(a32)
assert float(jit_used) == 0.0
x0 = np.asarray(cho_solve(l32, b32), np.float64)
x1 = np.asarray(
    jax.jit(lambda l, a, b: cho_solve_refined(l, a, b, iters=1))(
        l32, a32, b32),
    np.float64,
)
x2 = np.asarray(
    jax.jit(lambda l, a, b: cho_solve_refined(l, a, b, iters=2))(
        l32, a32, b32),
    np.float64,
)
err0 = np.linalg.norm(x0 - x_true) / xnorm
err1 = np.linalg.norm(x1 - x_true) / xnorm
err2 = np.linalg.norm(x2 - x_true) / xnorm
print("err0", err0, "err1", err1, "err2", err2)
# measured on this system (kappa 3.0e5): 3.5e-3 -> 1.9e-5 -> 1.2e-7
assert err0 <= 3e-2, err0
assert err1 <= 5e-5, err1          # sweep 1 acts WITHOUT x64
assert err1 < err0 / 50, (err0, err1)
# the stall signature: a working-precision residual would give
# err2 ~ err1 (Skeel limit); a twice-precision one keeps converging
assert err2 <= 1e-6, err2
assert err2 < err1 / 20, (err1, err2)
print("X64OFF_REFINE_OK")
"""


def test_refined_solve_bound_holds_without_x64():
    """The round-2 degradation scenario: an x64-OFF process must now hit
    the SAME <=1e-5 refined-solve bound as the x64-on suite (previously
    the fp64 residual cast no-op'd and refinement stalled at ~1.6x)."""
    import os

    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)   # relay-down import hang guard
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("JAX_ENABLE_X64", None)
    r = subprocess.run(
        [sys.executable, "-c", _X64_OFF_SCRIPT],
        capture_output=True, text=True, timeout=420, env=env,
    )
    assert r.returncode == 0, r.stderr[-3000:]
    assert "X64OFF_REFINE_OK" in r.stdout


@pytest.mark.slow
def test_fit_refine_without_x64_end_to_end():
    """gp.fit(refine=1) in this (x64-on) process must agree with the same
    fit in an x64-off subprocess — the refine path may not depend on the
    flag at all now."""
    import os

    script = r"""
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
from gp_emu_uqsa_tpu import gp
from gp_emu_uqsa_tpu.basis import basis_matrix, linear_basis
from gp_emu_uqsa_tpu.kernels import make_params

rng = np.random.default_rng(3)
n, d = 512, 4
base = rng.uniform(size=(n // 2, d))
x = np.vstack([base, base + 1e-3 * rng.standard_normal((n // 2, d))])
y = np.sin(3 * x[:, 0]) + x[:, 1]
xj = jnp.asarray(x, jnp.float32)
h = basis_matrix(xj, linear_basis(d))
st = gp.fit(make_params(np.full(d, 1.2), nugget=2.2e-3, dtype=jnp.float32),
            xj, jnp.asarray(y, jnp.float32), h, refine=1)
np.save("OUTPATH", np.asarray(st.e, np.float64))
"""
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        out = os.path.join(td, "e.npy")
        env = dict(os.environ)
        env.pop("PALLAS_AXON_POOL_IPS", None)
        env["JAX_PLATFORMS"] = "cpu"
        env.pop("JAX_ENABLE_X64", None)
        r = subprocess.run(
            [sys.executable, "-c", script.replace("OUTPATH", out)],
            capture_output=True, text=True, timeout=420, env=env,
        )
        assert r.returncode == 0, r.stderr[-3000:]
        e_off = np.load(out)

    from gp_emu_uqsa_tpu import gp
    from gp_emu_uqsa_tpu.basis import basis_matrix, linear_basis
    from gp_emu_uqsa_tpu.kernels import make_params

    rng = np.random.default_rng(3)
    n, d = 512, 4
    base = rng.uniform(size=(n // 2, d))
    x = np.vstack([base, base + 1e-3 * rng.standard_normal((n // 2, d))])
    y = np.sin(3 * x[:, 0]) + x[:, 1]
    xj = jnp.asarray(x, jnp.float32)
    h = basis_matrix(xj, linear_basis(d))
    st = gp.fit(make_params(np.full(d, 1.2), nugget=2.2e-3, dtype=jnp.float32),
                xj, jnp.asarray(y, jnp.float32), h, refine=1)
    e_on = np.asarray(st.e, np.float64)
    # identical code path -> tight agreement (both fp32 programs; x64 flag
    # must be irrelevant to the refine math now)
    scale = np.abs(e_on).max()
    assert np.abs(e_on - e_off).max() / scale < 1e-5

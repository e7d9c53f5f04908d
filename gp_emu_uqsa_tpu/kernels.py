"""Correlation kernels for GP emulation.

Reference parity: GP_emu_UQSA's Gaussian (squared-exponential) correlation
(reference `_emulatorkernels.py`, see SURVEY.md S3) is

    A_ij = exp( - sum_l ((x_il - x_jl) / delta_l)^2 ) + nu * 1[i==j]

i.e. NO factor 1/2 in the exponent (MUCM convention, c(x,x') =
exp{-(x-x')^T B (x-x')} with B = diag(1/delta_l^2)).  sigma^2 scales the
correlation matrix into a covariance.

TPU-first design: the correlation matrix is built from a single MXU matmul
via the ||x||^2 + ||x'||^2 - 2 x.x' expansion on delta-scaled inputs, with
the exponential fused by XLA (or by the Pallas kernel in
`gp_emu_uqsa_tpu.ops.kernel_matrix`). All functions are pure and jit/vmap/
shard_map friendly; hyperparameters travel in log-space pytrees.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class GPParams(NamedTuple):
    """Log-space hyperparameters of the Gaussian-kernel GP.

    Attributes:
      log_delta: (d_active,) per-dimension correlation lengths, log delta_l.
      log_sigma2: () log of the scale variance sigma^2 (unused by the
        concentrated/MUCM likelihood which profiles sigma^2 analytically,
        load-bearing in `gp4ml` mode).
      log_nugget: () log of the nugget nu added to the diagonal.
    """

    log_delta: jax.Array
    log_sigma2: jax.Array
    log_nugget: jax.Array

    @property
    def delta(self) -> jax.Array:
        return jnp.exp(self.log_delta)

    @property
    def sigma2(self) -> jax.Array:
        return jnp.exp(self.log_sigma2)

    @property
    def nugget(self) -> jax.Array:
        return jnp.exp(self.log_nugget)


def make_params(
    delta, sigma2=1.0, nugget=0.0, *, dtype=jnp.float32, min_nugget=1e-12
) -> GPParams:
    """Build a GPParams pytree from natural-space values.

    A zero nugget is clamped to `min_nugget` so log-space stays finite; the
    reference achieves exact-interpolation behavior with nugget=0.0 and we
    reproduce it to within that epsilon (plus the Cholesky jitter ladder in
    ops.cholesky).
    """
    delta = jnp.asarray(delta, dtype=dtype)
    sigma2 = jnp.asarray(sigma2, dtype=dtype)
    nugget = jnp.maximum(jnp.asarray(nugget, dtype=dtype), min_nugget)
    return GPParams(jnp.log(delta), jnp.log(sigma2), jnp.log(nugget))


def scaled_sq_dists(x1: jax.Array, x2: jax.Array, delta: jax.Array) -> jax.Array:
    """sum_l ((x1_il - x2_jl)/delta_l)^2 for all pairs, shape (n1, n2).

    Uses the matmul expansion so the O(n^2 d) work lands on the MXU. A
    `maximum(0)` clamps the tiny negatives the expansion can produce in
    fp32. For very small d this is still the right call on TPU: one fused
    GEMM beats a lane-sliced broadcast subtract.
    """
    xs1 = x1 / delta
    xs2 = x2 / delta
    n1 = jnp.sum(xs1 * xs1, axis=-1)[:, None]
    n2 = jnp.sum(xs2 * xs2, axis=-1)[None, :]
    # HIGHEST precision: on TPU the default fp32 matmul rounds through
    # bf16, which is too coarse for distances that feed an exp(); the d-dim
    # contraction is a tiny fraction of total FLOPs, so full precision here
    # costs ~nothing and keeps correlations accurate to fp32.
    cross = jnp.dot(
        xs1, xs2.T, preferred_element_type=xs1.dtype,
        precision=jax.lax.Precision.HIGHEST,
    )
    return jnp.maximum(n1 + n2 - 2.0 * cross, 0.0)


def _safe_dist(d2: jax.Array) -> jax.Array:
    """sqrt(d2) with a zero (not NaN) gradient at d2 == 0.

    Matern/exponential correlations are functions of the distance r; the
    plain sqrt has an infinite derivative at 0, which poisons gradients on
    the training diagonal. The double-where pattern gives r = 0 and dr = 0
    exactly at coincident points (the correct subgradient for correlation
    stationarity).
    """
    pos = d2 > 0.0
    safe = jnp.where(pos, d2, 1.0)
    return jnp.where(pos, jnp.sqrt(safe), 0.0)


def _corr_gaussian(d2: jax.Array) -> jax.Array:
    return jnp.exp(-d2)


def _corr_matern52(d2: jax.Array) -> jax.Array:
    s = jnp.sqrt(5.0) * _safe_dist(d2)
    return (1.0 + s + (s * s) / 3.0) * jnp.exp(-s)


def _corr_matern32(d2: jax.Array) -> jax.Array:
    s = jnp.sqrt(3.0) * _safe_dist(d2)
    return (1.0 + s) * jnp.exp(-s)


def _corr_exponential(d2: jax.Array) -> jax.Array:
    return jnp.exp(-_safe_dist(d2))


# Correlation families on the delta-scaled squared distance d2 (all valid
# (strictly PD) correlation functions; reference lineage kept a pluggable
# kernel list in `_emulatorkernels.py`). The UQSA analytics (sensitivity/)
# have closed forms ONLY for "gaussian" and enforce it at setup.
CORR_FAMILIES = {
    "gaussian": _corr_gaussian,
    "matern52": _corr_matern52,
    "matern32": _corr_matern32,
    "exponential": _corr_exponential,
}


def corr(x1: jax.Array, x2: jax.Array, params: GPParams,
         family: str = "gaussian") -> jax.Array:
    """Cross-correlation matrix c(x1_i, x2_j), no nugget, shape (n1, n2).

    On TPU the gaussian family takes the fused Pallas cross-build when
    both operands span >= _FAST_CROSS_MIN_ROWS rows (same gating family
    as corr_self); its custom VJP carries the FULL analytic adjoints
    (delta AND both input slots — fp32-pinned contractions). Forward-mode
    AD through the fast path is unsupported (custom_vjp); disable via
    GP_EMU_DISABLE_PALLAS_BUILD=1 if jvp/jacfwd through corr is needed.
    """
    if family == "gaussian" and _fast_cross_ok(x1, x2):
        return _gaussian_cross_fast(x1, x2, params.delta)
    try:
        fn = CORR_FAMILIES[family]
    except KeyError:
        raise ValueError(
            f"unknown kernel family {family!r}; one of {sorted(CORR_FAMILIES)}"
        ) from None
    return fn(scaled_sq_dists(x1, x2, params.delta))


# ---------------------------------------------------------------------------
# fused TPU self-build (round 4): the XLA build of A at n=16k costs 13 ms
# (D2 materialized to HBM, read back for exp, nugget in another pass — 10%
# of the HBM-bandwidth roof) vs 1.8 ms for the fused Pallas kernel (75% of
# roof, docs/perf_tpu.md) — and the build is ~15-20% of every NLL
# evaluation in the MLE/HMC hot loops. The Pallas kernel has no VJP, so a
# custom_vjp supplies the analytic hyperparameter adjoints (the same
# rank-1 + GEMM contraction as gp._nll_mucm_bwd); x cotangents are zeros
# (nothing in the framework differentiates w.r.t. training inputs).
# ---------------------------------------------------------------------------

_FAST_SELF_MIN_N = 512   # below this the pallas_call overhead ~ the build

# Escape hatch: export GP_EMU_DISABLE_PALLAS_BUILD=1 to force the XLA
# build path everywhere. The gate below consults jax.default_backend(),
# which is the PROCESS default — a computation explicitly pinned to CPU
# inside a TPU-default process (jax.default_device / CPU shardings) would
# still stage the Mosaic kernel and fail to lower; the env var is the
# out for that unusual configuration (code-review r4b finding #3).
import os as _os


def _pallas_build_enabled() -> bool:
    if _os.environ.get("GP_EMU_DISABLE_PALLAS_BUILD"):
        return False
    try:
        return jax.default_backend() == "tpu"
    except RuntimeError:
        return False


def _fast_self_ok(x: jax.Array) -> bool:
    from gp_emu_uqsa_tpu.ops.mxu_packing import packed_width

    return (_pallas_build_enabled() and x.ndim == 2
            and x.dtype == jnp.float32
            and x.shape[0] >= _FAST_SELF_MIN_N
            and packed_width(x.shape[1]) <= 128)


from gp_emu_uqsa_tpu.ops.precision import fp32_exact as _fp32_exact


@_fp32_exact
def _gaussian_cross_grads(x1, x2, delta, c, ct):
    """Analytic cotangents of sum(ct * c(x1, x2, delta)).

    With M = ct * c (ct need not be symmetric):
      d c_ij / d delta_l  = c_ij * 2 (x1_il - x2_jl)^2 / delta_l^3
      d c_ij / d x1_il    = c_ij * (-2)(x1_il - x2_jl) / delta_l^2
      d c_ij / d x2_jl    = c_ij * (+2)(x1_il - x2_jl) / delta_l^2
    All three collapse to row/col sums plus GEMMs (O(n^2 d), MXU-shaped);
    fp32_exact pins the contractions — a custom_vjp bwd traces OUTSIDE
    any caller's precision context, and the t1 - 2 t2 cancellation at
    single-pass bf16 would put ~1e-3 relative error on the gradients
    (code-review r4b finding #1). Unit-tested against autodiff of the
    XLA build (tests/test_kernel_families.py).

    Returns (grad_x1, grad_x2, grad_delta).
    """
    m = ct * c
    r = jnp.sum(m, axis=1)                                # (n1,)
    col = jnp.sum(m, axis=0)                              # (n2,)
    x1_sq = x1 * x1
    x2_sq = x2 * x2
    mx2 = m @ x2                                          # (n1, d)
    t1 = r @ x1_sq + col @ x2_sq                          # (d,)
    t2 = jnp.sum(x1 * mx2, axis=0)                        # (d,)
    grad_delta = (2.0 / delta**3) * (t1 - 2.0 * t2)
    inv_d2 = 1.0 / (delta * delta)
    grad_x1 = (-2.0 * inv_d2) * (x1 * r[:, None] - mx2)
    grad_x2 = (-2.0 * inv_d2) * (x2 * col[:, None] - m.T @ x1)
    return grad_x1, grad_x2, grad_delta


@_fp32_exact
def _gaussian_self_grads(x, delta, nugget, a, ct):
    """Analytic (grad_x, grad_delta, grad_nugget) for the SELF build.

    The cross formula applied at x1 = x2 = x with both input-slot
    cotangents summed, plus the nugget diagonal: A = c(x, x) + nugget*I.
    """
    n = x.shape[0]
    a_corr = a - nugget * jnp.eye(n, dtype=a.dtype)
    gx1, gx2, grad_delta = _gaussian_cross_grads(x, x, delta, a_corr, ct)
    grad_nugget = jnp.trace(ct)
    return gx1 + gx2, grad_delta, grad_nugget


@jax.custom_vjp
def _gaussian_self_fast(x, delta, nugget):
    from gp_emu_uqsa_tpu.ops.kernel_matrix import gaussian_corr_self_pallas

    return gaussian_corr_self_pallas(x, delta, nugget)


def _gsf_fwd(x, delta, nugget):
    a = _gaussian_self_fast(x, delta, nugget)
    return a, (x, delta, nugget, a)


def _gsf_bwd(res, ct):
    x, delta, nugget, a = res
    grad_x, grad_delta, grad_nugget = _gaussian_self_grads(
        x, delta, nugget, a, ct)
    return grad_x, grad_delta, grad_nugget


_gaussian_self_fast.defvjp(_gsf_fwd, _gsf_bwd)


# rectangular cross-build fast path: same idea as the self build. Gate on
# BOTH dims (not just the product): gaussian_corr_pallas pads each dim to
# the 256 tile, so a skinny query block (m = 8 against n = 40k) would pay
# up to 32x padding waste — exactly the shape the gate must protect
# (code-review r4b finding #4).
_FAST_CROSS_MIN_ROWS = 256


def _fast_cross_ok(x1: jax.Array, x2: jax.Array) -> bool:
    from gp_emu_uqsa_tpu.ops.mxu_packing import packed_width

    return (_pallas_build_enabled() and x1.ndim == 2 and x2.ndim == 2
            and x1.dtype == jnp.float32 and x2.dtype == jnp.float32
            and x1.shape[0] >= _FAST_CROSS_MIN_ROWS
            and x2.shape[0] >= _FAST_CROSS_MIN_ROWS
            and x1.shape[1] == x2.shape[1]
            and packed_width(x1.shape[1]) <= 128)


@jax.custom_vjp
def _gaussian_cross_fast(x1, x2, delta):
    from gp_emu_uqsa_tpu.ops.kernel_matrix import gaussian_corr_pallas

    return gaussian_corr_pallas(x1, x2, delta)


def _gcf_fwd(x1, x2, delta):
    c = _gaussian_cross_fast(x1, x2, delta)
    return c, (x1, x2, delta, c)


def _gcf_bwd(res, ct):
    x1, x2, delta, c = res
    return _gaussian_cross_grads(x1, x2, delta, c, ct)


_gaussian_cross_fast.defvjp(_gcf_fwd, _gcf_bwd)


def corr_self(x: jax.Array, params: GPParams,
              family: str = "gaussian") -> jax.Array:
    """Training correlation matrix A = c(X, X) + nugget*I, symmetrized.

    The explicit symmetrization (A + A^T)/2 removes the asymmetric fp32
    rounding of the matmul expansion so downstream Cholesky sees an exactly
    symmetric operand. On TPU, gaussian family, fp32, d <= 20, n >= 512
    the fused Pallas build takes over (7.5x faster at n=16k; its packed
    bf16x6 distance is sign-symmetric so residual asymmetry is O(eps) —
    harmless to the lower-triangle-only Cholesky). Its custom VJP carries
    full analytic adjoints (x, delta, nugget), fp32-pinned; forward-mode
    AD is unsupported on the fast path (GP_EMU_DISABLE_PALLAS_BUILD=1 to
    force the autodiff-through-XLA path).
    """
    if family == "gaussian" and _fast_self_ok(x):
        return _gaussian_self_fast(x, params.delta, params.nugget)
    a = corr(x, x, params, family)
    a = 0.5 * (a + a.T)
    n = x.shape[0]
    return a + params.nugget * jnp.eye(n, dtype=a.dtype)


def gaussian_corr(x1: jax.Array, x2: jax.Array, params: GPParams) -> jax.Array:
    """Gaussian-family cross-correlation (the reference's only kernel)."""
    return jnp.exp(-scaled_sq_dists(x1, x2, params.delta))


def gaussian_corr_self(x: jax.Array, params: GPParams) -> jax.Array:
    """Gaussian-family training matrix A = c(X, X) + nugget*I, symmetrized."""
    return corr_self(x, params, "gaussian")

"""fp32-exact matmul policy for the numerically sensitive compute paths.

On TPU, the MXU has no fp32 multiply: an f32 x f32 `jnp.matmul` with
DEFAULT precision runs a SINGLE bf16 pass (8-bit mantissa, ~3 decimal
digits). CPU ignores precision, so the round-1 CPU test suite could never
see this — but on hardware every unpinned GEMM in the likelihood/posterior
path would silently degrade:

  * the predictive-variance quadratic form t(x)^T A^-1 t(x) cancels
    against the leading 1 (interpolation regime: var << sigma^2), so a
    bf16 `c_star @ ainv` turns an O(1e-4) variance into noise;
  * GLS products H^T A^-1 H / H^T A^-1 y feed a small-q solve whose
    conditioning amplifies the pass error into beta-hat;
  * iterative-refinement residuals must be exact at working precision or
    the sweep stalls (docs/numerics.md).

`fp32_exact` scopes `jax.default_matmul_precision("highest")` (bf16x6 —
the fp32-ACCURATE MXU algorithm, ~1/6 the bf16 rate; the roofline judges
these ops against the fp32 roof accordingly) around a function's trace.
It deliberately does NOT touch global config: user code and deliberate
lower-precision regions (e.g. a future bf16x3 mean-only serving mode) are
unaffected. Sites with an explicit `precision=` keep it — the context only
fills in defaults.
"""
from __future__ import annotations

import functools

import jax


def fp32_exact(fn):
    """Decorator: trace `fn` under default_matmul_precision('highest')."""

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        with jax.default_matmul_precision("highest"):
            return fn(*args, **kwargs)

    return wrapped

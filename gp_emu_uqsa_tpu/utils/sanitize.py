"""Numerics sanitizers: checkify-instrumented fits + NaN debugging.

SURVEY S6 "Race detection / sanitizers": the production convention is
inf-not-NaN (a failed factorization yields NLL=+inf so optimizers/samplers
reject the point silently — gp.py::_guard). That is correct behavior but a
poor debugging experience: WHERE the non-finite arose is erased. This
module is the opt-in diagnosis layer:

  * `checked_fit` — gp.fit wrapped in `jax.experimental.checkify` with
    staged checks (inputs -> kernel matrix -> factorization -> posterior
    stats), each with an actionable message. Works under jit; returns
    (error, state) and `error.throw()` raises with the FIRST failing stage.
  * `debug_nans` — context manager flipping `jax_debug_nans`. NOTE: the
    jitter ladder intentionally probes with NaN-producing factorizations
    (ops/cholesky.py), so `jax_debug_nans` false-positives inside
    `cholesky_with_jitter`; use it around *prediction/serving* code, and
    `checked_fit` for fit-path diagnosis.

Kept OUT of the hot path on purpose: checkify threads an error pytree
through every jitted op and blocks some fusions; production code never
pays for it.
"""
from __future__ import annotations

from contextlib import contextmanager

import jax
import jax.numpy as jnp
from jax.experimental import checkify

from gp_emu_uqsa_tpu import gp
from gp_emu_uqsa_tpu.kernels import corr_self
from gp_emu_uqsa_tpu.ops.cholesky import cholesky_with_jitter


def checked_fit(params, x, y, h, *, mode: str = "mucm", noise_diag=None,
                family: str = "gaussian", refine: int = 0):
    """gp.fit with staged numerics checks (debug path; ~2x fit cost).

    Returns (error, state): `error.get()` is None on a clean fit, else a
    message naming the first failing stage. The returned state is the
    regular gp.fit result (garbage if an error fired — check first).
    """
    x = jnp.asarray(x)
    y = jnp.asarray(y)
    h = jnp.asarray(h)

    def body(params, x, y, h):
        checkify.check(jnp.all(jnp.isfinite(x)),
                       "non-finite training inputs x")
        checkify.check(jnp.all(jnp.isfinite(y)),
                       "non-finite training outputs y")
        checkify.check(jnp.all(jnp.isfinite(h)),
                       "non-finite basis matrix H")
        a = corr_self(x, params, family)
        if noise_diag is not None:
            a = a + jnp.diag(jnp.asarray(noise_diag, a.dtype))
        checkify.check(
            jnp.all(jnp.isfinite(a)),
            "kernel matrix has non-finite entries: log_delta or nugget "
            "overflow/underflow (exp of a huge hyperparameter?)",
        )
        l, jitter = cholesky_with_jitter(a)
        checkify.check(
            jnp.logical_not(jnp.any(jnp.isnan(l))),
            "Cholesky failed at MAX jitter: kernel matrix is not "
            "numerically SPD in this dtype — duplicated inputs with a "
            "tiny nugget, or length-scales so large the matrix is "
            "numerically rank-1. Raise the nugget or use fp64.",
        )
        state = gp.fit(params, x, y, h, mode=mode, noise_diag=noise_diag,
                       family=family, refine=refine)
        checkify.check(
            jnp.isfinite(state.nll),
            "NLL non-finite despite a successful factorization: "
            "concentrated sigma2 or logdet degenerate (n - q - 2 <= 0, "
            "or zero residual variance — is y constant?)",
        )
        checkify.check(state.sigma2 > 0,
                       "non-positive sigma2 estimate (zero residuals?)")
        return state

    return checkify.checkify(body)(params, x, y, h)


def checked_nll(params, x, y, h, *, mode: str = "mucm",
                family: str = "gaussian"):
    """Checked likelihood evaluation: (error, nll). See checked_fit."""
    err, state = checked_fit(params, x, y, h, mode=mode, family=family)
    return err, state.nll


@contextmanager
def debug_nans(enable: bool = True):
    """Temporarily enable jax_debug_nans (see module docstring caveat)."""
    old = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", enable)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", old)

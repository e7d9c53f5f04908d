"""Multi-restart maximum-likelihood hyperparameter fitting.

Reference parity: `Optimize.llh_optimize` (SURVEY.md S3/S4.2) loops `tries`
scipy L-BFGS-B runs from Latin-hypercube starts, each objective evaluation
rebuilding A + Cholesky — a serial Python loop.

TPU-first redesign: ALL restarts advance in lockstep as one batched program —
`jax.vmap` over the restart axis turns every step's n x n Cholesky into a
batched factorization that XLA maps onto the MXU, and the whole optimization
(L-BFGS updates + zoom linesearch from optax, under `lax.while_loop`) is one
jit-compiled computation. On a multi-chip mesh the same function shards the
restart axis (see gp_emu_uqsa_tpu.parallel).

Bounds (the reference's `delta_bounds`/`sigma_bounds`/`nugget_bounds`) are
enforced exactly via a smooth sigmoid reparametrization of log-space rather
than L-BFGS-B's active-set projection — equivalent feasible set, but the
iterates stay in the interior, which is friendlier to batched execution
(no per-restart active sets to diverge over).
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from gp_emu_uqsa_tpu import gp
from gp_emu_uqsa_tpu.kernels import GPParams


@dataclasses.dataclass(frozen=True)
class MLEConfig:
    """Hyperparameter-fit configuration (reference config-file surface).

    delta/sigma/nugget bounds are in NATURAL space, like the reference's
    `delta_bounds`/`sigma_bounds` config entries; None => wide defaults.
    """

    mode: str = "mucm"                # "mucm" (sigma2 profiled) or "gp4ml"
    family: str = "gaussian"          # correlation family (kernels.CORR_FAMILIES)
    tries: int = 8                    # restarts (reference `tries`)
    max_iters: int = 200
    tol: float = 1e-8                 # gradient-norm stop
    train_nugget: bool = False        # reference `fix_nugget F/T`
    nugget: float = 1e-8              # value when fixed
    delta_bounds: Optional[tuple] = None    # (lo, hi) scalars or (d,) arrays
    sigma_bounds: Optional[tuple] = None
    nugget_bounds: Optional[tuple] = None
    constraints: str = "bounds"       # "bounds" | "none" (reference `constraints`)


def _default_bounds(cfg: MLEConfig, d: int):
    db = cfg.delta_bounds if cfg.delta_bounds is not None else (1e-3, 1e3)
    sb = cfg.sigma_bounds if cfg.sigma_bounds is not None else (1e-6, 1e6)
    nb = cfg.nugget_bounds if cfg.nugget_bounds is not None else (1e-10, 1e0)
    # each bound may be a scalar or a per-dim vector (reference per-dim lists)
    lo = [np.broadcast_to(np.log(np.asarray(db[0], np.float64)), (d,))]
    hi = [np.broadcast_to(np.log(np.asarray(db[1], np.float64)), (d,))]
    if cfg.mode == "gp4ml":
        # sigma bound is on sigma (std dev) in the reference; optimize log sigma2
        lo.append(2.0 * np.log(np.ravel(np.asarray(sb[0], np.float64)))[:1])
        hi.append(2.0 * np.log(np.ravel(np.asarray(sb[1], np.float64)))[:1])
    if cfg.train_nugget:
        lo.append(np.log(np.ravel(np.asarray(nb[0], np.float64)))[:1])
        hi.append(np.log(np.ravel(np.asarray(nb[1], np.float64)))[:1])
    return np.concatenate(lo), np.concatenate(hi)


def _unpack(z, cfg: MLEConfig, d: int, dtype) -> GPParams:
    """Flat optimization vector -> GPParams (log-space values)."""
    log_delta = z[:d]
    i = d
    if cfg.mode == "gp4ml":
        log_sigma2 = z[i]; i += 1
    else:
        log_sigma2 = jnp.asarray(0.0, dtype)
    if cfg.train_nugget:
        log_nugget = z[i]
    else:
        log_nugget = jnp.asarray(np.log(cfg.nugget), dtype)
    return GPParams(log_delta, log_sigma2, log_nugget)


def _make_objective(x, y, h, cfg: MLEConfig, lo, hi, noise_diag=None):
    d = x.shape[1]
    dtype = x.dtype
    use_bounds = cfg.constraints != "none"
    lo = jnp.asarray(lo, dtype)
    hi = jnp.asarray(hi, dtype)

    def to_logspace(u):
        if use_bounds:
            return lo + (hi - lo) * jax.nn.sigmoid(u)
        return u

    def from_logspace(z):
        if use_bounds:
            frac = jnp.clip((z - lo) / (hi - lo), 1e-4, 1 - 1e-4)
            return jnp.log(frac) - jnp.log1p(-frac)
        return z

    def objective(u):
        # optax internals may promote the iterate under x64; pin the dtype
        params = _unpack(to_logspace(u.astype(dtype)), cfg, d, dtype)
        return gp.nll(params, x, y, h, mode=cfg.mode, noise_diag=noise_diag,
                      family=cfg.family)

    return objective, to_logspace, from_logspace


def _lhc_starts(key, tries, lo, hi, dtype):
    """Latin-hypercube starts in the log-space box (reference behavior)."""
    p = lo.shape[0]
    key_perm, key_u = jax.random.split(key)
    u = jax.random.uniform(key_u, (tries, p), dtype=dtype)
    perms = jax.vmap(
        lambda k: jax.random.permutation(k, tries)
    )(jax.random.split(key_perm, p)).T  # (tries, p)
    strat = (perms.astype(dtype) + u) / tries
    return lo + (hi - lo) * strat


def run_lbfgs(objective, z0, max_iters: int, tol: float):
    """Jit/vmap-safe L-BFGS loop; returns (z_final, value, n_iters)."""
    opt = optax.lbfgs()
    value_and_grad = optax.value_and_grad_from_state(objective)

    def cond(carry):
        _, state, best, i, gnorm = carry
        return jnp.logical_and(i < max_iters, gnorm > tol)

    def body(carry):
        z, state, best, i, _ = carry
        value, grad = value_and_grad(z, state=state)
        updates, state = opt.update(
            grad, state, z, value=value, grad=grad, value_fn=objective
        )
        z_new = optax.apply_updates(z, updates).astype(z.dtype)
        best_z, best_v = best
        value_new = objective(z_new)
        improved = value_new < best_v
        best = (jnp.where(improved, z_new, best_z), jnp.minimum(value_new, best_v))
        gnorm = jnp.linalg.norm(grad)
        # a non-finite step poisons the state: freeze in place instead
        ok = jnp.all(jnp.isfinite(z_new))
        z_new = jnp.where(ok, z_new, z)
        gnorm = jnp.where(ok, gnorm, 0.0)
        return z_new, state, best, i + 1, gnorm

    v0 = objective(z0)
    init = (z0, opt.init(z0), (z0, v0), jnp.asarray(0), jnp.asarray(jnp.inf, z0.dtype))
    _, _, (best_z, best_v), iters, _ = jax.lax.while_loop(cond, body, init)
    return best_z, best_v, iters


def mle_fit(key, x, y, h, cfg: MLEConfig = MLEConfig(), *, noise_diag=None,
            mesh=None, axis: str = "chains"):
    """Multi-restart MLE. Returns (best GPParams, info dict).

    info contains per-restart final NLLs (`nlls`), iteration counts, and the
    LHC start matrix, mirroring the reference's per-try printout as data.

    With `mesh`, the restart axis is sharded over mesh axis `axis` (restarts
    are embarrassingly parallel; XLA partitions the batched program with no
    collectives). cfg.tries should then be a multiple of the axis size.
    """
    x = jnp.asarray(x)
    y = jnp.asarray(y)
    h = jnp.asarray(h)
    d = x.shape[1]
    lo, hi = _default_bounds(cfg, d)
    objective, to_logspace, from_logspace = _make_objective(
        x, y, h, cfg, lo, hi, noise_diag
    )

    z0s = _lhc_starts(key, cfg.tries, jnp.asarray(lo, x.dtype), jnp.asarray(hi, x.dtype), x.dtype)
    u0s = jax.vmap(from_logspace)(z0s)
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        u0s = jax.device_put(u0s, NamedSharding(mesh, P(axis)))

    @jax.jit
    def run_all(u0s):
        zs, vs, iters = jax.vmap(
            lambda u0: run_lbfgs(objective, u0, cfg.max_iters, cfg.tol)
        )(u0s)
        return zs, vs, iters

    us, vs, iters = run_all(u0s)
    best = jnp.nanargmin(jnp.where(jnp.isfinite(vs), vs, jnp.inf))
    params = _unpack(to_logspace(us[best]), cfg, d, x.dtype)
    info = {
        "nlls": vs,
        "iters": iters,
        "best_index": best,
        "starts_logspace": z0s,
        "best_nll": vs[best],
    }
    return params, info

"""Multi-output batched emulation: all outputs trained/served as one program.

The reference workflow for multi-output simulators is one emulator per
output column, trained serially, compared with `sense_table` (SURVEY.md
S4.4). TPU-first redesign: outputs become another batch axis — the
(outputs x restarts) MLE grid runs as ONE vmapped L-BFGS program (batched
n x n Cholesky per iteration on the MXU), fits/predictions batch with
vmap, and UQSA runs per output off the shared machinery.

    me = MultiEmulator.fit(key, x, Y, tries=8)      # Y: (n, k)
    means, variances = me.predict(xs)               # (k, m) each
    tables = me.sensitivities(m, v)                 # list of Sensitivity
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from gp_emu_uqsa_tpu import gp
from gp_emu_uqsa_tpu.basis import BasisSpec, basis_matrix, linear_basis
from gp_emu_uqsa_tpu.inference.lbfgs import (
    MLEConfig, _default_bounds, _lhc_starts, _make_objective, _unpack,
    run_lbfgs,
)
from gp_emu_uqsa_tpu.kernels import GPParams
from gp_emu_uqsa_tpu.sensitivity._core import Sensitivity


@jax.jit
def _multi_predict(states, x, h, xstar, hstar):
    return jax.vmap(lambda st: gp.predict(st, x, h, xstar, hstar))(states)



@dataclasses.dataclass
class MultiEmulator:
    """k independent GPs over shared inputs, batched on-device."""

    x: jax.Array                  # (n, d) scaled inputs
    y: jax.Array                  # (n, k)
    h: jax.Array                  # (n, q)
    spec: BasisSpec
    cfg: MLEConfig
    params: GPParams              # leaves batched with leading k
    states: gp.FitState           # leaves batched with leading k
    info: dict

    @classmethod
    def fit(
        cls,
        key,
        x,
        y,
        *,
        basis: Optional[BasisSpec] = None,
        cfg: Optional[MLEConfig] = None,
        tries: int = 8,
        nugget: float = 1e-8,
        dtype=None,
    ) -> "MultiEmulator":
        x = jnp.asarray(x, dtype)
        y = jnp.asarray(y, dtype)
        if y.ndim == 1:
            y = y[:, None]
        n, d = x.shape
        k = y.shape[1]
        spec = basis if basis is not None else linear_basis(d)
        h = basis_matrix(x, spec)
        cfg = cfg if cfg is not None else MLEConfig(tries=tries, nugget=nugget)
        lo, hi = _default_bounds(cfg, d)

        # one objective per output, all sharing x/h; the (k*tries) grid runs
        # as a single vmapped program
        def objective_for(yi_col):
            obj, to_ls, _ = _make_objective(x, yi_col, h, cfg, lo, hi)
            return obj, to_ls

        _, to_logspace, from_logspace = _make_objective(
            x, y[:, 0], h, cfg, lo, hi
        )
        z0s = _lhc_starts(
            key, cfg.tries, jnp.asarray(lo, x.dtype), jnp.asarray(hi, x.dtype),
            x.dtype,
        )                                              # (tries, p)
        u0s = jax.vmap(from_logspace)(z0s)             # shared starts per output

        def run_one(u0, y_col):
            def obj(u):
                params = _unpack(to_logspace(u.astype(x.dtype)), cfg, d, x.dtype)
                return gp.nll(params, x, y_col, h, mode=cfg.mode)

            return run_lbfgs(obj, u0, cfg.max_iters, cfg.tol)

        @jax.jit
        def run_grid(u0s, y):
            # axes: outputs k (y columns) x restarts
            return jax.vmap(
                lambda y_col: jax.vmap(lambda u0: run_one(u0, y_col))(u0s)
            )(y.T)

        us, vs, iters = run_grid(u0s, y)               # (k, tries, ...)
        best = jnp.argmin(jnp.where(jnp.isfinite(vs), vs, jnp.inf), axis=1)
        u_best = jnp.take_along_axis(us, best[:, None, None], axis=1)[:, 0]

        def unpack_one(u):
            return _unpack(to_logspace(u), cfg, d, x.dtype)

        params = jax.vmap(unpack_one)(u_best)          # batched GPParams

        @jax.jit
        def fit_all(params, y):
            return jax.vmap(
                lambda p, y_col: gp.fit(p, x, y_col, h, mode=cfg.mode),
                in_axes=(0, 1),
            )(params, y)

        states = fit_all(params, y)
        info = {"nlls": vs, "best_index": best, "iters": iters}
        return cls(x, y, h, spec, cfg, params, states, info)

    @property
    def n_outputs(self) -> int:
        return self.y.shape[1]

    def predict(self, xstar, hstar=None):
        """Batched posterior mean/var for every output: (k, m) each."""
        xstar = jnp.asarray(xstar, self.x.dtype)
        hstar = (
            jnp.asarray(hstar, self.x.dtype)
            if hstar is not None
            else basis_matrix(xstar, self.spec)
        )
        # module-level jit + all operands as args: the previous per-call
        # @jax.jit closure retraced every predict() AND re-staged the
        # captured xstar/x/h per dispatch (same class as code-review r4
        # finding #3 / CLAUDE.md timing rule)
        return _multi_predict(self.states, self.x, self.h, xstar, hstar)

    def state_for(self, k: int) -> gp.FitState:
        return jax.tree.map(lambda leaf: leaf[k], self.states)

    def sensitivities(self, m, v) -> list[Sensitivity]:
        """Per-output Sensitivity engines (feed to sense_table)."""
        return [
            Sensitivity(self.state_for(k), self.x, self.spec, m, v)
            for k in range(self.n_outputs)
        ]

    def sense_matrix(self, m, v) -> np.ndarray:
        """(k, d) matrix of first-order indices S_i across outputs."""
        return np.stack(
            [np.asarray(s.sensitivity()["S_i"]) for s in self.sensitivities(m, v)]
        )

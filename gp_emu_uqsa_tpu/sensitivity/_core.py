r"""Analytic MUCM variance-based sensitivity analysis (closed-form integrals).

Reference parity: `gp_emu_uqsa/sensitivity/_sensitivityclasses.py::Sensitivity`
(SURVEY.md S3 "Sensitivity subpackage", S4.4 call stack): for a trained GP
emulator with Gaussian kernel, (at most) linear mean basis, and independent
normal inputs x_l ~ N(m_l, v_l), every UQ/SA quantity is a closed form in
products of 1D Gaussian integrals.

Derivation sketch (full derivation in DESIGN notes; verified in tests by
Gauss-Hermite quadrature to ~1e-10):

  per-dim primitives, with g(u,a) = exp(-(u-a)^2/delta^2), n = N(m, v):
    I0(a)   = \int g(u,a) n(u) du
            = (1+2v/d2)^(-1/2) exp(-(a-m)^2/(d2+2v)),        d2 = delta^2
    mu1(a)  = E-location of the g*n product = (m d2 + 2va)/(d2+2v)
      giving \int u g n du = I0 mu1,  \int u^2 g n du = I0 (mu1^2 + w1),
      w1 = v d2/(d2+2v)
    J0(a,b) = \int g(u,a) g(u,b) n(u) du
            = exp(-(a-b)^2/(2 d2)) (1+4v/d2)^(-1/2)
              exp(-((a+b)/2-m)^2/(d2/2+2v))
    K0      = \int\int g(u,u') n(u) n(u') du du' = (1+4v/d2)^(-1/2)

  emulator functionals (e = A^-1(y-H beta), P = A^-1 H, W = (H^T A^-1 H)^-1,
  T_j = prod_l I0_l(x_jl), rho_l[j,k] = J0_l/(I0_l I0_l)):
    conditional-expectation row for subset w at fixed x_w:
      T_w(x_w)_j = prod_{l in w} g(x_l, x_jl) * prod_{l not in w} I0_l(x_jl)
      R_w(x_w)   = [1, (x_l if l in w else m_l)]
      M_w(x_w)   = R_w beta + T_w . e                (posterior mean of E[Y|x_w])
    second moments over x_w:
      U_w = E[T_w T_w^T] = T T^T  (*) prod_{l in w} rho_l     (Hadamard)
      S_w = E[R_w^T T_w^T]:  row 0 = T;  row for linear dim i =
            T (*) (mu1_i if i in w else m_i)
      Q_w = E[R_w^T R_w] = Rbar^T Rbar + diag(v_i for linear i in w)
    posterior-variance corrections:
      Cbar_w = prod_{l not in w} K0_l
      E[v_w*] = sigma2 [ Cbar_w - tr(A^-1 U_w)
                         + tr(W (Q_w - S_w P - P^T S_w^T + P^T U_w P)) ]
    and finally
      E*(V_w)  = beta^T Q_w beta + 2 beta^T S_w e + e^T U_w e + E[v_w*]
                 - (M_0^2 + v_0*)
      with M_0, v_0* the w = {} case; E*(Var Y) = E*(V_{all dims}).
      E*(V_Tw) = E*(Var Y) - E*(V_{-w}).

NUMERICAL NOTE: the subtraction of the w = {} base suffers catastrophic
cancellation if evaluated literally (E[M_w^2] ~ M_0^2 >> V_w). Because the
w = {} case is exactly the rank-1/base specialization of every matrix above
(U_{} = T T^T, Q_{} = Rbar^T Rbar, S_{} rows proportional to T, Cbar_{} =
prod_l K0_l), the difference telescopes analytically:

  dU_w = T T^T (*) expm1( sum_{l in w} log rho_l )
  dS_w = rows: 0 for the constant; T (*) 2 v_i (x_i - m_i)/(d2_i + 2 v_i)
         for linear dim i in w; 0 otherwise
  dQ_w = diag( v_i for linear dims i in w )
  dCbar_w = - prod_{l not in w} K0_l * expm1( sum_{l in w} log K0_l )

  E*(V_w) = beta^T dQ beta + 2 beta^T dS e + e^T dU e
            + sigma2 [ dCbar - tr(A^-1 dU)
                       + tr(W (dQ - dS P - P^T dS^T + P^T dU P)) ]

which is exact in infinite precision and cancellation-free in fp.

All matrix work reuses the training Cholesky from the FitState; the O(d n^2)
Hadamard products and O(n^2) traces vectorize over output grids and batch
over emulators.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from gp_emu_uqsa_tpu import gp
from gp_emu_uqsa_tpu.basis import BasisSpec
from gp_emu_uqsa_tpu.ops.cholesky import spd_inverse_from_chol, tri_solve
from gp_emu_uqsa_tpu.ops.precision import fp32_exact


class Sensitivity:
    """Closed-form UQSA engine for one trained emulator.

    Args:
      state: gp.FitState of the trained emulator.
      x: (n, d) training inputs in the emulator's (scaled) input space.
      spec: the mean BasisSpec (constant + linear subset).
      m, v: per-dimension means/variances of the independent normal input
        distribution, in the same (scaled) input space — reference
        `s.setup(emul, m, v)` semantics.
      beta: overrides state.beta for a fixed (non-trained) mean; the
        beta-uncertainty W-corrections are dropped in that case, matching
        `fix_mean` semantics.
    """

    @fp32_exact
    def __init__(self, state: gp.FitState, x, spec: BasisSpec, m, v,
                 beta: Optional[np.ndarray] = None):
        if not spec.is_linear:
            raise ValueError(
                "the analytic MUCM sensitivity integrals require a mean "
                "basis that is at most linear; this emulator's basis has "
                f"monomial power terms {spec.power_terms} (emulation/"
                "prediction supports them, UQSA does not — SURVEY.md S7)"
            )
        self.state = state
        self.spec = spec
        dtype = state.l.dtype
        self.x = jnp.asarray(x, dtype)
        self.m = jnp.asarray(m, dtype)
        self.v = jnp.asarray(v, dtype)
        n, d = self.x.shape
        self.n, self.d = n, d
        if self.m.shape != (d,) or self.v.shape != (d,):
            raise ValueError(f"m and v must have shape ({d},)")

        delta2 = jnp.exp(2.0 * state.params.log_delta)          # (d,)
        vv = self.v
        self.delta2 = delta2
        # --- per-dim primitives -------------------------------------------
        self.s1 = 1.0 / jnp.sqrt(1.0 + 2.0 * vv / delta2)        # (d,)
        self.s2 = 1.0 / jnp.sqrt(1.0 + 4.0 * vv / delta2)        # (d,) == K0_l
        am = self.x - self.m                                     # (n, d)
        self.log_i0 = jnp.log(self.s1) - am * am / (delta2 + 2 * vv)   # (n, d)
        self.i0 = jnp.exp(self.log_i0)
        self.mu1 = (self.m * delta2 + 2 * vv * self.x) / (delta2 + 2 * vv)
        self.w1 = vv * delta2 / (delta2 + 2 * vv)
        self.t_vec = jnp.exp(jnp.sum(self.log_i0, axis=1))       # (n,) E[t(x)]
        # NOTE: log rho_l[j,k] (per-dim (n, n) correction matrices) is NOT
        # precomputed — a (d, n, n) tensor is a 20 TB wall at n=16k, d=10
        # (round-1 VERDICT weak-point #6). Subset sums are built lazily in
        # `_log_rho_sum` as rank-1 + GEMM terms: O(n^2) memory, MXU GEMMs.

        # --- emulator functionals -----------------------------------------
        self.sigma2 = state.sigma2
        self.e = state.e
        self.p_mat = state.ainv_h                                # (n, q_state)
        # A^-1 via the OOM-safe inversion: the one-shot (n, n) TRSM here was
        # exactly the 65 GB-of-temps pattern measured in gp.predictor at
        # n=16k (round-2 VERDICT weak #2); spd_inverse_from_chol switches to
        # the blocked recursion above BLOCKED_TRSM_THRESHOLD
        self.ainv = spd_inverse_from_chol(state.l)               # (n, n)
        q_state = state.ainv_h.shape[1]
        if q_state:
            lg_inv = tri_solve(state.lg, jnp.eye(q_state, dtype=dtype))
            self.w_mat = lg_inv.T @ lg_inv                       # (q, q) = G^-1
        else:
            self.w_mat = jnp.zeros((0, 0), dtype=dtype)
        self.has_w = q_state > 0 and beta is None
        self.beta = jnp.asarray(
            beta if beta is not None else state.beta, dtype
        )
        # mean-basis bookkeeping: column -> input dim for linear terms
        self.lin = list(spec.linear_dims)
        cols = ([None] if spec.include_const else []) + self.lin
        self.rbar = jnp.asarray(
            [1.0 if c is None else self.m[c] for c in cols], dtype
        )                                                        # E[h(x)]
        self._cols = cols
        # cache of the w = {} and w = all-dims quantities
        self._m0_v0: Optional[tuple] = None
        self._total: Optional[jax.Array] = None

    # --- subset machinery (cancellation-free delta forms) --------------------

    @fp32_exact
    def _log_rho_sum(self, w: Sequence[int]) -> jax.Array:
        r"""sum_{l in w} log rho_l[j,k] without the (d, n, n) tensor.

        Per-dim,  log rho_l = log K0_l - (x_jl-x_kl)^2/(2 d2_l)
                              - c_l ((x_jl+x_kl)/2 - m_l)^2
                              - log I0_l(x_jl) - log I0_l(x_kl),
        c_l = 1/(d2_l/2 + 2 v_l).  Both quadratic terms expand into
        rank-1 rows/cols plus a weighted Gram matrix:
          sum_l w_l (x_jl - x_kl)^2 = |xa_j|^2 + |xa_k|^2 - 2 xa_j.xa_k
          sum_l c_l (y_jl + y_kl)^2 = |yb_j|^2 + |yb_k|^2 + 2 yb_j.yb_k,
        with xa = x sqrt(w), yb = (x - m)/2 * sqrt(c) — so the whole subset
        sum is two (n, d_w) x (d_w, n) GEMMs: O(n^2) memory, MXU-shaped.
        HIGHEST precision: the Gram cancellation feeds exp (see CLAUDE.md).
        """
        dtype = self.t_vec.dtype
        if not len(w):
            return jnp.zeros((self.n, self.n), dtype)
        idx = jnp.asarray(list(w), int)
        xw = self.x[:, idx]                                   # (n, |w|)
        d2 = self.delta2[idx]
        vw = self.v[idx]
        mw = self.m[idx]
        hi = jax.lax.Precision.HIGHEST
        xa = xw * jnp.sqrt(1.0 / (2.0 * d2))
        sq_a = jnp.sum(xa * xa, axis=1)
        term_a = -(sq_a[:, None] + sq_a[None, :]
                   - 2.0 * jnp.matmul(xa, xa.T, precision=hi))
        c = 1.0 / (0.5 * d2 + 2.0 * vw)
        yb = 0.5 * (xw - mw) * jnp.sqrt(c)
        sq_b = jnp.sum(yb * yb, axis=1)
        term_b = -(sq_b[:, None] + sq_b[None, :]
                   + 2.0 * jnp.matmul(yb, yb.T, precision=hi))
        li = jnp.sum(self.log_i0[:, idx], axis=1)             # (n,)
        const = jnp.sum(jnp.log(self.s2[idx]))
        return const + term_a + term_b - li[:, None] - li[None, :]

    @fp32_exact
    def _delta_mats(self, w: Sequence[int]):
        """(dU, dS, dQ, dCbar) for subset w — exact w-minus-base differences."""
        w = [int(i) for i in w]
        dtype = self.t_vec.dtype
        du = jnp.outer(self.t_vec, self.t_vec) * jnp.expm1(self._log_rho_sum(w))
        wset = set(w)
        rows = []
        for c in self._cols:
            if c is not None and c in wset:
                dmu = 2.0 * self.v[c] * (self.x[:, c] - self.m[c]) / (
                    self.delta2[c] + 2.0 * self.v[c]
                )
                rows.append(self.t_vec * dmu)
            else:
                rows.append(jnp.zeros(self.n, dtype))
        ds = jnp.stack(rows) if rows else jnp.zeros((0, self.n), dtype)
        dq_diag = jnp.asarray(
            [self.v[c] if (c is not None and c in wset) else 0.0
             for c in self._cols],
            dtype,
        )
        dq = jnp.diag(dq_diag)
        log_s2 = jnp.log(self.s2)
        in_w = jnp.zeros(self.d, bool).at[jnp.asarray(w, int)].set(True) \
            if w else jnp.zeros(self.d, bool)
        cbar_rest = jnp.exp(jnp.sum(jnp.where(in_w, 0.0, log_s2)))
        dcbar = -cbar_rest * jnp.expm1(jnp.sum(jnp.where(in_w, log_s2, 0.0)))
        return du, ds, dq, dcbar

    @fp32_exact
    def _cbar_w(self, w: Sequence[int]) -> jax.Array:
        """Cbar_w = prod_{l not in w} K0_l."""
        log_s2 = jnp.log(self.s2)
        if not len(w):
            return jnp.exp(jnp.sum(log_s2))
        in_w = jnp.zeros(self.d, bool).at[jnp.asarray(list(w), int)].set(True)
        return jnp.exp(jnp.sum(jnp.where(in_w, 0.0, log_s2)))

    # --- public API ----------------------------------------------------------

    @fp32_exact
    def _base(self):
        """(M_0, v_0*) for the empty subset, via stable whitened solves."""
        if self._m0_v0 is None:
            m0 = self.rbar @ self.beta + self.t_vec @ self.e
            linv_t = tri_solve(self.state.l, self.t_vec[:, None])[:, 0]
            tat = jnp.sum(linv_t * linv_t)
            cbar0 = jnp.exp(jnp.sum(jnp.log(self.s2)))
            v0 = cbar0 - tat
            if self.has_w:
                rt0 = self.rbar - self.t_vec @ self.p_mat
                v0 = v0 + rt0 @ self.w_mat @ rt0
            self._m0_v0 = (m0, self.sigma2 * v0)
        return self._m0_v0

    @fp32_exact
    def uncertainty(self) -> dict:
        """Posterior UQ of E[Y]: E*[E(Y)], V*[E(Y)], and E*[Var(Y)].

        Reference `Sensitivity.uncertainty()` (SURVEY.md S4.4).
        """
        m0, v0 = self._base()
        return {
            "E_EY": m0,
            "V_EY": v0,
            "E_VarY": self.total_variance(),
        }

    @fp32_exact
    def total_variance(self) -> jax.Array:
        """E*[Var(Y)] — the w = all-dims sensitivity variance."""
        if self._total is None:
            self._total = self.sensitivity_variance(tuple(range(self.d)))
        return self._total

    @fp32_exact
    def sensitivity_variance(self, w: Sequence[int]) -> jax.Array:
        """E*(V_w) = E*[Var(E[Y|x_w])] for an arbitrary subset w."""
        du, ds, dq, dcbar = self._delta_mats(w)
        val = (
            self.beta @ dq @ self.beta
            + 2.0 * (self.beta @ ds @ self.e)
            + self.e @ du @ self.e
        )
        corr = dcbar - jnp.sum(self.ainv * du)
        if self.has_w:
            m1 = ds @ self.p_mat
            inner = dq - m1 - m1.T + self.p_mat.T @ du @ self.p_mat
            corr = corr + jnp.sum(self.w_mat * inner)
        return val + self.sigma2 * corr

    def sensitivity(self) -> dict:
        """First-order E*(V_i) and indices S_i = E*(V_i)/E*(Var Y)."""
        vis = jnp.stack([self.sensitivity_variance((i,)) for i in range(self.d)])
        total = self.total_variance()
        return {"V_i": vis, "S_i": vis / total, "V_total": total}

    def totaleffectvariance(self) -> dict:
        """Total-effect variances E*(V_Ti) = E*(VarY) - E*(V_{-i})."""
        total = self.total_variance()
        vtis = []
        for i in range(self.d):
            comp = tuple(j for j in range(self.d) if j != i)
            vtis.append(total - self.sensitivity_variance(comp))
        vtis = jnp.stack(vtis)
        return {"V_Ti": vtis, "S_Ti": vtis / total, "V_total": total}

    # --- effect curves -------------------------------------------------------

    @fp32_exact
    def _t_w_grid(self, w: Sequence[int], grid: jax.Array) -> jax.Array:
        """T_w rows for grid points over dims w; grid (G, |w|) -> (G, n)."""
        w = list(w)
        log_t_rest = jnp.sum(
            jnp.delete(self.log_i0, jnp.asarray(w, int), axis=1), axis=1
        )                                                        # (n,)
        lg = jnp.zeros((grid.shape[0], self.n), self.t_vec.dtype)
        for col, l in enumerate(w):
            diff = grid[:, col][:, None] - self.x[:, l][None, :]
            lg = lg - diff * diff / self.delta2[l]
        return jnp.exp(lg + log_t_rest[None, :])

    @fp32_exact
    def _r_w_grid(self, w: Sequence[int], grid: jax.Array) -> jax.Array:
        """R_w rows at grid points, (G, q_mean)."""
        wl = {int(l): c for c, l in enumerate(w)}
        cols = []
        g_n = grid.shape[0]
        one = jnp.ones(g_n, self.t_vec.dtype)
        for c in self._cols:
            if c is None:
                cols.append(one)
            elif c in wl:
                cols.append(grid[:, wl[c]])
            else:
                cols.append(one * self.m[c])
        return jnp.stack(cols, 1) if cols else jnp.zeros((g_n, 0), self.t_vec.dtype)

    @fp32_exact
    def effect_curve(self, w: Sequence[int], grid) -> tuple[jax.Array, jax.Array]:
        """Posterior mean and variance of E[Y | x_w] on grid points.

        grid: (G, |w|) values of x_w. Returns (mean (G,), var (G,)).
        """
        w = [int(i) for i in w]
        grid = jnp.atleast_2d(jnp.asarray(grid, self.t_vec.dtype))
        if grid.shape[1] != len(w):
            grid = grid.reshape(-1, len(w))
        t_w = self._t_w_grid(w, grid)                            # (G, n)
        r_w = self._r_w_grid(w, grid)                            # (G, q)
        mean = r_w @ self.beta + t_w @ self.e
        cbar = self._cbar_w(w)
        av = t_w @ self.ainv                                     # (G, n)
        var = cbar - jnp.sum(av * t_w, axis=1)
        if self.has_w:
            rt = r_w - t_w @ self.p_mat                          # (G, q)
            var = var + jnp.sum((rt @ self.w_mat) * rt, axis=1)
        return mean, self.sigma2 * jnp.maximum(var, 0.0)

    def main_effect(self, i: int, points: int = 100, span: float = 2.5):
        """Main-effect curve E[Y|x_i] (mean, sd) over m_i +- span*sqrt(v_i).

        Returns (grid, mean, sd, deviation) with deviation = mean - E*[E Y]
        (the MUCM zero-mean main-effect convention).
        """
        sd_i = jnp.sqrt(self.v[i])
        grid = jnp.linspace(self.m[i] - span * sd_i, self.m[i] + span * sd_i, points)
        mean, var = self.effect_curve((i,), grid[:, None])
        m0, _ = self._base()
        return grid, mean, jnp.sqrt(var), mean - m0

    def interaction_effect(self, i: int, j: int, points: int = 25, span: float = 2.5):
        """Interaction surface I_{ij} = E[Y|x_i,x_j] - M_i - M_j + E[Y].

        Returns (grid_i, grid_j, surface (points, points)).
        """
        si, sj = jnp.sqrt(self.v[i]), jnp.sqrt(self.v[j])
        gi = jnp.linspace(self.m[i] - span * si, self.m[i] + span * si, points)
        gj = jnp.linspace(self.m[j] - span * sj, self.m[j] + span * sj, points)
        gg = jnp.stack(jnp.meshgrid(gi, gj, indexing="ij"), -1).reshape(-1, 2)
        mij, _ = self.effect_curve((i, j), gg)
        mi, _ = self.effect_curve((i,), gi[:, None])
        mj, _ = self.effect_curve((j,), gj[:, None])
        m0, _ = self._base()
        surf = (
            mij.reshape(points, points)
            - mi[:, None] - mj[None, :] + m0
        )
        return gi, gj, surf

    # --- reporting -----------------------------------------------------------

    def to_file(self, path) -> None:
        """Write an indices table (reference `Sensitivity.to_file`)."""
        sens = self.sensitivity()
        tot = self.totaleffectvariance()
        unc = self.uncertainty()
        lines = [
            f"E*[E(Y)] {float(unc['E_EY']):.10g}",
            f"V*[E(Y)] {float(unc['V_EY']):.10g}",
            f"E*[Var(Y)] {float(unc['E_VarY']):.10g}",
            "input E*(V_i) S_i E*(V_Ti) S_Ti",
        ]
        for i in range(self.d):
            lines.append(
                f"{i} {float(sens['V_i'][i]):.10g} {float(sens['S_i'][i]):.10g} "
                f"{float(tot['V_Ti'][i]):.10g} {float(tot['S_Ti'][i]):.10g}"
            )
        from pathlib import Path

        Path(path).write_text("\n".join(lines) + "\n")

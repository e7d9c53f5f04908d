"""Emulator facade: setup / train / final_build (reference top-level API).

Reference parity (SURVEY.md S3 "Package facade", S4.1/S4.2 call stacks):

  emul = setup(config_file, datashuffle=True, scaleinputs=True)
  train(emul, auto=True, message=False)   # V-set loop -> final build
  mean, var = emul.predict(x_new)

plus the file-free idiomatic path used by TPU-native code:

  emul = Emulator.from_arrays(x, y, tries=8, ...)
  emul.train_full()

`train` reproduces the reference workflow: optimize hyperparameters on the
T set, validate against each V set (standardized errors + Mahalanobis
distance), fold the V set into T (automatically under `auto=True`, else via
an input() prompt), retrain, and finally rebuild on all data and write the
updated beliefs + reordered inputs/outputs files ("-f" suffix) — the
reference's checkpoint mechanism (SURVEY.md S7.4).

The compute path is jit-compiled JAX throughout; this module is the thin
host-side driver around it.
"""
from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from gp_emu_uqsa_tpu import gp
from gp_emu_uqsa_tpu.basis import BasisSpec, basis_matrix, linear_basis, parse_basis_strings
from gp_emu_uqsa_tpu.configs import Beliefs, Config
from gp_emu_uqsa_tpu.dataio import DataSplits, load_matrix, make_splits, save_matrix
from gp_emu_uqsa_tpu.inference import MLEConfig, mle_fit
from gp_emu_uqsa_tpu.kernels import GPParams, make_params

_MIN_NUGGET = 1e-10

# module-level jitted serving programs: sharing them across Emulator
# instances/refits lets XLA's compile cache hit on unchanged shapes (a
# per-rebuild jax.jit(...) wrapper would retrace + recompile every refit
# — code-review r4 finding #3)
_predictor_jit = jax.jit(gp.predictor)


def _predict_batched_jit_factory():
    import functools

    @functools.partial(jax.jit, static_argnames=("include_nugget", "family"))
    def run(pred, x, xs, hs, include_nugget, family):
        return gp.predict_batched(pred, x, xs, hs,
                                  include_nugget=include_nugget,
                                  family=family)

    return run


_predict_batched_jit = _predict_batched_jit_factory()


def _bounds_pair(bounds_list, d):
    """Reference per-dim [(lo,hi),...] bounds -> (lo_vec, hi_vec) arrays."""
    if bounds_list is None:
        return None
    arr = np.asarray(bounds_list, dtype=np.float64)
    if arr.ndim == 1:
        arr = arr[None, :]
    if len(arr) == 1:
        arr = np.repeat(arr, d, axis=0)
    return arr[:, 0], arr[:, 1]


@dataclasses.dataclass
class Emulator:
    """A (possibly trained) GP emulator plus its provenance."""

    splits: DataSplits
    spec: BasisSpec
    active: Optional[list[int]]            # active input columns (None = all)
    mle_config: MLEConfig
    beliefs: Optional[Beliefs] = None
    config: Optional[Config] = None
    params: Optional[GPParams] = None
    state: Optional[gp.FitState] = None
    n_folded: int = 0                      # V sets folded into training so far
    fixed_beta: Optional[np.ndarray] = None  # set when beliefs.fix_mean
    dtype: type = jnp.float64
    seed: int = 0
    # serving cache: (FitState identity, Predictor) — rebuilt whenever the
    # state object changes; the jitted batched-predict programs live at
    # module scope so refits hit XLA's compile cache (VERDICT r3 weak #7:
    # the facade predict used to re-run un-jitted TRSMs on every call)
    _serve_cache: Optional[tuple] = dataclasses.field(
        default=None, repr=False, compare=False)
    # training-view cache: (n_folded, fixed_beta identity) -> (x, y, h) on
    # device. predict() calls train_view() every time; without the cache
    # each call re-indexes the host arrays and re-uploads the full
    # training set (0.5 MB at n=16k — several RTTs through a remote-device
    # link, measured as the facade's remaining gap vs the direct serving
    # path in BENCH r5)
    _tv_cache: Optional[tuple] = dataclasses.field(
        default=None, repr=False, compare=False)

    # ----- construction ---------------------------------------------------

    @classmethod
    def from_arrays(
        cls,
        x,
        y,
        *,
        basis: Optional[BasisSpec] = None,
        tv_config=(10, 0, 2),
        shuffle=True,
        scale_inputs=True,
        mode="mucm",
        kernel="gaussian",
        tries=8,
        nugget=_MIN_NUGGET,
        train_nugget=False,
        delta_bounds=None,
        sigma_bounds=None,
        nugget_bounds=None,
        dtype=jnp.float64,
        seed=0,
    ) -> "Emulator":
        x = np.asarray(x, dtype=np.float64)
        if x.ndim == 1:
            x = x[:, None]
        d = x.shape[1]
        splits = make_splits(
            x, y, tv_config, shuffle=shuffle, scale_inputs=scale_inputs, seed=seed
        )
        spec = basis if basis is not None else linear_basis(d)
        mle = MLEConfig(
            mode=mode,
            family=kernel,
            tries=tries,
            nugget=max(nugget, _MIN_NUGGET),
            train_nugget=train_nugget,
            delta_bounds=delta_bounds,
            sigma_bounds=sigma_bounds,
            nugget_bounds=nugget_bounds,
        )
        return cls(splits, spec, None, mle, dtype=dtype, seed=seed)

    # ----- data views -----------------------------------------------------

    def _xy(self, rows):
        x = jnp.asarray(self.splits.x_all[rows], dtype=self.dtype)
        y = np.asarray(self.splits.y_all[rows])
        if self.fixed_beta is not None:
            hfull = np.asarray(basis_matrix(jnp.asarray(self.splits.x_all[rows]), self.spec))
            y = y - hfull @ self.fixed_beta
            h = jnp.zeros((len(y), 0), dtype=self.dtype)
        else:
            h = basis_matrix(x, self.spec)
        return x, jnp.asarray(y, dtype=self.dtype), h

    def train_view(self):
        # the key HOLDS the constituent objects (identity-compared), so a
        # recycled id() after GC can never alias, and basis/dtype changes
        # invalidate too — code-review r5 finding #3
        key = (self.n_folded, self.splits, self.fixed_beta, self.spec,
               self.dtype)
        cached = self._tv_cache
        if cached is None or not (
            cached[0][0] == key[0] and cached[0][1] is key[1]
            and cached[0][2] is key[2] and cached[0][3] == key[3]
            and cached[0][4] == key[4]
        ):
            self._tv_cache = (key,
                              self._xy(self.splits.train_rows(self.n_folded)))
        return self._tv_cache[1]

    def valid_view(self, k):
        return self._xy(self.splits.v_rows(k))

    # ----- fitting --------------------------------------------------------

    def optimize(self, key=None, message=False):
        """Multi-restart MLE on the current training set."""
        if key is None:
            key = jax.random.key(self.seed + self.n_folded)
        x, y, h = self.train_view()
        self.params, info = mle_fit(key, x, y, h, self.mle_config)
        self.state = gp.fit(self.params, x, y, h, mode=self.mle_config.mode,
                            family=self.mle_config.family)
        if message:
            nlls = np.asarray(info["nlls"])
            print(
                f"[optimize] n={len(y)} restarts={self.mle_config.tries} "
                f"best NLL={float(info['best_nll']):.6g} "
                f"(finite restarts: {np.isfinite(nlls).sum()}/{len(nlls)}) "
                f"delta={np.exp(np.asarray(self.params.log_delta))}"
            )
        return info

    def validate_against(self, k, message=True):
        """Reference V-set diagnostics for validation set k."""
        x, y, h = self.train_view()
        xv, yv, hv = self.valid_view(k)
        diag = gp.validate(self.state, x, h, xv, hv, yv,
                           family=self.mle_config.family)
        if message:
            se = np.asarray(diag["std_err"])
            print(
                f"[validate set {k}] n_V={len(yv)} "
                f"|std err|>2: {(np.abs(se) > 2).sum()}/{len(se)}  "
                f"Mahalanobis={float(diag['mahalanobis']):.4g} "
                f"(expect {float(diag['mahalanobis_mean']):.4g} "
                f"+- {float(diag['mahalanobis_sd']):.4g})"
            )
        return diag

    # ----- prediction -----------------------------------------------------

    def _prepare_inputs(self, x_new):
        """Raw-space inputs -> scaled active-dim array + basis matrix.

        Pure jnp throughout: a device-resident query array (the 1M-point
        serving case) stays on device — np.asarray here used to force a
        host round-trip of the full query set per predict() call, which
        through a remote-device link costs more than the prediction.
        """
        # cast to the float working dtype up front: an integer query array
        # would otherwise truncate the min-max lo/span to ints (span < 1
        # -> 0 -> inf predictions) — code-review r5 finding #1
        x_new = jnp.asarray(x_new, dtype=self.dtype)
        if x_new.ndim == 1:
            x_new = x_new[:, None]
        if self.active is not None:
            x_new = x_new[:, jnp.asarray(self.active)]
        if self.splits.minmax is not None:
            mm = np.asarray(self.splits.minmax, dtype=np.float64)
            lo = jnp.asarray(mm[:, 0], x_new.dtype)
            span = jnp.asarray(np.where(mm[:, 1] > mm[:, 0],
                                        mm[:, 1] - mm[:, 0], 1.0), x_new.dtype)
            x_new = (x_new - lo) / span
        xs = jnp.asarray(x_new, dtype=self.dtype)
        if self.fixed_beta is not None:
            hs = jnp.zeros((len(x_new), 0), dtype=self.dtype)
        else:
            hs = basis_matrix(xs, self.spec)
        return xs, hs

    def _serving(self):
        """Jitted GEMM-only serving path, cached per fit state.

        One O(n^3) `gp.predictor` build per (re)fit; after that every
        predict() call hits the shared module-level compiled program (no
        per-call TRSM retracing — VERDICT r3 weak #7 — and no per-refit
        recompilation: the jit wrappers live at module scope).
        """
        if self._serve_cache is None or self._serve_cache[0] is not self.state:
            pred = _predictor_jit(self.state)
            self._serve_cache = (self.state, pred)
        return self._serve_cache[1]

    def _use_pallas_serve(self, serve: str, m: int, d: int) -> bool:
        """Dispatch gate for the fused Pallas mean+variance serving tier.

        VERDICT r4 weak #2 / next-step #1: the engine's fastest correct
        serving path (ops/serve.py whitened triangular quadratic — 201k
        mean+var points/s at m=1M/n=16k on v5e vs 58k for the XLA GEMM
        tier) must be what `Emulator.predict` actually runs, not an
        import-only capability. Auto-dispatch requires: TPU backend,
        gaussian family, the lane-packed distance layout (d <= 20), and a
        query batch big enough to amortize the TILE_QM=1024 padding.
        """
        import os

        if serve == "xla" or os.environ.get("GP_EMU_DISABLE_PALLAS_SERVE"):
            return False
        if self.mle_config.family != "gaussian":
            return False
        from gp_emu_uqsa_tpu.ops.mxu_packing import packed_width

        if packed_width(d) > 128:
            return False
        if serve == "pallas":
            return True
        return jax.default_backend() == "tpu" and m >= 1024

    def predict(self, x_new, *, full_cov=False, include_nugget=False,
                serve: str = "auto", quad_precision: str = "high"):
        """Posterior mean and variance at raw-space inputs x_new.

        The diagonal-variance path dispatches to the fused Pallas
        mean+variance serving kernels on TPU (`ops.serve`, gaussian
        family, d <= 20 — the measured-fastest correct tier) and to the
        cached jitted XLA Predictor (`gp.predict_batched`) otherwise;
        full_cov=True takes the exact factor-based path (`gp.predict`),
        which is the only one that builds the (m, m) covariance.

        serve: "auto" (default), "pallas" (force the fused kernels;
        interpret-mode off-TPU — the CPU equivalence-test hook), or "xla".
        quad_precision: precision tier of the variance quadratic on the
        Pallas path — "high" (bf16x3; measured 3.5e-7 absolute agreement
        with the exact tier at n=16k, docs/numerics.md) or "highest"
        (fp32-exact, ~2x slower). The XLA path always runs "highest".
        """
        if self.state is None:
            raise RuntimeError("emulator not trained: call optimize()/train first")
        x, y, h = self.train_view()
        xs, hs = self._prepare_inputs(x_new)
        m, d = xs.shape
        if full_cov:
            mean, var = gp.predict(
                self.state, x, h, xs, hs, full_cov=True,
                include_nugget=include_nugget, family=self.mle_config.family,
            )
        elif self._use_pallas_serve(serve, m, d):
            from gp_emu_uqsa_tpu.ops.serve import serve_meanvar_pallas_batched

            pred = self._serving()
            # bucket the (static) chunk size: 131072 chunks at serving
            # scale (the direct ops.serve path's measured-best config,
            # docs/perf_tpu.md), the next power of two >= m (floor 1024 =
            # TILE_QM) for small queries — a handful of compiled programs
            batch = (131072 if m > 131072
                     else max(1024, 1 << (m - 1).bit_length()))
            mean, var = serve_meanvar_pallas_batched(
                pred, x, xs, hs, batch=batch,
                quad_precision=quad_precision,
                include_nugget=include_nugget,
                interpret=jax.default_backend() != "tpu",
            )
            mean = mean.astype(self.dtype)
            var = var.astype(self.dtype)
        else:
            pred = self._serving()
            mean, var = _predict_batched_jit(pred, x, xs, hs, include_nugget,
                                             self.mle_config.family)
        if self.fixed_beta is not None:
            hraw = basis_matrix(xs, self.spec)
            mean = mean + hraw @ jnp.asarray(self.fixed_beta, dtype=self.dtype)
        return mean, var

    def train_full(self, message: bool = False) -> "Emulator":
        """Idiomatic one-call training on all data (== final_build)."""
        return final_build(self, message=message)

    def train_bayes(
        self,
        *,
        sampler: str = "nuts",
        n_chains: int = 8,
        n_warmup: int = 500,
        n_samples: int = 500,
        max_depth: int = 8,
        key=None,
        axis_name=None,
    ):
        """Full-Bayes hyperparameter inference on all data (north star).

        Runs MLE first (for initialization), then HMC/NUTS around it.
        Stores draws in self.hyper_samples; predict_bayes() marginalizes.
        Returns the sampler stats dict.

        sampler="nuts" is the MEASURED default (docs/samplers.md): ~6x the
        min-ESS/s of 32-leapfrog HMC on the real GP-hyperparameter
        posterior on both TPU and CPU, with faster compiles on TPU.
        """
        import jax as _jax
        import jax.numpy as _jnp

        from gp_emu_uqsa_tpu.inference.hmc import (
            HMCConfig, hmc_sample, make_gp_logdensity,
        )
        from gp_emu_uqsa_tpu.inference.lbfgs import _default_bounds

        self.n_folded = self.splits.n_v_sets
        if self.params is None:
            self.optimize()
        x, y, h = self.train_view()
        logdensity = make_gp_logdensity(x, y, h, self.mle_config)
        lo, hi = _default_bounds(self.mle_config, x.shape[1])
        p = lo.shape[0]
        if key is None:
            key = _jax.random.key(self.seed + 1000)
        k_init, k_run = _jax.random.split(key)
        # start chains jittered around the MLE (delta part; extras at center)
        center = np.zeros(p)
        center[: x.shape[1]] = np.asarray(self.params.log_delta)
        i = x.shape[1]
        if self.mle_config.mode == "gp4ml":
            center[i] = float(self.params.log_sigma2)
            i += 1
        if self.mle_config.train_nugget:
            center[i] = float(self.params.log_nugget)
        z0 = _jnp.asarray(center, x.dtype) + 0.1 * _jax.random.normal(
            k_init, (n_chains, p), x.dtype
        )
        cfg = HMCConfig(n_warmup=n_warmup, n_samples=n_samples)
        if sampler == "nuts":
            from gp_emu_uqsa_tpu.inference.nuts import nuts_sample

            samples, stats = nuts_sample(
                k_run, logdensity, z0, cfg, max_depth=max_depth,
                axis_name=axis_name,
            )
        else:
            samples, stats = hmc_sample(
                k_run, logdensity, z0, cfg, axis_name=axis_name
            )
        self.hyper_samples = samples
        return stats

    def predict_bayes(self, x_new, *, max_draws: int = 32):
        """Posterior-predictive mean/var marginalized over train_bayes draws."""
        from gp_emu_uqsa_tpu.inference.hmc import predict_marginalized

        if getattr(self, "hyper_samples", None) is None:
            raise RuntimeError("call train_bayes() first")
        x, y, h = self.train_view()
        xs, hs = self._prepare_inputs(x_new)
        mean, var = predict_marginalized(
            self.hyper_samples, x, y, h, xs, hs, self.mle_config,
            max_draws=max_draws,
        )
        if self.fixed_beta is not None:
            hraw = basis_matrix(xs, self.spec)
            mean = mean + hraw @ jnp.asarray(self.fixed_beta, dtype=self.dtype)
        return mean, var

    # ----- checkpoint export ----------------------------------------------

    def updated_beliefs(self) -> Beliefs:
        """Beliefs object carrying the trained hyperparameters."""
        b = self.beliefs if self.beliefs is not None else Beliefs()
        out = dataclasses.replace(b) if dataclasses.is_dataclass(b) else Beliefs()
        if self.params is not None:
            out.delta = [float(v) for v in np.exp(np.asarray(self.params.log_delta))]
            out.nugget = float(np.exp(self.params.log_nugget))
            if self.state is not None:
                out.sigma = float(np.sqrt(float(self.state.sigma2)))
                if self.fixed_beta is None:
                    out.beta = [float(v) for v in np.asarray(self.state.beta)]
        out.mucm = self.mle_config.mode == "mucm"
        out.fix_nugget = not self.mle_config.train_nugget
        out.input_minmax = self.splits.minmax
        # write the basis explicitly (round 5: power terms must survive the
        # beliefs round-trip; the implicit ["1.0"]-means-default-linear
        # convention cannot carry them)
        from gp_emu_uqsa_tpu.basis import basis_strings

        out.basis_str, out.basis_inf = basis_strings(self.spec)
        # record the kernel family the fit actually used — a from_arrays
        # emulator otherwise writes back the default 'gaussian()' even for
        # matern/exponential fits (ADVICE r1)
        out.kernel = f"{self.mle_config.family}()"
        return out


def setup(
    config_file,
    datashuffle: bool = True,
    scaleinputs: bool = True,
    *,
    dtype=jnp.float64,
    seed: int = 0,
) -> Emulator:
    """Build an Emulator from a reference-format config file.

    Mirrors `g.setup(config_file, datashuffle=..., scaleinputs=...)`
    (SURVEY.md S4.1).
    """
    cfg = Config.from_file(config_file)
    bel = Beliefs.from_file(cfg.beliefs)
    x_raw = load_matrix(cfg.inputs)
    y_raw = load_matrix(cfg.outputs)
    y = y_raw[:, bel.output] if y_raw.ndim == 2 and y_raw.shape[1] > 1 else y_raw.ravel()
    active = bel.active
    x = x_raw if active is None else x_raw[:, active]
    d = x.shape[1]

    spec = parse_basis_strings(bel.basis_str, bel.basis_inf)
    if not spec.linear_dims and bel.basis_str == ["1.0"] and len(bel.beta) == d + 1:
        # beliefs wrote only the default; fall back to reference default basis
        spec = linear_basis(d)

    minmax = bel.input_minmax if not scaleinputs else None
    splits = make_splits(
        x,
        y,
        cfg.tv_config,
        shuffle=datashuffle,
        scale_inputs=scaleinputs,
        minmax=bel.input_minmax,
        seed=seed,
    )
    db = _bounds_pair(cfg.delta_bounds, d)
    sb = _bounds_pair(cfg.sigma_bounds, 1)
    nb = _bounds_pair(cfg.nugget_bounds, 1)
    mle = MLEConfig(
        mode="mucm" if bel.mucm else "gp4ml",
        family=bel.kernel_family(),
        tries=cfg.tries,
        nugget=max(bel.nugget, _MIN_NUGGET),
        train_nugget=not bel.fix_nugget,
        delta_bounds=db,
        sigma_bounds=sb,
        nugget_bounds=nb,
        constraints="none" if cfg.constraints == "none" else "bounds",
    )
    emul = Emulator(
        splits, spec, active, mle, beliefs=bel, config=cfg, dtype=dtype, seed=seed
    )
    if bel.fix_mean:
        emul.fixed_beta = np.asarray(bel.beta, dtype=np.float64)
    return emul


def train(emul: Emulator, auto: bool = True, message: bool = False) -> Emulator:
    """Reference training workflow: optimize -> validate -> fold -> retrain.

    Mirrors `g.train(emul, auto=True, message=False)` (SURVEY.md S4.2): with
    auto=False the fold-in step asks interactively, as the reference does.
    Ends with `final_build` on all data + beliefs/inputs/outputs write-back.
    """
    n_v = emul.splits.n_v_sets
    emul.optimize(message=message)
    for k in range(n_v):
        emul.validate_against(k, message=True)
        if not auto:
            ans = input(f"include validation set {k} into training and retrain? [y/n] ")
            if not ans.strip().lower().startswith("y"):
                break
        emul.n_folded = k + 1
        if emul.n_folded < n_v:   # last fold is re-optimized by final_build
            emul.optimize(message=message)
    return final_build(emul, message=message)


def final_build(emul: Emulator, message: bool = False) -> Emulator:
    """Train on ALL data and write updated beliefs + reordered data files."""
    emul.n_folded = emul.splits.n_v_sets
    emul.optimize(message=message)
    if emul.config is not None:
        suffix = "-f"
        bel_path = Path(emul.beliefs.path or emul.config.beliefs)
        out_bel = bel_path.with_name(bel_path.name + suffix)
        emul.updated_beliefs().to_file(out_bel)
        x_raw = load_matrix(emul.config.inputs)[emul.splits.order]
        y_raw = load_matrix(emul.config.outputs)[emul.splits.order]
        ip = Path(emul.config.inputs)
        op = Path(emul.config.outputs)
        save_matrix(ip.with_name(ip.name + suffix), x_raw)
        save_matrix(op.with_name(op.name + suffix), y_raw)
        if message:
            print(f"[final_build] wrote {out_bel}, {ip.name}{suffix}, {op.name}{suffix}")
    return emul

"""Matrix-free (BBMM-style) NLL/gradient/MLE vs the exact factorized path."""
import numpy as np
import jax
import jax.numpy as jnp

from gp_emu_uqsa_tpu import gp
from gp_emu_uqsa_tpu.basis import basis_matrix, linear_basis
from gp_emu_uqsa_tpu.kernels import gaussian_corr_self, make_params
from gp_emu_uqsa_tpu.inference.matrix_free import (
    MFConfig, mle_fit_matrix_free, nll_and_grad_matrix_free,
)
from gp_emu_uqsa_tpu.ops.cg import make_corr_matvec
from gp_emu_uqsa_tpu.ops.slq import slq_logdet


def _problem(n=160, d=2, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.uniform(size=(n, d)))
    y = (jnp.sin(3 * x[:, 0]) + jnp.sin(2 * x[:, 1])
         + 0.05 * jnp.asarray(rng.standard_normal(n)))
    h = basis_matrix(x, linear_basis(d))
    return x, y, h


def test_slq_logdet_matches_dense():
    x, y, h = _problem()
    p = make_params(np.full(2, 0.7), nugget=1e-2, dtype=jnp.float64)
    a = gaussian_corr_self(x, p)
    ld_true = float(jnp.linalg.slogdet(a)[1])
    mv = make_corr_matvec(x, p, chunk=64)
    est = float(slq_logdet(mv, x.shape[0], jax.random.key(0),
                           num_probes=32, k=32))
    assert abs(est - ld_true) / abs(ld_true) < 0.02


def test_matrix_free_nll_and_grad_match_exact():
    x, y, h = _problem()
    p = make_params(np.array([0.7, 0.9]), nugget=1e-2, dtype=jnp.float64)
    val, grads = jax.value_and_grad(lambda pp: gp.nll_mucm(pp, x, y, h))(p)
    cfg = MFConfig(num_probes=64, lanczos_k=40, cg_tol=1e-10,
                   cg_maxiter=2000, chunk=64)
    nll, g, aux = nll_and_grad_matrix_free(p, x, y, h, jax.random.key(1), cfg)
    assert abs(float(nll) - float(val)) / abs(float(val)) < 0.01
    # stochastic estimator: assert direction + magnitude, not components
    # (the exact gradient is a small difference of large cancelling terms,
    # so per-component relative error reflects probe variance, not bias)
    ge = np.concatenate([np.asarray(grads.log_delta),
                         [float(grads.log_nugget)]])
    gm = np.concatenate([np.asarray(g.log_delta), [float(g.log_nugget)]])
    cos = gm @ ge / (np.linalg.norm(gm) * np.linalg.norm(ge))
    assert cos > 0.95, (cos, gm, ge)
    ratio = np.linalg.norm(gm) / np.linalg.norm(ge)
    assert 0.6 < ratio < 1.6, (ratio, gm, ge)
    assert float(jnp.max(aux["cg_info"]["rel_resid"])) < 1e-8


def test_preconditioned_nll_matches_exact():
    x, y, h = _problem()
    p = make_params(np.array([0.7, 0.9]), nugget=1e-4, dtype=jnp.float64)
    val = float(gp.nll_mucm(p, x, y, h))
    cfg = MFConfig(num_probes=16, lanczos_k=32, cg_tol=1e-9,
                   cg_maxiter=2000, chunk=64, precond_rank=48)
    nll, g, aux = nll_and_grad_matrix_free(p, x, y, h, jax.random.key(2), cfg)
    # small-nugget regime: PCG converges fast AND the preconditioned SLQ
    # keeps the value tight where plain SLQ drifts ~1-2%
    assert abs(float(nll) - val) / abs(val) < 0.01, (float(nll), val)
    assert int(aux["cg_info"]["iters"]) < 200


def test_matrix_free_mle_approaches_exact_optimum():
    from gp_emu_uqsa_tpu.inference import MLEConfig, mle_fit

    x, y, h = _problem()
    p_ref, info = mle_fit(
        jax.random.key(0), x, y, h,
        MLEConfig(mode="mucm", tries=8, train_nugget=True,
                  nugget_bounds=(1e-6, 1.0)),
    )
    # realistic usage: warm-start from a subset MLE, refine matrix-free
    p_sub, _ = mle_fit(
        jax.random.key(2), x[:60], y[:60], h[:60],
        MLEConfig(mode="mucm", tries=4, train_nugget=True,
                  nugget_bounds=(1e-6, 1.0)),
    )
    cfg = MFConfig(num_probes=8, lanczos_k=24, cg_tol=1e-8,
                   cg_maxiter=1000, chunk=64)
    p_mf, _ = mle_fit_matrix_free(jax.random.key(1), x, y, h, steps=100,
                                  learning_rate=0.03, min_nugget=1e-4,
                                  init=p_sub, cfg=cfg)
    nll_ref = float(info["best_nll"])
    nll_mf = float(gp.nll_mucm(p_mf, x, y, h))
    # stochastic first-order fit lands within a few nats of the exact MLE
    assert nll_mf < nll_ref + 10.0, (nll_mf, nll_ref)

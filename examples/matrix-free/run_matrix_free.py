"""Matrix-free GP workflow: train + serve past the Cholesky memory wall.

At n = 64k the correlation matrix is 16 GB fp32 — unfactorizable on one
chip. This workflow never materializes it:

  1. warm-start hyperparameters with an exact subset MLE,
  2. refine them matrix-free (batched PCG solves + preconditioned-SLQ
     logdet + Hutchinson trace gradients, inference/matrix_free.py),
  3. compute serving weights and predict means via chunked kernel matvecs
     (ops/cg.py; the fused Pallas kernel ops/serve.py on TPU).

Run: python run_matrix_free.py  (CPU demo sizes; scale n freely on TPU)
"""
import numpy as np

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp

from gp_emu_uqsa_tpu.basis import basis_matrix, linear_basis
from gp_emu_uqsa_tpu.inference import MLEConfig, mle_fit
from gp_emu_uqsa_tpu.inference.matrix_free import MFConfig, mle_fit_matrix_free
from gp_emu_uqsa_tpu.ops.cg import fit_matrix_free, predict_mean_matrix_free


def simulator(x):
    return np.sin(3 * x[:, 0]) + np.sin(2 * x[:, 1]) + 0.3 * x[:, 0] * x[:, 1]


def main(n=800, n_sub=200, d=2, seed=0, verbose=True):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.uniform(size=(n, d)))
    y = jnp.asarray(simulator(np.asarray(x)) + 0.05 * rng.standard_normal(n))
    spec = linear_basis(d)
    h = basis_matrix(x, spec)

    # 1. exact subset MLE as warm start
    p0, _ = mle_fit(
        jax.random.key(seed), x[:n_sub], y[:n_sub], h[:n_sub],
        MLEConfig(mode="mucm", tries=4, train_nugget=True,
                  nugget_bounds=(1e-6, 1.0)),
    )

    # 2. matrix-free refinement on ALL points
    cfg = MFConfig(num_probes=8, lanczos_k=24, cg_tol=1e-7,
                   cg_maxiter=500, chunk=256, precond_rank=48)
    p, info = mle_fit_matrix_free(
        jax.random.key(seed + 1), x, y, h,
        steps=60, learning_rate=0.03, min_nugget=1e-4, init=p0, cfg=cfg,
    )
    if verbose:
        tr = np.asarray(info["nll_trace"])
        print(f"NLL {tr[0]:.1f} -> {tr[-1]:.1f} over {len(tr)} steps")
        print("delta", np.exp(np.asarray(p.log_delta)),
              "nugget", float(np.exp(p.log_nugget)))

    # 3. matrix-free serving
    ff = fit_matrix_free(p, x, y, h, chunk=256, tol=1e-8, maxiter=1000,
                         precond_rank=48)
    xs = jnp.asarray(rng.uniform(size=(500, d)))
    hs = basis_matrix(xs, spec)
    mean = predict_mean_matrix_free(ff, x, xs, hs, p, chunk=256)
    rmse = float(jnp.sqrt(jnp.mean((mean - simulator(np.asarray(xs))) ** 2)))
    if verbose:
        print(f"serving RMSE on 500 held-out points: {rmse:.4f}")
    return p, ff, rmse


if __name__ == "__main__":
    main()

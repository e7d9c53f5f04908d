"""Heteroscedastic noise fitting example (reference `noise_fit` examples).

Workflow (SURVEY.md S4.5): a 1D simulator whose noise level varies with x
(sd grows linearly). The alternating Goldberg-style fit recovers both the
signal emulator and the input-dependent noise surface:

  1. fit a GP to the data under current pointwise noise estimates,
  2. estimate pointwise residual variance from closed-form LOO residuals
     (chi^2_1 log-moment + latent-variance corrections applied),
  3. fit a second GP to the log-noise surface, iterate.

Run: python run_noisefit.py  (CPU ok; ~a minute, compile-dominated)
"""
import numpy as np

import jax

jax.config.update("jax_enable_x64", True)

from gp_emu_uqsa_tpu.noise_fit import noisefit_arrays, predict_noise


def simulator(x, rng):
    signal = 2.0 * np.sin(2 * np.pi * x)
    noise_sd = 0.1 + 0.4 * x          # heteroscedastic: quiet left, loud right
    return signal + noise_sd * rng.standard_normal(x.shape), noise_sd


def main(n=200, seed=0, verbose=True):
    rng = np.random.default_rng(seed)
    x = rng.uniform(0.0, 1.0, n)
    y, true_sd = simulator(x, rng)

    result = noisefit_arrays(x, y, stopat=5, tries=3, seed=seed,
                             message=verbose)

    xg = np.linspace(0.05, 0.95, 19)
    est_sd = np.sqrt(predict_noise(result, xg))
    true_g = 0.1 + 0.4 * xg
    if verbose:
        print("x      true sd   estimated sd")
        for xi, ti, ei in zip(xg[::3], true_g[::3], est_sd[::3]):
            print(f"{xi:5.2f}  {ti:8.3f}  {ei:12.3f}")
        ratio = est_sd / true_g
        print(f"mean est/true sd ratio: {ratio.mean():.3f}")
    return result, est_sd, true_g


if __name__ == "__main__":
    main()

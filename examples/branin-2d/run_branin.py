"""BASELINE config 2: 2D Branin emulator with nugget noise + main-effect SA.

Workflow: maximin LHC design -> noisy Branin evaluations -> GP emulator with
trained nugget -> analytic main-effect sensitivity indices + curves.
"""
import numpy as np

import jax

jax.config.update("jax_enable_x64", True)

import gp_emu_uqsa_tpu as g
import gp_emu_uqsa_tpu.sensitivity as s
from gp_emu_uqsa_tpu.design_inputs import optLatinHyperCube


def branin(x1, x2):
    """Branin-Hoo on its standard domain x1 in [-5,10], x2 in [0,15]."""
    a, b, c = 1.0, 5.1 / (4 * np.pi**2), 5 / np.pi
    r, t = 6.0, 1 / (8 * np.pi)
    return a * (x2 - b * x1**2 + c * x1 - r) ** 2 + 10 * (1 - t) * np.cos(x1) + 10


def main(n=80, noise_sd=2.0, seed=0, verbose=True):
    mm = [[-5.0, 10.0], [0.0, 15.0]]
    x = optLatinHyperCube(2, n, 200, mm, seed=seed)
    rng = np.random.default_rng(seed)
    y = branin(x[:, 0], x[:, 1]) + noise_sd * rng.standard_normal(n)

    emul = g.Emulator.from_arrays(
        x, y, tries=8, train_nugget=True, nugget_bounds=(1e-8, 1.0), seed=seed
    )
    emul.train_full(message=verbose)

    # input distribution: independent normals at domain centers (scaled space)
    m = np.array([0.5, 0.5])
    v = np.array([0.04, 0.04])
    sens = s.setup(emul, m, v)
    si = sens.sensitivity()
    ti = sens.totaleffectvariance()
    unc = sens.uncertainty()
    if verbose:
        print("E*[E Y] =", float(unc["E_EY"]))
        print("S_i  =", np.asarray(si["S_i"]))
        print("S_Ti =", np.asarray(ti["S_Ti"]))
    return emul, sens


if __name__ == "__main__":
    main()

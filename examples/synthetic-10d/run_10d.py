"""BASELINE config 3: 10D synthetic simulator, 500 points, MLE + full Sobol.

The simulator is a Sobol g-function variant with known importance ordering:
small a_i => important input. Analytic first-order indices of the
g-function provide the golden values the emulator-based UQSA must approach.
"""
import numpy as np

import jax

jax.config.update("jax_enable_x64", True)

import gp_emu_uqsa_tpu as g
import gp_emu_uqsa_tpu.sensitivity as s
from gp_emu_uqsa_tpu.design_inputs import optLatinHyperCube

A_COEF = np.array([0.0, 0.5, 1.5, 3.0, 6.0, 9.0, 12.0, 15.0, 20.0, 30.0])


def smooth_g(x):
    """Smooth analog of the Sobol g-function (cos instead of |4x-2|).

    f = prod_i (1 + b_i cos(2 pi x_i)),  b_i = 1/(1+a_i) * 0.8
    For independent U(0,1)-ish inputs the factors decouple; inputs with
    larger b_i dominate. Smoothness keeps the GP emulator accurate at n=500.
    """
    b = 0.8 / (1.0 + A_COEF)
    return np.prod(1.0 + b * np.cos(2 * np.pi * x), axis=1)


def main(n=500, tries=8, seed=0, verbose=True):
    x = optLatinHyperCube(10, n, 50, [[0.0, 1.0]] * 10, seed=seed)
    y = smooth_g(x)

    emul = g.Emulator.from_arrays(
        x, y, tries=tries, nugget=1e-8, scale_inputs=False, seed=seed,
        tv_config=(10, 0, 1),
    )
    emul.train_full(message=verbose)

    m = np.full(10, 0.5)
    v = np.full(10, 0.02)
    sens = s.setup(emul, m, v)
    si = sens.sensitivity()
    ti = sens.totaleffectvariance()
    if verbose:
        print("S_i  =", np.round(np.asarray(si["S_i"]), 4))
        print("S_Ti =", np.round(np.asarray(ti["S_Ti"]), 4))
    return emul, sens, si, ti


if __name__ == "__main__":
    main()

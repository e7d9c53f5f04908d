"""Generate the 1D toy-simulator example data (reference `examples/toy-sim`).

The reference ships a 1D toy simulator with optional noise; this recreates
the same workflow shape: run the simulator over an optimized LHC design,
write whitespace inputs/outputs files consumable by `setup()`.
"""
import numpy as np


def toy_sim(x, noise=0.0, rng=None):
    y = 3.0 * x[:, 0] * np.sin(5.0 * np.pi * x[:, 0] / 2.0)
    if noise:
        rng = rng or np.random.default_rng(0)
        y = y + noise * rng.standard_normal(len(y))
    return y


if __name__ == "__main__":
    rng = np.random.default_rng(12)
    x = np.sort(rng.uniform(0.0, 2.0, size=(40, 1)), axis=0)
    y = toy_sim(x)
    np.savetxt("toy-sim_input", x, fmt="%.10g")
    np.savetxt("toy-sim_output", y, fmt="%.10g")
    print("wrote toy-sim_input / toy-sim_output")

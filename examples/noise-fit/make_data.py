"""Generate the noise-fit example data (checked-in; rerun to refresh).

1D simulator with input-dependent noise: y = 2 sin(2 pi x) + sd(x) eps,
sd(x) = 0.1 + 0.4 x (quiet left, loud right).
"""
import numpy as np

rng = np.random.default_rng(21)
n = 150
x = rng.uniform(size=n)
y = 2.0 * np.sin(2 * np.pi * x) + (0.1 + 0.4 * x) * rng.standard_normal(n)
np.savetxt("noisefit_input", x)
np.savetxt("noisefit_output", y)

"""Generate the sensitivity-2d example data (checked-in; rerun to refresh).

Simulator: eta(x1, x2) = x1 + 0.15 exp(x1) + 0.6 x2^2. Around the input
distribution N(0.5, 0.02) the x1 slope is 1 + 0.15 e^0.5 ~ 1.25 vs the x2
slope 0.6, so the analytic S_i table has an unambiguous expected ordering
(S_1 ~ 0.8, S_2 ~ 0.2) to eyeball against. (A sin(2 pi x) term looks
tempting here but its slope at x = 0.5 is exactly -2 pi * amplitude, which
silently cancels a linear term — a trap for golden ordering assertions.)
"""
import numpy as np

rng = np.random.default_rng(11)
n = 60
x = rng.uniform(size=(n, 2))
y = x[:, 0] + 0.15 * np.exp(x[:, 0]) + 0.6 * x[:, 1] ** 2
np.savetxt("sens2d_input", x)
np.savetxt("sens2d_output", y)

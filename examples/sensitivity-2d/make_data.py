"""Generate the sensitivity-2d example data (checked-in; rerun to refresh).

Simulator: eta(x1, x2) = x1 + 0.6 x2^2 + 0.25 sin(2 pi x1) — a smooth 2-d
function whose variance is dominated by x1 (direct + oscillatory term)
with a weaker x2 contribution, so the analytic S_i table has a clear
expected ordering to eyeball against.
"""
import numpy as np

rng = np.random.default_rng(11)
n = 60
x = rng.uniform(size=(n, 2))
y = x[:, 0] + 0.6 * x[:, 1] ** 2 + 0.25 * np.sin(2 * np.pi * x[:, 0])
np.savetxt("sens2d_input", x)
np.savetxt("sens2d_output", y)

"""File-driven sensitivity workflow (reference layout: config/beliefs/data).

    cd examples/sensitivity-2d && python run_sensitivity.py

Mirrors the reference's sensitivity examples (SURVEY.md S3 Examples row):
setup + train from the text files, then the analytic MUCM UQSA table with
input distributions x_i ~ N(m_i, v_i) in the scaled input space.
"""
import numpy as np
import gp_emu_uqsa_tpu as g
import gp_emu_uqsa_tpu.sensitivity as s

emul = g.setup("sens2d_config")
g.train(emul, auto=True, message=True)

m = [0.5, 0.5]
v = [0.02, 0.02]
sens = s.setup(emul, m, v)
res = sens.sensitivity()
tot = sens.totaleffectvariance()
unc = sens.uncertainty()
print(f"E*[E(Y)] = {float(unc['E_EY']):.5g}  "
      f"V*[E(Y)] = {float(unc['V_EY']):.3g}")
for i in range(2):
    print(f"x{i+1}: S_i = {float(res['S_i'][i]):.4f}  "
          f"S_Ti = {float(tot['S_Ti'][i]):.4f}")
sens.to_file("sens2d_indices")
sens.main_effect(0, points=40)

"""File-driven heteroscedastic noise fit (reference layout).

    cd examples/noise-fit && python run_noisefit_files.py

Reference call shape (SURVEY.md S3 noise-fit row):
    n.noisefit(data_conf, noise_conf, stopat, olhcmult)
Writes per-iteration `noisefit_output-noise-it<k>` files, the final
`noisefit_output-noise` estimates, and `*-f` updated beliefs for both GPs.
"""
import numpy as np

from gp_emu_uqsa_tpu.noise_fit import noisefit, predict_noise

result = noisefit("noisefit_data_config", "noisefit_noise_config",
                  stopat=5, olhcmult=100, message=True)
xg = np.linspace(0.05, 0.95, 10)
est_sd = np.sqrt(predict_noise(result, xg))
print("x, estimated sd (true sd = 0.1 + 0.4 x):")
for xi, ei in zip(xg, est_sd):
    print(f"{xi:5.2f}  {ei:8.3f}")

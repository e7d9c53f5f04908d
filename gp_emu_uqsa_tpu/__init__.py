"""gp_emu_uqsa_tpu — TPU-native GP emulation + UQ/sensitivity engine.

A from-scratch JAX/XLA/Pallas re-design of the GP_emu_UQSA capability set
(SURVEY.md): Gaussian-process emulators of computer simulators with MUCM
concentrated likelihood, multi-restart MLE and HMC hyperparameter inference,
universal-kriging prediction, validation diagnostics, analytic variance-based
sensitivity analysis, optimized Latin-hypercube design, and heteroscedastic
noise fitting — all jit-compiled, vmap-batched, and shardable over TPU
meshes.

Reference-compatible facade (same call shapes as the reference package):

    import gp_emu_uqsa_tpu as g
    emul = g.setup("config_file")
    g.train(emul, auto=True)
    g.plot(emul, [0], [1], [0.3], "mean")

Idiomatic array API:

    emul = g.Emulator.from_arrays(x, y, tries=8)
    emul.train_full()  # == g.final_build(emul)
"""
from gp_emu_uqsa_tpu.emulator import Emulator, setup, train, final_build
from gp_emu_uqsa_tpu.plotting import plot
from gp_emu_uqsa_tpu.configs import Beliefs, Config
from gp_emu_uqsa_tpu.kernels import GPParams, make_params
from gp_emu_uqsa_tpu.basis import BasisSpec, basis_matrix, linear_basis, const_basis
from gp_emu_uqsa_tpu.inference import MLEConfig, mle_fit
from gp_emu_uqsa_tpu import gp

__version__ = "0.1.0"

__all__ = [
    "Emulator", "setup", "train", "final_build", "plot",
    "Beliefs", "Config", "GPParams", "make_params",
    "BasisSpec", "basis_matrix", "linear_basis", "const_basis",
    "MLEConfig", "mle_fit", "gp",
]

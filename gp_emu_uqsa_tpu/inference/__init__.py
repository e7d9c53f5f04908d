from gp_emu_uqsa_tpu.inference.lbfgs import MLEConfig, mle_fit

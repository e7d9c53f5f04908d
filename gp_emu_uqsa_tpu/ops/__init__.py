from gp_emu_uqsa_tpu.ops.cholesky import cholesky_with_jitter, tri_solve

from gp_emu_uqsa_tpu.parallel.mesh import make_mesh, replicated, sharded
from gp_emu_uqsa_tpu.parallel.predict import predict_sharded
from gp_emu_uqsa_tpu.parallel.large_fit import fit_large, predictor_large
from gp_emu_uqsa_tpu.parallel.ring import ring_predict

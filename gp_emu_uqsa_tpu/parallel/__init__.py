from gp_emu_uqsa_tpu.parallel.mesh import make_mesh, replicated, sharded
from gp_emu_uqsa_tpu.parallel.predict import predict_sharded

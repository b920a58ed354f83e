from ltp_sglang_tpu.parallel.mesh import MeshContext, create_mesh

from lrce_tpu.parallel.mesh import batch_sharding, make_mesh, replicate

from lrce_tpu.parallel.mesh import batch_sharding, make_mesh, replicate
from lrce_tpu.parallel.sharding import e2e_param_shardings, shard_params

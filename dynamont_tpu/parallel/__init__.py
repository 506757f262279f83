from dynamont_tpu.parallel.mesh import make_mesh
from dynamont_tpu.parallel.train_step import make_sharded_train_step, pool_params

__all__ = ["make_mesh", "make_sharded_train_step", "pool_params"]

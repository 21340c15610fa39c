from gnnpe_tpu.parallel.mesh import make_mesh
from gnnpe_tpu.parallel.dist import (shard_edges, distributed_neighbor_sum,
                                     make_distributed_train_step)

__all__ = ["make_mesh", "shard_edges", "distributed_neighbor_sum",
           "make_distributed_train_step"]

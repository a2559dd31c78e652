from .mesh import make_data_mesh, shard_map_fn, DATA_AXIS
from .multihost import (any_process, host_sum, make_global_batch,
                        replicate_tree)

__all__ = ["make_data_mesh", "shard_map_fn", "DATA_AXIS",
           "any_process", "host_sum", "make_global_batch", "replicate_tree"]

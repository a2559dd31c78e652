from .mesh import make_data_mesh, shard_map_fn, DATA_AXIS

__all__ = ["make_data_mesh", "shard_map_fn", "DATA_AXIS"]

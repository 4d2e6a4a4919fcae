from svinet_tpu.parallel.mesh import make_mesh, make_sharded_sweep, shard_edges

__all__ = ["make_mesh", "make_sharded_sweep", "shard_edges"]

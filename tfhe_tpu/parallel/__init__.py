from .mesh import make_mesh, replicate, shard_batch, sharded_ks_pbs

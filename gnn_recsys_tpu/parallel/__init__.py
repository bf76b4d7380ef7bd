from gnn_recsys_tpu.parallel.mesh import make_mesh, shard_batch  # noqa: F401

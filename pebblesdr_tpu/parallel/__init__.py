from pebblesdr_tpu.parallel import expert, mesh, time_shard  # noqa: F401

from pebblesdr_tpu.parallel import mesh, time_shard  # noqa: F401

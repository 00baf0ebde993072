from pebblesdr_tpu.parallel import expert, mesh, pipeline, time_shard  # noqa: F401

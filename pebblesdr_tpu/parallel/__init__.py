from pebblesdr_tpu.parallel import dist_fft, expert, mesh, pipeline, \
    time_shard  # noqa: F401

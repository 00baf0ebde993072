from pebblesdr_tpu.io import wav, sources  # noqa: F401

from pebblesdr_tpu.demod.modes import DemodMode, MODE_INFO  # noqa: F401

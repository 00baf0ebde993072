from pebblesdr_tpu.modem import morse, morse_code  # noqa: F401

from pebblesdr_tpu.ops import (  # noqa: F401
    mixer,
    fir,
    decimator,
    fastfir,
    spectrum,
    resampler,
    iir,
    scanops,
    agc,
    pll,
    goertzel,
    pfb,
)

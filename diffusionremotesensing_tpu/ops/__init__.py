from diffusionremotesensing_tpu.ops.resize import (  # noqa: F401
    bicubic_resize_weights,
    resize_bicubic,
    upsample_bicubic,
    upsample_nearest,
)

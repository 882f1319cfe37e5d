from diffusionremotesensing_tpu.models.unet import (  # noqa: F401
    ResidualAttentionUNet,
    residual_attention_unet_generation,
    residual_attention_unet_sar_to_ndvi,
    residual_attention_unet_superres,
)

"""The Residual Attention UNet, once, with pluggable conditioning.

Replaces the reference's three near-identical model files:

* ``superres``  — condition = LR image: RRDB encode -> torch-bicubic upsample
  by ``magnification_factor`` -> 3x3 conv -> summed into the stem
  (/root/reference/UNet_model_superres.py:266-379).
* ``sar``       — condition = SAR image: RRDB encode -> 3x3 conv -> summed
  into the stem, no upsampling (/root/reference/UNet_model_SAR_TO_NDVI.py:263-370).
* ``class``     — condition = integer class label: Embedding(num_classes, 100)
  added to the time embedding; maskable per-sample for classifier-free
  guidance (/root/reference/generate_new_imgs/UNet_model_generation.py:226-329).
* ``none``      — unconditional.

Skeleton (all variants): stem 3x3 conv to 16ch; 3 ResConvBlocks
(16->32->64->128) each followed by a stride-2 3x3 conv; bottleneck ResConvBlock
128->256; 3 up stages of [gating signal -> additive attention gate on the skip
-> UpConvBlock x2-upsample -> channel concat -> 3x3 conv]; 1x1 output conv.
The stem output is additionally fed as ``x_skip`` into the first ResConvBlock.

Layout is NHWC (TPU-native); parameter counts match the torch models exactly
(4,383,058 / 4,382,238 / 4,383,022 — see tests/test_models.py).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from diffusionremotesensing_tpu.models.blocks import (
    AttentionGate,
    GatingSignal,
    ResConvBlock,
    RRDB,
    TorchConv,
    UpConvBlock,
    sinusoidal_time_embedding,
)
from diffusionremotesensing_tpu.ops.resize import upsample_bicubic


class ResidualAttentionUNet(nn.Module):
    """Conditioning-parameterized Residual Attention UNet (epsilon-predictor).

    Args passed to ``__call__``:
      x:    noisy image, (B, H, W, image_channels), H and W divisible by 8.
      t:    integer/float timesteps, (B,).
      cond: conditioning input —
            'superres'/'sar': image (B, h, w, cond_channels) on the LR/SAR grid;
            'class': integer labels (B,), or None for unconditional;
            'none': ignored.
      cond_mask: optional (B,) float mask multiplying the label embedding
            (1 = conditioned, 0 = unconditional); enables batched CFG with a
            single model call.
      train: BatchNorm mode (True = batch stats, False = running averages).
    """

    conditioning: str = "superres"  # 'superres' | 'sar' | 'class' | 'none'
    image_channels: int = 3
    out_dim: int = 3
    cond_channels: int = 3
    num_classes: Optional[int] = None
    magnification_factor: Optional[int] = None
    time_emb_dim: int = 100
    down_channels: Tuple[int, ...] = (16, 32, 64, 128, 256)
    up_channels: Tuple[int, ...] = (256, 128, 64, 32, 16)
    dtype: Optional[jnp.dtype] = None
    # False | True | 'interpret' — fused Pallas attention gates at inference
    use_pallas: object = False

    def setup(self):
        dc, uc = self.down_channels, self.up_channels
        self.conv0 = TorchConv(dc[0], 3, dtype=self.dtype)
        if self.conditioning in ("superres", "sar"):
            self.cond_encoder = RRDB(num_blocks=3, dtype=self.dtype)
            self.conv_cond = TorchConv(dc[0], 3, dtype=self.dtype)
        if self.conditioning == "class" and self.num_classes is not None:
            self.label_emb = nn.Embed(
                num_embeddings=self.num_classes,
                features=self.time_emb_dim,
                # torch nn.Embedding default is N(0, 1)
                embedding_init=nn.initializers.normal(stddev=1.0),
            )
        self.conv_blocks = [
            ResConvBlock(dc[i + 1], dtype=self.dtype, name=f"conv_block{i}")
            for i in range(len(dc) - 2)
        ]
        self.downs = [
            TorchConv(dc[i + 1], 3, stride=2, dtype=self.dtype, name=f"down{i}")
            for i in range(len(dc) - 2)
        ]
        self.bottle_neck = ResConvBlock(dc[-1], dtype=self.dtype)
        self.gatings = [
            GatingSignal(uc[i + 1], dtype=self.dtype, name=f"gating{i}")
            for i in range(len(uc) - 2)
        ]
        self.attentions = [
            AttentionGate(uc[i + 1], dtype=self.dtype, use_pallas=self.use_pallas, name=f"attention{i}")
            for i in range(len(uc) - 2)
        ]
        self.ups = [
            UpConvBlock(uc[i], dtype=self.dtype, name=f"up{i}") for i in range(len(uc) - 2)
        ]
        self.up_convs = [
            TorchConv(uc[i + 1], 3, dtype=self.dtype, name=f"up_conv{i}")
            for i in range(len(uc) - 2)
        ]
        self.output = TorchConv(self.out_dim, 1, dtype=self.dtype)

    def encode_cond(self, cond):
        """Condition-image stem: RRDB encode (+bicubic upsample for superres)
        + 3x3 conv to stem width. Loop-invariant during sampling — call once
        via ``apply(..., method='encode_cond')`` and pass the result as
        ``cond_features`` to skip recomputing it in every scan step."""
        if self.conditioning not in ("superres", "sar"):
            raise ValueError("encode_cond applies to image-conditioned variants")
        c = self.cond_encoder(cond)
        if self.conditioning == "superres":
            if self.magnification_factor is None:
                raise ValueError("superres conditioning requires magnification_factor")
            c = upsample_bicubic(c, self.magnification_factor)
        return self.conv_cond(c)

    def __call__(
        self, x, t, cond=None, cond_mask=None, train: bool = False, cond_features=None
    ):
        t_emb = sinusoidal_time_embedding(t, self.time_emb_dim)

        if self.conditioning == "class" and self.num_classes is not None:
            if cond is not None:
                lab = self.label_emb(cond.astype(jnp.int32))
                if cond_mask is not None:
                    lab = lab * cond_mask.astype(lab.dtype)[:, None]
                t_emb = t_emb + lab
            elif self.is_initializing():
                _ = self.label_emb(jnp.zeros((1,), jnp.int32))
        if self.dtype is not None:
            t_emb = t_emb.astype(self.dtype)

        # INITIAL PROJECTION
        h = self.conv0(x)

        # IMAGE-CONDITION ENCODER (superres / sar)
        if self.conditioning in ("superres", "sar"):
            if cond_features is None:
                if cond is None:
                    raise ValueError(f"conditioning={self.conditioning!r} requires a condition image")
                cond_features = self.encode_cond(cond)
            h = h + cond_features

        x_skip = h

        # DOWN PATH
        residual_inputs = []
        for i, (block, down) in enumerate(zip(self.conv_blocks, self.downs)):
            h = block(h, t_emb, x_skip if i == 0 else None, train=train)
            residual_inputs.append(h)
            h = down(h)

        # BOTTLENECK
        h = self.bottle_neck(h, t_emb, None, train=train)

        # UP PATH
        for i in range(len(self.ups)):
            g = self.gatings[i](h, train=train)
            attn = self.attentions[i](residual_inputs[-(i + 1)], g, train=train)
            h = self.ups[i](h, t_emb, train=train)
            h = jnp.concatenate([h, attn], axis=-1)
            h = self.up_convs[i](h)

        # OUTPUT
        out = self.output(h)
        return out.astype(jnp.float32)


def residual_attention_unet_superres(
    image_channels: int = 3,
    out_dim: int = 3,
    magnification_factor: int = 2,
    dtype=None,
    use_pallas=False,
) -> ResidualAttentionUNet:
    """Superres UNet (ref UNet_model_superres.py:266): LR-image conditioned."""
    return ResidualAttentionUNet(
        conditioning="superres",
        image_channels=image_channels,
        out_dim=out_dim,
        cond_channels=image_channels,
        magnification_factor=magnification_factor,
        dtype=dtype,
        use_pallas=use_pallas,
    )


def residual_attention_unet_sar_to_ndvi(
    sar_channels: int = 2,
    ndvi_channels: int = 1,
    dtype=None,
) -> ResidualAttentionUNet:
    """SAR->NDVI UNet (ref UNet_model_SAR_TO_NDVI.py:263): SAR-image conditioned."""
    return ResidualAttentionUNet(
        conditioning="sar",
        image_channels=ndvi_channels,
        out_dim=ndvi_channels,
        cond_channels=sar_channels,
        dtype=dtype,
    )


def residual_attention_unet_generation(
    image_channels: int = 3,
    out_dim: int = 3,
    num_classes: Optional[int] = 10,
    dtype=None,
) -> ResidualAttentionUNet:
    """Class-conditional UNet (ref UNet_model_generation.py:226) with CFG masking."""
    return ResidualAttentionUNet(
        conditioning="class",
        image_channels=image_channels,
        out_dim=out_dim,
        num_classes=num_classes,
        dtype=dtype,
    )


def init_unet_params(
    model: ResidualAttentionUNet,
    key: jax.Array,
    image_size: int = 64,
    cond_size: Optional[int] = None,
):
    """Initialize model variables with dummy inputs of the right shapes.

    Returns the flax variables dict {'params': ..., 'batch_stats': ...}.
    """
    x = jnp.zeros((1, image_size, image_size, model.image_channels), jnp.float32)
    t = jnp.zeros((1,), jnp.int32)
    if model.conditioning == "superres":
        cs = cond_size or image_size // (model.magnification_factor or 1)
        cond = jnp.zeros((1, cs, cs, model.cond_channels), jnp.float32)
    elif model.conditioning == "sar":
        cs = cond_size or image_size
        cond = jnp.zeros((1, cs, cs, model.cond_channels), jnp.float32)
    elif model.conditioning == "class":
        cond = jnp.zeros((1,), jnp.int32)
    else:
        cond = None
    return model.init(key, x, t, cond, train=False)


def param_count(params) -> int:
    """Total number of scalar parameters in a pytree."""
    return int(sum(np.prod(p.shape) for p in jax.tree_util.tree_leaves(params)))

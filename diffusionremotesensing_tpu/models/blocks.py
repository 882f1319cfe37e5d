"""UNet building blocks (flax.linen, NHWC) shared by all three tasks.

One implementation replaces the reference's three copy-pasted block sets
(/root/reference/UNet_model_superres.py:57-260, UNet_model_SAR_TO_NDVI.py,
generate_new_imgs/UNet_model_generation.py). Numerics follow the reference
exactly (conv taps/padding, BatchNorm eps/momentum, op ordering); layout is
NHWC and initialization matches torch's kaiming-uniform defaults so that
training dynamics and imported checkpoints are comparable.

Parity notes:
* every ResConvBlock owns an ``x_skip`` 3x3 conv even when no skip is fed to
  it (the reference instantiates ``conv_upsampled_lr_img`` in every block,
  UNet_model_superres.py:129, and DDP runs with find_unused_parameters=True);
  we register those params unconditionally so parameter counts and torch
  checkpoint import line up.
* BatchNorm: eps 1e-5, torch momentum 0.1 (flax momentum 0.9). Torch updates
  running_var with the *unbiased* batch variance while flax uses the biased
  one; imported checkpoints carry their own running stats so eval parity is
  unaffected, and freshly-trained stats differ only by n/(n-1).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from diffusionremotesensing_tpu.ops import quant as quant_ops

from diffusionremotesensing_tpu.ops.resize import upsample_nearest

# --------------------------------------------------------------------------
# torch-default initializers (kaiming_uniform(a=sqrt(5)) => U(+-1/sqrt(fan_in)))
# --------------------------------------------------------------------------


def torch_conv_kernel_init(key, shape, dtype=jnp.float32):
    """U(-b, b) with b = 1/sqrt(in_ch * kh * kw); shape is HWIO."""
    fan_in = shape[0] * shape[1] * shape[2]
    bound = 1.0 / np.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def torch_linear_kernel_init(key, shape, dtype=jnp.float32):
    """U(-b, b) with b = 1/sqrt(in_features); shape is (in, out)."""
    bound = 1.0 / np.sqrt(shape[0])
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def _torch_bias_init(fan_in: int):
    bound = 1.0 / np.sqrt(fan_in)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


class TorchConv(nn.Module):
    """Conv2d with torch default init for both kernel and bias."""

    features: int
    kernel: int
    stride: int = 1
    pad: Optional[int] = None
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        pad = (self.kernel - 1) // 2 if self.pad is None else self.pad
        in_ch = x.shape[-1]
        fan_in = in_ch * self.kernel * self.kernel
        kw = {}
        # W8A8 hook (ops/quant.module_amax): sow amax during calibration,
        # swap in the int8 conv when a calibrated scale is attached
        amax = quant_ops.module_amax(self, "amax", x)
        if amax is not None:
            kw["conv_general_dilated"] = quant_ops.flax_conv_fn(amax)
        return nn.Conv(
            features=self.features,
            kernel_size=(self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=((pad, pad), (pad, pad)),
            kernel_init=torch_conv_kernel_init,
            bias_init=_torch_bias_init(fan_in),
            dtype=self.dtype,
            name="conv",
            **kw,
        )(x)


class TorchLinear(nn.Module):
    """Linear with torch default init."""

    features: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        fan_in = x.shape[-1]
        return nn.Dense(
            features=self.features,
            kernel_init=torch_linear_kernel_init,
            bias_init=_torch_bias_init(fan_in),
            dtype=self.dtype,
            name="linear",
        )(x)


def BatchNorm(train: bool, dtype=None):
    """BatchNorm2d with torch eps/momentum defaults (eps 1e-5, momentum 0.1)."""
    return nn.BatchNorm(
        use_running_average=not train,
        momentum=0.9,
        epsilon=1e-5,
        dtype=dtype,
    )


class ConvTranspose2x(nn.Module):
    """torch ConvTranspose2d(k=3, s=2, p=1, output_padding=1): H -> 2H.

    Implemented as an input-dilated regular convolution
    (lhs_dilation=2, padding=(1,2)), which XLA lowers to an MXU-friendly
    transposed conv. The kernel is stored in HWIO of the *equivalent forward
    conv*; the torch checkpoint importer flips/transposes accordingly.
    Matches /root/reference/UNet_model_superres.py:185.
    """

    features: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        # torch fan_in for ConvTranspose2d(in,out,k) is out*k*k
        fan_in = self.features * 9
        kernel = self.param(
            "kernel",
            lambda key, shape, dtype=jnp.float32: jax.random.uniform(
                key, shape, dtype, -1.0 / np.sqrt(fan_in), 1.0 / np.sqrt(fan_in)
            ),
            (3, 3, in_ch, self.features),
        )
        bias = self.param("bias", _torch_bias_init(fan_in), (self.features,))
        dtype = self.dtype or x.dtype
        amax = quant_ops.module_amax(self, "amax", x)
        if amax is not None:
            y = quant_ops.conv_int8(
                x.astype(dtype), kernel.astype(dtype), amax,
                window_strides=(1, 1), padding=((1, 2), (1, 2)),
                lhs_dilation=(2, 2),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ).astype(dtype)
            return y + bias.astype(dtype)
        y = jax.lax.conv_general_dilated(
            x.astype(dtype),
            kernel.astype(dtype),
            window_strides=(1, 1),
            padding=((1, 2), (1, 2)),
            lhs_dilation=(2, 2),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return y + bias.astype(dtype)


def sinusoidal_time_embedding(t: jnp.ndarray, channels: int = 100, dtype=jnp.float32) -> jnp.ndarray:
    """Sinusoidal embedding of scalar timesteps, dim ``channels``.

    sin(t * inv_freq) ++ cos(t * inv_freq) with inv_freq =
    1/10000^(arange(0, C, 2)/C) — reference ``pos_encoding``
    (/root/reference/UNet_model_superres.py:328-335).
    """
    t = t.astype(dtype)[:, None]  # (B, 1)
    inv_freq = 1.0 / (
        10000.0 ** (jnp.arange(0, channels, 2, dtype=dtype) / channels)
    )
    ang = t * inv_freq[None, :]
    return jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=-1)


class TimeMLP(nn.Module):
    """Linear(time_dim, out) + SiLU + Linear(out, out) (reference _make_te)."""

    features: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, t_emb):
        h = TorchLinear(self.features, dtype=self.dtype, name="fc1")(t_emb)
        h = nn.silu(h)
        return TorchLinear(self.features, dtype=self.dtype, name="fc2")(h)


class ResConvBlock(nn.Module):
    """Residual conv block with time-bias injection and optional skip-image add.

    h = ReLU(BN(conv3x3(x))); h += conv3x3(x_skip) if given;
    h += ReLU(TimeMLP(t))[per-channel]; h = BN(conv3x3(h));
    out = ReLU(BN(conv1x1(x)) + h).
    Mirrors /root/reference/UNet_model_superres.py:110-172.
    """

    features: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, t_emb, x_skip=None, train: bool = False):
        h = TorchConv(self.features, 3, dtype=self.dtype, name="conv1")(x)
        h = BatchNorm(train, dtype=self.dtype)(h)
        h = nn.relu(h)

        # The skip conv exists in every block for param parity with the
        # reference (see module docstring); it is applied only when fed.
        skip_conv = TorchConv(self.features, 3, dtype=self.dtype, name="conv_skip")
        if x_skip is not None:
            h = h + skip_conv(x_skip)
        else:
            _ = skip_conv(jnp.zeros_like(x)) if self.is_initializing() else None

        te = nn.relu(TimeMLP(self.features, dtype=self.dtype, name="time_mlp")(t_emb))
        h = h + te[:, None, None, :]

        h = TorchConv(self.features, 3, dtype=self.dtype, name="conv2")(h)
        h = BatchNorm(train, dtype=self.dtype)(h)

        s = TorchConv(self.features, 1, dtype=self.dtype, name="shortcut_conv")(x)
        s = BatchNorm(train, dtype=self.dtype)(s)
        return nn.relu(s + h)


class AttentionGate(nn.Module):
    """Additive (Oktay-style) attention gate.

    g1 = conv1x1(g); x1 = conv2x2_s2(x)  [downsamples skip to gating res];
    psi = sigmoid(conv1x1(ReLU(g1 + x1))); psi upsampled x2 nearest and
    broadcast over channels; out = BN(conv1x1(psi * x)).
    Mirrors /root/reference/UNet_model_superres.py:57-108.

    ``use_pallas`` switches inference (train=False) to the single fused
    Pallas kernel in ops/pallas_kernels.py — one VMEM-resident program
    instead of four conv dispatches ('interpret' runs the same kernel in
    interpreter mode for CPU tests). Training always uses the XLA path
    (the fused kernel is forward-only and BN needs batch stats).
    """

    features: int  # f_int == f_x == f_g in all uses
    dtype: Optional[jnp.dtype] = None
    use_pallas: object = False  # False | True | 'interpret'

    def setup(self):
        self.w_g = TorchConv(self.features, 1, dtype=self.dtype)
        self.w_x = TorchConv(self.features, 2, stride=2, pad=0, dtype=self.dtype)
        self.psi = TorchConv(1, 1, dtype=self.dtype)
        self.result_conv = TorchConv(self.features, 1, dtype=self.dtype)
        self.BatchNorm_0 = nn.BatchNorm(momentum=0.9, epsilon=1e-5, dtype=self.dtype)

    def __call__(self, x, g, train: bool = False):
        if self.use_pallas and not train and not self.is_initializing():
            from diffusionremotesensing_tpu.ops.pallas_kernels import fused_attention_gate

            p = lambda m, leaf: m.variables["params"]["conv"][leaf]  # noqa: E731
            bn = self.BatchNorm_0.variables
            return fused_attention_gate(
                x, g,
                p(self.w_g, "kernel"), p(self.w_g, "bias"),
                p(self.w_x, "kernel"), p(self.w_x, "bias"),
                p(self.psi, "kernel"), p(self.psi, "bias"),
                p(self.result_conv, "kernel"), p(self.result_conv, "bias"),
                bn["params"]["scale"], bn["params"]["bias"],
                bn["batch_stats"]["mean"], bn["batch_stats"]["var"],
                interpret=self.use_pallas == "interpret",
            ).astype(x.dtype)
        g1 = self.w_g(g)
        x1 = self.w_x(x)
        psi = nn.relu(g1 + x1)
        psi = self.psi(psi)
        psi = nn.sigmoid(psi)
        psi = upsample_nearest(psi, 2)  # (B, Hx, Wx, 1), broadcasts over C
        out = self.result_conv(psi * x)
        return self.BatchNorm_0(out, use_running_average=not train)


class UpConvBlock(nn.Module):
    """Time-bias add + conv3x3 + BN + ReLU + ConvTranspose(k3,s2,op1) x2-upsample.

    Mirrors /root/reference/UNet_model_superres.py:174-207 (time bias is added
    *before* the conv here, unlike ResConvBlock).
    """

    features: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, t_emb, train: bool = False):
        te = nn.relu(TimeMLP(self.features, dtype=self.dtype, name="time_mlp")(t_emb))
        x = x + te[:, None, None, :]
        x = TorchConv(self.features, 3, dtype=self.dtype, name="conv")(x)
        x = BatchNorm(train, dtype=self.dtype)(x)
        x = nn.relu(x)
        return ConvTranspose2x(self.features, dtype=self.dtype, name="transform")(x)


class GatingSignal(nn.Module):
    """conv1x1 + BN + ReLU channel reduction (reference gating_signal)."""

    features: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = TorchConv(self.features, 1, dtype=self.dtype, name="conv")(x)
        x = BatchNorm(train, dtype=self.dtype)(x)
        return nn.relu(x)


class ResidualBlock(nn.Module):
    """conv3x3 + ReLU + conv3x3 with identity residual (condition encoder)."""

    features: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        h = nn.relu(TorchConv(self.features, 3, dtype=self.dtype, name="conv1")(x))
        h = TorchConv(self.features, 3, dtype=self.dtype, name="conv2")(h)
        return h + x


class RRDB(nn.Module):
    """Condition-image encoder: 3 chained ResidualBlocks + conv out + outer
    residual (reference RRDB, /root/reference/UNet_model_superres.py:244-260).
    Channel-preserving."""

    num_blocks: int = 3
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        ch = x.shape[-1]
        h = x
        for i in range(self.num_blocks):
            h = ResidualBlock(ch, dtype=self.dtype, name=f"block{i}")(h)
        h = TorchConv(ch, 3, dtype=self.dtype, name="conv_out")(h)
        return h + x

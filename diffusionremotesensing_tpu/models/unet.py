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



def _named_conv(label, x, w, padding, dt, strides=(1, 1), amax=None):
    with jax.named_scope(label):
        if amax is not None:
            # W8A8 static-scale path (ops/quant.py): engaged per site when a
            # calibrated activation scale is present in the "quant" collection
            from diffusionremotesensing_tpu.ops.quant import conv_int8

            return conv_int8(
                x.astype(dt), w.astype(dt), amax,
                window_strides=strides, padding=padding,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ).astype(dt)
        from diffusionremotesensing_tpu.ops.s2d import conv_s2d as _c
        return _c(x, w, padding, dt, strides=strides)

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
    # Space-to-depth execution of the full-resolution level at inference:
    # identical math, 4x the MXU lane occupancy (ops/s2d.py; the op profile
    # shows the 3-32-channel level-0 convs at 0.3-4% MFU otherwise).
    s2d: bool = False
    # s2d execution of the TRAINING forward as well: level-0 BatchNorms
    # compute batch statistics from the tap-reshaped tensors (identical
    # element multisets -> identical stats) and emit momentum-updated
    # running stats through the sown 's2d_stats' collection, which the
    # Trainer merges into state.batch_stats. Opt-in (fp-tolerance-equivalent
    # gradients, like --compute_dtype bfloat16).
    s2d_train: bool = False
    # Tap-structured Pallas conv for the s2d level-0 3x3s (ops/tap_conv.py):
    # skips the dense-s2d kernels' 75% structural-zero MACs via an in-VMEM
    # im2col (1.78x reference MACs instead of 4x). False | 'conv2' (only
    # blk_conv2, the profiled #1 op) | True (conv2 + the conv1/skip pair)
    # | 'block' (whole ResConvBlock-0 as one fused kernel, ops/tap_block.py)
    # | 'stem' ('block' extended downward through the stem: conv0 + bias +
    # cond-add fused into the same kernel, the loop-invariant cond arriving
    # as pre-sliced per-program slabs via encode_cond_stem — h_s never
    # exists in HBM; measurement in benchmarks/NOTES.md round-3)
    # | 'l1' ('block' plus fused s2d execution of level 1: s2d-emitting
    # down0, fused ResConvBlock-1, s2d down1/attention1 — measured 4% SLOWER
    # end-to-end than 'block' on TPU v5e; the d2s relayout of the s2d
    # attention-1 output dominates. Kept opt-in; benchmarks/NOTES.md round-3).
    # Exact math (golden tests); runs interpreted automatically off-TPU.
    tap44: object = False
    # Vertically-packed Pallas kernel for the two composed-head convs
    # (ops/packed_head.py): head_up4 + head_at produce only 4*out_dim output
    # lanes (12 of 128 — 9.4% MXU lane occupancy). Packing 8 vertically-
    # adjacent output pixels into the lane dim lifts occupancy 8x: the
    # kernel measures 224us vs the XLA pair's 419us standalone (72% of bf16
    # peak) — but is a measured END-TO-END NEGATIVE (7.94s vs 7.24s tile,
    # same tunnel window): the XLA pair's epilogue was carrying the fused
    # ancestral-step math + per-step RNG, which the Pallas barrier orphans
    # into a standalone 283us 12-lane f32 fusion (benchmarks/NOTES.md
    # round-3 packed-head entry). Kept opt-in (True) with exactness pinned;
    # default off. Requires H/2 % 8 == 0 (falls back to the XLA pair).
    packed_head: object = False
    # Fused Pallas program for the s2d stage-2 attention region
    # (ops/att_block.py): gating2 + the whole additive attention gate +
    # the composed head's 12-lane attn-branch conv as a V=8 packed matmul,
    # one read of res0_s/h, one packed write — the region runs as four
    # standalone HBM-bound XLA fusions (~490us/step incl. head_at) in the
    # round-3 profile. Inference only; takes precedence over packed_head's
    # pair kernel (head_at lives here); requires H/2 % 8 == 0 (falls back
    # to the XLA path). Measurement in benchmarks/NOTES.md round-3.
    fused_att: object = False
    # Fused Pallas program for the decoder tail (ops/dec_block.py): the
    # stage-1 concat conv + UpConvBlock-2 body (time bias, conv, BN, relu)
    # + the composed head_up4 as a V=8 packed matmul — ~1.13 ms/step of
    # 64-lane-limited convs and HBM round trips in the round-3 profile.
    # Inference only; composes with fused_att (which carries head_at) and
    # excludes packed_head; requires H/2 % 8 == 0 (falls back to the XLA
    # path). Measurement in benchmarks/NOTES.md round-3.
    dec_block: object = False

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

    # -------------------------------------------------------- s2d inference
    #
    # Level 0 (full resolution, 3-32 channels) evaluated in space-to-depth
    # layout: x viewed as (B, H/2, W/2, 4C). Kernels are assembled from the
    # untouched parity parameters at trace time (ops/s2d.py transforms, each
    # golden-tested against the direct op); BatchNorm/bias/time vectors tile
    # 4x over the taps. Levels 1+ run through the ordinary modules.

    def _p(self, mod, *path):
        v = mod.variables["params"]
        for k in path:
            v = v[k]
        return v

    def _bn_s2d(self, h, mod, bn_name, dt, train=False, updates=None,
                mod_name=None, taps=True):
        """Inference: running-stat normalization (tiled 4x over taps).
        Train: batch statistics — computed per ORIGINAL channel from the
        tap-reshaped tensor, so the values equal the normal-layout BN's stats
        exactly (same element multiset) — with flax's mean2-minus-mean^2
        formulation and 0.9-momentum running update recorded in ``updates``.
        ``taps=False`` handles s2d-branch BNs that run on normal layout."""
        p = mod.variables["params"][bn_name]
        s = mod.variables["batch_stats"][bn_name]
        rep = (lambda a: jnp.tile(a, 4)) if taps else (lambda a: a)
        if train:
            hf = h.astype(jnp.float32)
            if taps:
                b_, hh, ww, c4 = hf.shape
                hr = hf.reshape(b_, hh, ww, 4, c4 // 4)
                axes = (0, 1, 2, 3)
            else:
                hr, axes = hf, (0, 1, 2)
            mean = jnp.mean(hr, axes)
            var = jnp.mean(jnp.square(hr), axes) - jnp.square(mean)
            updates.setdefault(mod_name, {})[bn_name] = {
                "mean": 0.9 * s["mean"] + 0.1 * mean,
                "var": 0.9 * s["var"] + 0.1 * var,
            }
        else:
            mean, var = s["mean"], s["var"]
        return (h - rep(mean).astype(dt)) * jax.lax.rsqrt(
            rep(var).astype(dt) + jnp.asarray(1e-5, dt)
        ) * rep(p["scale"]).astype(dt) + rep(p["bias"]).astype(dt)

    def _time_bias(self, mod, t_emb, dt):
        """ReLU(TimeMLP(t_emb)) from a bound block's params, (B, F)."""
        p = mod.variables["params"]["time_mlp"]
        h = t_emb @ p["fc1"]["linear"]["kernel"].astype(dt) + p["fc1"]["linear"]["bias"].astype(dt)
        h = nn.silu(h)
        h = h @ p["fc2"]["linear"]["kernel"].astype(dt) + p["fc2"]["linear"]["bias"].astype(dt)
        return nn.relu(h)

    def _upconv2_plain_concat_perm(self) -> np.ndarray:
        """Input-channel permutation mapping the s2d kernel of up_conv2 from
        tap-interleaved layout to the PLAIN concat [s2d(up), s2d(attn)]
        (avoids a tap-aware shuffle of a 16MB activation every step by
        permuting the hoisted kernel once instead)."""
        c_up = self.up_channels[2]      # channels of the upsampled half
        c_at = self.up_channels[3]      # channels of the attention half
        c_tot = c_up + c_at
        perm = np.empty((4 * c_tot,), np.int64)
        for t in range(4):
            for c in range(c_tot):
                plain = t * c_up + c if c < c_up else 4 * c_up + t * c_at + (c - c_up)
                perm[plain] = t * c_tot + c
        return perm

    def prepare_s2d_kernels(self):
        """Assemble every s2d-transformed kernel once (pure function of the
        params) — samplers hoist this out of the reverse-diffusion scan; the
        in-loop fallback (s2d_kernels=None) rebuilds them per step."""
        from diffusionremotesensing_tpu.ops.s2d import (
            k1_to_blockdiag,
            k2s2_to_1x1,
            k3_to_s2d,
            k3_to_s2d44,
            k3s2_to_s2d,
            kT_to_s2d,
        )

        blk, att, up = self.conv_blocks[0], self.attentions[2], self.ups[2]
        k = {
            "conv0": k3_to_s2d(self._p(self.conv0, "conv", "kernel")),
            "blk_conv1": k3_to_s2d(self._p(blk, "conv1", "conv", "kernel")),
            "blk_skip": k3_to_s2d(self._p(blk, "conv_skip", "conv", "kernel")),
            "blk_conv2": k3_to_s2d(self._p(blk, "conv2", "conv", "kernel")),
            "blk_short": k1_to_blockdiag(self._p(blk, "shortcut_conv", "conv", "kernel")),
            "down0": k3s2_to_s2d(self._p(self.downs[0], "conv", "kernel")),
            "att_wx": k2s2_to_1x1(self._p(att, "w_x", "conv", "kernel")),
            "att_rc": k1_to_blockdiag(self._p(att, "result_conv", "conv", "kernel")),
        }
        if self.tap44 in ("block", "l1", "stem"):
            # monolithic fused ResConvBlock-0 kernel (ops/tap_block.py):
            # BN_0/BN_1/BN_2 fold into the conv weights here, so these are
            # functions of params AND batch_stats (still loop-invariant)
            from diffusionremotesensing_tpu.ops.tap_block import build_block_weights

            def bn(mod, name):
                p = mod.variables["params"][name]
                s = mod.variables["batch_stats"][name]
                return {"scale": p["scale"], "bias": p["bias"],
                        "mean": s["mean"], "var": s["var"]}

            k["tap_block"] = build_block_weights(
                self._p(blk, "conv1", "conv", "kernel"),
                self._p(blk, "conv1", "conv", "bias"),
                bn(blk, "BatchNorm_0"),
                self._p(blk, "conv_skip", "conv", "kernel"),
                self._p(blk, "conv_skip", "conv", "bias"),
                self._p(blk, "conv2", "conv", "kernel"),
                self._p(blk, "conv2", "conv", "bias"),
                bn(blk, "BatchNorm_1"),
                self._p(blk, "shortcut_conv", "conv", "kernel"),
                self._p(blk, "shortcut_conv", "conv", "bias"),
                bn(blk, "BatchNorm_2"),
            )
            if self.tap44 == "l1":
                # fused level-1 execution: down0 re-blocked to EMIT s2d, the
                # level-1 ResConvBlock as a second fused tap_block (its parity
                # skip conv is unused there — blocks.py:199-204), down1 and
                # attention1 consuming s2d via the existing transforms
                from diffusionremotesensing_tpu.ops.s2d import kdown_to_s2d_out

                blk1, att1 = self.conv_blocks[1], self.attentions[1]
                k["down0_s2d"] = kdown_to_s2d_out(k["down0"])
                k["tap_block1"] = build_block_weights(
                    self._p(blk1, "conv1", "conv", "kernel"),
                    self._p(blk1, "conv1", "conv", "bias"),
                    bn(blk1, "BatchNorm_0"),
                    None,
                    None,
                    self._p(blk1, "conv2", "conv", "kernel"),
                    self._p(blk1, "conv2", "conv", "bias"),
                    bn(blk1, "BatchNorm_1"),
                    self._p(blk1, "shortcut_conv", "conv", "kernel"),
                    self._p(blk1, "shortcut_conv", "conv", "bias"),
                    bn(blk1, "BatchNorm_2"),
                )
                k["down1_s2d"] = k3s2_to_s2d(self._p(self.downs[1], "conv", "kernel"))
                k["att1_wx"] = k2s2_to_1x1(self._p(att1, "w_x", "conv", "kernel"))
                k["att1_rc"] = k1_to_blockdiag(self._p(att1, "result_conv", "conv", "kernel"))
        elif self.tap44:
            # tap-structured variants for the Pallas path (measured −29% on
            # blk_conv2 standalone at the flagship shape, NOTES.md round-3)
            k["blk_conv2_44"] = k3_to_s2d44(self._p(blk, "conv2", "conv", "kernel"))
            if self.tap44 is True:
                k["blk_conv1_44"] = k3_to_s2d44(self._p(blk, "conv1", "conv", "kernel"))
                k["blk_skip_44"] = k3_to_s2d44(self._p(blk, "conv_skip", "conv", "kernel"))
        # HEAD COMPOSITION: up_conv2's output feeds ONLY the 1x1 output conv,
        # so the two linear layers compose into one 3x3 conv (kernel W@V,
        # bias V^T b + b_out) — exact algebra, and it removes the s2d path's
        # 4x MAC inflation from the model's single largest conv (96->32 3x3
        # at full res would cost ~29 GFLOP/step dense-s2d; composed 96->3 is
        # ~2.7 GFLOP). Equivalence pinned by tests/test_s2d_model.py.
        w_up = self._p(self.up_convs[2], "conv", "kernel")      # (3,3,96,32)
        b_up = self._p(self.up_convs[2], "conv", "bias")
        w_out = self._p(self.output, "conv", "kernel")[0, 0]    # (32, out)
        b_out = self._p(self.output, "conv", "bias")
        head = jnp.einsum("uvic,co->uvio", w_up, w_out)
        head_s2d = k3_to_s2d(head)[:, :, self._upconv2_plain_concat_perm(), :]
        n_up = 4 * self.up_channels[2]           # s2d channels of the up half
        H_up = head_s2d[:, :, :n_up, :]          # (3,3,4*64,4*out)
        k["head_at"] = head_s2d[:, :, n_up:, :]  # consumes attn_s directly

        # UP-BRANCH COMPOSITION: up2's ConvTranspose (as the s2d 2x2 conv
        # K2, pad (0,1)) feeds the head with NO nonlinearity between, so
        # head∘up2_T collapses to ONE 4x4 conv on the 64-ch `hh` (pad (1,2))
        # — ~4x fewer MACs for this pair and the (B,H/2,W/2,256) s2d
        # intermediate (100MB/step at the flagship shape) never exists.
        # Boundary: the head's SAME padding zeroes the whole intermediate at
        # row/col -1, while the composed conv sees x-padding there instead —
        # corrected exactly by subtracting two 1-wide strip convs (kernels
        # below) and per-edge bias terms (assembled shape-dependently in
        # _forward_s2d). Equivalence pinned by tests/test_s2d_model.py.
        K2 = kT_to_s2d(self._p(up, "transform", "kernel"))       # (2,2,64,256)
        K4 = jnp.zeros((4, 4) + (K2.shape[2], H_up.shape[3]), K2.dtype)
        for dy in range(3):
            for ky in range(2):
                for dx in range(3):
                    for kx in range(2):
                        K4 = K4.at[dy + ky, dx + kx].add(
                            jnp.einsum("im,mo->io", K2[ky, kx], H_up[dy, dx])
                        )
        k["head_up4"] = K4
        # top-row / left-col corrections: the composed conv's spurious
        # contribution through intermediate row/col -1 (see derivation above)
        k["head_fix_x"] = jnp.stack(
            [
                sum(
                    jnp.einsum("im,mo->io", K2[1, kx], H_up[0, dx])
                    for dx in range(3)
                    for kx in range(2)
                    if dx + kx == t
                )
                for t in range(4)
            ]
        )[None]  # (1, 4, 64, out4)
        k["head_fix_y"] = jnp.stack(
            [
                sum(
                    jnp.einsum("im,mo->io", K2[ky, 1], H_up[dy, 0])
                    for dy in range(3)
                    for ky in range(2)
                    if dy + ky == t
                )
                for t in range(4)
            ]
        )[:, None]  # (4, 1, 64, out4)
        # corner term double-subtracted by the two strips: add back once
        k["head_fix_c"] = jnp.einsum("im,mo->io", K2[1, 1], H_up[0, 0])
        # bias pieces: head's own (uniform over taps & space) + the up2_T
        # bias routed through each head tap (edge rows/cols see fewer taps —
        # the per-edge deficits are assembled into a bias frame at runtime)
        b_T = jnp.tile(self._p(up, "transform", "bias"), 4)       # (256,)
        k["head_b"] = jnp.tile(b_up @ w_out + b_out, 4)           # (out4,)
        if self.fused_att:
            # fused stage-2 attention + packed head_at (ops/att_block.py):
            # both inference BNs folded here, loop-invariant, hoisted with
            # the rest of the kernel dict
            from diffusionremotesensing_tpu.ops.att_block import build_att_weights

            gat, att = self.gatings[2], self.attentions[2]
            bnd = lambda m: {  # noqa: E731
                "scale": m.variables["params"]["BatchNorm_0"]["scale"],
                "bias": m.variables["params"]["BatchNorm_0"]["bias"],
                "mean": m.variables["batch_stats"]["BatchNorm_0"]["mean"],
                "var": m.variables["batch_stats"]["BatchNorm_0"]["var"],
            }
            k["att_fused"] = build_att_weights(
                self._p(gat, "conv", "conv", "kernel"),
                self._p(gat, "conv", "conv", "bias"),
                bnd(gat),
                self._p(att, "w_g", "conv", "kernel"),
                self._p(att, "w_g", "conv", "bias"),
                k["att_wx"],
                self._p(att, "w_x", "conv", "bias"),
                self._p(att, "psi", "conv", "kernel"),
                self._p(att, "psi", "conv", "bias"),
                k["att_rc"],
                self._p(att, "result_conv", "conv", "bias"),
                bnd(att),
                k["head_at"],
            )
        if self.dec_block:
            # fused decoder tail (ops/dec_block.py): concat conv +
            # UpConvBlock-2 body + packed head_up4; the UpConvBlock BN
            # folded here, loop-invariant, hoisted with the kernel dict
            from diffusionremotesensing_tpu.ops.dec_block import build_dec_weights

            k["dec"] = build_dec_weights(
                self._p(self.up_convs[1], "conv", "kernel"),
                self._p(self.up_convs[1], "conv", "bias"),
                self.up_channels[1],  # up-branch channels in the concat
                self._p(up, "conv", "conv", "kernel"),
                self._p(up, "conv", "conv", "bias"),
                {
                    "scale": up.variables["params"]["BatchNorm_0"]["scale"],
                    "bias": up.variables["params"]["BatchNorm_0"]["bias"],
                    "mean": up.variables["batch_stats"]["BatchNorm_0"]["mean"],
                    "var": up.variables["batch_stats"]["BatchNorm_0"]["var"],
                },
                k["head_up4"],
            )
        dt = self.dtype
        if dt is not None:
            k = jax.tree_util.tree_map(lambda a: a.astype(dt), k)
        # bias-tap table stays f32: reduced into the (small) bias frame at
        # runtime, where bf16 would cost visible precision on a pure constant
        k["head_bT_taps"] = jnp.einsum("uvmo,m->uvo", H_up, b_T)  # (3,3,out4)
        if self.packed_head:
            # slot-packed matmul weights for the fused head kernel
            # (ops/packed_head.py; loop-invariant, hoisted with the rest)
            from diffusionremotesensing_tpu.ops.packed_head import kpack_weights

            k["head_up4_p"] = kpack_weights(k["head_up4"])
            k["head_at_p"] = kpack_weights(k["head_at"])
        return k

    def _qconv(self, label, x, w, padding, dt, strides=(1, 1)):
        """_named_conv with the per-site W8A8 hook (ops/quant.module_amax —
        the same hook TorchConv/ConvTranspose2x apply in blocks.py)."""
        from diffusionremotesensing_tpu.ops.quant import module_amax

        return _named_conv(
            label, x, w, padding, dt, strides, amax=module_amax(self, label, x)
        )

    def _forward_s2d(self, x, t_emb, cond_features, train, kern=None, s2d_io=False):
        from diffusionremotesensing_tpu.ops.s2d import (
            conv_s2d,
            depth_to_space,
            space_to_depth,
        )

        if kern is None:
            kern = self.prepare_s2d_kernels()

        dt = self.dtype or x.dtype
        SAME = ((1, 1), (1, 1))
        tile = lambda a: jnp.tile(a, 4).astype(dt)  # noqa: E731
        updates = {}  # train-mode BN running-stat updates, sown at the end

        # s2d_io: caller keeps the diffusion state in s2d layout across the
        # whole sampling scan (no per-step layout shuffles of x / eps).
        xs = x.astype(dt) if s2d_io else space_to_depth(x.astype(dt))

        # ---- ResConvBlock 0 in s2d (blocks.py:180-214 semantics)
        # tap44: the 3x3s run through the tap-structured Pallas kernel
        # (inference only — the training forward keeps the differentiable
        # XLA path); interpret mode automatically off-TPU so the exact same
        # code path is test-covered on CPU.
        use_tap = bool(self.tap44) and not train
        tap_level = self.tap44
        if use_tap and tap_level == "stem":
            # stem shape guard: the row-partitioned stem kernel's slab
            # intermediates scale with W2 (stem_fits_vmem); past the budget
            # demote to 'block' — the same ResConvBlock-0 fusion minus the
            # conv0 absorb, numerically identical (tests/test_tap_stem.py) —
            # and let the block guard below decide the rest. The hoisted
            # 5-D cond slabs are inverted back to flat features below.
            from diffusionremotesensing_tpu.ops.tap_block import stem_fits_vmem

            if not stem_fits_vmem(xs.shape[1], xs.shape[2],
                                  jnp.dtype(dt).itemsize):
                tap_level = "block"
        if use_tap and tap_level != "stem":
            # shape guard: the (B, 2)-grid tap kernels hold whole (H2, W2)
            # blocks in VMEM — past the scoped-vmem budget (e.g. whole-tile
            # aggregation, one 256px-LR patch = a (1, 256, 256, 4C) s2d
            # program) fall back to the dense-s2d XLA path, which is
            # numerically identical (tests/test_s2d_model.py). 'stem' has
            # its own guard above (row-partitioned grid, different scaling).
            from diffusionremotesensing_tpu.ops.tap_block import tap_block_fits_vmem

            use_tap = tap_block_fits_vmem(
                xs.shape[1], xs.shape[2],
                kern["conv0"].shape[-1], kern["tap_block"]["w2"].shape[1]
                if "tap_block" in kern else kern["conv0"].shape[-1],
                jnp.dtype(dt).itemsize, batch=xs.shape[0],
            )
        if use_tap:
            interp = jax.default_backend() != "tpu"
        blk = self.conv_blocks[0]
        if use_tap and tap_level == "stem":
            # fused stem: conv0 + bias + cond-add + the whole ResConvBlock-0
            # in one kernel — h_s never exists in HBM. The loop-invariant
            # bias/cond slabs arrive pre-assembled from encode_cond_stem
            # (5-D) when sampling; any other caller (tests, direct apply)
            # gets them built here from the 4-D features.
            from diffusionremotesensing_tpu.ops.tap_block import (
                build_cond_slabs,
                tap_stem_block,
            )

            if cond_features is not None and cond_features.ndim == 5:
                condb = cond_features
            else:
                # bias-only slabs (no condition image) are batch-invariant:
                # build at B=1 so they stay a loop constant under sampling
                # scans instead of a per-step (B,NH,...) assembly
                condb = build_cond_slabs(
                    tile(self._p(self.conv0, "conv", "bias")),
                    xs.shape[0] if cond_features is not None else 1,
                    xs.shape[1], xs.shape[2],
                    cond_s2d=cond_features, dtype=dt,
                )
            te = self._time_bias(blk, t_emb.astype(dt), dt)
            with jax.named_scope("s2d.tap_stem0"):
                res0_s = tap_stem_block(
                    xs, condb, jnp.tile(te, (1, 4)), kern["tap_block"],
                    kern["conv0"], interpret=interp,
                )
            return self._forward_s2d_tail(res0_s, t_emb, train, kern, s2d_io, dt, updates)

        h_s = self._qconv("s2d.conv0", xs, kern["conv0"], SAME, dt)
        if cond_features is not None and cond_features.ndim == 5:
            # demoted-stem path: the caller hoisted encode_cond_stem's
            # (B, NH, ROWS+4, W2, C14) slabs, which carry conv0-bias + cond
            # COMBINED. Recover the flat base exactly — the interior rows of
            # each slab invert build_cond_slabs — instead of re-adding
            # bias/cond separately.
            nh = cond_features.shape[1]
            rows = xs.shape[1] // nh
            # slabs are contiguous row windows [i*rows, i*rows+rows) plus a
            # 2-row halo, so stacking the interiors is one reshape
            interior = cond_features[:, :, 2 : 2 + rows]
            h_s = h_s + interior.reshape(
                interior.shape[0], nh * rows, *interior.shape[3:]
            ).astype(dt)
        else:
            h_s = h_s + tile(self._p(self.conv0, "conv", "bias"))
            if cond_features is not None:
                h_s = h_s + cond_features.astype(dt)  # already s2d (see encode_cond_s2d)
        x_skip_s = h_s
        if use_tap and tap_level in ("block", "l1"):
            # whole ResConvBlock-0 in one fused kernel; skip to down0
            from diffusionremotesensing_tpu.ops.tap_block import tap_block

            te = self._time_bias(blk, t_emb.astype(dt), dt)
            with jax.named_scope("s2d.tap_block0"):
                res0_s = tap_block(
                    h_s, jnp.tile(te, (1, 4)), kern["tap_block"], interpret=interp
                )
            return self._forward_s2d_tail(res0_s, t_emb, train, kern, s2d_io, dt, updates)
        if use_tap:
            from diffusionremotesensing_tpu.ops.tap_conv import tap_conv, tap_conv_pair
        if use_tap and tap_level is True:
            with jax.named_scope("s2d.tap_conv1_skip"):
                h, h_sk = tap_conv_pair(
                    h_s, kern["blk_conv1_44"], kern["blk_skip_44"], interpret=interp
                )
        else:
            h = self._qconv("s2d.blk_conv1", h_s, kern["blk_conv1"], SAME, dt)
            h_sk = None
        h = h + tile(self._p(blk, "conv1", "conv", "bias"))
        h = nn.relu(self._bn_s2d(h, blk, "BatchNorm_0", dt, train, updates, "conv_block0"))
        if h_sk is None:
            h_sk = self._qconv("s2d.blk_skip", x_skip_s, kern["blk_skip"], SAME, dt)
        h = h + h_sk + tile(self._p(blk, "conv_skip", "conv", "bias"))
        te = self._time_bias(blk, t_emb.astype(dt), dt)  # (B, 32)
        h = h + jnp.tile(te, (1, 4))[:, None, None, :]
        if use_tap:
            with jax.named_scope("s2d.tap_conv2"):
                h = tap_conv(h, kern["blk_conv2_44"], interpret=interp)
        else:
            h = self._qconv("s2d.blk_conv2", h, kern["blk_conv2"], SAME, dt)
        h = h + tile(self._p(blk, "conv2", "conv", "bias"))
        h = self._bn_s2d(h, blk, "BatchNorm_1", dt, train, updates, "conv_block0")
        s = self._qconv("s2d.blk_short", x_skip_s, kern["blk_short"], "VALID", dt) + tile(self._p(blk, "shortcut_conv", "conv", "bias"))
        s = self._bn_s2d(s, blk, "BatchNorm_2", dt, train, updates, "conv_block0")
        res0_s = nn.relu(s + h)
        return self._forward_s2d_tail(res0_s, t_emb, train, kern, s2d_io, dt, updates)

    def _attention_s2d(self, att, x_s2d, g, wx_kern, rc_kern, dt, train,
                       updates, stats_name, label):
        """AttentionGate with the skip input in s2d layout (blocks.py:217-266
        semantics; reference /root/reference/UNet_model_superres.py:57-108):
        w_x's 2x2/s2 conv == one 1x1 conv over the 4 taps (k2s2_to_1x1),
        psi's nearest x2 upsample == broadcast over the taps, result_conv ==
        block-diagonal 1x1. Returns the gated result in s2d layout."""
        g1 = self._qconv(f"{label}_wg", g, self._p(att, "w_g", "conv", "kernel"), "VALID", dt)
        g1 = g1 + self._p(att, "w_g", "conv", "bias").astype(dt)
        x1 = self._qconv(f"{label}_wx", x_s2d, wx_kern, "VALID", dt) + self._p(
            att, "w_x", "conv", "bias"
        ).astype(dt)
        psi = nn.relu(g1 + x1)
        psi = self._qconv(f"{label}_psi", psi, self._p(att, "psi", "conv", "kernel"), "VALID", dt)
        psi = nn.sigmoid(psi + self._p(att, "psi", "conv", "bias").astype(dt))
        attn_s = self._qconv(f"{label}_rc", x_s2d * psi, rc_kern, "VALID", dt) + jnp.tile(
            self._p(att, "result_conv", "conv", "bias"), 4
        ).astype(dt)
        return self._bn_s2d(attn_s, att, "BatchNorm_0", dt, train, updates, stats_name)

    def _forward_s2d_tail(self, res0_s, t_emb, train, kern, s2d_io, dt, updates):
        """Everything after ResConvBlock-0: down0, levels 1+, up stage 2 and
        the composed head — shared by the XLA/tap_conv path and the fused
        tap_block path."""
        from diffusionremotesensing_tpu.ops.s2d import depth_to_space

        SAME = ((1, 1), (1, 1))
        tile = lambda a: jnp.tile(a, 4).astype(dt)  # noqa: E731

        use_l1 = self.tap44 == "l1" and not train
        if use_l1:
            # same scoped-vmem shape guard as level 0 (level-1 shape/channels)
            from diffusionremotesensing_tpu.ops.tap_block import tap_block_fits_vmem

            use_l1 = tap_block_fits_vmem(
                res0_s.shape[1] // 2, res0_s.shape[2] // 2,
                kern["down0_s2d"].shape[-1], kern["tap_block1"]["w2"].shape[1],
                jnp.dtype(dt).itemsize, batch=res0_s.shape[0],
            )
        res1 = res1_s = None
        if use_l1:
            # ---- fused level-1 (tap44='l1'): down0 re-blocked to emit the
            # s2d of ITS OUTPUT (1.14x MACs for 4x output lanes), the level-1
            # ResConvBlock as a second fused tap_block kernel, down1 via the
            # stride-2 s2d transform (emits the normal level-2 input directly)
            from diffusionremotesensing_tpu.ops.tap_block import tap_block

            interp = jax.default_backend() != "tpu"
            blk1 = self.conv_blocks[1]
            b1_in = self._qconv(
                "s2d.down0s", res0_s, kern["down0_s2d"], ((1, 0), (1, 0)), dt,
                strides=(2, 2),
            ) + tile(self._p(self.downs[0], "conv", "bias"))
            te1 = self._time_bias(blk1, t_emb.astype(dt), dt)
            with jax.named_scope("s2d.tap_block1"):
                res1_s = tap_block(
                    b1_in, jnp.tile(te1, (1, 4)), kern["tap_block1"],
                    interpret=interp,
                )
            h = self._qconv(
                "s2d.down1", res1_s, kern["down1_s2d"], ((1, 0), (1, 0)), dt
            ) + self._p(self.downs[1], "conv", "bias").astype(dt)
        else:
            # ---- down0: 3x3 stride-2 conv == 2x2 s2d conv; output leaves s2d
            h = self._qconv("s2d.down0", res0_s, kern["down0"], ((1, 0), (1, 0)), dt) + self._p(
                self.downs[0], "conv", "bias"
            ).astype(dt)
            res1 = h = self.conv_blocks[1](h, t_emb, None, train=train)
            h = self.downs[1](h)

        # ---- level 2 and bottleneck through the ordinary modules
        res2 = h = self.conv_blocks[2](h, t_emb, None, train=train)
        h = self.downs[2](h)
        h = self.bottle_neck(h, t_emb, None, train=train)

        # ---- up stage 0 (level-2 skip)
        g = self.gatings[0](h, train=train)
        attn = self.attentions[0](res2, g, train=train)
        h = self.ups[0](h, t_emb, train=train)
        h = jnp.concatenate([h, attn], axis=-1)
        h = self.up_convs[0](h)

        # ---- up stage 1 (level-1 skip; s2d attention when fused)
        g = self.gatings[1](h, train=train)
        if use_l1:
            attn = depth_to_space(
                self._attention_s2d(
                    self.attentions[1], res1_s, g, kern["att1_wx"],
                    kern["att1_rc"], dt, train, updates, "attention1",
                    "s2d.att1",
                )
            )
        else:
            attn = self.attentions[1](res1, g, train=train)
        hup = self.ups[1](h, t_emb, train=train)
        # dec_block: stage-1 concat conv + UpConvBlock-2 body + packed
        # head_up4 as ONE Pallas program (ops/dec_block.py); h still comes
        # back to HBM for the gating branch, hh only as its boundary-fix
        # strips. Falls back to the XLA chain on non-multiple-of-8 rows.
        use_dec = (
            not train
            and bool(self.dec_block)
            and "dec" in kern
            and hup.shape[1] % 8 == 0
        )
        if use_dec:
            # shape guard: the per-sample program holds whole (H, W) blocks
            # in VMEM — whole-tile shapes fall back to the XLA chain
            # (numerically identical, tests/test_dec_block.py)
            from diffusionremotesensing_tpu.ops.dec_block import dec_block_fits_vmem

            use_dec = dec_block_fits_vmem(
                hup.shape[1], hup.shape[2], hup.shape[3], attn.shape[3],
                kern["dec"]["ba"].shape[0], jnp.dtype(dt).itemsize,
            )
        if use_dec:
            from diffusionremotesensing_tpu.ops.dec_block import dec_block as _dec

            te2 = self._time_bias(self.ups[2], t_emb.astype(dt), dt)
            with jax.named_scope("s2d.dec_block"):
                h, hh_row0, hh_col0, out_p = _dec(
                    hup, attn, te2, kern["dec"],
                    interpret=jax.default_backend() != "tpu",
                )
        else:
            h = self.up_convs[1](jnp.concatenate([hup, attn], axis=-1))

        # ---- up stage 2: gate + UpConvBlock + concat-conv, level-0 in s2d
        # fused_att: gating2 + the whole attention gate + the packed head_at
        # conv as ONE Pallas program (ops/att_block.py) — attn_s never
        # exists in HBM. Falls back to the XLA chain when rows don't split
        # into whole packed groups.
        use_fa = (
            not train
            and bool(self.fused_att)
            and "att_fused" in kern
            and res0_s.shape[1] % 8 == 0
        )
        if use_fa:
            # shape guard: the per-sample program holds whole (Hg, Wg) blocks
            # in VMEM — whole-tile shapes fall back to the XLA chain
            # (numerically identical, tests/test_att_block.py)
            from diffusionremotesensing_tpu.ops.att_block import att_block_fits_vmem

            use_fa = att_block_fits_vmem(
                res0_s.shape[1], res0_s.shape[2], res0_s.shape[3],
                h.shape[3], jnp.dtype(dt).itemsize,
            )
        if use_fa:
            from diffusionremotesensing_tpu.ops.att_block import (
                att_head_block,
                unpack_v8,
            )

            with jax.named_scope("s2d.att_head"):
                at_p = att_head_block(
                    res0_s, h, kern["att_fused"],
                    interpret=jax.default_backend() != "tpu",
                )
            head_at_out = unpack_v8(at_p, kern["head_at"].shape[3])
        else:
            g = self.gatings[2](h, train=train)
            attn_s = self._attention_s2d(
                self.attentions[2], res0_s, g, kern["att_wx"], kern["att_rc"],
                dt, train, updates, "attention2", "s2d.att",
            )

        if not use_dec:
            up = self.ups[2]
            te = self._time_bias(up, t_emb.astype(dt), dt)
            hh = h + te[:, None, None, :]
            hh = self._qconv("s2d.up2_conv", hh, self._p(up, "conv", "conv", "kernel"), SAME, dt)
            hh = hh + self._p(up, "conv", "conv", "bias").astype(dt)
            hh = self._bn_s2d(hh, up, "BatchNorm_0", dt, train, updates, "up2", taps=False)
            hh = nn.relu(hh)
            hh_row0, hh_col0 = hh[:, :1], hh[:, :, :1]

        # head ∘ ConvTranspose composed into ONE 4x4 conv on the 64-ch hh
        # (~4x fewer MACs than up2_T + head; the (B,H/2,W/2,256) s2d
        # intermediate never exists) plus the head's attn-branch 3x3 on
        # attn_s. Derivation and boundary analysis in prepare_s2d_kernels.
        # With packed_head, the pair runs as ONE vertically-packed Pallas
        # matmul kernel (8x the 9.4% lane occupancy — ops/packed_head.py).
        use_ph = (
            not train
            and bool(self.packed_head)
            and not use_fa  # head_at already lives in the fused-att kernel
            and not use_dec  # head_up4 already lives in the dec kernel
            and "head_up4_p" in kern
            and hh.shape[1] % 8 == 0
        )
        if use_ph:
            from diffusionremotesensing_tpu.ops.packed_head import packed_head

            with jax.named_scope("s2d.packed_head"):
                out_s = packed_head(
                    hh, attn_s, kern["head_up4_p"], kern["head_at_p"],
                    interpret=jax.default_backend() != "tpu",
                )
        else:
            if use_dec:
                from diffusionremotesensing_tpu.ops.att_block import unpack_v8 as _upk

                out_s = _upk(out_p, kern["head_at"].shape[3])
            else:
                out_s = self._qconv("s2d.head_up4", hh, kern["head_up4"], ((1, 2), (1, 2)), dt)
            if use_fa:
                out_s = out_s + head_at_out
            else:
                out_s = out_s + self._qconv("s2d.head_at", attn_s, kern["head_at"], SAME, dt)
        # boundary corrections: the composed conv leaks x-padding through
        # intermediate row/col -1, which the uncomposed head zeroed out
        fix_t = self._qconv("s2d.head_fix_x", hh_row0, kern["head_fix_x"], ((0, 0), (1, 2)), dt)
        fix_l = self._qconv("s2d.head_fix_y", hh_col0, kern["head_fix_y"], ((1, 2), (0, 0)), dt)
        out_s = out_s.at[:, :1].add(-fix_t).at[:, :, :1].add(-fix_l)
        # the two strips double-subtract the (0,0) corner term — re-add once
        out_s = out_s.at[:, :1, :1].add(
            jnp.einsum("bi,io->bo", hh_row0[:, 0, 0], kern["head_fix_c"])[:, None, None]
        )
        # bias frame: the head's own bias is uniform; the ConvTranspose bias
        # flows through only the head taps whose intermediate row/col is in
        # range, so edge rows/cols see fewer taps (constant-folded per shape)
        taps = kern["head_bT_taps"]                              # (3,3,out4) f32
        Hs, Ws = out_s.shape[1], out_s.shape[2]
        rows = jnp.ones((Hs, 3)).at[0, 0].set(0.0).at[Hs - 1, 2].set(0.0)
        cols = jnp.ones((Ws, 3)).at[0, 0].set(0.0).at[Ws - 1, 2].set(0.0)
        frame = jnp.einsum("yu,xv,uvo->yxo", rows, cols, taps)
        out_s = out_s.astype(jnp.float32) + (frame + kern["head_b"].astype(jnp.float32))[None]
        if train and updates:
            # the Trainer merges these into state.batch_stats (the flax
            # mutable mechanism can't reach grandchild collections from here)
            self.sow("s2d_stats", "updates", updates)
        return out_s if s2d_io else depth_to_space(out_s)

    def encode_cond_s2d(self, cond):
        """encode_cond + space_to_depth: the hoisted condition features for
        the s2d inference path (sampling hoists this out of the scan)."""
        from diffusionremotesensing_tpu.ops.s2d import space_to_depth

        return space_to_depth(self.encode_cond(cond))

    def encode_cond_stem(self, cond):
        """encode_cond_s2d + the conv0-bias/cond slab assembly consumed by
        the fused stem kernel (tap44='stem'): everything loop-invariant
        about h_s, pre-sliced into the kernel grid's overlapping row
        windows. Hoisted out of the sampling scan by make_process."""
        from diffusionremotesensing_tpu.ops.tap_block import build_cond_slabs

        feats = self.encode_cond_s2d(cond)
        dt = self.dtype or feats.dtype
        b0 = jnp.tile(self._p(self.conv0, "conv", "bias"), 4).astype(dt)
        return build_cond_slabs(
            b0, feats.shape[0], feats.shape[1], feats.shape[2],
            cond_s2d=feats, dtype=dt,
        )

    def __call__(
        self, x, t, cond=None, cond_mask=None, train: bool = False,
        cond_features=None, s2d_kernels=None, s2d_io: bool = False,
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

        use_s2d_now = (self.s2d and not train) or (self.s2d_train and train)
        if use_s2d_now and not self.is_initializing():
            if self.conditioning in ("superres", "sar") and cond_features is None:
                if cond is None:
                    raise ValueError(
                        f"conditioning={self.conditioning!r} requires a condition image"
                    )
                cond_features = self.encode_cond_s2d(cond)
            # NOTE: with s2d enabled, hoisted cond_features must come from
            # encode_cond_s2d (s2d layout) — shapes fail loudly otherwise.
            return self._forward_s2d(
                x, t_emb, cond_features, train, kern=s2d_kernels, s2d_io=s2d_io
            )

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


# Canonical CLI/env spelling -> model-kwarg value for the tap44 kernel level.
# Single source of truth for cli.py --tap44, Aggregation_Sampling.py choices,
# bench.py DRS_TAP44 and learning_check's gate knob — a new level is added
# HERE once and every surface picks it up.
TAP44_LEVELS = {
    "off": False,        # bit-reference dense-s2d execution
    "conv2": "conv2",    # tap kernel on blk_conv2 only
    "full": True,        # tap kernels on conv0/blk_conv1/blk_conv2
    "block": "block",    # fused whole-ResConvBlock-0 kernel (TPU default)
    "stem": "stem",      # conv0 + cond-add + block-0 in one program (opt-in)
    "l1": "l1",          # + fused s2d encoder level 1 (opt-in, measured -4%)
}


def resolve_tap44(name=None, device=None) -> object:
    """Map a ``--tap44``/``DRS_TAP44`` spelling to the model kwarg.

    ``None``/""/"auto" defer to :func:`default_tap44` (fused-block kernel on
    TPU, off elsewhere); any other value must be a :data:`TAP44_LEVELS` key.
    An explicit level is demoted to off (with a note) when the computation's
    committed ``device`` cannot execute Mosaic kernels
    (:func:`pallas_device_ok` — e.g. ``--tap44 block --device cpu`` on a
    TPU-default host, where interpret mode would not engage).
    """
    if not name or name == "auto":
        return default_tap44(device)
    try:
        level = TAP44_LEVELS[name]
    except KeyError:
        # argparse `choices` protects the CLIs, but the documented env A/B
        # surface (DRS_TAP44 on bench.py / learning_check) reaches here raw —
        # a typo should fail with the valid spellings, not a bare KeyError
        # after the snapshot load and TPU wait already ran.
        raise ValueError(
            f"unknown tap44 level {name!r} (--tap44 / DRS_TAP44); valid: "
            f"{', '.join(TAP44_LEVELS)}, or 'auto'"
        ) from None
    if level and device is not None and not pallas_device_ok(device):
        print(
            f"--tap44 {name} requires a TPU-compatible device (computation "
            f"is committed to {device.platform}); using the dense-s2d path."
        )
        return False
    return level


def default_tap44(device=None) -> object:
    """Default tap44 level for inference surfaces: the fused-block Pallas
    kernel on TPU (measured −4% sampler step at the flagship shape,
    benchmarks/NOTES.md round-3), off elsewhere — interpret-mode Pallas
    would slow CPU runs/tests. Pass the device the computation will be
    COMMITTED to when it may differ from the default backend (e.g.
    ``--device cpu`` on a TPU host — compiling the Mosaic kernel for a CPU
    device would fail). Opt out with tap44=False (bit-reference s2d
    execution) wherever a surface forwards the kwarg."""
    try:
        platform = device.platform if device is not None else jax.default_backend()
        return "block" if platform == "tpu" else False
    except Exception:  # pragma: no cover - backend probing never raises in practice
        return False


def pallas_device_ok(device=None) -> bool:
    """Whether the opt-in Mosaic kernel flags (fused_att / dec_block /
    packed_head) can execute for a computation committed to ``device``.

    The model picks interpret mode from ``jax.default_backend()``
    (_forward_s2d), so the one broken combination is a non-TPU committed
    device on a TPU-default host (e.g. ``--device cpu`` under the
    sitecustomize-pinned remote TPU): interpret stays False while the
    program compiles for the CPU device, which Mosaic cannot do. Mirrors
    :func:`default_tap44`'s device-awareness for the boolean kernel flags."""
    try:
        platform = device.platform if device is not None else jax.default_backend()
        return platform == "tpu" or jax.default_backend() != "tpu"
    except Exception:  # pragma: no cover - backend probing never raises in practice
        return False


# Shared by every surface that gates the fused ancestral-update kernel
# (cli._gate_kernel_flags demotes with a note; bench.py / learning_check's
# DRS_FUSED_UPDATE A/B knob hard-errors) so the rule lives in one place.
FUSED_UPDATE_NEEDS_TPU = (
    "DRS_FUSED_UPDATE=1 needs a real TPU (the in-kernel PRNG has no "
    "interpret-mode lowering); unset it or drop DRS_FORCE_CPU."
)


def fused_update_device_ok(device=None) -> bool:
    """Whether the fused ancestral-update kernel (ops/fused_update.py) can
    run for a computation committed to ``device``: real TPU only — its
    hardware PRNG (pltpu.prng_seed) has no interpret-mode lowering, so
    unlike the other kernels there is no off-TPU execution path for the
    sampler's in-kernel noise draw."""
    try:
        platform = device.platform if device is not None else jax.default_backend()
        return platform == "tpu"
    except Exception:  # pragma: no cover - backend probing never raises in practice
        return False


def residual_attention_unet_superres(
    image_channels: int = 3,
    out_dim: int = 3,
    magnification_factor: int = 2,
    dtype=None,
    use_pallas=False,
    s2d: bool = False,
    s2d_train: bool = False,
    tap44: object = False,
    packed_head: object = False,
    fused_att: object = False,
    dec_block: object = False,
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
        s2d=s2d,
        s2d_train=s2d_train,
        tap44=tap44,
        packed_head=packed_head,
        fused_att=fused_att,
        dec_block=dec_block,
    )


def residual_attention_unet_sar_to_ndvi(
    sar_channels: int = 2,
    ndvi_channels: int = 1,
    dtype=None,
    s2d: bool = False,
    s2d_train: bool = False,
    tap44: object = False,
    packed_head: object = False,
    fused_att: object = False,
    dec_block: object = False,
) -> ResidualAttentionUNet:
    """SAR->NDVI UNet (ref UNet_model_SAR_TO_NDVI.py:263): SAR-image conditioned."""
    return ResidualAttentionUNet(
        conditioning="sar",
        image_channels=ndvi_channels,
        out_dim=ndvi_channels,
        cond_channels=sar_channels,
        dtype=dtype,
        s2d=s2d,
        s2d_train=s2d_train,
        tap44=tap44,
        packed_head=packed_head,
        fused_att=fused_att,
        dec_block=dec_block,
    )


def residual_attention_unet_generation(
    image_channels: int = 3,
    out_dim: int = 3,
    num_classes: Optional[int] = 10,
    dtype=None,
    s2d: bool = False,
    s2d_train: bool = False,
    tap44: object = False,
    packed_head: object = False,
    fused_att: object = False,
    dec_block: object = False,
) -> ResidualAttentionUNet:
    """Class-conditional UNet (ref UNet_model_generation.py:226) with CFG masking."""
    return ResidualAttentionUNet(
        conditioning="class",
        image_channels=image_channels,
        out_dim=out_dim,
        num_classes=num_classes,
        dtype=dtype,
        s2d=s2d,
        s2d_train=s2d_train,
        tap44=tap44,
        packed_head=packed_head,
        fused_att=fused_att,
        dec_block=dec_block,
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

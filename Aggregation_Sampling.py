"""Tiled super-resolution inference CLI (reference-parity flag surface).

Mirrors /root/reference/Aggregation_Sampling.py:207-227. The patch set is
denoised as a sharded batch instead of serially at batch 1 — see
diffusionremotesensing_tpu/aggregation.py.
"""

from diffusionremotesensing_tpu.aggregation import (  # noqa: F401  (library API re-export)
    AggregationSampler,
    gaussian_weights,
    patchify_coords,
)
from diffusionremotesensing_tpu.cli import launch_aggregation, str2bool

if __name__ == "__main__":
    import argparse
    import os

    parser = argparse.ArgumentParser(description=" ")
    parser.add_argument("--noise_schedule", type=str, default="cosine")
    parser.add_argument("--snapshot_name", type=str, default="snapshot.pt")
    parser.add_argument("--noise_steps", type=int, default=1500)
    parser.add_argument("--model_input_size", type=int, default=512)
    parser.add_argument("--model_name", type=str)
    parser.add_argument("--UNet_type", type=str)
    parser.add_argument("--Degradation_type", type=str)
    parser.add_argument("--device", type=str, default="cuda")
    parser.add_argument("--magnification_factor", type=int)
    parser.add_argument("--inp_out_channels", type=int, default=3)
    parser.add_argument("--patch_size", type=int, default=64)
    parser.add_argument("--stride", type=int, default=32)
    parser.add_argument("--destination_path", type=str)
    parser.add_argument("--img_lr_path", type=str)
    parser.add_argument("--img_lr_dir", type=str, default=None,
                        help="framework addition: super-resolve EVERY image in "
                             "this folder in one process (one compiled sampler, "
                             "startup amortized across the fleet); outputs keep "
                             "their basenames under --destination_dir. Unset = "
                             "reference single-image behavior via --img_lr_path")
    parser.add_argument("--destination_dir", type=str, default=None,
                        help="output folder for --img_lr_dir (falls back to "
                             "--destination_path interpreted as a folder)")
    # framework additions (optional; defaults preserve reference behavior)
    parser.add_argument("--batch_size", type=int, default=48,
                        help="patches denoised per jitted call (48 = measured "
                             "v5e optimum for the s2d sampler, benchmarks/NOTES.md)")
    parser.add_argument("--ddim_steps", type=int, default=None,
                        help="use DDIM with this many steps instead of the full DDPM chain")
    parser.add_argument("--ddim_eta", type=float, default=0.0)
    parser.add_argument("--ddim_spacing", type=str, default="linear",
                        choices=["linear", "quadratic"],
                        help="DDIM timestep subsequence spacing (quadratic "
                             "concentrates steps near t=0; better at few steps)")
    parser.add_argument("--ddim_clip_x0",
                        type=str2bool, nargs="?", const=True, default=True,
                        help="clamp the per-step DDIM x0 prediction to [0,1] "
                             "(default on: +2.1 dB / +0.027 SSIM at DDIM-100 on "
                             "the learning-gate model; --ddim_clip_x0 false disables)")
    parser.add_argument("--start_t", type=int, default=None,
                        help="truncated warm-start sampling (SDEdit/CCDF): each "
                             "patch starts from its q-sampled bicubic upsample "
                             "at this timestep instead of pure noise at T-1, so "
                             "only start_t reverse steps run (DDIM subsequences "
                             "squeeze into [1, start_t]). Quality/speed curve in "
                             "benchmarks/NOTES.md; unset = reference full chain")
    parser.add_argument("--s2d", type=str2bool, nargs="?", const=True, default=True,
                        help="space-to-depth inference execution (exact math, faster on TPU); --s2d false disables")
    parser.add_argument("--tap44", type=str, default="auto",
                        choices=["auto", "off", "conv2", "full", "block", "stem", "l1"],
                        help="tap-structured Pallas kernels for the s2d level-0 "
                             "convs (auto = fused-block kernel on TPU, off elsewhere)")
    parser.add_argument("--fused_update", type=str2bool, nargs="?", const=True, default=False,
                        help="fused Pallas ancestral update with the on-chip "
                             "hardware PRNG (TPU-only; same noise distribution, "
                             "different stream than the default threefry path; "
                             "DDPM only — rejected when combined with --ddim_steps)")
    parser.add_argument("--fused_att", type=str2bool, nargs="?", const=True, default=False,
                        help="fused Pallas stage-2 attention gate + packed "
                             "head_at (ops/att_block.py; exact math, TPU-only)")
    parser.add_argument("--dec_block", type=str2bool, nargs="?", const=True, default=False,
                        help="fused Pallas decoder tail: concat conv + "
                             "UpConvBlock-2 + packed head_up4 "
                             "(ops/dec_block.py; exact math, TPU-only)")
    parser.add_argument("--multiple_gpus", type=str2bool, nargs="?", const=True, default=False,
                        help="shard the patch batch across all local chips")
    parser.add_argument("--quant", type=str, default="none",
                        choices=["none", "int8"],
                        help="W8A8 static-calibration int8 execution "
                             "(ops/quant.py): calibrates activation scales on "
                             "this tile's own patches, then runs the hot convs "
                             "on the int8 MXU path. NOT fp-equivalent — "
                             "quality-gated in benchmarks/NOTES.md; default "
                             "off = the exact reference-parity path")
    args = parser.parse_args()
    args.snapshot_folder_path = os.path.join(os.curdir, "models_run", args.model_name, "weights")
    launch_aggregation(args)

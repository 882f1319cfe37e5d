"""Class-conditional generation training CLI (reference-parity flag surface).

Mirrors /root/reference/generate_new_imgs/train_diffusion_generation.py:641-668.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from diffusionremotesensing_tpu.cli import launch_generation, str2bool  # noqa: E402

if __name__ == "__main__":
    import argparse

    parser = argparse.ArgumentParser(description=" ")
    parser.add_argument("--epochs", type=int, default=501)
    parser.add_argument("--batch_size", type=int, default=32)
    parser.add_argument("--image_size", type=int, default=None)
    parser.add_argument("--lr", type=float, default=3e-4)
    parser.add_argument("--check_preds_epoch", type=int, default=20)
    parser.add_argument("--noise_schedule", type=str, default="cosine")
    parser.add_argument("--snapshot_name", type=str, default="snapshot.pt")
    parser.add_argument("--model_name", type=str)
    parser.add_argument("--noise_steps", type=int, default=200)
    parser.add_argument("--patience", type=int, default=10)
    parser.add_argument("--dataset_path", type=str, default=None)
    parser.add_argument("--inp_out_channels", type=int, default=3)
    parser.add_argument("--generate_video", type=str2bool, nargs="?", const=True, default=False)
    parser.add_argument("--loss", type=str)
    parser.add_argument("--UNet_type", type=str, default="Residual Attention UNet")
    parser.add_argument("--multiple_gpus", type=str2bool, nargs="?", const=True, default=False)
    parser.add_argument("--ema_smoothing", type=str2bool, nargs="?", const=True, default=False)
    # framework addition: bfloat16 compute for training (params stay float32)
    parser.add_argument("--compute_dtype", type=str, default="float32",
                        choices=["float32", "bfloat16"])
    parser.add_argument("--steps_per_dispatch", type=int, default=1,
                        help="train steps per device dispatch (K batches as one jitted "
                             "scan; same update sequence, Kx fewer host->device round "
                             "trips — wins only dispatch-bound small-image recipes: "
                             "+60%% at 64px/K=8, negative at >=128px; NOTES.md)")
    parser.add_argument("--num_workers", type=int, default=0,
                        help="data-loading threads (0 = synchronous)")
    parser.add_argument("--checkpoint_backend", type=str, default="msgpack",
                        choices=["msgpack", "orbax"],
                        help="snapshot writer: msgpack (single file, torch-interop default) "
                             "or orbax (async directory checkpoint; writes overlap training)")
    parser.add_argument("--profile_dir", type=str, default=None,
                        help="capture a jax.profiler trace of training into this dir")
    parser.add_argument("--vgg19_weights", type=str, default=None,
                        help="torch state_dict of torchvision vgg19.features (pretrained weights for MSE+Perceptual_noise)")
    parser.add_argument("--allow_random_vgg", type=str2bool, nargs="?", const=True, default=False,
                        help="allow MSE+Perceptual_noise with a fixed random VGG19 (NOT the reference's pretrained-feature semantics)")
    args = parser.parse_args()
    args.snapshot_folder_path = os.path.join("..", "models_run", args.model_name, "weights")
    launch_generation(args)

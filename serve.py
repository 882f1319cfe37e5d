"""HTTP serving CLI: micro-batched diffusion inference for the three task
families (diffusionremotesensing_tpu/serving.py).

No reference counterpart — the reference's inference is ad-hoc scripts
(/root/reference/superres_and_NDVIgen.py, Aggregation_Sampling.py,
generate_new_imgs/imgs_generator.py) — so this CLI's flag surface is the
framework's own. It serves the same models_run checkpoints behind

    POST /superres       {"image": <base64 PNG>}        -> SR image
    POST /sar_to_ndvi    {"image": <base64 PNG>}        -> NDVI map
    POST /generate       {"label": <int class>}         -> generated image
    POST /superres_tile  {"image": <base64 PNG>}        -> whole-scene tiled SR
    GET  /healthz

with concurrent requests micro-batched into one jitted sampler call.
Defaults follow the measured serving configuration (bf16 + s2d,
benchmarks/serving_bench.py); --compute_dtype float32 / --s2d false select
the bit-reference execution path.
"""

from diffusionremotesensing_tpu.cli import launch_serving, str2bool
from diffusionremotesensing_tpu.serving import InferenceServer  # noqa: F401  (library API re-export)

if __name__ == "__main__":
    import argparse

    parser = argparse.ArgumentParser(description=__doc__,
                                     formatter_class=argparse.RawDescriptionHelpFormatter)
    parser.add_argument("--task", type=str, default="superres",
                        choices=["superres", "sar_to_ndvi", "generation"])
    parser.add_argument("--model_name", type=str, default=None,
                        help="models_run registry name; sizes are parsed from "
                             "its magnificationN/LRimgsizeN/imgsizeN parts "
                             "unless overridden below")
    parser.add_argument("--snapshot_name", type=str, default="snapshot.pt")
    parser.add_argument("--snapshot_path", type=str, default=None,
                        help="explicit checkpoint path (overrides the "
                             "models_run/<model_name>/weights convention); "
                             "torch snapshot.pt files load transparently")
    parser.add_argument("--noise_schedule", type=str, default="cosine")
    parser.add_argument("--noise_steps", type=int, default=1500)
    parser.add_argument("--model_input_size", type=int, default=None,
                        help="model input size (HR size for superres); "
                             "default: parsed from model_name")
    parser.add_argument("--magnification_factor", type=int, default=None)
    parser.add_argument("--inp_out_channels", type=int, default=3)
    parser.add_argument("--num_classes", type=int, default=10)
    parser.add_argument("--device", type=str, default="cuda")
    parser.add_argument("--host", type=str, default="127.0.0.1")
    parser.add_argument("--port", type=int, default=8000)
    parser.add_argument("--max_batch", type=int, default=8,
                        help="micro-batch size (requests pad to this fixed "
                             "shape; one compiled sampler)")
    parser.add_argument("--max_wait_ms", type=float, default=10.0,
                        help="max time a request waits for batch-mates")
    parser.add_argument("--ddim_steps", type=int, default=None,
                        help="use DDIM with this many steps instead of the "
                             "full DDPM chain")
    parser.add_argument("--ddim_clip_x0", type=str2bool, nargs="?", const=True,
                        default=True,
                        help="clamp the per-step DDIM x0 prediction to [0,1] "
                             "(measured-best; --ddim_clip_x0 false disables)")
    parser.add_argument("--start_t", type=int, default=None,
                        help="superres only: truncated warm-start sampling — "
                             "requests start from the q-sampled bicubic "
                             "upsample at this timestep (SDEdit/CCDF), running "
                             "start_t steps instead of the full chain")
    parser.add_argument("--compute_dtype", type=str, default="bfloat16",
                        choices=["float32", "bfloat16"],
                        help="sampler computation dtype (params stay f32); "
                             "bfloat16 is the measured serving configuration")
    parser.add_argument("--s2d", type=str2bool, nargs="?", const=True, default=True,
                        help="space-to-depth inference execution (exact math, "
                             "faster on TPU); --s2d false disables")
    parser.add_argument("--quant", type=str, default="none",
                        choices=["none", "int8"],
                        help="W8A8 static-calibration int8 execution "
                             "(ops/quant.py; NOT fp-equivalent, quality-gated "
                             "in benchmarks/NOTES.md; default off = exact path)")
    parser.add_argument("--quant_calib_image", type=str, default=None,
                        help="representative input image for --quant int8 "
                             "calibration (recommended; default: smooth "
                             "synthetic proxy)")
    parser.add_argument("--data_parallel", type=str2bool, nargs="?", const=True,
                        default=False,
                        help="span all local devices with one server: params "
                             "replicate, micro-batches shard across the mesh "
                             "(max_batch must divide evenly)")
    parser.add_argument("--seed", type=int, default=None,
                        help="sampler PRNG seed; default draws fresh entropy "
                             "per process so restarted servers / load-balanced "
                             "replicas don't replay one noise sequence (pass "
                             "an int for reproducible serving)")
    parser.add_argument("--tap44", type=str, default="auto",
                        choices=["auto", "off", "conv2", "full", "block", "stem", "l1"])
    parser.add_argument("--fused_att", type=str2bool, nargs="?", const=True, default=False)
    parser.add_argument("--dec_block", type=str2bool, nargs="?", const=True, default=False)
    args = parser.parse_args()
    if not args.model_name and not args.snapshot_path:
        parser.error("pass --model_name (registry) or --snapshot_path")
    launch_serving(args)

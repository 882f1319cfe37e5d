"""TPU-native diffusion framework for remote sensing.

A ground-up JAX/XLA/Pallas/pjit rebuild of the capabilities of the PyTorch
reference ``AdrianoEttari/DiffusionRemoteSensing``: DDPM training and sampling
(linear/cosine schedules, EMA, classifier-free guidance) with a ~4.4M-param
Residual Attention UNet, for three remote-sensing tasks:

* Sentinel-2 super-resolution (DownBlur / DownBlurNoise / BSRGAN degradations)
* class-conditional image generation (EuroSAT-style folders, CIFAR10)
* SAR -> NDVI translation

plus StableSR-style aggregation sampling (overlapping-patch tiled inference
with Gaussian-weight blending), rebuilt as a batched, mesh-sharded workload.

Design (TPU-first, not a port):
* one conditioning-parameterized UNet (flax.linen, NHWC) replaces the
  reference's three copy-pasted model files
* one ``Diffusion`` engine; the reverse process is a single jitted
  ``lax.scan`` over timesteps instead of a Python loop of model calls
* data parallelism is ``jax.sharding.Mesh`` + NamedSharding (XLA collectives
  over ICI) instead of DDP/NCCL
* hot blocks have fused Pallas kernel paths (``ops.pallas_kernels``)
"""

__version__ = "0.1.0"

from diffusionremotesensing_tpu import schedules  # noqa: F401

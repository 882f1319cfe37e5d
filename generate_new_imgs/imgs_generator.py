"""Per-class image generation from the shipped generation checkpoint.

Mirrors /root/reference/generate_new_imgs/imgs_generator.py: loads
'Residual_Attention_UNet_generation_sentinel_data_crops', samples one image
per sorted EuroSAT class name with 1500 cosine steps, saves a 2x5 grid.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402


def main(s2d: bool = True, ddim_steps=None, ddim_clip_x0: bool = True):
    """s2d=False selects the bit-reference inference path (PARITY.md).

    ``ddim_steps``/``ddim_clip_x0``: optional DDIM fast path (framework
    addition); default None keeps the reference's 1499-step sampler."""
    import jax
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from diffusionremotesensing_tpu.io import load_snapshot
    from diffusionremotesensing_tpu.models.unet import (
        default_tap44,
        residual_attention_unet_generation,
    )

    noise_schedule = "cosine"
    input_channels = 3
    noise_steps = 1500
    model_name = "Residual_Attention_UNet_generation_sentinel_data_crops"
    snapshot_path = os.path.join("..", "models_run", model_name, "weights", "snapshot.pt")
    image_size = 64

    classes = sorted(
        ["Highway", "River", "HerbaceousVegetation", "Residential", "AnnualCrop",
         "Pasture", "Forest", "PermanentCrop", "Industrial", "SeaLake"]
    )

    model = residual_attention_unet_generation(
        image_channels=input_channels, out_dim=input_channels, num_classes=len(classes),
        s2d=s2d,  # fp-tolerance-equivalent fast path (tests/test_s2d_model.py)
        tap44=default_tap44() if s2d else False,
    )
    state, _ = load_snapshot(snapshot_path)
    variables = {"params": state["params"], "batch_stats": state.get("batch_stats", {})}

    from diffusionremotesensing_tpu.diffusion import make_process

    proc = make_process(model, noise_schedule, noise_steps, image_size)
    # one batched call generates all 10 classes at once, with the reference's
    # default classifier-free guidance (cfg_scale=3,
    # generate_new_imgs/train_diffusion_generation.py:206)
    labels = np.arange(len(classes), dtype=np.int32)
    preds = np.clip(
        np.asarray(proc.sample(variables, jax.random.PRNGKey(0), n=len(classes), cond=labels, cfg_scale=3.0,
                               ddim_steps=ddim_steps, ddim_clip_x0=ddim_clip_x0)),
        0, 1,
    )

    save_path = os.path.join("..", "models_run", model_name, "results", "generated_imgs")
    os.makedirs(os.path.dirname(save_path), exist_ok=True)
    fig, axs = plt.subplots(2, 5, figsize=(15, 6))
    axs = axs.ravel()
    for i, class_ in enumerate(classes):
        axs[i].imshow(preds[i])
        axs[i].axis("off")
        axs[i].set_title(class_, fontsize=12)
    plt.savefig(save_path, dpi=300, bbox_inches="tight", pad_inches=0)
    plt.close(fig)


if __name__ == "__main__":
    main()

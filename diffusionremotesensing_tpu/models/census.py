"""Per-layer parameter census, like the reference models' __main__ smoke
blocks (/root/reference/UNet_model_superres.py:659-681)."""

from __future__ import annotations

import jax
import numpy as np


def parameter_census(params, prefix: str = "") -> list[tuple[str, int]]:
    """Flatten a params pytree into (dotted_name, n_params) rows."""
    rows = []
    if isinstance(params, dict) or hasattr(params, "items"):
        for k, v in sorted(params.items()):
            rows.extend(parameter_census(v, f"{prefix}.{k}" if prefix else str(k)))
    else:
        rows.append((prefix, int(np.prod(params.shape))))
    return rows


def print_census(params) -> int:
    """Print per-module totals and the grand total; returns the total."""
    rows = parameter_census(params)
    by_module: dict[str, int] = {}
    for name, n in rows:
        top = name.split(".")[0]
        by_module[top] = by_module.get(top, 0) + n
    for mod, n in sorted(by_module.items()):
        print(f"{mod:>24s}: {n:>10,d}")
    total = sum(by_module.values())
    print(f"{'TOTAL':>24s}: {total:>10,d}")
    return total


if __name__ == "__main__":
    from diffusionremotesensing_tpu.models.unet import (
        init_unet_params,
        residual_attention_unet_generation,
        residual_attention_unet_sar_to_ndvi,
        residual_attention_unet_superres,
    )

    for label, model in [
        ("superres (x2)", residual_attention_unet_superres(magnification_factor=2)),
        ("SAR->NDVI", residual_attention_unet_sar_to_ndvi()),
        ("generation (10 classes)", residual_attention_unet_generation(num_classes=10)),
    ]:
        print(f"\n=== {label} ===")
        v = init_unet_params(model, jax.random.PRNGKey(0), image_size=16)
        print_census(v["params"])

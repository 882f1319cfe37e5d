"""Exponential moving average of parameters with warmup-copy semantics.

Reference EMA (/root/reference/UNet_model_superres.py:12-55, stepped per
optimizer step at train_diffusion_superres.py:395-396): for the first
``step_start_ema`` (2000) steps the EMA weights are *reset to* the online
weights; afterwards ema = beta * ema + (1 - beta) * online with beta = 0.995.

Implemented as a pure function over (ema_params, params, step) so it lives
inside the jitted train step — the copy-vs-decay branch is a ``jnp.where`` on
the traced step counter (no retrace).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

EMA_BETA = 0.995
EMA_WARMUP_STEPS = 2000


def ema_update(ema_params, params, step, beta: float = EMA_BETA, warmup: int = EMA_WARMUP_STEPS):
    """One EMA step. ``step`` is the pre-increment counter (0-based), matching
    the reference where steps 0..warmup-1 copy and step >= warmup decays."""
    decay = jnp.where(step < warmup, 0.0, beta)
    return jax.tree_util.tree_map(
        lambda e, p: decay * e + (1.0 - decay) * p, ema_params, params
    )

"""DDPM noise schedules as pure functions over static ``noise_steps``.

Reproduces the schedule semantics of the reference engine
(``/root/reference/train_diffusion_superres.py:117-169``):

* ``linear``: beta = linspace(beta_start, beta_end, T); alpha = 1 - beta;
  alpha_hat = cumprod(alpha).
* ``cosine`` (Nichol & Dhariwal, s = 0.008): alpha_hat_t =
  f(t)/f(0) with f(t) = cos(((t/T + s)/(1 + s)) * pi/2)^2, and beta recovered
  as beta_t = 1 - alpha_hat_t / alpha_hat_{t-1} with beta_0 = 1 - alpha_hat_0
  (reference ``from_alpha_hat_to_beta``, train_diffusion_superres.py:128-148).
  NOTE: the reference does NOT clip beta at 0.999; we preserve that.

Schedules are tiny (T,) arrays computed eagerly in float32; they are closed
over as constants by jitted samplers/train steps, so they live in device
memory once per compilation and index-gathers inside ``lax.scan`` are free.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np


class Schedule(NamedTuple):
    """Per-timestep DDPM schedule arrays, each of shape (noise_steps,)."""

    beta: jnp.ndarray
    alpha: jnp.ndarray
    alpha_hat: jnp.ndarray

    @property
    def noise_steps(self) -> int:
        return int(self.beta.shape[0])


def linear_beta(noise_steps: int, beta_start: float = 1e-4, beta_end: float = 0.02) -> np.ndarray:
    """Linear beta schedule (reference prepare_noise_schedule, linear branch)."""
    return np.linspace(beta_start, beta_end, noise_steps, dtype=np.float64)


def cosine_alpha_hat(noise_steps: int, s: float = 0.008) -> np.ndarray:
    """Cosine alpha_hat schedule (reference prepare_noise_schedule, cosine branch).

    Computed in float32 to match torch's default dtype bit-for-bit: near
    t = T the cumulative product is ~1e-9 and the beta recovery
    (1 - ah_t/ah_{t-1}) amplifies any precision mismatch, so checkpoint-output
    parity requires the same arithmetic precision as the reference.
    """
    t = np.arange(noise_steps, dtype=np.float32)
    f_t = np.cos((((t / np.float32(noise_steps)) + np.float32(s)) / (1.0 + np.float32(s))) * np.float32(np.pi) / 2.0, dtype=np.float32) ** 2
    return (f_t / f_t[0]).astype(np.float32)


def beta_from_alpha_hat(alpha_hat: np.ndarray) -> np.ndarray:
    """Recover beta from a cumulative alpha_hat sequence (in its own dtype).

    beta_t = 1 - alpha_hat_t / alpha_hat_{t-1}, with beta_0 = 1 - alpha_hat_0.
    Matches the reference's reversed-loop construction
    (train_diffusion_superres.py:128-148), unclipped.
    """
    alpha_hat = np.asarray(alpha_hat)
    beta = np.empty_like(alpha_hat)
    beta[0] = 1.0 - alpha_hat[0]
    beta[1:] = 1.0 - alpha_hat[1:] / alpha_hat[:-1]
    return beta


def make_schedule(
    noise_schedule: str,
    noise_steps: int,
    beta_start: float = 1e-4,
    beta_end: float = 0.02,
    dtype=jnp.float32,
) -> Schedule:
    """Build the (beta, alpha, alpha_hat) triple for 'linear' or 'cosine'."""
    if noise_schedule == "linear":
        beta = linear_beta(noise_steps, beta_start, beta_end)
        alpha = 1.0 - beta
        alpha_hat = np.cumprod(alpha)
    elif noise_schedule == "cosine":
        alpha_hat = cosine_alpha_hat(noise_steps)
        beta = beta_from_alpha_hat(alpha_hat)
        alpha = 1.0 - beta
    else:
        raise ValueError("The noise schedule must be either 'linear' or 'cosine'")
    return Schedule(
        beta=jnp.asarray(beta, dtype=dtype),
        alpha=jnp.asarray(alpha, dtype=dtype),
        alpha_hat=jnp.asarray(alpha_hat, dtype=dtype),
    )

"""Schedule math: golden checks against the reference's torch formulas."""

import numpy as np
import pytest
import torch

from diffusionremotesensing_tpu.schedules import (
    beta_from_alpha_hat,
    cosine_alpha_hat,
    linear_beta,
    make_schedule,
)


def torch_linear(T, b0=1e-4, b1=0.02):
    beta = torch.linspace(b0, b1, T)
    alpha = 1.0 - beta
    return beta, alpha, torch.cumprod(alpha, dim=0)


def torch_cosine_alpha_hat(T):
    # formula from /root/reference/train_diffusion_superres.py:164-169
    f_t = torch.cos(((((torch.arange(T) / T) + 0.008) / (1 + 0.008)) * torch.pi / 2)) ** 2
    return f_t / f_t[0]


def torch_beta_from_alpha_hat(alpha_hat):
    # reversed-loop construction, train_diffusion_superres.py:128-148
    beta = []
    for t in range(len(alpha_hat) - 1, 0, -1):
        beta.append(1 - (alpha_hat[t] / alpha_hat[t - 1]))
    beta.append(1 - alpha_hat[0])
    return torch.tensor(beta[::-1], dtype=alpha_hat.dtype)


@pytest.mark.parametrize("T", [10, 200, 1500])
def test_linear_schedule_matches_torch(T):
    beta_t, alpha_t, ah_t = torch_linear(T)
    sched = make_schedule("linear", T)
    np.testing.assert_allclose(np.asarray(sched.beta), beta_t.numpy(), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(sched.alpha), alpha_t.numpy(), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(sched.alpha_hat), ah_t.numpy(), rtol=2e-4)


@pytest.mark.parametrize("T", [10, 200, 1500])
def test_cosine_schedule_matches_torch(T):
    ah_t = torch_cosine_alpha_hat(T)  # float32, like the reference
    beta_t = torch_beta_from_alpha_hat(ah_t).numpy()
    ah_t = ah_t.numpy()
    sched = make_schedule("cosine", T)
    # alpha_hat agrees to ~1 ULP of float32 (torch vs numpy cos kernels)
    np.testing.assert_allclose(np.asarray(sched.alpha_hat), ah_t, rtol=5e-7, atol=2e-7)
    # beta = 1 - ah_t/ah_{t-1} amplifies that ULP noise where ah -> 0 (the
    # noise-dominated tail); assert tight parity wherever ah is numerically
    # meaningful and sane bounds on the tail.
    beta = np.asarray(sched.beta)
    meaningful = ah_t > 1e-4
    np.testing.assert_allclose(beta[meaningful], beta_t[meaningful], rtol=1e-3, atol=1e-6)
    # beta[0] == 1 - alpha_hat[0] == 0 exactly; index 0 is never used
    # (t ranges over [1, T) in both training and sampling).
    assert beta[0] == 0.0
    assert (beta[1:] > 0).all() and (beta <= 1.0).all()
    np.testing.assert_allclose(np.asarray(sched.alpha), 1.0 - beta, rtol=1e-6)


def test_beta_alpha_hat_roundtrip():
    ah = cosine_alpha_hat(100)
    beta = beta_from_alpha_hat(ah)
    # reconstruct alpha_hat from beta by cumprod (float32 arithmetic)
    np.testing.assert_allclose(np.cumprod(1.0 - beta), ah, rtol=1e-4)


def test_linear_endpoints():
    beta = linear_beta(1000)
    assert beta[0] == pytest.approx(1e-4)
    assert beta[-1] == pytest.approx(0.02)

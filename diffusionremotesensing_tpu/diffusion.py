"""The DDPM engine: forward noising, timestep sampling, and the scan sampler.

One engine replaces the reference's three copy-pasted ``Diffusion`` classes
(/root/reference/train_diffusion_superres.py:78-511,
train_diffusion_SAR_TO_NDVI.py:79-503,
generate_new_imgs/train_diffusion_generation.py:81-503). Semantics preserved:

* q-sample: x_t = sqrt(alpha_hat_t) x0 + sqrt(1 - alpha_hat_t) eps
  (train_diffusion_superres.py:171-190).
* training timesteps: uniform ints in [1, noise_steps)
  (train_diffusion_superres.py:192-205) — index 0 is never used.
* ancestral sampling: for i = T-1 .. 1,
  x <- (x - (1-alpha_i)/sqrt(1-alpha_hat_i) * eps_hat) / sqrt(alpha_i)
       + sqrt(beta_i) * z,   z = 0 at i == 1
  (train_diffusion_superres.py:207-255).
* classifier-free guidance: eps = lerp(eps_uncond, eps_cond, cfg_scale)
  (train_diffusion_generation.py:239-242), computed here with ONE batched
  model call (cond and uncond stacked along batch) per step.

TPU-first formulation: the reverse process is a single jitted ``lax.scan``
over the (static-length) timestep sequence — one compilation, no host sync
per step, schedule gathers on-device. The condition image is broadcast (or
per-sample, a superset of the reference which only supports one condition
image per sample() call, train_diffusion_superres.py:224).
"""

from __future__ import annotations

import os
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from diffusionremotesensing_tpu.schedules import Schedule, make_schedule

__all__ = [
    "q_sample",
    "sample_timesteps",
    "ddpm_step",
    "make_sampler",
    "warm_start_state",
    "DiffusionProcess",
]


def _scan_unroll() -> int:
    """Unroll factor for the sampling scans (DRS_SCAN_UNROLL, default 1) —
    an execution-only A/B knob: ``lax.scan(unroll=k)`` emits k step bodies
    per loop iteration, giving XLA a window to schedule/fuse across
    consecutive timesteps; the math (and therefore the output) is unchanged.
    Read at trace time, like the other DRS_* measurement knobs."""
    return max(1, int(os.environ.get("DRS_SCAN_UNROLL", "1")))


def _normal_packed(key: jax.Array, shape, dtype) -> jnp.ndarray:
    """jax.random.normal drawn FLAT then reshaped — bit-identical output
    (threefry fills row-major from a flat counter, so normal(k, (a, b)) ==
    normal(k, (a*b,)).reshape(a, b)), but the expensive bits->normal math
    runs on a (N/128, 128)-tileable array at full VPU lane occupancy instead
    of a 3- or 12-channel lane layout (~9% occupancy; the per-step RNG was
    ~250us/step of the B=48 s2d sampler before this, see benchmarks/NOTES.md).
    """
    n = 1
    for s in shape:
        n *= int(s)
    return jax.random.normal(key, (n,), dtype=dtype).reshape(shape)


def _key_bits(key: jax.Array) -> jnp.ndarray:
    """The (2,) uint32 material of a PRNG key (typed or raw) — seed input
    for the fused-update kernel's on-chip generator."""
    if jnp.issubdtype(key.dtype, jax.dtypes.prng_key):
        return jax.random.key_data(key)
    return key


def q_sample(schedule: Schedule, x0: jnp.ndarray, t: jnp.ndarray, key: jax.Array):
    """Forward noising. Returns (x_t, eps) with eps ~ N(0, I).

    x0: (B, H, W, C); t: (B,) ints.
    """
    eps = _normal_packed(key, x0.shape, x0.dtype)
    sqrt_ah = jnp.sqrt(schedule.alpha_hat[t])[:, None, None, None]
    sqrt_omah = jnp.sqrt(1.0 - schedule.alpha_hat[t])[:, None, None, None]
    return sqrt_ah * x0 + sqrt_omah * eps, eps


def sample_timesteps(key: jax.Array, n: int, noise_steps: int) -> jnp.ndarray:
    """Uniform timesteps in [1, noise_steps) — matches the reference's range."""
    return jax.random.randint(key, (n,), 1, noise_steps)


def ddpm_step(
    schedule: Schedule,
    x: jnp.ndarray,
    eps_hat: jnp.ndarray,
    t: jnp.ndarray,
    noise: jnp.ndarray,
) -> jnp.ndarray:
    """One reverse (ancestral) step at scalar timestep t.

    noise must already be zeroed when t == 1 (the sampler handles this).
    """
    alpha = schedule.alpha[t]
    alpha_hat = schedule.alpha_hat[t]
    beta = schedule.beta[t]
    coef = (1.0 - alpha) / jnp.sqrt(1.0 - alpha_hat)
    return (x - coef * eps_hat) / jnp.sqrt(alpha) + jnp.sqrt(beta) * noise


def make_sampler(
    apply_fn: Callable[..., jnp.ndarray],
    schedule: Schedule,
    *,
    cfg_scale: Optional[float] = None,
    capture_frames: bool = False,
    encode_cond_fn: Optional[Callable] = None,
    prepare_fn: Optional[Callable] = None,
    state_codec: Optional[tuple] = None,
    fused_update: bool = False,
    start_t: Optional[int] = None,
):
    """Build a jittable ancestral sampler closed over the model apply fn.

    apply_fn(variables, x, t, cond, cond_mask, cond_features=None) -> eps_hat,
    where t is (B,) and cond may be None / image batch / label batch.

    When ``encode_cond_fn(variables, cond) -> features`` is given (image-
    conditioned models), the condition stem is computed ONCE per sample call
    and the loop-invariant features are fed into every scan step — the
    reference recomputes its RRDB+upsample+conv stem in all T-1 forwards.
    ``prepare_fn(variables) -> aux`` likewise hoists any loop-invariant
    derived quantities (e.g. the s2d-transformed kernels) out of the scan;
    when given, apply_fn is called with an extra trailing ``aux`` argument.
    ``state_codec=(encode, decode)`` keeps the diffusion state in an
    alternate layout across the scan (s2d execution): x_T is encoded once,
    per-step noise is drawn in the ORIGINAL layout and encoded (bitwise-
    identical sampling), and the final state is decoded once.

    ``fused_update=True`` (TPU-only, opt-in) runs the per-step ancestral
    update + noise draw as one Pallas program with the on-chip hardware
    PRNG (ops/fused_update.py) instead of the threefry fusion. Same
    distribution, DIFFERENT noise stream — not bitwise reproducible against
    the default path, hence default OFF (repo invariant: behavior-changing
    additions are opt-in).

    ``start_t`` truncates the chain (warm-start sampling, a framework
    addition — SDEdit, arXiv:2108.01073 / CCDF, arXiv:2112.05146): the scan
    runs start_t..1 instead of T-1..1 and the caller passes x at t=start_t
    (typically a q-sampled cheap reconstruction, e.g. the bicubic upsample
    for super-resolution). Default None is the reference full chain.

    Returns sample(variables, key, x_T, cond) -> x0 (or (x0, frames) when
    ``capture_frames``; frames has shape (start_t, B, H, W, C) — the
    denoising trajectory used by the reference's video/GIF export).
    """
    T = schedule.noise_steps
    t_start = T - 1 if start_t is None else int(start_t)
    if not 1 <= t_start <= T - 1:
        raise ValueError(f"start_t must be in [1, {T - 1}], got {start_t}")
    ts = jnp.arange(t_start, 0, -1)
    enc, dec = state_codec if state_codec is not None else (None, None)

    def sample(variables, key: jax.Array, x_T: jnp.ndarray, cond=None):
        if cfg_scale is not None and cond is None:
            raise ValueError(
                "cfg_scale requires cond (labels): classifier-free guidance "
                "lerps the conditioned vs unconditioned predictions; pass "
                "cond or sample with cfg_scale=None"
            )
        n = x_T.shape[0]
        orig_shape = x_T.shape
        feats = None
        if encode_cond_fn is not None and cond is not None:
            feats = encode_cond_fn(variables, cond)
        aux = (prepare_fn(variables),) if prepare_fn is not None else ()

        if cfg_scale is not None:
            # Batched CFG: conditioned half (mask 1) + unconditioned half
            # (mask 0) in one model call, then lerp.
            def eps_fn(x, t):
                x2 = jnp.concatenate([x, x], axis=0)
                t2 = jnp.concatenate([t, t], axis=0)
                cond2 = jnp.concatenate([cond, cond], axis=0)
                mask = jnp.concatenate(
                    [jnp.ones((n,), x.dtype), jnp.zeros((n,), x.dtype)], axis=0
                )
                eps2 = (apply_fn(variables, x2, t2, cond2, mask, None, *aux)
                        if aux else apply_fn(variables, x2, t2, cond2, mask))
                eps_c, eps_u = eps2[:n], eps2[n:]
                # torch.lerp(uncond, cond, s) = uncond + s*(cond - uncond)
                return eps_u + cfg_scale * (eps_c - eps_u)

        elif encode_cond_fn is not None:

            def eps_fn(x, t):
                return apply_fn(variables, x, t, cond, None, feats, *aux)

        else:

            def eps_fn(x, t):
                if aux:
                    return apply_fn(variables, x, t, cond, None, None, *aux)
                return apply_fn(variables, x, t, cond, None)

        def step(carry, i):
            x, k = carry
            k, k_noise = jax.random.split(k)
            t = jnp.full((n,), i, dtype=jnp.int32)
            eps_hat = eps_fn(x, t)
            if fused_update:
                from diffusionremotesensing_tpu.ops.fused_update import (
                    ancestral_update,
                    update_coefs,
                )

                # noise drawn in-kernel (hardware PRNG) directly in the scan
                # layout; the i>1 zeroing rides in the cn coefficient
                x = ancestral_update(
                    x, eps_hat, update_coefs(schedule, i), _key_bits(k_noise)
                )
            else:
                z = _normal_packed(k_noise, orig_shape, x.dtype)
                if enc is not None:
                    z = enc(z)
                z = jnp.where(i > 1, z, jnp.zeros_like(z))
                x = ddpm_step(schedule, x, eps_hat, i, z)
            frame = (dec(x) if dec is not None else x) if capture_frames else None
            return (x, k), frame

        x0 = enc(x_T) if enc is not None else x_T
        (x, _), frames = jax.lax.scan(step, (x0, key), ts, unroll=_scan_unroll())
        if dec is not None:
            x = dec(x)
        return (x, frames) if capture_frames else x

    return sample


def make_ddim_sampler(
    apply_fn: Callable[..., jnp.ndarray],
    schedule: Schedule,
    num_steps: int,
    *,
    eta: float = 0.0,
    cfg_scale: Optional[float] = None,
    tau_spacing: str = "linear",
    clip_x0: bool = False,
    encode_cond_fn: Optional[Callable] = None,
    prepare_fn: Optional[Callable] = None,
    state_codec: Optional[tuple] = None,
    start_t: Optional[int] = None,
):
    """DDIM sampler (Song et al., arXiv:2010.02502) over a strided timestep
    subsequence — a framework addition beyond the reference (which only has
    the T-step ancestral sampler): ``num_steps`` model evaluations instead of
    T-1, deterministic at eta=0, approaching DDPM as eta -> 1.

    Uses the same model/schedule as training. ``tau_spacing``: 'linear' is
    an even stride over [1, T); 'quadratic' (Song et al. §4.2's preferred
    subsequence for few steps) concentrates steps near t=0 where the
    denoising trajectory curves most. ``clip_x0`` clamps the per-step x0
    prediction to [0, 1] — the data range of every task in this framework
    (the reference clamps only the FINAL output,
    superres_and_NDVIgen.py:49); at few steps an out-of-range x0_pred
    otherwise feeds visible artifacts back through the update.

    ``start_t`` truncates the subsequence to [1, start_t] (warm-start
    sampling, see make_sampler): the caller passes x at t=start_t instead of
    pure noise at T-1. Default None spans the full [1, T).

    Returns sample(variables, key, x_T, cond) -> x0.
    """
    T = schedule.noise_steps
    t_start = T - 1 if start_t is None else int(start_t)
    if not 1 <= t_start <= T - 1:
        raise ValueError(f"start_t must be in [1, {T - 1}], got {start_t}")
    # strided subsequence of [1, t_start], descending; pair each t with its
    # predecessor in the subsequence (0 terminates, where alpha_hat -> 1)
    if num_steps == 1:
        # np.linspace(lo, hi, 1) returns [lo]: the single step would run at
        # t=1 and never remove the t_start noise the caller's state carries
        # (explicitly wrong under start_t, where x IS x_{start_t}). Anchor
        # the one step at t_start: one DDIM step = direct x0 prediction
        # from the actual starting state.
        grid = np.asarray([t_start], np.float64)
    elif tau_spacing == "quadratic":
        grid = np.linspace(1.0, np.sqrt(t_start), num_steps) ** 2
    elif tau_spacing == "linear":
        grid = np.linspace(1, t_start, num_steps)
    else:
        raise ValueError(f"tau_spacing must be linear|quadratic, got {tau_spacing!r}")
    taus = jnp.asarray(np.unique(grid.round().astype(np.int64))[::-1].copy())
    taus_prev = jnp.concatenate([taus[1:], jnp.zeros((1,), taus.dtype)])
    enc, dec = state_codec if state_codec is not None else (None, None)

    def sample(variables, key: jax.Array, x_T: jnp.ndarray, cond=None):
        if cfg_scale is not None and cond is None:
            raise ValueError(
                "cfg_scale requires cond (labels): classifier-free guidance "
                "lerps the conditioned vs unconditioned predictions; pass "
                "cond or sample with cfg_scale=None"
            )
        n = x_T.shape[0]
        orig_shape = x_T.shape
        feats = None
        if encode_cond_fn is not None and cond is not None:
            feats = encode_cond_fn(variables, cond)
        aux = (prepare_fn(variables),) if prepare_fn is not None else ()

        def eps_fn(x, t):
            if cfg_scale is not None:
                x2 = jnp.concatenate([x, x], axis=0)
                t2 = jnp.concatenate([t, t], axis=0)
                cond2 = jnp.concatenate([cond, cond], axis=0)
                mask = jnp.concatenate(
                    [jnp.ones((n,), x.dtype), jnp.zeros((n,), x.dtype)], axis=0
                )
                eps2 = (apply_fn(variables, x2, t2, cond2, mask, None, *aux)
                        if aux else apply_fn(variables, x2, t2, cond2, mask))
                return eps2[n:] + cfg_scale * (eps2[:n] - eps2[n:])
            if encode_cond_fn is not None:
                return apply_fn(variables, x, t, cond, None, feats, *aux)
            if aux:
                return apply_fn(variables, x, t, cond, None, None, *aux)
            return apply_fn(variables, x, t, cond, None)

        def step(carry, tt):
            x, k = carry
            t, t_prev = tt
            k, k_noise = jax.random.split(k)
            eps_hat = eps_fn(x, jnp.full((n,), t, jnp.int32))
            ah = schedule.alpha_hat[t]
            # terminal convention: alpha_hat at t_prev = 0 is 1 (no noise), so
            # the final step returns x0_pred exactly and sigma -> 0 even at
            # eta > 0 (mirrors the DDPM sampler's zero-noise last step)
            ah_prev = jnp.where(t_prev > 0, schedule.alpha_hat[t_prev], 1.0)
            x0_pred = (x - jnp.sqrt(1.0 - ah) * eps_hat) / jnp.sqrt(ah)
            if clip_x0:
                # pointwise clip, valid directly in the s2d state layout (a
                # pixel permutation); recompute eps from the clipped x0 so
                # the direction term stays consistent with the prediction
                x0_pred = jnp.clip(x0_pred, 0.0, 1.0)
                eps_hat = (x - jnp.sqrt(ah) * x0_pred) / jnp.sqrt(1.0 - ah)
            sigma = (
                eta
                * jnp.sqrt((1.0 - ah_prev) / (1.0 - ah))
                * jnp.sqrt(1.0 - ah / ah_prev)
            )
            dir_xt = jnp.sqrt(jnp.maximum(1.0 - ah_prev - sigma**2, 0.0)) * eps_hat
            z = _normal_packed(k_noise, orig_shape, x.dtype)
            if enc is not None:
                z = enc(z)
            x = jnp.sqrt(ah_prev) * x0_pred + dir_xt + sigma * z
            return (x, k), None

        x0 = enc(x_T) if enc is not None else x_T
        (x, _), _ = jax.lax.scan(
            step, (x0, key), (taus, taus_prev), unroll=_scan_unroll()
        )
        return dec(x) if dec is not None else x

    return sample


def warm_start_state(
    schedule: Schedule, init: jnp.ndarray, start_t: int, key: jax.Array
) -> jnp.ndarray:
    """q-sample a cheap reconstruction to t=start_t: the warm-start state for
    truncated sampling (SDEdit arXiv:2108.01073 eq. 2 / CCDF arXiv:2112.05146).

    init: (B, H, W, C) in the data range (e.g. a bicubic upsample for SR).
    Returns x_{start_t} = sqrt(alpha_hat_t) init + sqrt(1 - alpha_hat_t) eps.
    """
    ah = schedule.alpha_hat[start_t]
    eps = _normal_packed(key, init.shape, init.dtype)
    return jnp.sqrt(ah) * init + jnp.sqrt(1.0 - ah) * eps


def make_process(
    model,
    noise_schedule: str,
    noise_steps: int,
    image_size: int,
    beta_start: float = 1e-4,
    beta_end: float = 0.02,
) -> "DiffusionProcess":
    """Build a DiffusionProcess wired to a ResidualAttentionUNet: the standard
    apply_fn (with cond_features passthrough) plus the hoisted condition-stem
    encoder for image-conditioned variants. One definition for every call
    site (CLI, inference helpers, benchmarks, trainer)."""

    use_s2d = bool(getattr(model, "s2d", False))

    def apply_fn(variables, x, t, cond, cond_mask, cond_features=None, aux=None):
        return model.apply(
            variables, x, t, cond, cond_mask, train=False,
            cond_features=cond_features, s2d_kernels=aux, s2d_io=use_s2d,
        )

    state_codec = None
    if use_s2d:
        from diffusionremotesensing_tpu.ops.s2d import depth_to_space, space_to_depth

        # keep the sampling state itself in s2d layout across the scan
        state_codec = (space_to_depth, depth_to_space)

    prepare_fn = None
    if use_s2d:
        # hoist the s2d-transformed kernels out of the sampling scan (they
        # are a pure function of the params; rebuilding the scatter-assembled
        # kernels every step measured ~165us/step on v5e)
        def prepare_fn(variables):
            return model.apply(variables, method="prepare_s2d_kernels")

    encode_cond_fn = None
    if getattr(model, "conditioning", None) in ("superres", "sar"):
        # hoisted in the layout the model's inference path consumes:
        # space-to-depth when the s2d level-0 execution is enabled; the
        # fused-stem kernel (tap44='stem') additionally wants the
        # conv0-bias/cond slabs pre-assembled (unet.encode_cond_stem)
        method = "encode_cond_s2d" if use_s2d else "encode_cond"
        if use_s2d and getattr(model, "tap44", None) == "stem":
            method = "encode_cond_stem"

        def encode_cond_fn(variables, cond):
            return model.apply(variables, cond, method=method)

    return DiffusionProcess(
        noise_schedule,
        apply_fn,
        noise_steps=noise_steps,
        beta_start=beta_start,
        beta_end=beta_end,
        image_size=image_size,
        image_channels=model.image_channels,
        encode_cond_fn=encode_cond_fn,
        prepare_fn=prepare_fn,
        state_codec=state_codec,
    )


class DiffusionProcess:
    """Convenience wrapper bundling a model apply_fn with a schedule.

    This is the functional core used by the training engine
    (``diffusionremotesensing_tpu.train.Trainer``) and by inference helpers;
    it owns no mutable state beyond cached compiled samplers.
    """

    def __init__(
        self,
        noise_schedule: str,
        apply_fn: Callable[..., jnp.ndarray],
        noise_steps: int = 1000,
        beta_start: float = 1e-4,
        beta_end: float = 0.02,
        image_size: int = 224,
        image_channels: int = 3,
        encode_cond_fn: Optional[Callable] = None,
        prepare_fn: Optional[Callable] = None,
        state_codec: Optional[tuple] = None,
    ):
        self.noise_steps = noise_steps
        self.image_size = image_size
        self.image_channels = image_channels
        self.apply_fn = apply_fn
        self.encode_cond_fn = encode_cond_fn
        self.prepare_fn = prepare_fn
        self.state_codec = state_codec
        self.schedule = make_schedule(noise_schedule, noise_steps, beta_start, beta_end)
        self._samplers: dict[Any, Callable] = {}

    def q_sample(self, x0, t, key):
        return q_sample(self.schedule, x0, t, key)

    def sample_timesteps(self, key, n):
        return sample_timesteps(key, n, self.noise_steps)

    def sampler(
        self,
        cfg_scale: Optional[float] = None,
        capture_frames: bool = False,
        fused_update: bool = False,
        start_t: Optional[int] = None,
    ):
        """Return the jitted sampler for the given CFG/frames configuration."""
        cache_key = (cfg_scale, capture_frames, fused_update, start_t)
        if cache_key not in self._samplers:
            fn = make_sampler(
                self.apply_fn,
                self.schedule,
                cfg_scale=cfg_scale,
                capture_frames=capture_frames,
                encode_cond_fn=self.encode_cond_fn,
                prepare_fn=self.prepare_fn,
                state_codec=self.state_codec,
                fused_update=fused_update,
                start_t=start_t,
            )
            self._samplers[cache_key] = jax.jit(fn)
        return self._samplers[cache_key]

    def ddim_sampler(
        self,
        num_steps: int,
        eta: float = 0.0,
        cfg_scale: Optional[float] = None,
        tau_spacing: str = "linear",
        clip_x0: bool = False,
        start_t: Optional[int] = None,
    ):
        """Jitted DDIM sampler with ``num_steps`` model evaluations."""
        cache_key = ("ddim", num_steps, eta, cfg_scale, tau_spacing, clip_x0,
                     start_t)
        if cache_key not in self._samplers:
            fn = make_ddim_sampler(
                self.apply_fn,
                self.schedule,
                num_steps,
                eta=eta,
                cfg_scale=cfg_scale,
                tau_spacing=tau_spacing,
                clip_x0=clip_x0,
                encode_cond_fn=self.encode_cond_fn,
                prepare_fn=self.prepare_fn,
                state_codec=self.state_codec,
                start_t=start_t,
            )
            self._samplers[cache_key] = jax.jit(fn)
        return self._samplers[cache_key]

    def sample(
        self,
        variables,
        key: jax.Array,
        n: int,
        cond=None,
        cfg_scale: Optional[float] = None,
        capture_frames: bool = False,
        mesh=None,
        ddim_steps: Optional[int] = None,
        ddim_eta: float = 0.0,
        ddim_spacing: str = "linear",
        ddim_clip_x0: bool = True,
        start_t: Optional[int] = None,
        init=None,
    ):
        """Generate n images; mirrors the reference's Diffusion.sample.

        The condition may be a single image (broadcast to n, like the
        reference) or a per-sample batch of n condition images/labels.

        ``mesh``: when sampling inside a mesh-parallel job (training
        previews under --multiple_gpus), the sampler is a GLOBAL-mesh
        computation every process enters; x_T, cond, and the key are placed
        as replicated global arrays (all ranks hold identical values by
        lockstep key discipline — Trainer.next_key advances uniformly).
        Without this, x_T would be a process-local committed array that the
        global jit rejects (multi-host) or that breaks device consistency.

        ``ddim_steps``: framework addition with no reference counterpart —
        when set, sampling runs the DDIM subsequence sampler
        (``ddim_sampler``) with that many model evaluations instead of the
        reference's T-1 ancestral steps; the remaining ddim_* kwargs mirror
        the Aggregation_Sampling CLI flags (clip_x0 defaults to the
        measured-best configuration, benchmarks/NOTES.md round-3). The
        default (None) is the reference ancestral path, bit-identical to
        before this kwarg existed.

        ``start_t``/``init``: truncated warm-start sampling (framework
        addition, default off). ``init`` is a cheap reconstruction in the
        data range (HWC or (n, H, W, C)); it is q-sampled to t=start_t
        (``warm_start_state``) and only start_t reverse steps run (or the
        DDIM subsequence is squeezed into [1, start_t] when ddim_steps is
        also set).
        """
        if (start_t is None) != (init is None):
            raise ValueError(
                "start_t and init go together: truncated sampling needs a "
                "warm-start image (init) and a truncation point (start_t)"
            )
        key, k_init = jax.random.split(jnp.asarray(key))
        if start_t is not None:
            init = jnp.asarray(init)
            if init.ndim == 3:  # single HWC init -> broadcast like cond
                init = jnp.broadcast_to(init[None], (n,) + init.shape)
            x_T = warm_start_state(self.schedule, init, start_t, k_init)
        else:
            x_T = jax.random.normal(
                k_init, (n, self.image_size, self.image_size, self.image_channels)
            )
        if cond is not None and hasattr(cond, "ndim"):
            cond = jnp.asarray(cond)
            if cond.ndim == 3:  # single HWC condition image -> broadcast
                cond = jnp.broadcast_to(cond[None], (n,) + cond.shape)
            elif cond.ndim == 0:  # single label
                cond = jnp.broadcast_to(cond[None], (n,))
        if mesh is not None:
            from diffusionremotesensing_tpu.parallel.sharding import global_replicated

            x_T = global_replicated(x_T, mesh)
            key = global_replicated(key, mesh)
            if cond is not None:
                cond = global_replicated(cond, mesh)
        if ddim_steps is not None:
            if capture_frames:
                raise ValueError(
                    "capture_frames is only supported by the ancestral "
                    "sampler (ddim_steps=None); the DDIM scan does not "
                    "record per-step frames"
                )
            fn = self.ddim_sampler(
                ddim_steps,
                eta=ddim_eta,
                cfg_scale=cfg_scale,
                tau_spacing=ddim_spacing,
                clip_x0=ddim_clip_x0,
                start_t=start_t,
            )
        else:
            fn = self.sampler(cfg_scale, capture_frames, start_t=start_t)
        return fn(variables, key, x_T, cond)

"""W8A8 static-calibration quantized inference (opt-in ``--quant int8``).

TPU v5e advertises ~2x int8 MXU peak, but measured through XLA this model's
conv shapes reach at most 1.17x gross per conv, and the full path is ~6.5%
SLOWER end to end (benchmarks/NOTES.md round-3 int8 probe + W8A8 A/B) — so
this ships as a quantized-inference *capability* (quality gated end to end),
not a speed knob on this chip. Activations use STATIC per-site scales from a
one-off calibration pass (dynamic per-batch amax would add an HBM-bound
reduction per conv); weights use per-output-channel scales computed inline
(loop invariant -> hoisted/constant-folded by XLA).

Design (no reference counterpart — the reference is f32 torch end to end):

* Scales live in a flax variable collection ``"quant"``, keyed by module
  path (TorchConv / ConvTranspose2x sites) or by the s2d conv label
  (unet._named_conv sites). No model-signature changes: calibration is one
  ``model.apply(..., mutable=["quant"])`` pass per probe; inference sees the
  collection in ``variables`` and the conv sites switch to the int8 path.
* Conv sites READ their own scale; policy (which sites quantize) is applied
  by filtering the calibrated tree (``filter_scales``) before attaching it —
  the output head and 1-channel attention projections stay high-precision by
  default (the standard first/last-layer rule; the head feeds the image).
* Quantization is symmetric int8: activation scale ``amax/127`` per site,
  weight scale ``max|w|/127`` per output channel.

Exactness: this is NOT an fp-equivalent execution path — it ships default
OFF everywhere (CLAUDE.md flag-default contract) and is gated end-to-end by
benchmarks/learning_check.py PSNR/SSIM before any recommendation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# conv sites never quantized by default (substring match on the flattened
# "quant" path): the composed output head + its boundary fixes write the
# image ("head*" labels on the s2d path, the "output" module on the plain
# path); psi projects to ONE channel (no MXU win, quality-sensitive gate).
DEFAULT_EXCLUDE = ("head", "_psi", "psi/", "output")

_EPS = 1e-12


def abs_max(x) -> jnp.ndarray:
    """Scalar f32 max|x| (the calibration statistic)."""
    return jnp.max(jnp.abs(x.astype(jnp.float32)))


def module_amax(module, name, x):
    """The per-conv-site quant hook, shared by every site (TorchConv,
    ConvTranspose2x, and the hand-written s2d convs): during a calibration
    pass (``mutable=["quant"]``) record this site's activation amax under
    ``name`` and return None (the caller stays on the exact conv); during
    quantized inference return the calibrated scale (the caller switches to
    the int8 conv); otherwise None (the exact path — provably inert without
    the "quant" collection)."""
    if module.is_mutable_collection("quant") and not module.is_initializing():
        module.sow("quant", name, abs_max(x), reduce_fn=jnp.maximum,
                   init_fn=lambda: jnp.zeros((), jnp.float32))
        return None
    if module.has_variable("quant", name):
        return module.get_variable("quant", name)
    return None


def _weight_qparams(kernel):
    """Per-output-channel symmetric int8 weight quantization (HWIO / any
    layout with the output channel LAST). Returns (wq int8, sw f32 (Co,))."""
    w = kernel.astype(jnp.float32)
    red = tuple(range(w.ndim - 1))
    sw = jnp.maximum(jnp.max(jnp.abs(w), axis=red), _EPS) / 127.0
    wq = jnp.clip(jnp.round(w / sw), -127, 127).astype(jnp.int8)
    return wq, sw


def _quantize_act(x, amax):
    sx = jnp.maximum(amax.astype(jnp.float32), _EPS) / 127.0
    xq = jnp.clip(jnp.round(x.astype(jnp.float32) / sx), -127, 127).astype(jnp.int8)
    return xq, sx


def conv_int8(lhs, rhs, amax, *, window_strides, padding, lhs_dilation=None,
              rhs_dilation=None, dimension_numbers=None,
              feature_group_count=1):
    """The W8A8 sandwich for one conv site. ``amax`` is the calibrated
    activation scale (traced f32 scalar from the "quant" collection); the
    weight quantization is loop-invariant and hoisted out of the sampling
    scan by XLA. Output is f32 (callers cast; bias adds after dequant)."""
    if feature_group_count != 1:
        # no grouped convs in this model; keep the exact path if one appears
        return jax.lax.conv_general_dilated(
            lhs, rhs, window_strides, padding, lhs_dilation=lhs_dilation,
            rhs_dilation=rhs_dilation, dimension_numbers=dimension_numbers,
            feature_group_count=feature_group_count,
        ).astype(jnp.float32)
    xq, sx = _quantize_act(lhs, amax)
    wq, sw = _weight_qparams(rhs)
    acc = jax.lax.conv_general_dilated(
        xq, wq, window_strides, padding, lhs_dilation=lhs_dilation,
        rhs_dilation=rhs_dilation, dimension_numbers=dimension_numbers,
        preferred_element_type=jnp.int32,
    )
    return acc.astype(jnp.float32) * (sx * sw)


def flax_conv_fn(amax):
    """A drop-in ``conv_general_dilated`` for ``nn.Conv`` implementing the
    W8A8 sandwich (flax calls it positionally as
    ``fn(inputs, kernel, strides, padding, lhs_dilation=, rhs_dilation=,
    dimension_numbers=, feature_group_count=, precision=)``; it also probes
    output shapes through jax.eval_shape, where the int8 math must still
    report the f32 result shape — conv_int8 does)."""

    def conv(lhs, rhs, window_strides=None, padding=None, *,
             lhs_dilation=None, rhs_dilation=None, dimension_numbers=None,
             feature_group_count=1, precision=None):
        del precision  # int8 path fixes its own accumulation type
        out = conv_int8(
            lhs, rhs, amax, window_strides=window_strides, padding=padding,
            lhs_dilation=lhs_dilation, rhs_dilation=rhs_dilation,
            dimension_numbers=dimension_numbers,
            feature_group_count=feature_group_count,
        )
        return out.astype(lhs.dtype)

    return conv


# --------------------------------------------------------------- calibration


def calibrate(model, variables, probes, **apply_kwargs):
    """Collect per-site activation amax over ``probes`` (a list of
    ``model.apply`` positional-arg tuples, e.g. ``(x, t, cond)``). Returns
    the raw "quant" tree (flax path -> f32 scalar amax). Each pass feeds the
    previous tree back in so the maxima accumulate across probes. Runs the
    same execution path the quantized inference will use — build the model
    with the production flags (s2d, tap44, dtype) before calibrating."""
    import flax

    vs = {k: v for k, v in variables.items() if k != "quant"}

    @jax.jit
    def pass_(variables_, *probe):
        # a mutable apply is still pure (it returns the new collections), so
        # the calibration forward jits — one compile, probes share a shape
        _, mut = model.apply(variables_, *probe, mutable=["quant"], **apply_kwargs)
        return mut["quant"]

    acc = None
    for probe in probes:
        tree = flax.core.unfreeze(pass_(vs, *probe))
        acc = (
            tree if acc is None
            else jax.tree_util.tree_map(jnp.maximum, acc, tree)
        )
    return jax.device_get(acc) if acc is not None else {}


def filter_scales(quant_tree, exclude=DEFAULT_EXCLUDE, margin: float = 1.0):
    """Apply the quantization policy: drop sites whose flattened path
    contains any ``exclude`` substring, scale the kept amaxes by ``margin``
    (>1 leaves clipping headroom for activations beyond the probe set)."""
    def prune(node, prefix=()):
        if isinstance(node, dict):
            out = {}
            for k, v in node.items():
                sub = prune(v, prefix + (k,))
                if sub is not None:
                    out[k] = sub
            return out or None
        s = "/".join(str(p) for p in prefix)
        if any(e in s for e in exclude):
            return None
        return jnp.asarray(node, jnp.float32) * margin

    # quant trees from flax are (possibly frozen) nested dicts
    import flax

    node = flax.core.unfreeze(quant_tree) if hasattr(flax.core, "unfreeze") else quant_tree
    return prune(dict(node)) or {}


def attach(variables, quant_tree):
    """Return ``variables`` with the (filtered) quant collection merged in —
    the switch that turns the int8 path on for every site with a scale."""
    vs = dict(variables)
    vs["quant"] = quant_tree
    return vs


def quantize_for_sampling(model, variables, schedule_alpha_hat, x0_proxy,
                          cond, key, ts=None, exclude=DEFAULT_EXCLUDE,
                          margin: float = 1.05, cond_mask=None, **apply_kwargs):
    """One-stop W8A8 preparation for a sampling workload: build probes that
    span the denoising trajectory, calibrate every conv site, apply the
    default policy, and return ``variables`` with the scales attached. The
    model must carry its production inference flags (s2d/tap44/dtype) so
    calibration walks the execution path the sampler will compile.

    ``cond_mask`` (generation/CFG only): a (B,) float mask forwarded to the
    model so the probes exercise BOTH guidance regimes — the sampler's
    batched CFG (diffusion.py) runs a mask=0 half whose label embedding is
    zeroed, an activation regime a labels-only probe never sees; pass a
    half-ones/half-zeros mask so its maxima inform the scales.

    Branch coverage: the tap44 VMEM-fit guards (models/unet.py) pick between
    the fused Pallas level-0 kernel and the dense-s2d conv sites PER BATCH
    SHAPE, and one aggregation run genuinely executes both (full chunks +
    the small remainder chunk). When the model carries a tap44 config, the
    dense branch is calibrated as well (``model.clone(tap44=False)`` over
    the same probes, trees merged by maximum) so every site that can
    execute holds a scale, whichever branch a given batch takes."""
    probes = [
        p if cond is None else
        (p + (cond,) if cond_mask is None else p + (cond, cond_mask))
        for p in sampling_probes(x0_proxy, schedule_alpha_hat, key, ts)
    ]
    tree = calibrate(model, variables, probes, **apply_kwargs)
    if getattr(model, "tap44", False):
        dense = calibrate(model.clone(tap44=False), variables, probes,
                          **apply_kwargs)
        tree = _merge_max(tree, dense)
    return attach(variables, filter_scales(tree, exclude=exclude, margin=margin))


def _merge_max(a, b):
    """Merge two quant trees by elementwise maximum, keeping sites present
    in only one of them (branch-specific conv sites)."""
    if not isinstance(a, dict) or not isinstance(b, dict):
        return jnp.maximum(jnp.asarray(a, jnp.float32), jnp.asarray(b, jnp.float32))
    out = dict(a)
    for k, v in b.items():
        out[k] = _merge_max(a[k], v) if k in a else v
    return out


def quantize_superres_tile(model, variables, schedule_alpha_hat, lr_img,
                           patch_size: int, magnification: int, key,
                           n_patches: int = 4, **kw):
    """W8A8 preparation for tiled super-resolution: calibrate on real corner
    patches of the LR tile about to be super-resolved (their bicubic x-mag
    upsample is the x0 proxy), then attach the filtered scales. Call once
    per tile-size/content family; the returned variables drive the ordinary
    AggregationSampler unchanged."""
    lr = jnp.asarray(lr_img, jnp.float32)
    H, W = lr.shape[0], lr.shape[1]
    ys = sorted({0, max(0, H - patch_size)})
    xs = sorted({0, max(0, W - patch_size)})
    crops = [lr[y : y + patch_size, x : x + patch_size] for y in ys for x in xs]
    cond = jnp.stack(crops[:n_patches])
    hr = patch_size * magnification
    x0 = jax.image.resize(
        cond, (cond.shape[0], hr, hr, cond.shape[-1]), "bicubic"
    )
    return quantize_for_sampling(
        model, variables, schedule_alpha_hat, x0, cond, key,
        train=False, **kw
    )


def sampling_probes(x0_proxy, schedule_alpha_hat, key, ts=None):
    """Build calibration probes (x_t, t) spanning the sampling trajectory
    without running a chain: x_t = sqrt(a_hat_t) x0 + sqrt(1-a_hat_t) eps
    with ``x0_proxy`` a stand-in for the final sample (for superres, the
    bicubic-upsampled LR tile is an excellent proxy). Returns a list of
    (x, t) pairs (append cond per task). Default ``ts``: six timesteps
    spread over [1, T) so early (noise-dominated) and late (image-dominated)
    activation regimes both inform the scales."""
    if ts is None:
        T = int(schedule_alpha_hat.shape[0])
        ts = sorted({
            max(1, min(T - 1, int(round(f * (T - 1)))))
            for f in (0.002, 0.1, 0.3, 0.5, 0.75, 0.95)
        })
    probes = []
    for i, t in enumerate(ts):
        eps = jax.random.normal(jax.random.fold_in(key, i), x0_proxy.shape)
        a = schedule_alpha_hat[t].astype(jnp.float32)
        x_t = jnp.sqrt(a) * x0_proxy + jnp.sqrt(1.0 - a) * eps
        probes.append((x_t, jnp.full((x0_proxy.shape[0],), t, jnp.int32)))
    return probes

"""Multi-device data parallelism on the 8-virtual-CPU-device mesh."""

import jax
import jax.numpy as jnp
import numpy as np

from diffusionremotesensing_tpu.data.loader import DataLoader
from diffusionremotesensing_tpu.models.unet import (
    init_unet_params,
    residual_attention_unet_generation,
    residual_attention_unet_superres,
)
from diffusionremotesensing_tpu.parallel.sharding import (
    batch_sharding,
    make_mesh,
    replicated_sharding,
    shard_batch,
)
from diffusionremotesensing_tpu.train import Trainer


def test_mesh_has_8_devices():
    mesh = make_mesh()
    assert mesh.devices.size == 8


def test_sharded_train_step_matches_single_device():
    """The same batch + key must give the same loss and parameters whether
    the batch is sharded over 8 devices or run on one (BN reduces over the
    global batch in both cases)."""
    model = residual_attention_unet_generation(num_classes=2)
    variables = init_unet_params(model, jax.random.PRNGKey(0), image_size=16)

    def make(mesh):
        tr = Trainer(
            model, "linear", noise_steps=20, image_size=16, lr=1e-3,
            loss="MSE", mesh=mesh, seed=0,
        )
        # fresh array copies: the jitted step donates its state buffers
        fresh = jax.tree_util.tree_map(jnp.array, variables)
        return tr, tr.init_state(fresh)

    rng = np.random.default_rng(0)
    batch = {
        "x": rng.random((16, 16, 16, 3)).astype(np.float32),
        "cond": rng.integers(0, 2, (16,)).astype(np.int32),
    }
    key = jax.random.PRNGKey(7)

    tr1, st1 = make(None)
    step1 = tr1._build_train_step()
    st1, loss1 = step1(st1, {k: jnp.asarray(v) for k, v in batch.items()}, key)

    mesh = make_mesh()
    tr8, st8 = make(mesh)
    st8 = tr8.replicate_state(st8)
    step8 = tr8._build_train_step()
    st8, loss8 = step8(st8, shard_batch(batch, mesh), key)

    assert np.allclose(float(loss1), float(loss8), rtol=1e-4)
    # BN batch stats are linear reductions over the global batch: tight match
    for a, b in zip(
        jax.tree_util.tree_leaves(st1.batch_stats), jax.tree_util.tree_leaves(st8.batch_stats)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)
    # Adam's first step is +-lr*sign(grad); grads that are ~0 can flip sign
    # under 8-way reduction-order noise, so individual elements may differ by
    # up to 2*lr. Assert the update fields agree in aggregate instead — a
    # missing/incorrect all-reduce diverges by O(1) here.
    # (zero-gradient leaves — the unused skip convs — turn reduction noise
    # into full +-lr steps, so no tighter elementwise bound is meaningful)
    for a, b in zip(jax.tree_util.tree_leaves(st1.params), jax.tree_util.tree_leaves(st8.params)):
        a, b = np.asarray(a), np.asarray(b)
        assert np.abs(a - b).max() <= 2.5e-3  # 2*lr + slack


def test_sharded_training_loop_runs():
    mesh = make_mesh()
    model = residual_attention_unet_superres(magnification_factor=2)
    variables = init_unet_params(model, jax.random.PRNGKey(0), image_size=16)
    trainer = Trainer(
        model, "cosine", noise_steps=10, image_size=16, lr=1e-3, loss="MSE",
        ema_smoothing=True, mesh=mesh,
    )
    state = trainer.init_state(variables)

    rng = np.random.default_rng(1)
    ds = [
        {
            "x": rng.random((16, 16, 3)).astype(np.float32),
            "cond": rng.random((8, 8, 3)).astype(np.float32),
        }
        for _ in range(16)
    ]
    loader = DataLoader(ds, batch_size=8, drop_last=True)
    state = trainer.train(state, epochs=1, train_loader=loader, verbose=False)
    assert int(state.step) == 2
    # outputs stay finite and state stays replicated
    leaf = jax.tree_util.tree_leaves(state.params)[0]
    assert np.isfinite(np.asarray(leaf)).all()


def test_sampler_sharded_over_batch():
    """Sampling with the batch axis sharded across the mesh compiles and
    produces the same result as unsharded (model is deterministic per key)."""
    from diffusionremotesensing_tpu.diffusion import DiffusionProcess

    model = residual_attention_unet_generation(num_classes=4)
    variables = init_unet_params(model, jax.random.PRNGKey(0), image_size=16)

    def apply_fn(v, x, t, cond, mask):
        return model.apply(v, x, t, cond, mask, train=False)

    proc = DiffusionProcess("linear", apply_fn, noise_steps=8, image_size=16, image_channels=3)
    key = jax.random.PRNGKey(3)
    x_T = jax.random.normal(jax.random.PRNGKey(4), (8, 16, 16, 3))
    cond = jnp.arange(8, dtype=jnp.int32) % 4

    sampler = proc.sampler()
    out1 = np.asarray(sampler(variables, key, x_T, cond))

    mesh = make_mesh()
    bs = batch_sharding(mesh)
    rs = replicated_sharding(mesh)
    v8 = jax.device_put(variables, rs)
    out8 = np.asarray(sampler(v8, key, jax.device_put(x_T, bs), jax.device_put(cond, bs)))
    np.testing.assert_allclose(out1, out8, rtol=1e-4, atol=1e-5)


def test_spatially_sharded_single_image_sampling():
    """One image's H axis sharded across all 8 devices (XLA inserts the conv
    halo exchanges) must match unsharded sampling within fp reduction-order
    tolerance."""
    from diffusionremotesensing_tpu.diffusion import make_process
    from diffusionremotesensing_tpu.parallel.sharding import (
        replicated_sharding,
        spatial_sharding,
    )

    model = residual_attention_unet_superres(magnification_factor=2)
    v = init_unet_params(model, jax.random.PRNGKey(0), image_size=64)
    proc = make_process(model, "linear", 6, 64)
    s = proc.sampler()
    key = jax.random.PRNGKey(1)
    x_T = jax.random.normal(jax.random.PRNGKey(2), (1, 64, 64, 3))
    cond = jax.random.uniform(jax.random.PRNGKey(3), (1, 32, 32, 3))
    ref = np.asarray(s(v, key, x_T, cond))

    mesh = make_mesh()
    sp = spatial_sharding(mesh)
    rep = replicated_sharding(mesh)
    out = np.asarray(
        s(jax.device_put(v, rep), key, jax.device_put(x_T, sp), jax.device_put(cond, sp))
    )
    np.testing.assert_allclose(out, ref, atol=1e-4)


def test_tensor_parallel_train_step_matches_replicated():
    """One full train step (fwd + bwd + adam) with the widest conv kernels
    output-channel-sharded over a (data, model) mesh must match the
    replicated step: XLA inserts the TP collectives from the param shardings
    alone (sharding propagation), so loss and updated params agree to fp
    reduction-order tolerance."""
    import optax

    from diffusionremotesensing_tpu.parallel.tensor import (
        make_mesh_2d,
        shard_params_tensor_parallel,
    )
    from jax.sharding import NamedSharding, PartitionSpec as P

    model = residual_attention_unet_superres(magnification_factor=2)
    variables = init_unet_params(model, jax.random.PRNGKey(0), image_size=16)
    opt = optax.adam(1e-3)

    rng = np.random.default_rng(0)
    x = rng.standard_normal((8, 16, 16, 3)).astype(np.float32)
    t = np.full((8,), 5, np.int32)
    cond = rng.random((8, 8, 8, 3)).astype(np.float32)
    eps = rng.standard_normal((8, 16, 16, 3)).astype(np.float32)

    def loss_fn(p, s, x, t, cond, eps):
        out, mut = model.apply(
            {"params": p, "batch_stats": s}, x, t, cond,
            train=True, mutable=["batch_stats"],
        )
        return jnp.mean((out - eps) ** 2), mut["batch_stats"]

    @jax.jit
    def step(p, s, o, x, t, cond, eps):
        (l, new_s), g = jax.value_and_grad(loss_fn, has_aux=True)(p, s, x, t, cond, eps)
        upd, o = opt.update(g, o, p)
        return optax.apply_updates(p, upd), new_s, l, g

    # replicated single-device reference
    p0 = jax.tree_util.tree_map(jnp.array, variables["params"])
    ref_p, _, ref_loss, ref_g = step(
        p0, variables["batch_stats"], opt.init(p0), x, t, cond, eps
    )

    # tensor-parallel: 4x2 (data, model) mesh, kernels with >=128 output
    # features sharded on 'model', batch sharded on 'data'
    mesh = make_mesh_2d(4, 2)
    p_tp = shard_params_tensor_parallel(
        jax.tree_util.tree_map(jnp.array, variables["params"]), mesh, min_features=128
    )
    # at least one kernel must actually be model-sharded for this test to bite
    shardings = jax.tree_util.tree_leaves(
        jax.tree_util.tree_map(lambda a: a.sharding.spec, p_tp),
        is_leaf=lambda s: isinstance(s, P),
    )
    assert any("model" in str(s) for s in shardings)
    s_tp = jax.device_put(variables["batch_stats"], NamedSharding(mesh, P()))
    bs = NamedSharding(mesh, P("data"))
    tp_p, _, tp_loss, tp_g = step(
        p_tp, s_tp, opt.init(p_tp),
        jax.device_put(x, bs), jax.device_put(t, bs),
        jax.device_put(cond, bs), jax.device_put(eps, bs),
    )

    np.testing.assert_allclose(float(tp_loss), float(ref_loss), rtol=1e-5)
    # BN divides by batch statistics whose reduction order differs under the
    # 2-axis sharding, so elementwise grad noise reaches ~1% of a leaf's max;
    # a broken/missing TP collective diverges by O(1). Pin per-leaf relative
    # L2 instead — tight enough to catch wrong math, robust to fp ordering.
    # (adam-updated params are skipped: lr*g/(sqrt(v)+eps) flips sign under
    # epsilon-scale perturbations wherever g ~ 0.)
    del ref_p, tp_p
    ga = np.concatenate([np.asarray(l, np.float64).ravel()
                         for l in jax.tree_util.tree_leaves(ref_g)])
    gb = np.concatenate([np.asarray(l, np.float64).ravel()
                         for l in jax.tree_util.tree_leaves(tp_g)])
    assert np.linalg.norm(gb - ga) / np.linalg.norm(ga) < 1e-2  # global
    for a, b in zip(jax.tree_util.tree_leaves(ref_g), jax.tree_util.tree_leaves(tp_g)):
        a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
        denom = np.linalg.norm(a)
        if denom < 1e-5:  # noise-floor leaf (e.g. unused skip convs): ~zero grad
            assert np.linalg.norm(b) < 1e-5
        else:
            # measured fp-ordering noise reaches ~1.5% on tiny-grad leaves
            assert np.linalg.norm(b - a) / denom < 5e-2


def test_tap44_block_kernel_under_batch_sharded_mesh():
    """The fused-block Pallas kernel's grid is batch-parallel, so GSPMD can
    partition it along the data axis: sharded sampling with tap44='block'
    must match the unsharded dense-s2d path (pins the AggregationSampler
    mesh= + tap44 combination)."""
    from diffusionremotesensing_tpu.diffusion import make_process
    from diffusionremotesensing_tpu.models.unet import (
        init_unet_params,
        residual_attention_unet_superres,
    )
    from diffusionremotesensing_tpu.parallel.sharding import (
        batch_sharding,
        make_mesh,
        replicated_sharding,
    )

    mesh = make_mesh()
    m0 = residual_attention_unet_superres(magnification_factor=2, s2d=True)
    m1 = residual_attention_unet_superres(magnification_factor=2, s2d=True, tap44="block")
    v = init_unet_params(m0, jax.random.PRNGKey(0), image_size=32)
    v = jax.device_put(v, replicated_sharding(mesh))
    xT = jax.device_put(
        jax.random.normal(jax.random.PRNGKey(1), (8, 32, 32, 3)), batch_sharding(mesh)
    )
    cond = jax.device_put(
        jax.random.uniform(jax.random.PRNGKey(2), (8, 16, 16, 3)), batch_sharding(mesh)
    )
    key = jax.random.PRNGKey(3)
    ref = np.asarray(make_process(m0, "cosine", 4, 32).sampler()(v, key, xT, cond))
    got = np.asarray(make_process(m1, "cosine", 4, 32).sampler()(v, key, xT, cond))
    np.testing.assert_allclose(got, ref, atol=1e-4)


def test_tap44_stem_kernel_under_batch_sharded_mesh():
    """Same pin for the fused-stem kernel (tap44='stem'): its extra 5-D cond
    slab operand is batch-major (dim 0), so GSPMD partitions the kernel and
    the encode_cond_stem hoist along the data axis together."""
    from diffusionremotesensing_tpu.diffusion import make_process
    from diffusionremotesensing_tpu.models.unet import (
        init_unet_params,
        residual_attention_unet_superres,
    )
    from diffusionremotesensing_tpu.parallel.sharding import (
        batch_sharding,
        make_mesh,
        replicated_sharding,
    )

    mesh = make_mesh()
    m0 = residual_attention_unet_superres(magnification_factor=2, s2d=True)
    m1 = residual_attention_unet_superres(magnification_factor=2, s2d=True, tap44="stem")
    v = init_unet_params(m0, jax.random.PRNGKey(0), image_size=32)
    v = jax.device_put(v, replicated_sharding(mesh))
    xT = jax.device_put(
        jax.random.normal(jax.random.PRNGKey(1), (8, 32, 32, 3)), batch_sharding(mesh)
    )
    cond = jax.device_put(
        jax.random.uniform(jax.random.PRNGKey(2), (8, 16, 16, 3)), batch_sharding(mesh)
    )
    key = jax.random.PRNGKey(3)
    ref = np.asarray(make_process(m0, "cosine", 4, 32).sampler()(v, key, xT, cond))
    got = np.asarray(make_process(m1, "cosine", 4, 32).sampler()(v, key, xT, cond))
    np.testing.assert_allclose(got, ref, atol=1e-4)


def test_global_replicated_accepts_typed_and_raw_keys():
    """global_replicated must handle new-style typed PRNG keys (np.asarray
    rejects them) as well as raw uint32 keys and plain arrays — callers of
    DiffusionProcess.sample(mesh=...) may pass jax.random.key() keys."""
    from diffusionremotesensing_tpu.parallel.sharding import global_replicated

    mesh = make_mesh()
    typed = global_replicated(jax.random.key(7), mesh)
    assert jnp.issubdtype(typed.dtype, jax.dtypes.prng_key)
    assert typed.sharding.is_fully_replicated
    raw = global_replicated(jax.random.PRNGKey(7), mesh)
    # same key stream regardless of wrapper type
    np.testing.assert_array_equal(
        np.asarray(jax.random.key_data(typed)), np.asarray(raw)
    )
    a = global_replicated(np.arange(12.0).reshape(3, 4), mesh)
    assert a.sharding.is_fully_replicated
    # and the mesh sampling path accepts a typed key end to end
    from diffusionremotesensing_tpu.diffusion import make_process
    from diffusionremotesensing_tpu.models.unet import (
        init_unet_params,
        residual_attention_unet_superres,
    )

    model = residual_attention_unet_superres(magnification_factor=2)
    v = init_unet_params(model, jax.random.PRNGKey(0), image_size=16)
    proc = make_process(model, "cosine", 3, 16)
    cond = jax.random.uniform(jax.random.PRNGKey(1), (2, 8, 8, 3))
    out = proc.sample(v, jax.random.key(5), n=2, cond=cond, mesh=mesh)
    assert np.asarray(out).shape == (2, 16, 16, 3)

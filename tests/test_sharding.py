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

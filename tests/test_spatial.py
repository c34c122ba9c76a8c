"""Spatial model parallelism: training and sampling over a 2D
("data", "model") mesh with the H axis sharded must match the replicated
computation — GSPMD inserts the conv halo exchanges and GroupNorm psums."""

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from tqdne_tpu.models.unet import UNet
from tqdne_tpu.parallel import spatial
from tqdne_tpu.parallel.mesh import replicated
from tqdne_tpu.train.state import TrainState, make_optimizer
from tqdne_tpu.train.steps import make_edm_steps

UNET_2D = dict(
    in_channels=3, out_channels=3, model_channels=32, num_res_blocks=1,
    attention_resolutions=(4,), channel_mult=(1, 2), conv_kernel_size=3,
    dims=2, cond_features=5, num_heads=4,
)


def _setup():
    mesh = spatial.spatial_mesh(model=4)
    assert mesh.shape == {"data": 2, "model": 4}
    unet = UNet(**UNET_2D)
    x = jnp.zeros((1, 32, 32, 3))
    params = unet.init(jax.random.key(0), x, jnp.zeros((1,)), jnp.zeros((1, 5)))
    batch = {
        "signal": jax.random.normal(jax.random.key(1), (4, 32, 32, 3)),
        "cond": jnp.zeros((4, 5)),
    }
    return mesh, unet, params, batch


def test_batch_shardings_specs():
    mesh = spatial.spatial_mesh(model=4)
    batch = {"signal": jnp.zeros((4, 32, 32, 3)), "wave": jnp.zeros((4, 64, 3)),
             "cond": jnp.zeros((4, 5)), "label": jnp.zeros((4,))}
    sh = spatial.batch_shardings(mesh, batch)
    assert sh["signal"].spec == P("data", "model")
    assert sh["wave"].spec == P("data", "model")
    assert sh["cond"].spec == P("data")
    assert sh["label"].spec == P("data")


def test_spatial_training_matches_replicated():
    mesh, unet, params, batch = _setup()
    tx = make_optimizer("adam", 1e-3)
    train_step, _, _ = make_edm_steps(unet, tx)
    key = jax.random.key(2)

    state_r = TrainState.create(params, tx)
    out_r, m_r = jax.jit(train_step)(state_r, batch, key)

    shardings = spatial.batch_shardings(mesh, batch)
    batch_s = spatial.shard_batch(mesh, batch)
    repl = replicated(mesh)
    state_s = jax.device_put(TrainState.create(params, tx), repl)
    step_s = jax.jit(train_step, in_shardings=(repl, shardings, None))
    out_s, m_s = step_s(state_s, batch_s, key)

    np.testing.assert_allclose(float(m_s["loss"]), float(m_r["loss"]), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(out_r.params),
                    jax.tree_util.tree_leaves(out_s.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6)


def test_spatial_sampling_matches_replicated():
    """Small-batch serving layout: batch (2) < devices (8); the spatial
    constraint on the initial noise must not change the samples."""
    mesh, unet, params, _ = _setup()
    _, _, sample_fn = make_edm_steps(unet, None, num_sampling_steps=3)
    shape = (2, 32, 32, 3)
    cond = jnp.zeros((2, 5))
    key = jax.random.key(7)

    base = jax.jit(
        lambda p, k: sample_fn(p, k, shape, cond=cond)
    )(params, key)

    repl = replicated(mesh)
    eps_sh = spatial.signal_sharding(mesh)
    sp = jax.jit(
        lambda p, k: sample_fn(p, k, shape, cond=cond, eps_sharding=eps_sh),
        in_shardings=(repl, None),
    )(jax.device_put(params, repl), key)

    assert np.isfinite(np.asarray(sp)).all()
    np.testing.assert_allclose(np.asarray(sp), np.asarray(base), rtol=2e-4, atol=1e-5)

"""FSDP parameter sharding: sharded-state training matches replicated
training bit-for-bit (GSPMD inserts the gathers/scatters)."""

import numpy as np

import jax
import jax.numpy as jnp

from tqdne_tpu.models.unet import UNet
from tqdne_tpu.parallel.fsdp import fsdp_shardings, fsdp_state_shardings
from tqdne_tpu.parallel.mesh import batch_sharding, make_mesh
from tqdne_tpu.train.state import TrainState, make_optimizer
from tqdne_tpu.train.steps import make_edm_steps

T = 128
UNET = dict(
    in_channels=3, out_channels=3, model_channels=32, num_res_blocks=1,
    attention_resolutions=(), channel_mult=(1, 2), conv_kernel_size=5, dims=1,
    cond_features=5,
)


def test_fsdp_spec_selection():
    mesh = make_mesh()
    tree = {
        "big_kernel": jnp.zeros((5, 64, 512)),     # shard axis 2 (512 % 8 == 0)
        "bias": jnp.zeros((512,)),                 # below min_size -> replicated
        "odd": jnp.zeros((513, 200)),              # shard axis 1 (200 % 8 == 0)
        "tiny": jnp.zeros((4, 4)),
    }
    shardings = fsdp_shardings(tree, mesh, min_size=2**12)
    assert shardings["big_kernel"].spec == jax.sharding.PartitionSpec(None, None, "data")
    assert shardings["bias"].spec == jax.sharding.PartitionSpec()
    assert shardings["odd"].spec == jax.sharding.PartitionSpec(None, "data")
    assert shardings["tiny"].spec == jax.sharding.PartitionSpec()


def test_fsdp_training_matches_replicated():
    mesh = make_mesh()
    unet = UNet(**UNET)
    tx = make_optimizer("adam", 1e-3)
    train_step, _, _ = make_edm_steps(unet, tx)
    x = jnp.zeros((1, T, 3))
    params = unet.init(jax.random.key(0), x, jnp.zeros((1,)), jnp.zeros((1, 5)))
    batch = {
        "signal": jax.random.normal(jax.random.key(1), (8, T, 3)),
        "cond": jnp.zeros((8, 5)),
    }
    key = jax.random.key(2)
    bshard = batch_sharding(mesh)

    # replicated baseline
    state_r = TrainState.create(params, tx)
    out_r, m_r = jax.jit(train_step)(state_r, batch, key)

    # fsdp: shard the whole state (params, ema, optimizer moments)
    state_f = TrainState.create(params, tx)
    shardings = fsdp_state_shardings(state_f, mesh, min_size=2**12)
    state_f = jax.tree_util.tree_map(jax.device_put, state_f, shardings)
    step_f = jax.jit(train_step, in_shardings=(shardings, bshard, None),
                     out_shardings=(shardings, None))
    batch_s = jax.tree_util.tree_map(lambda a: jax.device_put(a, bshard), batch)
    out_f, m_f = step_f(state_f, batch_s, key)

    np.testing.assert_allclose(float(m_f["loss"]), float(m_r["loss"]), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(out_r.params),
                    jax.tree_util.tree_leaves(out_f.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6)

    # the big kernels really are distributed
    leaves = jax.tree_util.tree_leaves(out_f.params)
    assert any(
        not leaf.sharding.is_fully_replicated for leaf in leaves if leaf.size >= 2**12
    )

"""DCN-aware hybrid ("replica", "data") mesh: hierarchical data parallelism
for multi-slice pods (parallel/mesh.py:make_hybrid_mesh).  On the virtual
8-device CPU mesh the slice grouping is simulated by contiguous blocks;
the semantics under test — batch split over both axes, loss identical to
flat dp, FSDP sharding weights only within a slice — are layout-independent."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tqdne_tpu.models.unet import UNet
from tqdne_tpu.parallel.fsdp import fsdp_state_shardings
from tqdne_tpu.parallel.mesh import batch_sharding, make_hybrid_mesh, make_mesh, replicated
from tqdne_tpu.train.state import TrainState, make_optimizer
from tqdne_tpu.train.steps import make_edm_steps

T = 128
UNET = dict(
    in_channels=3, out_channels=3, model_channels=32, num_res_blocks=1,
    attention_resolutions=(), channel_mult=(1, 2), conv_kernel_size=5, dims=1,
    cond_features=5,
)


def test_hybrid_mesh_shape_and_batch_spec():
    mesh = make_hybrid_mesh(num_slices=2)
    assert mesh.shape == {"replica": 2, "data": 4}
    assert batch_sharding(mesh).spec == jax.sharding.PartitionSpec(("replica", "data"))
    # flat mesh keeps the plain spec
    assert batch_sharding(make_mesh()).spec == jax.sharding.PartitionSpec("data")
    with pytest.raises(ValueError):
        make_hybrid_mesh(num_slices=3)  # 3 does not divide 8


def test_hybrid_dp_matches_flat_dp():
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

    def run(mesh):
        bshard = batch_sharding(mesh)
        state = jax.device_put(TrainState.create(params, tx), replicated(mesh))
        step = jax.jit(train_step, in_shardings=(None, bshard, None))
        batch_s = jax.tree_util.tree_map(lambda a: jax.device_put(a, bshard), batch)
        return step(state, batch_s, key)

    out_flat, m_flat = run(make_mesh())
    out_h, m_h = run(make_hybrid_mesh(num_slices=2))
    np.testing.assert_allclose(float(m_h["loss"]), float(m_flat["loss"]), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(out_flat.params),
                    jax.tree_util.tree_leaves(out_h.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6)


def test_hybrid_fsdp_shards_within_slice_only():
    """fsdp over the hybrid mesh: weights shard on `data` (within a slice)
    and replicate across `replica` — the all-gathers stay on ICI."""
    mesh = make_hybrid_mesh(num_slices=2)
    unet = UNet(**UNET)
    tx = make_optimizer("adam", 1e-3)
    train_step, _, _ = make_edm_steps(unet, tx)
    x = jnp.zeros((1, T, 3))
    params = unet.init(jax.random.key(0), x, jnp.zeros((1,)), jnp.zeros((1, 5)))
    state = TrainState.create(params, tx)
    shardings = fsdp_state_shardings(state, mesh, min_size=2**12)
    specs = {s.spec for s in jax.tree_util.tree_leaves(shardings)}
    assert all("replica" not in jax.tree_util.tree_leaves(tuple(sp)) for sp in specs)
    assert any("data" in tuple(sp) for sp in specs)

    bshard = batch_sharding(mesh)
    state = jax.tree_util.tree_map(jax.device_put, state, shardings)
    step = jax.jit(train_step, in_shardings=(shardings, bshard, None),
                   out_shardings=(shardings, None))
    batch = {
        "signal": jax.device_put(
            jax.random.normal(jax.random.key(1), (8, T, 3)), bshard),
        "cond": jax.device_put(jnp.zeros((8, 5)), bshard),
    }
    out, metrics = step(state, batch, jax.random.key(2))
    assert np.isfinite(float(metrics["loss"]))
    assert int(out.step) == 1

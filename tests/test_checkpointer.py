"""Checkpointer behavior: top-k-by-metric, last-always, raw restore."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tqdne_tpu.train.checkpoint import Checkpointer
from tqdne_tpu.train.state import TrainState, make_optimizer


def _state(value: float):
    tx = make_optimizer("adam", 1e-3)
    params = {"params": {"w": jnp.full((4,), value)}}
    return TrainState.create(params, tx)


def test_best_and_last_retention(tmp_path):
    ckpt = Checkpointer(tmp_path, max_best=2, monitor="loss")
    losses = {10: 5.0, 20: 1.0, 30: 3.0, 40: 0.5}
    for step, loss in losses.items():
        ckpt.save(step, jax.device_get(_state(float(step))), metrics={"loss": loss})

    assert ckpt.latest_step() == 40

    # raw restore gives the last save
    raw, step = ckpt.restore_latest_raw()
    assert step == 40
    np.testing.assert_allclose(raw["params"]["params"]["w"], 40.0)

    # best restore picks the smallest loss (step 40, loss 0.5)
    template = _state(0.0)
    best, best_step = ckpt.restore_best(template)
    assert best_step == 40

    # structural restore round-trips dtypes/shapes
    restored, _ = ckpt.restore_latest(template)
    assert restored.params["params"]["w"].shape == (4,)
    assert int(restored.step) == 0
    ckpt.close()


def test_restore_none_when_empty(tmp_path):
    ckpt = Checkpointer(tmp_path / "empty")
    assert ckpt.latest_step() is None
    assert ckpt.restore_latest(_state(0.0)) is None
    assert ckpt.restore_latest_raw() is None
    ckpt.close()


def test_hyperparameters_in_checkpoint(tmp_path):
    """save_hyperparameters/load_from_checkpoint parity (reference
    edm.py:103, utils.py:46-70): checkpoints are self-describing and
    restores refuse silently-drifted architectures."""
    import pytest

    from tqdne_tpu.train.checkpoint import Checkpointer

    ckpt = Checkpointer(tmp_path / "checkpoints")
    hp = {"kind": "edm", "unet": {"model_channels": 64, "channel_mult": (1, 2, 4)}}
    assert ckpt.restore_hyperparameters() is None
    assert not ckpt.verify_hyperparameters(hp)  # nothing stored yet
    ckpt.save_hyperparameters(hp)
    stored = ckpt.restore_hyperparameters()
    assert stored["unet"]["model_channels"] == 64
    # tuples survive JSON round-trip comparison
    assert ckpt.verify_hyperparameters(hp)
    # drifted architecture -> hard error (strict) or warning
    bad = {"kind": "edm", "unet": {"model_channels": 128, "channel_mult": (1, 2, 4)}}
    with pytest.raises(ValueError, match="model_channels"):
        ckpt.verify_hyperparameters(bad)
    assert not ckpt.verify_hyperparameters(bad, strict=False)
    ckpt.close()

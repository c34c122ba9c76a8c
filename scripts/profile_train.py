"""Capture + summarize a TPU profile of the flagship training step.

Usage: python scripts/profile_train.py [outdir]
Same offline perfetto parsing as profile_sampler.py, over 3 chained
latent-EDM train steps (batch 64, bf16) ending in a scalar fetch.
"""

from __future__ import annotations

import sys
from pathlib import Path

import jax
import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from scripts.profile_sampler import summarize  # noqa: E402


def capture(outdir: str):
    from tqdne_tpu import configs
    from tqdne_tpu.cli.common import enable_compilation_cache
    from tqdne_tpu.models.autoencoder import AutoencoderKL
    from tqdne_tpu.models.unet import UNet
    from tqdne_tpu.train.state import TrainState, make_optimizer
    from tqdne_tpu.train.steps import make_edm_steps

    enable_compilation_cache()
    cfg = configs.LatentSpectrogramConfig(workdir=".")
    enc_cfg, dec_cfg = configs.get_2d_autoencoder_configs(cfg)
    ae = AutoencoderKL(encoder_config=enc_cfg, decoder_config=dec_cfg, dtype=jnp.bfloat16)
    ae_vars = jax.jit(ae.init)(
        {"params": jax.random.key(0), "sample": jax.random.key(1)},
        jnp.zeros((1, 128, 128, 3)),
    )
    ucfg = configs.get_2d_unet_config(cfg, in_channels=8, out_channels=8)
    unet = UNet(**ucfg, dtype=jnp.bfloat16)
    params = jax.jit(unet.init)(
        jax.random.key(2), jnp.zeros((1, 32, 32, 8)), jnp.zeros((1,)), jnp.zeros((1, 5))
    )
    tx = make_optimizer("adam", 1e-4)
    train_step, _, _ = make_edm_steps(unet, tx, autoencoder=ae)
    step = jax.jit(train_step, donate_argnums=(0,))

    batch = {
        "signal": jax.random.normal(jax.random.key(3), (64, 128, 128, 3)),
        "cond": jnp.zeros((64, 5)),
    }
    state = TrainState.create(params, tx)
    state, m = step(state, batch, jax.random.key(4), ae_vars)
    float(m["loss"])
    with jax.profiler.trace(outdir):
        for i in range(3):
            state, m = step(state, batch, jax.random.key(5 + i), ae_vars)
        float(m["loss"])


if __name__ == "__main__":
    outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/prof_train"
    capture(outdir)
    summarize(outdir)

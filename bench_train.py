"""Secondary benchmark: training samples/sec/chip, flagship latent EDM.

(bench.py stays the driver's single-line headline; this measures the
BASELINE.md companion metric.)  Full-size flagship configuration: frozen
2D VAE encode (128x128x3 -> 32x32x8) + EDM loss + grad + Adam + EMA on
the model_channels=128 UNet, bf16 compute / f32 params, one chip.

Prints one JSON line:
  {"metric": "train_samples_per_sec_per_chip_latent_edm", ...}
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp

from tqdne_tpu.cli.common import enable_compilation_cache, enable_fast_prng

enable_compilation_cache()
enable_fast_prng()


def measure(batch: int = 128, iters: int = 30) -> float:
    """Measure flagship latent-EDM training samples/sec/chip (one number).

    Shared by the standalone CLI below and bench.py's budget-fenced
    training secondary (VERDICT r3 #3: BASELINE.json names training
    samples/sec as a companion headline, so the driver-visible bench
    must emit it).
    """
    # batch sweep (BENCH_NOTES round 2): 64 -> 1882, 128 -> 2127,
    # 256 -> 2169 samples/s; 128 is the knee (256 costs 2x memory for +2%)
    from tqdne_tpu import configs
    from tqdne_tpu.models.autoencoder import AutoencoderKL
    from tqdne_tpu.models.unet import UNet
    from tqdne_tpu.train.state import TrainState, cosine_annealing, make_optimizer
    from tqdne_tpu.train.steps import make_edm_steps

    cfg = configs.LatentSpectrogramConfig(workdir=".")
    enc_cfg, dec_cfg = configs.get_2d_autoencoder_configs(cfg)
    ae = AutoencoderKL(encoder_config=enc_cfg, decoder_config=dec_cfg, dtype=jnp.bfloat16)
    x = jnp.zeros((1, 128, 128, 3))
    ae_vars = jax.jit(ae.init)({"params": jax.random.key(0), "sample": jax.random.key(1)}, x)

    ucfg = configs.get_2d_unet_config(cfg, 8, 8)
    unet = UNet(**ucfg, dtype=jnp.bfloat16)
    params = jax.jit(unet.init)(jax.random.key(2), jnp.zeros((1, 32, 32, 8)),
                                jnp.zeros((1,)), jnp.zeros((1, 5)))

    tx = make_optimizer("adam", cosine_annealing(1e-4, 100_000))
    train_step, _, _ = make_edm_steps(unet, tx, autoencoder=ae)
    state = TrainState.create(params, tx)

    # device-side batch generation: a host->device transfer over ~32 MB
    # trips the axon relay's payload limit (INVALID_ARGUMENT at 50 MB)
    batch_data = {
        "signal": jax.jit(lambda k: jax.random.normal(k, (batch, 128, 128, 3)))(
            jax.random.key(3)),
        "cond": jnp.zeros((batch, 5)),
    }
    step = jax.jit(train_step, donate_argnums=(0,))

    state, metrics = step(state, batch_data, jax.random.key(4), ae_vars)  # compile
    float(metrics["loss"])  # scalar fetch: the relay's ready-notifications
    # can fire early (BENCH_NOTES.md), a fetch cannot

    t0 = time.perf_counter()
    for i in range(iters):
        state, metrics = step(state, batch_data, jax.random.key(5 + i), ae_vars)
    float(metrics["loss"])
    dt = time.perf_counter() - t0
    return batch * iters / dt


def main(batch: int = 128, iters: int = 30):
    from bench import emit  # shared per-metric anchor / vs_baseline logic

    emit("train_samples_per_sec_per_chip_latent_edm", measure(batch, iters),
         unit="samples/sec/chip")


if __name__ == "__main__":
    main()

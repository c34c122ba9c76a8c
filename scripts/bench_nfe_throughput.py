"""Throughput at reduced sampling steps — companion to scripts/nfe_sweep.sh.

nfe_sweep.sh measures QUALITY (FID/ASD/accuracy) per {solver, steps} point
on trained weights; this measures THROUGHPUT per point at the flagship
shape (random init — throughput depends on architecture, not weights).
Together they give the speed/quality frontier in docs/quality/README.md.

Usage: python scripts/bench_nfe_throughput.py [batch]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import jax
import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 64

    from tqdne_tpu import configs
    from tqdne_tpu.models.autoencoder import AutoencoderKL
    from tqdne_tpu.models.unet import UNet
    from tqdne_tpu.train.steps import make_edm_steps

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
    _, _, sample_fn = make_edm_steps(unet, tx=None, autoencoder=ae, num_sampling_steps=25)
    cond = jnp.zeros((batch, 5))
    latent_shape = (batch, 32, 32, 8)

    for solver in ("heun", "dpmpp_2m"):
        for steps in (25, 10, 5):

            @jax.jit
            def run(params, ae_vars, key, _solver=solver, _steps=steps):
                return sample_fn(params, key, latent_shape, cond=cond, ae_vars=ae_vars,
                                 cast_params=jnp.bfloat16, solver=_solver, num_steps=_steps)

            out = run(params, ae_vars, jax.random.key(9))
            float(out.sum())  # scalar fetch: relay-safe completion barrier
            n = 5
            t0 = time.perf_counter()
            for i in range(n):
                out = run(params, ae_vars, jax.random.key(i))
            float(out.sum())
            dt = (time.perf_counter() - t0) / n
            print(json.dumps({"solver": solver, "steps": steps, "batch": batch,
                              "wf_per_s": round(batch / dt, 1)}), flush=True)


if __name__ == "__main__":
    main()

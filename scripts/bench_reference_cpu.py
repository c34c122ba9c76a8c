"""Same-hardware baseline: the reference torch flagship sampler vs ours, CPU.

The reference publishes no throughput numbers (SURVEY §6), and no GPU is
reachable from this environment, so the only *measured* external anchor we
can produce is a same-host CPU comparison: the reference's own sampling
path (python for-loop over 25 Heun steps = 49 UNet forwards in float64
accumulators with an f32 torch model, then VAE decode —
/root/reference/tqdne/edm.py:146-196) against our jit-compiled lax.scan
sampler on the same machine, same architecture, same batch and step count.
Weights are random — throughput does not depend on their values.

Usage:
    python scripts/bench_reference_cpu.py [--batch 4] [--steps 25]
        [--model-channels 128] [--side both|torch|jax] [--repeats 2]

Prints one JSON line per side plus a ratio line.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))  # repo root
sys.path.insert(0, "/root/reference")  # torch-only modules; read for benchmarking


# ---- EDM constants/formulas (reference tqdne/edm.py:9-52) -------------------
SIGMA_MIN, SIGMA_MAX, RHO, SIGMA_DATA = 0.002, 80.0, 7.0, 0.5


def sampling_sigmas(num_steps):
    idx = np.arange(num_steps, dtype=np.float64)
    rho_inv = 1.0 / RHO
    s = (SIGMA_MAX**rho_inv + idx / (num_steps - 1) * (SIGMA_MIN**rho_inv - SIGMA_MAX**rho_inv)) ** RHO
    return np.concatenate([s, [0.0]])


def unet_cfg(model_channels):
    # /root/reference/tqdne/architectures.py:61-79 (flagship latent EDM)
    return dict(
        in_channels=8, out_channels=8, cond_features=5, dims=2,
        conv_kernel_size=3, model_channels=model_channels,
        channel_mult=(1, 2, 4, 4), attention_resolutions=(8,),
        num_res_blocks=2, num_heads=4, dropout=0.1,
    )


def decoder_cfg():
    # /root/reference/tqdne/architectures.py:40-58
    return dict(
        model_channels=64, channel_mult=(1, 2, 4), attention_resolutions=(),
        num_res_blocks=2, dims=2, conv_kernel_size=3, dropout=0.1,
        in_channels=8, out_channels=3,
    )


def bench_torch(batch, steps, model_channels, repeats):
    import torch

    from tqdne.blocks import Decoder  # reference
    from tqdne.unet import UNetModel  # reference

    torch.manual_seed(0)
    unet = UNetModel(**unet_cfg(model_channels), flash_attention=False).eval()
    dec = Decoder(**decoder_cfg()).eval()
    sigmas = torch.tensor(sampling_sigmas(steps))
    cond = torch.zeros(batch, 5)

    @torch.no_grad()
    def precond_forward(x, sigma):
        # edm.py:105-113: in/skip/out scalings + 0.25 log sigma conditioning
        in_s = (sigma**2 + SIGMA_DATA**2) ** -0.5
        skip_s = SIGMA_DATA**2 / (sigma**2 + SIGMA_DATA**2)
        out_s = sigma * SIGMA_DATA / (sigma**2 + SIGMA_DATA**2) ** 0.5
        noise_cond = 0.25 * sigma.log()
        out = unet((x * in_s).float(), noise_cond.float().repeat(len(x)), cond=cond)
        return out.double() * out_s + skip_s * x

    @torch.no_grad()
    def sample():
        # edm.py:171-196: float64 accumulators, python loop, Heun correction
        x = torch.randn(batch, 8, 32, 32, dtype=torch.float64) * sigmas[0]
        for i, (sigma, sigma_next) in enumerate(zip(sigmas[:-1], sigmas[1:])):
            pred = precond_forward(x, sigma)
            d = (x - pred) / sigma
            x_next = x + d * (sigma_next - sigma)
            if i < steps - 1:
                pred_next = precond_forward(x_next, sigma_next)
                d_prime = (x_next - pred_next) / sigma_next
                x_next = x + (sigma_next - sigma) * (0.5 * d + 0.5 * d_prime)
            x = x_next
        return dec(x.float())

    sample()  # warmup (allocator, thread pools)
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = sample()
        dt = time.perf_counter() - t0
        best = min(best, dt)
    assert out.shape == (batch, 3, 128, 128)
    return batch / best


def bench_jax(batch, steps, model_channels, repeats):
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from tqdne_tpu import configs
    from tqdne_tpu.models.autoencoder import AutoencoderKL
    from tqdne_tpu.models.unet import UNet
    from tqdne_tpu.train.steps import make_edm_steps

    cfg = configs.LatentSpectrogramConfig(workdir=".")
    enc_cfg, dec_cfg = configs.get_2d_autoencoder_configs(cfg)
    ae = AutoencoderKL(encoder_config=enc_cfg, decoder_config=dec_cfg)
    ae_vars = jax.jit(ae.init)(
        {"params": jax.random.key(0), "sample": jax.random.key(1)},
        jnp.zeros((1, 128, 128, 3)),
    )
    ucfg = configs.get_2d_unet_config(cfg, in_channels=8, out_channels=8,
                                      model_channels=model_channels)
    unet = UNet(**ucfg)
    params = jax.jit(unet.init)(
        jax.random.key(2), jnp.zeros((1, 32, 32, 8)), jnp.zeros((1,)), jnp.zeros((1, 5))
    )
    _, _, sample_fn = make_edm_steps(unet, tx=None, autoencoder=ae,
                                     num_sampling_steps=steps)
    cond = jnp.zeros((batch, 5))

    @jax.jit
    def run(params, ae_vars, key):
        return sample_fn(params, key, (batch, 32, 32, 8), cond=cond, ae_vars=ae_vars)

    out = jax.block_until_ready(run(params, ae_vars, jax.random.key(3)))  # compile
    best = float("inf")
    for i in range(repeats):
        t0 = time.perf_counter()
        out = jax.block_until_ready(run(params, ae_vars, jax.random.key(4 + i)))
        best = min(best, time.perf_counter() - t0)
    assert out.shape == (batch, 128, 128, 3)
    return batch / best


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--steps", type=int, default=25)
    p.add_argument("--model-channels", type=int, default=128)
    p.add_argument("--repeats", type=int, default=2)
    p.add_argument("--side", choices=("both", "torch", "jax"), default="both")
    args = p.parse_args(argv)

    results = {}
    if args.side in ("both", "torch"):
        results["reference_torch_cpu"] = bench_torch(
            args.batch, args.steps, args.model_channels, args.repeats)
        print(json.dumps({"metric": "sampled waveforms/sec (reference torch, CPU)",
                          "value": round(results["reference_torch_cpu"], 3)}), flush=True)
    if args.side in ("both", "jax"):
        results["tqdne_tpu_jax_cpu"] = bench_jax(
            args.batch, args.steps, args.model_channels, args.repeats)
        print(json.dumps({"metric": "sampled waveforms/sec (tqdne_tpu jax, CPU)",
                          "value": round(results["tqdne_tpu_jax_cpu"], 3)}), flush=True)
    if len(results) == 2:
        print(json.dumps({"metric": "jax/torch same-CPU throughput ratio",
                          "value": round(results["tqdne_tpu_jax_cpu"]
                                         / results["reference_torch_cpu"], 3)}), flush=True)


if __name__ == "__main__":
    main()

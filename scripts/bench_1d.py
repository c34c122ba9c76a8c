"""1D UNet forward benchmark (the conv1d north-star measurement).

Chained fori_loop timing with fresh inputs + device_get (the only
trustworthy protocol through the axon relay — BENCH_NOTES.md).

Usage: python scripts/bench_1d.py
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from tqdne_tpu import configs  # noqa: E402
from tqdne_tpu.cli.common import enable_compilation_cache  # noqa: E402
from tqdne_tpu.models.unet import UNet  # noqa: E402

enable_compilation_cache()


def main(batch: int = 64, n: int = 100):
    cfg = configs.MovingAverageEnvelopeConfig(workdir=".")
    ucfg = configs.get_1d_unet_config(cfg, in_channels=6, out_channels=6)
    unet = UNet(**ucfg, dtype=jnp.bfloat16)
    params = jax.jit(unet.init)(
        jax.random.key(0), jnp.zeros((1, 4064, 6)), jnp.zeros((1,)), jnp.zeros((1, 5))
    )
    pbf = jax.tree.map(lambda p: p.astype(jnp.bfloat16), params)
    s = jnp.ones((batch,))
    c = jnp.zeros((batch, 5))

    @jax.jit
    def chain(params, x, s, c):
        def body(i, xx):
            return unet.apply(params, xx.astype(jnp.float32), s, c).astype(jnp.float32)

        return jax.lax.fori_loop(0, n, body, x)

    flops = float(
        jax.jit(lambda p, x: unet.apply(p, x, s, c))
        .lower(pbf, jnp.zeros((batch, 4064, 6)))
        .compile()
        .cost_analysis()["flops"]
    )
    x1 = jax.random.normal(jax.random.key(1), (batch, 4064, 6), jnp.float32)
    jax.device_get(chain(pbf, x1, s, c))  # warmup/compile
    x2 = jax.random.normal(jax.random.key(2), (batch, 4064, 6), jnp.float32)
    t0 = time.perf_counter()
    out = jax.device_get(chain(pbf, x2, s, c))
    dt = time.perf_counter() - t0
    assert np.isfinite(out).all()
    print(
        f"1D UNet fwd (batch {batch}, chained x{n}): {dt / n * 1e3:.2f} ms/fwd, "
        f"{flops * n / dt / 1e12:.1f} TFLOP/s = "
        f"{flops * n / dt / 197e12 * 100:.0f}% of v5e bf16 peak "
        f"({flops / batch / 1e9:.2f} GF/sample)"
    )


if __name__ == "__main__":
    main()

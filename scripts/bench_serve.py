"""Serving-path benchmark: HTTP + micro-batching overhead on the real chip.

Measures what tqdne-serve adds on top of the raw jitted sampler
(bench.py's headline program): batch-1 request latency through the full
HTTP + coalescing stack, and aggregate throughput under concurrent load
(the micro-batcher should recover most of the batched device rate).

Random-init flagship weights (throughput depends on architecture, not
weights); representation inversion excluded (identity invert) so the
numbers isolate the serving machinery + sampler. Not the driver bench —
run manually: `python scripts/bench_serve.py [--solver dpmpp_2m]`.
"""

from __future__ import annotations

import argparse
import json
import sys
import threading
import time
import urllib.request
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from tqdne_tpu import serving  # noqa: E402
from tqdne_tpu.cli.common import enable_compilation_cache  # noqa: E402

enable_compilation_cache()


def build_run(batch: int, solver: str):
    """Flagship latent-EDM sampler (bench.py semantics), channels-first out."""
    from tqdne_tpu import configs
    from tqdne_tpu.models.autoencoder import AutoencoderKL
    from tqdne_tpu.models.unet import UNet
    from tqdne_tpu.train.steps import make_edm_steps

    cfg = configs.LatentSpectrogramConfig(workdir=".")
    enc_cfg, dec_cfg = configs.get_2d_autoencoder_configs(cfg)
    ae = AutoencoderKL(encoder_config=enc_cfg, decoder_config=dec_cfg,
                       dtype=jnp.bfloat16)
    ae_vars = jax.jit(ae.init)(
        {"params": jax.random.key(0), "sample": jax.random.key(1)},
        jnp.zeros((1, 128, 128, 3)))
    ucfg = configs.get_2d_unet_config(cfg, in_channels=8, out_channels=8)
    unet = UNet(**ucfg, dtype=jnp.bfloat16)
    params = jax.jit(unet.init)(
        jax.random.key(2), jnp.zeros((1, 32, 32, 8)), jnp.zeros((1,)),
        jnp.zeros((1, 5)))
    _, _, sample_fn = make_edm_steps(unet, tx=None, autoencoder=ae,
                                     num_sampling_steps=25)
    shape = (batch, 32, 32, 8)

    @jax.jit
    def run(params, ae_vars, key, cond):
        return sample_fn(params, key, shape, cond=cond, ae_vars=ae_vars,
                         cast_params=jnp.bfloat16, solver=solver)

    params = jax.device_put(params)
    ae_vars = jax.device_put(ae_vars)

    def run_dev(key, cond):
        # async dispatch: the Microbatcher's finalizer thread does the
        # blocking device->host fetch (fetch_host) while the next batch runs
        return run(params, ae_vars, key, jnp.asarray(cond))

    def fetch_host(out):
        return np.moveaxis(np.asarray(out, np.float32), -1, 1)

    return run_dev, fetch_host


def post(url: str, payload: dict) -> dict:
    req = urllib.request.Request(url, data=json.dumps(payload).encode(),
                                 headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=600) as r:
        return json.loads(r.read())


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--solver", default="heun", choices=["heun", "dpmpp_2m"])
    ap.add_argument("--batch-size", type=int, default=64)
    ap.add_argument("--clients", type=int, default=16)
    ap.add_argument("--rows-per-request", type=int, default=8)
    ap.add_argument("--requests-per-client", type=int, default=4)
    args = ap.parse_args()

    run_dev, fetch_host = build_run(args.batch_size, args.solver)
    batcher = serving.Microbatcher(run_dev, lambda x: x, args.batch_size,
                                   t_out=128, max_delay_ms=25.0,
                                   fetch_fn=fetch_host)
    server = serving.make_server(batcher, lambda c: c, {"bench": True}, port=0)
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    url = f"http://127.0.0.1:{port}/generate"
    cond_row = [0.0] * len(serving.FEATURES)

    # warmup (compile)
    post(url, {"conditions": [cond_row], "format": "b64"})

    # batch-1 latency through the full stack (pad-to-64 device batch)
    lats = []
    for _ in range(8):
        t0 = time.perf_counter()
        post(url, {"conditions": [cond_row], "format": "b64"})
        lats.append(time.perf_counter() - t0)
    lats.sort()
    print(json.dumps({
        "metric": f"serve_batch1_latency_{args.solver}",
        "p50_ms": round(lats[len(lats) // 2] * 1e3, 1),
        "p95_ms": round(lats[int(len(lats) * 0.95) - 1] * 1e3, 1),
        "note": "includes micro-batch window + HTTP + base64",
    }), flush=True)

    # concurrent load: clients x requests, rows coalesced into device batches
    n_rows = args.clients * args.requests_per_client * args.rows_per_request
    batches_before = batcher.batches_run
    errs = []

    def client():
        try:
            for _ in range(args.requests_per_client):
                post(url, {"conditions": [cond_row] * args.rows_per_request,
                           "format": "b64"})
        except Exception as e:  # pragma: no cover
            errs.append(e)

    threads = [threading.Thread(target=client) for _ in range(args.clients)]
    t0 = time.perf_counter()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    dt = time.perf_counter() - t0
    if errs:
        raise errs[0]
    print(json.dumps({
        "metric": f"serve_throughput_{args.solver}",
        "value": round(n_rows / dt, 1),
        "unit": "waveforms/sec/chip",
        "device_batches": batcher.batches_run - batches_before,
        "rows": n_rows,
        "note": f"{args.clients} clients x {args.requests_per_client} req x "
                f"{args.rows_per_request} rows, device batch {args.batch_size}",
    }), flush=True)

    server.shutdown()
    server.server_close()
    batcher.shutdown()


if __name__ == "__main__":
    main()

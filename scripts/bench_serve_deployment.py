"""Composed deployment-point serving benchmark (VERDICT r4 #10).

The three serving optimizations — the dpmpp_2m@10 operating point (best
measured FID, docs/quality NFE sweep), trained flagship weights, and the
measured Griffin-Lim iteration knee — were each benchmarked separately.
This drives them COMPOSED, through the real `tqdne-serve` stack (HTTP +
micro-batching + on-device inversion), and reports one saturation number:

    python scripts/bench_serve_deployment.py --workdir qrun \
        --gl-iters 32 [--clients 16] [--out docs/quality/serve_deployment.json]

Starts `tqdne-serve --config latent_edm --solver dpmpp_2m --num_steps 10`
as a subprocess on a free port, waits for readiness, then measures batch-1
latency and concurrent-load throughput (rows/sec through the full stack,
waveform payloads included).  Requires the trained flagship chain in
--workdir (scripts/quality_loop.sh).
"""

from __future__ import annotations

import argparse
import json
import socket
import subprocess
import sys
import threading
import time
import urllib.request
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]


def free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def post(url: str, payload: dict, timeout: float = 900.0) -> dict:
    req = urllib.request.Request(url, data=json.dumps(payload).encode(),
                                 headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=timeout) as r:
        return json.loads(r.read())


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="qrun")
    ap.add_argument("--gl-iters", type=int, default=None)
    ap.add_argument("--batch-size", type=int, default=64)
    ap.add_argument("--clients", type=int, default=16)
    ap.add_argument("--rows-per-request", type=int, default=8)
    ap.add_argument("--requests-per-client", type=int, default=4)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    port = free_port()
    cmd = [sys.executable, "-m", "tqdne_tpu.cli.serve",
           "--workdir", args.workdir, "--config", "latent_edm",
           "--solver", "dpmpp_2m", "--num_steps", "10",
           "--batch_size", str(args.batch_size), "--port", str(port)]
    if args.gl_iters:
        cmd += ["--gl-iters", str(args.gl_iters)]
    print("starting:", " ".join(cmd), flush=True)
    proc = subprocess.Popen(cmd, cwd=ROOT, stdout=subprocess.DEVNULL,
                            stderr=subprocess.STDOUT)
    url = f"http://127.0.0.1:{port}/generate"
    cond = {"hypocentral_distance": 50.0, "magnitude": 5.5, "vs30": 400.0,
            "hypocentre_depth": 20.0, "azimuthal_gap": 100.0}
    try:
        # readiness + compile warmup (first call compiles sampler + GL)
        deadline = time.time() + 900
        while True:
            try:
                post(url, {"conditions": [cond], "format": "b64"})
                break
            except Exception:
                if proc.poll() is not None:
                    raise SystemExit("tqdne-serve exited during startup")
                if time.time() > deadline:
                    raise SystemExit("tqdne-serve never became ready")
                time.sleep(5)

        lats = []
        for _ in range(8):
            t0 = time.perf_counter()
            post(url, {"conditions": [cond], "format": "b64"})
            lats.append(time.perf_counter() - t0)
        lats.sort()

        n_rows = args.clients * args.requests_per_client * args.rows_per_request
        errs: list = []

        def client():
            try:
                for _ in range(args.requests_per_client):
                    post(url, {"conditions": [cond] * args.rows_per_request,
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

        result = {
            "metric": "serve_deployment_dpmpp10_trained_e2e",
            "value": round(n_rows / dt, 1),
            "unit": "waveforms/sec/chip",
            "batch1_p50_ms": round(lats[len(lats) // 2] * 1e3, 1),
            "batch1_p95_ms": round(lats[int(len(lats) * 0.95) - 1] * 1e3, 1),
            "config": {"solver": "dpmpp_2m", "num_steps": 10,
                       "gl_iters": args.gl_iters or 128,
                       "weights": f"trained({args.workdir})",
                       "device_batch": args.batch_size,
                       "clients": args.clients,
                       "rows_per_request": args.rows_per_request},
            "note": "full stack: HTTP + micro-batch coalescing + dpmpp_2m@10 "
                    "sampling + VAE decode + on-device Griffin-Lim + b64 payload",
            # self-describing provenance so the curated copy in docs/quality
            # passes scripts/restamp_reports.py --check
            "provenance": {"script": "scripts/bench_serve_deployment.py",
                           "round": 5, "workdir": args.workdir,
                           "recipe": "latent_edm", "solver": "dpmpp_2m",
                           "num_steps": 10},
        }
        print(json.dumps(result), flush=True)
        if args.out:
            Path(args.out).write_text(json.dumps(result, indent=1) + "\n")
    finally:
        proc.terminate()
        try:
            proc.wait(timeout=30)
        except subprocess.TimeoutExpired:
            proc.kill()


if __name__ == "__main__":
    main()

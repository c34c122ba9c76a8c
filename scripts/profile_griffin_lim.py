"""A/B the Griffin-Lim implementation on the TPU at the flagship shape.

The e2e bench (sampling + VAE decode + Griffin-Lim x128 to waveforms)
spends ~2/3 of its time in Griffin-Lim.  Each iteration is an iSTFT+STFT
over (B, 3, 129, 128) spectrograms; with n_fft=256 the per-frame
transforms are small, so the fft path runs on the VPU with gather/scatter
framing while the matmul path runs DFT matrices on the MXU with pure
slicing.  Full-program timings only (relay micro-timings are unreliable,
BENCH_NOTES.md).

Usage: python scripts/profile_griffin_lim.py [--batch 64] [--iters 128]
"""

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from tqdne_tpu.cli.common import enable_compilation_cache
from tqdne_tpu.ops import spectral as jsp


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--iters", type=int, default=128)
    p.add_argument("--repeats", type=int, default=3)
    args = p.parse_args()

    enable_compilation_cache()
    rng = np.random.default_rng(0)
    mag = jnp.asarray(np.abs(rng.standard_normal((args.batch, 3, 129, 128))),
                      jnp.float32)

    # chain each call's input on the previous output so the relay cannot
    # report ready before the work is done (BENCH_NOTES: micro-timings via
    # ready-notifications are unreliable; only chained full-program
    # timings are load-bearing)
    chain = 4

    results = {}
    for impl in ("fft", "matmul"):
        def fn_impl(m, k, impl=impl):
            wf = jsp.griffin_lim(m, k, 256, 32, 4064, n_iter=args.iters, impl=impl)
            return jnp.abs(jsp.stft(wf, 256, 32, impl=impl))[..., :129, :128]

        fn = jax.jit(fn_impl)
        out = fn(mag, jax.random.key(0))
        float(out.sum())  # compile + force completion (block_until_ready can
        # return early through the relay — a scalar fetch cannot)
        best = float("inf")
        for i in range(args.repeats):
            m = mag
            t0 = time.perf_counter()
            for j in range(chain):
                m = fn(m, jax.random.key(i * 131 + j))
            float(m.sum())
            best = min(best, (time.perf_counter() - t0) / chain)
        results[impl] = best
        print(json.dumps({"impl": impl, "seconds": round(best, 4),
                          "waveforms_per_s": round(args.batch / best, 2)}), flush=True)
        assert np.isfinite(np.asarray(out)).all()

    print(json.dumps({"metric": "matmul speedup over fft",
                      "value": round(results["fft"] / results["matmul"], 3)}), flush=True)


if __name__ == "__main__":
    main()

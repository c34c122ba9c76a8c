"""Griffin-Lim iteration sweep: quality vs cost of on-device phase recovery.

The reference inverts log-spectrograms with 128 librosa Griffin-Lim
iterations (/root/reference/tqdne/representation.py:106-108) and our
device GL matches that default for parity.  But GL cost is ~20% of the
end-to-end generation path (e2e 155.5 vs 196 wf/s sampling-only,
BENCH_NOTES), and momentum-GL converges geometrically — most of the 128
iterations may buy nothing measurable.  This script measures, per
iteration count, on the REAL generated spectrograms of a trained run
(the tqdne-evaluate HDF5):

- ASD Frechet distance per channel of the inverted waveforms vs the
  held-out real target waveforms (the report.py waveform-domain metric
  that GL quality feeds);
- spectral convergence error || |STFT(x)| - M || / ||M|| (the standard GL
  objective) against the model-generated magnitude M;
- device milliseconds per batch-64 inversion (chained timing, scalar
  fetch — the BENCH_NOTES protocol).

Usage:
  python scripts/gl_iter_sweep.py qrun/evaluation/<run>-split_test-rank_0.h5 \
      --out qrun/evaluation/gl_iter_sweep.json
"""

from __future__ import annotations

import argparse
import json
import time
from pathlib import Path

import h5py
import numpy as np

import jax
import jax.numpy as jnp

from tqdne_tpu.cli.common import enable_compilation_cache
from tqdne_tpu.data.representation import LogSpectrogram
from tqdne_tpu.eval.metrics import AmplitudeSpectralDensity
from tqdne_tpu.ops import spectral as jspectral


def load_eval(path: Path):
    with h5py.File(path, "r") as f:
        pred_signal = f["predicted_signal"][()]  # (n, C, F, T) channels-first
        target_wf = f["target_waveform"][()]  # (n, 3, t)
    return pred_signal, target_wf


def signal_to_mag(rep: LogSpectrogram, signal_cf: np.ndarray) -> np.ndarray:
    """Normalized [-1,1] log-spectrogram -> linear magnitude incl. Nyquist row."""
    log_spec = (signal_cf.astype(np.float64) + 1) / 2 * (rep.log_max - rep.log_clip)
    log_spec += rep.log_clip
    mag = np.exp(np.minimum(log_spec, rep.log_spec_ceiling)).astype(np.float32)
    pad = np.zeros_like(mag[..., :1, :])
    return np.concatenate([mag, pad], axis=-2)  # (n, C, bins, frames)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("eval_h5", type=Path)
    ap.add_argument("--iters", type=int, nargs="+", default=[8, 16, 32, 64, 128, 256])
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--length", type=int, default=4064)
    ap.add_argument("--timing-reps", type=int, default=4)
    ap.add_argument("--out", type=Path, default=None)
    args = ap.parse_args()

    enable_compilation_cache()
    # build the representation FROM the project config so n_fft/hop match
    # the spectrograms in the eval HDF5 (hop 32; the LogSpectrogram default
    # hop of stft_channels//4 = 64 would crash griffin_lim on 128-frame data)
    from tqdne_tpu import configs

    cfg = configs.LatentSpectrogramConfig(workdir=".")
    rep = LogSpectrogram(
        stft_channels=cfg.stft_channels, hop_size=cfg.hop_size,
        backend="jax", length=args.length,
    )
    pred_signal, target_wf = load_eval(args.eval_h5)
    n = len(pred_signal)
    mag = signal_to_mag(rep, pred_signal)
    print(f"{n} generated spectrograms, mag shape {mag.shape}")

    asd = [AmplitudeSpectralDensity(fs=100.0, channel=c, isotropic=True) for c in range(3)]
    bs = args.batch
    rows = []
    for n_iter in args.iters:
        inv = jax.jit(
            lambda m, k: jspectral.griffin_lim(
                m, k, rep.n_fft, rep.hop, args.length, n_iter=n_iter
            ),
            static_argnums=(),
        )
        # quality: invert every sample at this iteration count
        out = np.empty((n, 3, args.length), np.float32)
        sc_num = sc_den = 0.0
        for s in range(0, n, bs):
            mb = jnp.asarray(mag[s : s + bs])
            wf = inv(mb, jax.random.key(rep.seed))
            out[s : s + bs] = np.asarray(wf, np.float32)
            # spectral convergence vs the generated magnitude target —
            # |STFT| is taken ON DEVICE: the axon relay cannot fetch
            # complex64 arrays (UNIMPLEMENTED), only reals
            re_mag = np.asarray(
                jnp.abs(jspectral.stft(wf, rep.n_fft, rep.hop))
            )
            mb_np = np.asarray(mb)
            sc_num += float(((re_mag - mb_np) ** 2).sum())
            sc_den += float((mb_np**2).sum())
        asd_per_ch = [float(a(out, target_wf)) for a in asd]
        spec_conv = float(np.sqrt(sc_num / sc_den))

        # cost: chained batch-64 timing, scalar fetch to close the chain
        mb = jnp.asarray(mag[:bs])
        w = inv(mb, jax.random.key(0))
        float(w.sum())
        t0 = time.perf_counter()
        for i in range(args.timing_reps):
            w = inv(mb, jax.random.key(i + 1))
        float(w.sum())
        ms = (time.perf_counter() - t0) / args.timing_reps * 1e3

        row = {
            "n_iter": n_iter,
            "asd_frechet_per_channel": [round(v, 2) for v in asd_per_ch],
            "spectral_convergence": round(spec_conv, 6),
            "ms_per_batch64": round(ms, 2),
        }
        rows.append(row)
        print(json.dumps(row), flush=True)

    result = {
        "eval_h5": str(args.eval_h5), "batch": bs, "rows": rows,
        # self-describing provenance so the curated copy in docs/quality
        # passes scripts/restamp_reports.py --check
        "provenance": {"script": "scripts/gl_iter_sweep.py", "round": 5,
                       "eval_h5": args.eval_h5.name, "length": args.length,
                       "timing_reps": args.timing_reps},
    }
    if args.out:
        args.out.write_text(json.dumps(result, indent=1))
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()

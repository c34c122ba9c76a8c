"""`tqdne-generate-waveforms` — sample accelerograms from a trained model.

CLI parity with /root/reference/tqdne/generate_waveforms.py: conditioning
from flags or a CSV (hypocentral_distance,magnitude,vs30,
hypocentre_depth,azimuthal_gap,num_samples per row), normalization with
the published dataset summary statistics (generate_waveforms.py:126-136),
batched latent-EDM Heun sampling, spectrogram inversion, HDF5 output.

Checkpoints: our orbax run dirs (--workdir) or reference torch .ckpt
files (--edm-checkpoint/--autoencoder-checkpoint, converted on the fly —
the released Zenodo artifacts, records 15687691/16405538; this
environment has no egress so no auto-download).

TPU-native: sampling AND Griffin-Lim phase recovery run jit-compiled on
the accelerator (the reference runs Griffin-Lim x128 per waveform in
host process pools).
"""

from __future__ import annotations

import argparse
import csv as csv_mod
from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp

from tqdne_tpu.cli import common

# dataset conditional-feature summary statistics (mean, std) —
# generate_waveforms.py:128-136
SUMMARY_STATISTICS = np.array(
    [
        [101.29891904350877, 40.78415968551517],  # hypocentral_distance
        [4.801697862929673, 0.7146698731358634],  # magnitude
        [384.7045105848187, 220.11269086015872],  # vs30
        [38.359214998072, 22.472499592355014],  # hypocentre_depth
        [129.92139043457396, 89.69479051949207],  # azimuthal_gap
    ]
)

FEATURES = ("hypocentral_distance", "magnitude", "vs30", "hypocentre_depth", "azimuthal_gap")


def read_conditioning(args) -> np.ndarray:
    """Rows of raw (unnormalized) features, one per waveform to generate."""
    if args.csv:
        rows = []
        with open(args.csv) as f:
            reader = csv_mod.DictReader(f)
            missing = [k for k in FEATURES if k not in (reader.fieldnames or ())]
            if missing:
                raise SystemExit(
                    f"CSV {args.csv} is missing required columns: {', '.join(missing)} "
                    f"(expected: {', '.join(FEATURES)}[, num_samples])"
                )
            for row in reader:
                n = int(float(row.get("num_samples", 1)))
                rows.extend([[float(row[k]) for k in FEATURES]] * n)
        return np.array(rows, np.float64)
    values = [getattr(args, k) for k in FEATURES]
    if any(v is None for v in values) or args.num_samples is None:
        raise SystemExit("provide either --csv or a full parameter set with --num_samples")
    return np.tile(np.array(values, np.float64), (args.num_samples, 1))


def normalize(cond_raw: np.ndarray) -> np.ndarray:
    return (cond_raw - SUMMARY_STATISTICS[:, 0]) / SUMMARY_STATISTICS[:, 1]


def main(argv=None):
    parser = argparse.ArgumentParser("tqdne-generate-waveforms", description=__doc__)
    for k in FEATURES:
        parser.add_argument(f"--{k}", type=float, default=None)
    parser.add_argument("--num_samples", "--num-samples", type=int, default=None)
    parser.add_argument("--csv", type=str, default=None)
    parser.add_argument("--outfile", type=str, required=True)
    parser.add_argument("--workdir", type=str, default=None,
                        help="load our orbax checkpoints from this workdir's outputs/")
    parser.add_argument("--config", type=str, default="latent_edm",
                        help="recipe/config name (as in tqdne-train): latent_edm, edm, "
                             "1d_edm, 1d_latent_edm, consistency, latent_consistency, "
                             "latent_distill, ddpm")
    parser.add_argument("--name", type=str, default=None,
                        help="run name under outputs/ (default: the recipe's run name)")
    parser.add_argument("--ae-name", type=str, default=None)
    parser.add_argument("--edm-checkpoint", "--edm_checkpoint", type=str, default=None,
                        help="reference torch EDM .ckpt (converted on the fly)")
    parser.add_argument("--autoencoder-checkpoint", "--autoencoder_checkpoint", type=str,
                        default=None)
    parser.add_argument("--stats-from-dataset", action="store_true",
                        help="normalize conditioning with the workdir dataset's feature "
                             "statistics (experiments/generate.py:82-106 behavior) instead "
                             "of the published summary table")
    parser.add_argument("--batch_size", "--batch-size", type=int, default=32)
    parser.add_argument("--num_steps", "--num-steps", type=int, default=None,
                        help="sampling steps (default: 25 for EDM solvers; 2 total "
                             "network evals for the consistency solver)")
    parser.add_argument("--solver", type=str, default="heun",
                        choices=["heun", "dpmpp_2m", "consistency", "distill"],
                        help="heun = reference semantics (2N-1 UNet evals); dpmpp_2m = "
                             "2nd-order multistep, N evals (~2x faster, beyond reference); "
                             "consistency = 1-2 eval sampling from a consistency-model run "
                             "(implies --config consistency unless one is given)")
    parser.add_argument("--dtype", type=str, default="bf16", choices=["f32", "bf16"])
    parser.add_argument("--weights", type=str, default=None,
                        help="load UNet EMA weights from a tqdne-export-weights "
                             "release artifact (.msgpack, digest-verified against "
                             "its manifest) instead of the run's orbax checkpoint")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--tiny", action="store_true",
                        help="match a --tiny-trained run's model widths")
    parser.add_argument("--spatial", type=int, default=0,
                        help="small-batch serving: split each sample's spatial extent "
                             "K ways over a 2D (data, model) device mesh so a request "
                             "batch smaller than the chip count still uses every chip "
                             "(parallel/spatial.py; needs K | device count, EDM recipes)")
    parser.add_argument("--int8", action="store_true",
                        help="quality-gated fast mode: int8 MXU convolutions (2x bf16 "
                             "TOPS on v5e; ~1%% per-layer quantization noise — see "
                             "nn/quant.py and the measured delta in BENCH_NOTES.md)")
    parser.add_argument("--consistency-noise", type=str, default="auto",
                        choices=["auto", "song", "reference"],
                        help="consistency/distill sampling convention (see "
                             "tqdne-evaluate --help)")
    parser.add_argument("--gl-iters", type=int, default=None,
                        help="Griffin-Lim iterations for waveform inversion "
                             "(default: the representation's 128; "
                             "scripts/gl_iter_sweep.py measures the "
                             "quality-vs-cost trade-off)")
    args = parser.parse_args(argv)

    common.setup_logging()
    import h5py

    if args.solver == "consistency" and args.config == "latent_edm":
        # --solver consistency routes to the consistency-model family
        # (a separate trained run), not an EDM ODE solver; the flagship
        # maps to its latent-space consistency counterpart
        args.config = "latent_consistency"
    if args.solver == "distill" and args.config == "latent_edm":
        # same routing for the teacher-distilled consistency student
        args.config = "latent_distill"
    if args.solver == "consistency" and args.config not in ("consistency",
                                                            "latent_consistency"):
        raise SystemExit(
            "--solver consistency samples a consistency-model run; use it with "
            "--config consistency / latent_consistency (or omit --config)"
        )
    if args.solver == "distill" and args.config != "latent_distill":
        raise SystemExit(
            "--solver distill samples a distilled-consistency run; use it with "
            "--config latent_distill (or omit --config)"
        )
    few_eval = ("consistency", "latent_consistency", "latent_distill")
    if args.num_steps is None:
        args.num_steps = 2 if args.config in few_eval else 25

    dtype = common.parse_dtype(args.dtype)
    cond_raw = read_conditioning(args)
    if bool(args.edm_checkpoint) != bool(args.autoencoder_checkpoint):
        raise SystemExit("either both or none of the torch checkpoints must be provided")

    bundle = common.build_inference(
        args.config, args.workdir or ".", dtype, num_steps=args.num_steps, tiny=args.tiny,
        run_name=args.name, ae_name=args.ae_name,
        edm_checkpoint=args.edm_checkpoint,
        exported_weights=args.weights,
        autoencoder_checkpoint=args.autoencoder_checkpoint,
        solver=args.solver, int8=args.int8, spatial=args.spatial,
        consistency_noise=args.consistency_noise, gl_iters=args.gl_iters,
    )
    config, representation = bundle.config, bundle.representation
    t_out = bundle.t

    if args.stats_from_dataset:
        stats = common.dataset_feature_stats(config)
        cond = ((cond_raw - stats[:, 0]) / stats[:, 1]).astype(np.float32)
    else:
        cond = normalize(cond_raw).astype(np.float32)

    bs = args.batch_size
    run = bundle.jit_sample(bs)

    n = len(cond)
    outfile = Path(args.outfile)
    outfile.parent.mkdir(parents=True, exist_ok=True)
    with h5py.File(outfile, "w") as f:
        for i, k in enumerate(FEATURES):
            f.create_dataset(k, data=cond_raw[:, i])
        waveforms = f.create_dataset("waveforms", (n, 3, t_out), dtype=np.float32)
        for start in range(0, n, bs):
            batch_cond = cond[start : start + bs]
            pad = bs - len(batch_cond)  # keep shapes static for jit
            if pad:
                batch_cond = np.concatenate([batch_cond, np.zeros((pad, 5), np.float32)])
            key = jax.random.fold_in(jax.random.key(args.seed), start)
            signal = np.asarray(run(key, jnp.asarray(batch_cond)), np.float32)
            signal = np.moveaxis(signal, -1, 1)[: bs - pad if pad else bs]
            waveforms[start : start + len(signal)] = representation.invert_representation(signal)[
                ..., :t_out
            ]
            print(f"generated {min(start + bs, n)}/{n}")
    print("done!")


if __name__ == "__main__":
    main()

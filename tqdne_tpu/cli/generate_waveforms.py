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

from tqdne_tpu import configs
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


def load_models(args, dtype):
    config = configs.LatentSpectrogramConfig(workdir=args.workdir or ".")
    ae, enc_cfg, dec_cfg = common.build_autoencoder(config, dims=2, dtype=dtype)
    unet, ucfg = common.build_unet(config, 2, config.latent_channels, config.latent_channels,
                                   dtype)

    if args.edm_checkpoint or args.autoencoder_checkpoint:
        if not (args.edm_checkpoint and args.autoencoder_checkpoint):
            raise SystemExit("either both or none of the torch checkpoints must be provided")
        from tqdne_tpu.utils.torch_convert import (
            convert_autoencoder,
            convert_unet,
            load_lightning_checkpoint,
        )

        ae_sd, _ = load_lightning_checkpoint(args.autoencoder_checkpoint, prefix="")
        ae_vars = convert_autoencoder(ae_sd, enc_cfg, dec_cfg)
        unet_sd, _ = load_lightning_checkpoint(args.edm_checkpoint, prefix="unet")
        params = convert_unet(unet_sd, ucfg)
    else:
        sig_shape = common.signal_shape(config)
        ae_vars = common.load_ae_variables(
            config, "Autoencoder-32x32x4-LogSpectrogram", ae, sig_shape
        )
        from tqdne_tpu.train.checkpoint import Checkpointer

        ckptdir = config.outputdir / "Latent-EDM-32x32x8-LogSpectrogram" / "checkpoints"
        restored = Checkpointer(ckptdir, create=False).restore_latest_raw()
        if restored is None:
            raise SystemExit(f"no EDM checkpoint under {ckptdir}")
        params = restored[0]["ema_params"]

    return config, ae, ae_vars, unet, params


def main(argv=None):
    parser = argparse.ArgumentParser("tqdne-generate-waveforms", description=__doc__)
    for k in FEATURES:
        parser.add_argument(f"--{k}", type=float, default=None)
    parser.add_argument("--num_samples", type=int, default=None)
    parser.add_argument("--csv", type=str, default=None)
    parser.add_argument("--outfile", type=str, required=True)
    parser.add_argument("--workdir", type=str, default=None,
                        help="load our orbax checkpoints from this workdir's outputs/")
    parser.add_argument("--edm-checkpoint", "--edm_checkpoint", type=str, default=None,
                        help="reference torch EDM .ckpt (converted on the fly)")
    parser.add_argument("--autoencoder-checkpoint", "--autoencoder_checkpoint", type=str,
                        default=None)
    parser.add_argument("--stats-from-dataset", action="store_true",
                        help="normalize conditioning with the workdir dataset's feature "
                             "statistics (experiments/generate.py:82-106 behavior) instead "
                             "of the published summary table")
    parser.add_argument("--batch_size", type=int, default=32)
    parser.add_argument("--num_steps", type=int, default=25)
    parser.add_argument("--dtype", type=str, default="bf16", choices=["f32", "bf16"])
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args(argv)

    common.setup_logging()
    import h5py

    dtype = common.parse_dtype(args.dtype)
    cond_raw = read_conditioning(args)
    if args.stats_from_dataset:
        stats = common.dataset_feature_stats(configs.LatentSpectrogramConfig(
            workdir=args.workdir or "."))
        cond = ((cond_raw - stats[:, 0]) / stats[:, 1]).astype(np.float32)
    else:
        cond = normalize(cond_raw).astype(np.float32)

    config, ae, ae_vars, unet, params = load_models(args, dtype)
    t_out = config.t or 4064
    representation = config.make_representation()

    from tqdne_tpu.train.steps import make_edm_steps

    _, _, sample_fn = make_edm_steps(unet, tx=None, autoencoder=ae,
                                     num_sampling_steps=args.num_steps)

    bs = args.batch_size

    @jax.jit
    def run(params, ae_vars, key, cond_b):
        return sample_fn(params, key, (bs, 32, 32, config.latent_channels), cond=cond_b,
                         ae_vars=ae_vars)

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
            signal = np.asarray(run(params, ae_vars, key, jnp.asarray(batch_cond)), np.float32)
            signal = np.moveaxis(signal, -1, 1)[: bs - pad if pad else bs]
            waveforms[start : start + len(signal)] = representation.invert_representation(signal)[
                ..., :t_out
            ]
            print(f"generated {min(start + bs, n)}/{n}")
    print("done!")


if __name__ == "__main__":
    main()

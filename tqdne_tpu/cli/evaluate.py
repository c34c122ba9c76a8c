"""`tqdne-evaluate` — generate over a dataset split and dump everything the
evaluation notebooks need to HDF5.

Parity with /root/reference/experiments/evaluate.py: per split, writes
conditioning features plus 8 datasets (target/predicted waveform,
target/predicted signal, target/predicted classifier embedding,
target/predicted classifier logits).  The reference shards work across
torchrun ranks with per-rank files and zero communication
(evaluate.py:67-70); here one process drives all local devices (batch
sharded over the mesh) and multi-host runs shard by jax.process_index()
with the same per-rank file naming.
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp

from tqdne_tpu import configs
from tqdne_tpu.cli import common
from tqdne_tpu.data.dataset import Dataset
from tqdne_tpu.data.pipeline import to_channels_first, to_channels_last
from tqdne_tpu.train.checkpoint import Checkpointer


def main(argv=None):
    parser = argparse.ArgumentParser("tqdne-evaluate", description=__doc__)
    parser.add_argument("--workdir", type=str, required=True)
    parser.add_argument("--split", type=str, default="test",
                        choices=["train", "validation", "test", "train_validation", "full"])
    parser.add_argument("-b", "--batchsize", type=int, default=32)
    parser.add_argument("--name", type=str, default="Latent-EDM-32x32x8-LogSpectrogram",
                        help="EDM run name under outputs/")
    parser.add_argument("--ae-name", type=str, default="Autoencoder-32x32x4-LogSpectrogram")
    parser.add_argument("--classifier-name", type=str, default="Classifier-LogSpectrogram")
    parser.add_argument("--num_steps", type=int, default=25)
    parser.add_argument("--dtype", type=str, default="bf16", choices=["f32", "bf16"])
    parser.add_argument("--limit-batches", type=int, default=None)
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args(argv)
    common.setup_logging()
    from tqdne_tpu.parallel.mesh import maybe_initialize_distributed

    maybe_initialize_distributed()
    import h5py

    dtype = common.parse_dtype(args.dtype)
    config = configs.LatentSpectrogramConfig(workdir=args.workdir)
    clf_config = configs.SpectrogramClassificationConfig(workdir=args.workdir)
    representation = config.make_representation()

    dataset = Dataset(config.datapath, representation, cut=config.t, cond=True, split=args.split)

    # models
    sig_shape = common.signal_shape(config)
    ae, _, _ = common.build_autoencoder(config, 2, dtype)
    ae_vars = common.load_ae_variables(config, args.ae_name, ae, sig_shape)
    unet, _ = common.build_unet(config, 2, config.latent_channels, config.latent_channels, dtype)
    restored = Checkpointer(config.outputdir / args.name / "checkpoints",
                            create=False).restore_latest_raw()
    if restored is None:
        raise SystemExit(f"no EDM checkpoint for {args.name}")
    params = restored[0]["ema_params"]

    from tqdne_tpu.models.classifier import Classifier

    clf_enc = configs.get_classifier_encoder_config(clf_config)
    clf = Classifier(encoder_config=clf_enc, num_classes=clf_config.num_classes, dtype=dtype)
    clf_restored = Checkpointer(
        config.outputdir / args.classifier_name / "checkpoints", create=False
    ).restore_latest_raw()
    if clf_restored is None:
        raise SystemExit(f"no classifier checkpoint for {args.classifier_name}")
    clf_vars = clf_restored[0]["ema_params"]

    from tqdne_tpu.train.steps import make_edm_steps

    _, _, sample_fn = make_edm_steps(unet, tx=None, autoencoder=ae,
                                     num_sampling_steps=args.num_steps)

    bs = args.batchsize

    # shard generation over all local devices (the reference parallelizes
    # inference across torchrun ranks; here one process drives the mesh)
    from tqdne_tpu.parallel.mesh import batch_sharding, make_mesh

    mesh = make_mesh()
    cond_sharding = batch_sharding(mesh)

    @jax.jit
    def generate(params, ae_vars, key, cond):
        cond = jax.lax.with_sharding_constraint(cond, cond_sharding)
        return sample_fn(params, key, (bs, 32, 32, config.latent_channels), cond=cond,
                         ae_vars=ae_vars)

    @jax.jit
    def classify(clf_vars, signal):
        emb = clf.apply(clf_vars, signal, method="embed")
        logits = clf.apply(clf_vars, signal)
        return emb, logits

    # per-host sharding of the example index space (rank-file parity)
    rank, n_ranks = jax.process_index(), jax.process_count()
    all_idx = np.arange(len(dataset))[rank::n_ranks]
    if args.limit_batches:
        all_idx = all_idx[: args.limit_batches * bs]

    outdir = Path(args.workdir) / "evaluation"
    outdir.mkdir(parents=True, exist_ok=True)
    outfile = outdir / f"{args.name}-split_{args.split}-rank_{rank}.h5"

    n = len(all_idx)
    emb_dim = clf_enc["out_channels"]
    t = config.t or 4064
    with h5py.File(outfile, "w") as f:
        for key in config.features_keys:
            f.create_dataset(key, data=dataset.get_feature(key)[all_idx])
        dsets = {
            "target_waveform": (n, 3, t),
            "predicted_waveform": (n, 3, t),
            "target_signal": (n, 3, 128, 128),
            "predicted_signal": (n, 3, 128, 128),
            "target_classifier_embedding": (n, emb_dim),
            "predicted_classifier_embedding": (n, emb_dim),
            "target_classifier_pred": (n, clf_config.num_classes),
            "predicted_classifier_pred": (n, clf_config.num_classes),
        }
        handles = {k: f.create_dataset(k, shape=shape, dtype="f") for k, shape in dsets.items()}

        for start in range(0, n, bs):
            idx = all_idx[start : start + bs]
            batch = dataset.load_batch(idx)
            cond = batch["cond"]
            pad = bs - len(idx)
            if pad:
                cond = np.concatenate([cond, np.zeros((pad, cond.shape[1]), np.float32)])
            key = jax.random.fold_in(jax.random.key(args.seed), start)
            pred_signal_last = np.asarray(
                generate(params, ae_vars, key, jnp.asarray(cond)), np.float32
            )[: len(idx)]
            pred_signal = to_channels_first(pred_signal_last)
            pred_waveform = representation.invert_representation(pred_signal)[..., :t]

            end = start + len(idx)
            handles["target_waveform"][start:end] = batch["waveform"][..., :t]
            handles["target_signal"][start:end] = batch["signal"]
            handles["predicted_signal"][start:end] = pred_signal
            handles["predicted_waveform"][start:end] = pred_waveform

            t_emb, t_logits = classify(
                clf_vars, jnp.asarray(to_channels_last({"signal": batch["signal"]})["signal"])
            )
            p_emb, p_logits = classify(clf_vars, jnp.asarray(pred_signal_last))
            f32 = lambda x: np.asarray(x, np.float32)  # h5py can't take bf16
            handles["target_classifier_embedding"][start:end] = f32(t_emb)
            handles["target_classifier_pred"][start:end] = f32(t_logits)
            handles["predicted_classifier_embedding"][start:end] = f32(p_emb)[: len(idx)]
            handles["predicted_classifier_pred"][start:end] = f32(p_logits)[: len(idx)]
            print(f"{end}/{n}")
    print(f"wrote {outfile}")


if __name__ == "__main__":
    main()

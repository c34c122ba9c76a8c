"""`tqdne-evaluate` — generate over a dataset split and dump everything the
evaluation notebooks need to HDF5.

Parity with /root/reference/experiments/evaluate.py: per split, writes
conditioning features plus 8 datasets (target/predicted waveform,
target/predicted signal, target/predicted classifier embedding,
target/predicted classifier logits).  Like the reference, the model
family is selected by config name (`getattr(conf, args.config)`,
evaluate.py:210) — here `--config <recipe>` picks any diffusion recipe
(latent_edm, edm, 1d_edm, 1d_latent_edm, consistency, ddpm) and every
shape is derived from the config + AE.  The reference shards work across
torchrun ranks with per-rank files and zero communication
(evaluate.py:67-70); here one process drives all local devices (batch
sharded over the mesh) and multi-host runs shard by jax.process_index()
with the same per-rank file naming.

Classifier embeddings/logits are written when a classifier checkpoint is
available (the reference's classifier is spectrogram-only; 1D configs
skip those datasets unless --classifier-name points at a compatible run).
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


def load_classifier(workdir: str, name: str, dtype):
    """(classifier, variables, encoder_config, clf_config) or None if no checkpoint.

    Rebuilds the encoder from the run's STORED hyperparameters when
    available (load_from_checkpoint semantics) so e.g. --tiny-trained
    classifiers restore with the right widths; falls back to the preset.
    """
    from tqdne_tpu.cli.common import _tuplify
    from tqdne_tpu.models.classifier import Classifier

    clf_config = configs.SpectrogramClassificationConfig(workdir=workdir)
    ckpt = Checkpointer(clf_config.outputdir / name / "checkpoints", create=False)
    restored = ckpt.restore_latest_raw()
    if restored is None:
        return None
    stored = ckpt.restore_hyperparameters()
    if stored is not None and "encoder" in stored:
        clf_enc = _tuplify(stored["encoder"])
        num_classes = int(stored.get("num_classes", clf_config.num_classes))
    else:
        clf_enc = configs.get_classifier_encoder_config(clf_config)
        num_classes = clf_config.num_classes
    clf = Classifier(encoder_config=clf_enc, num_classes=num_classes, dtype=dtype)
    return clf, restored[0]["ema_params"], clf_enc, clf_config


def main(argv=None):
    parser = argparse.ArgumentParser("tqdne-evaluate", description=__doc__)
    parser.add_argument("--workdir", type=str, required=True)
    parser.add_argument("--config", type=str, default="latent_edm",
                        help="recipe/config name (as in tqdne-train): latent_edm, edm, "
                             "1d_edm, 1d_latent_edm, consistency, latent_consistency, "
                             "latent_distill, ddpm")
    parser.add_argument("--split", type=str, default="test",
                        choices=["train", "validation", "test", "train_validation", "full"])
    parser.add_argument("-b", "--batchsize", type=int, default=32)
    parser.add_argument("--name", type=str, default=None,
                        help="run name under outputs/ (default: the recipe's run name)")
    parser.add_argument("--ae-name", type=str, default=None,
                        help="frozen AE run name (default: the recipe's)")
    parser.add_argument("--classifier-name", type=str, default="Classifier-LogSpectrogram")
    parser.add_argument("--no-classifier", action="store_true",
                        help="skip classifier embedding/logit datasets")
    parser.add_argument("--num_steps", "--num-steps", type=int, default=25)
    parser.add_argument("--solver", type=str, default="heun", choices=["heun", "dpmpp_2m"])
    parser.add_argument("--dtype", type=str, default="bf16", choices=["f32", "bf16"])
    parser.add_argument("--limit-batches", type=int, default=None)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--tiny", action="store_true",
                        help="match a --tiny-trained run's model widths")
    parser.add_argument("--suffix", type=str, default="",
                        help="appended to the output filename — keeps sweep variants "
                             "(e.g. NFE/solver points) from overwriting each other")
    parser.add_argument("--int8", action="store_true",
                        help="quality-gated fast mode: int8 MXU convolutions "
                             "(see nn/quant.py; measures the mode's quality delta "
                             "through the standard report machinery)")
    parser.add_argument("--consistency-noise", type=str, default="auto",
                        choices=["auto", "song", "reference"],
                        help="consistency/distill sampling convention: 'auto' "
                             "(measured-best: 'song' at every NFE on the "
                             "converged student — docs/quality CD tables), "
                             "'song' (variance-matched Gaussian, Song et al. "
                             "2023 Alg. 1) or 'reference' (the reference's "
                             "unscaled init + uniform refinement)")
    parser.add_argument("--refine-sigma", type=float, default=1.0,
                        help="re-noising sigma for multistep consistency "
                             "refinement passes (NFE >= 2)")
    args = parser.parse_args(argv)
    common.setup_logging()
    from tqdne_tpu.parallel.mesh import maybe_initialize_distributed

    maybe_initialize_distributed()
    import h5py

    dtype = common.parse_dtype(args.dtype)
    # int8 uses the SCOPED mode (build_inference traces only the sampler
    # with QuantConv) rather than the TQDNE_INT8_CONV env var: the
    # classifier embeddings computed below must stay f32/bf16 so the FID
    # delta isolates the sampler's quantization, not the metric's.
    bundle = common.build_inference(
        args.config, args.workdir, dtype, num_steps=args.num_steps, tiny=args.tiny,
        run_name=args.name, ae_name=args.ae_name, solver=args.solver, int8=args.int8,
        consistency_noise=args.consistency_noise, refine_sigma=args.refine_sigma,
    )
    config, representation = bundle.config, bundle.representation
    run_name = args.name or bundle.recipe.name

    dataset = Dataset(config.datapath, representation, cut=config.t,
                      cond=bundle.recipe.cond, split=args.split)

    clf_bundle = None
    if not args.no_classifier:
        clf_bundle = load_classifier(args.workdir, args.classifier_name, dtype)
        if clf_bundle is None:
            print(f"no classifier checkpoint for {args.classifier_name} — "
                  "skipping embedding/logit datasets (--no-classifier to silence)")
        elif tuple(bundle.sig_shape) != tuple(common.signal_shape(clf_bundle[3])):
            print(f"classifier signal shape {common.signal_shape(clf_bundle[3])} != "
                  f"config signal shape {bundle.sig_shape} — skipping classifier datasets")
            clf_bundle = None

    bs = args.batchsize

    # shard generation over all local devices (the reference parallelizes
    # inference across torchrun ranks; here one process drives the mesh)
    from tqdne_tpu.parallel.mesh import batch_sharding, make_mesh

    mesh = make_mesh()
    cond_sharding = batch_sharding(mesh)
    raw_sample = bundle._raw_sample
    model_shape = bundle.model_shape

    @jax.jit
    def generate(params, ae_vars, key, cond):
        if cond is not None:
            cond = jax.lax.with_sharding_constraint(cond, cond_sharding)
        return raw_sample(params, ae_vars, key, (bs, *model_shape), cond)

    if clf_bundle is not None:
        clf, clf_vars, clf_enc, clf_config = clf_bundle

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
    outfile = outdir / f"{run_name}{args.suffix}-split_{args.split}-rank_{rank}.h5"

    n = len(all_idx)
    t = bundle.t
    # channels-first signal shape derived from the representation
    sig_cf = (bundle.sig_shape[-1], *bundle.sig_shape[:-1])
    with h5py.File(outfile, "w") as f:
        # provenance: training budget of the sampled checkpoint + sampler
        # settings, copied into the report JSON by eval.report so committed
        # quality numbers state the budget that produced them
        import json as _json

        f.attrs["provenance"] = _json.dumps(
            bundle.provenance
            | {"num_steps": args.num_steps, "solver": args.solver,
               "seed": args.seed, "dtype": args.dtype, "split": args.split,
               "consistency_noise": args.consistency_noise,
               "refine_sigma": args.refine_sigma}
        )
        for key in config.features_keys:
            f.create_dataset(key, data=dataset.get_feature(key)[all_idx])
        dsets = {
            "target_waveform": (n, 3, t),
            "predicted_waveform": (n, 3, t),
            "target_signal": (n, *sig_cf),
            "predicted_signal": (n, *sig_cf),
        }
        if clf_bundle is not None:
            dsets |= {
                "target_classifier_embedding": (n, clf_enc["out_channels"]),
                "predicted_classifier_embedding": (n, clf_enc["out_channels"]),
                "target_classifier_pred": (n, clf_config.num_classes),
                "predicted_classifier_pred": (n, clf_config.num_classes),
            }
        handles = {k: f.create_dataset(k, shape=shape, dtype="f") for k, shape in dsets.items()}

        for start in range(0, n, bs):
            idx = all_idx[start : start + bs]
            batch = dataset.load_batch(idx)
            cond = None
            if bundle.recipe.cond:
                cond = batch["cond"]
                pad = bs - len(idx)
                if pad:
                    cond = np.concatenate([cond, np.zeros((pad, cond.shape[1]), np.float32)])
                cond = jnp.asarray(cond)
            key = jax.random.fold_in(jax.random.key(args.seed), start)
            pred_signal_last = np.asarray(
                generate(bundle.params, bundle.ae_vars, key, cond), np.float32
            )[: len(idx)]
            pred_signal = to_channels_first(pred_signal_last)
            pred_waveform = representation.invert_representation(pred_signal)[..., :t]

            end = start + len(idx)
            handles["target_waveform"][start:end] = batch["waveform"][..., :t]
            handles["target_signal"][start:end] = batch["signal"]
            handles["predicted_signal"][start:end] = pred_signal
            handles["predicted_waveform"][start:end] = pred_waveform

            if clf_bundle is not None:
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

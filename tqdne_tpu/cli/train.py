"""`tqdne-train <recipe>` — all training entry points in one CLI.

Recipe parity with the reference experiment scripts
(/root/reference/experiments/train_*.py), including run names,
architectures, optimizers, schedules, epoch counts and batch sizes:

  1d_edm          EDM-MovingAvg                      train_1d_edm.py
  1d_autoencoder  Autoencoder-1024x16-MovingAvg      train_1d_autoencoder.py
  1d_latent_edm   Latent-EDM-MovingAvg-1024x16       train_1d_latent_edm.py
  autoencoder     Autoencoder-32x32x4-LogSpectrogram train_autoencoder.py
  edm             EDM-128x128-LogSpectrogram         train_edm.py
  latent_edm      Latent-EDM-32x32x8-LogSpectrogram  train_latent_edm.py (flagship)
  classifier      Classifier-LogSpectrogram          train_classifier.py
  consistency     Consistency-MovingAvg              consistency_model.py (standalone)
  latent_consistency  Latent-Consistency-32x32x8-LogSpectrogram  (beyond reference)
  ddpm            DDPM-MovingAvg                     diffusion.py (legacy)

TPU-native differences: one process drives the whole device mesh
(instead of DDP ranks), bf16 compute by default (--dtype f32 for the
reference's precision 32), orbax checkpoints, JSONL metrics.
"""

from __future__ import annotations

import argparse
import dataclasses

import numpy as np

import jax
import jax.numpy as jnp

from tqdne_tpu import configs
from tqdne_tpu.cli import common
from tqdne_tpu.parallel.mesh import make_mesh
from tqdne_tpu.train.callbacks import SamplingEvalCallback
from tqdne_tpu.train.loop import Trainer
from tqdne_tpu.train.state import TrainState, cosine_annealing, make_optimizer


@dataclasses.dataclass
class Recipe:
    name: str
    config_cls: type
    dims: int
    epochs: int
    batch: int
    cond: bool = True
    latent: bool = False
    kind: str = "edm"  # edm | autoencoder | classifier | consistency | ddpm
    ae_name: str | None = None
    optimizer: str = "adam"
    weight_decay: float = 0.0
    lr: float = 1e-4
    unet_channels: dict = dataclasses.field(default_factory=dict)


RECIPES: dict[str, Recipe] = {
    "1d_edm": Recipe("EDM-MovingAvg", configs.MovingAverageEnvelopeConfig, 1, 200, 256),
    "1d_autoencoder": Recipe(
        "Autoencoder-1024x16-MovingAvg", configs.LatentMovingAverageEnvelopeConfig, 1, 200, 256,
        cond=False, kind="autoencoder", optimizer="adamw", weight_decay=1e-4,
    ),
    "1d_latent_edm": Recipe(
        "Latent-EDM-MovingAvg-1024x16", configs.LatentMovingAverageEnvelopeConfig, 1, 300, 256,
        latent=True, ae_name="Autoencoder-1024x16-MovingAvg",
    ),
    "autoencoder": Recipe(
        "Autoencoder-32x32x4-LogSpectrogram", configs.LatentSpectrogramConfig, 2, 300, 128,
        cond=False, kind="autoencoder", optimizer="adamw", weight_decay=1e-4,
    ),
    "edm": Recipe("EDM-128x128-LogSpectrogram", configs.SpectrogramConfig, 2, 300, 64),
    "latent_edm": Recipe(
        "Latent-EDM-32x32x8-LogSpectrogram", configs.LatentSpectrogramConfig, 2, 200, 256,
        latent=True, ae_name="Autoencoder-32x32x4-LogSpectrogram",
    ),
    "classifier": Recipe(
        "Classifier-LogSpectrogram", configs.SpectrogramClassificationConfig, 2, 110, 64,
        cond=False, kind="classifier",
    ),
    "consistency": Recipe(
        "Consistency-MovingAvg", configs.MovingAverageEnvelopeConfig, 1, 200, 256,
        kind="consistency", optimizer="radam",
    ),
    # beyond reference: consistency distillation target in the flagship's
    # frozen-VAE latent space — few-eval sampling of 128x128 spectrograms
    "latent_consistency": Recipe(
        "Latent-Consistency-32x32x8-LogSpectrogram", configs.LatentSpectrogramConfig, 2,
        200, 256, latent=True, ae_name="Autoencoder-32x32x4-LogSpectrogram",
        kind="consistency", optimizer="radam",
    ),
    # beyond reference: consistency DISTILLATION from the trained flagship
    # latent-EDM teacher (Song et al. 2023 CD) — few-eval sampling that
    # inherits the teacher's quality instead of training from scratch
    "latent_distill": Recipe(
        "Latent-Distill-32x32x8-LogSpectrogram", configs.LatentSpectrogramConfig, 2,
        80, 256, latent=True, ae_name="Autoencoder-32x32x4-LogSpectrogram",
        kind="distill", optimizer="radam",
    ),
    "ddpm": Recipe("DDPM-MovingAvg", configs.MovingAverageEnvelopeConfig, 1, 200, 256,
                   kind="ddpm", optimizer="adamw"),
}


def run(recipe_key: str, args):
    common.setup_logging()
    common.enable_fast_prng()  # +13% train step on TPU (BENCH_NOTES round 2)
    from tqdne_tpu.parallel.mesh import maybe_initialize_distributed

    maybe_initialize_distributed()
    recipe = RECIPES[recipe_key]
    config = recipe.config_cls(workdir=args.workdir)
    common.ensure_dataset(config, args.synthetic)

    dtype = common.parse_dtype(args.dtype)
    if args.num_slices and args.num_slices > 1:
        from tqdne_tpu.parallel.mesh import make_hybrid_mesh

        mesh = make_hybrid_mesh(args.num_slices, args.num_devices)
    else:
        mesh = make_mesh(args.num_devices)
    batch = args.batchsize or recipe.batch
    epochs = args.max_epochs or recipe.epochs

    workdir = config.outputdir / recipe.name
    sig_shape = common.signal_shape(config)

    # recipe-specific flags must error loudly where unsupported (no silent
    # no-ops)
    device_rep = None
    if getattr(args, "device_representation", False) and recipe.kind not in (
        "edm", "autoencoder", "classifier", "consistency", "distill"
    ):
        raise SystemExit(
            "--device-representation is supported for EDM, consistency, "
            "distill, autoencoder and classifier recipes"
        )
    if getattr(args, "cached_latents", False) and not (
        recipe.latent and recipe.kind in ("edm", "consistency", "distill")
    ):
        raise SystemExit(
            "--cached-latents needs a latent EDM, consistency or distill recipe"
        )

    if recipe.kind == "classifier":
        return _run_classifier(recipe, config, args, mesh, batch, epochs, dtype, workdir)

    if getattr(args, "device_representation", False):
        from tqdne_tpu.ops.representation import device_representation_fn

        device_rep = device_representation_fn(config.make_representation())
        if device_rep is None:
            raise SystemExit(
                f"no device transform for {type(config.make_representation()).__name__}"
            )

    cached_latents = getattr(args, "cached_latents", False)
    lat_path = None
    if cached_latents:
        from tqdne_tpu.cli.precompute_latents import latents_path

        lat_path = latents_path(config, recipe.ae_name)
        if not lat_path.exists():
            raise SystemExit(
                f"{lat_path} not found — run `tqdne-precompute-latents --workdir "
                f"{args.workdir} --config {recipe_key}` first"
            )

    if cached_latents:
        # train batches need only moments + cond; the sampling callback's
        # val batches also need waveform targets
        loader_keys = ("latent_mean", "latent_log_std", "cond")
        val_keys = ("latent_mean", "latent_log_std", "cond", "waveform")
    elif device_rep is not None:
        loader_keys = val_keys = ("waveform", "cond")
    else:
        loader_keys = val_keys = ("signal", "cond", "waveform")

    train_loader, val_loader, representation = common.make_loaders(
        config, batch, cond=recipe.cond, mesh=mesh,
        host_representation=device_rep is None and not cached_latents,
        keys=loader_keys, val_keys=val_keys, latents_path=lat_path,
    )
    max_steps = args.max_steps or epochs * len(train_loader)
    lr_schedule = cosine_annealing(recipe.lr, max_steps) if recipe.optimizer != "radam" else None
    tx = make_optimizer(
        recipe.optimizer,
        lr_schedule if lr_schedule is not None else recipe.lr,
        weight_decay=recipe.weight_decay,
        skip_nonfinite=args.skip_nonfinite,
    )

    tiny_mc = 32 if args.tiny else None

    if recipe.kind == "autoencoder":
        ae, enc_cfg, dec_cfg = common.build_autoencoder(
            config, recipe.dims, dtype, train=True, model_channels=tiny_mc
        )
        from tqdne_tpu.train.steps import make_autoencoder_steps

        variables = jax.jit(ae.init)(
            {"params": jax.random.key(args.seed), "sample": jax.random.key(1)},
            jnp.zeros((1, *sig_shape)),
        )
        # the reference trains the AE and classifier WITHOUT EMA (ema_decay
        # defaults to 0 in get_pl_trainer; only the EDM passes 0.999,
        # /root/reference/tqdne/training.py:18,37 + train_latent_edm.py:73):
        # decay 0 keeps ema_params == live params, so checkpoint consumers
        # (frozen-AE loading, evaluation) read the live weights
        train_step, eval_step = make_autoencoder_steps(ae, tx, kl_weight=config.kl_weight,
                                                       ema_decay=0.0,
                                                       device_representation=device_rep)
        state = TrainState.create(variables, tx)
        extra = ()
        callbacks = ()
        hparams = {"kind": "autoencoder", "dims": recipe.dims,
                   "encoder": enc_cfg, "decoder": dec_cfg,
                   "kl_weight": config.kl_weight}
    else:
        cond_features = len(config.features_keys) if recipe.cond else None
        ae_vars = None
        if recipe.latent:
            ae, _, _ = common.build_autoencoder(config, recipe.dims, dtype,
                                                model_channels=tiny_mc)
            ae_vars = common.load_ae_variables(config, recipe.ae_name, ae, sig_shape)
            if cached_latents:
                # the sidecar must come from THESE weights: same-architecture
                # retrains would silently shift the latent space otherwise
                import h5py

                from tqdne_tpu.cli.precompute_latents import ae_fingerprint

                with h5py.File(lat_path, "r", locking=False) as lf:
                    stored_fp = str(lf.attrs.get("ae_fingerprint", ""))
                fp = ae_fingerprint(ae_vars)
                if stored_fp != fp:
                    raise SystemExit(
                        f"{lat_path} was computed from different AE weights "
                        f"(fingerprint {stored_fp} != {fp}) — re-run "
                        "tqdne-precompute-latents"
                    )
            latent = ae.apply(
                ae_vars, jnp.zeros((1, *sig_shape)), method="encode",
                rngs={"sample": jax.random.key(0)},
            )
            model_shape = tuple(latent.shape[1:])
        else:
            ae = None
            model_shape = sig_shape

        overrides = dict(cond_features=cond_features)
        if args.tiny:
            overrides["model_channels"] = 32
        unet, ucfg = common.build_unet(
            config, recipe.dims, model_shape[-1], model_shape[-1], dtype, **overrides
        )
        params = jax.jit(unet.init)(
            jax.random.key(args.seed), jnp.zeros((1, *model_shape)), jnp.zeros((1,)),
            jnp.zeros((1, cond_features)) if cond_features else None,
        )
        state = TrainState.create(params, tx)

        if recipe.kind == "edm":
            from tqdne_tpu.train.steps import make_edm_steps

            train_step, eval_step, sample_fn = make_edm_steps(
                unet, tx, autoencoder=ae, device_representation=device_rep,
                latent_moments=cached_latents,
            )
        elif recipe.kind == "consistency":
            from tqdne_tpu.diffusion.consistency import ConsistencyConfig, make_consistency_steps

            train_step, eval_step, sample_fn = make_consistency_steps(
                unet, tx, ConsistencyConfig(), max_steps, autoencoder=ae,
                device_representation=device_rep, latent_moments=cached_latents,
            )
        elif recipe.kind == "distill":
            from tqdne_tpu.diffusion.distillation import make_distillation_steps
            from tqdne_tpu.train.checkpoint import Checkpointer

            teacher_name = getattr(args, "teacher", None) or recipe.name.replace(
                "Distill", "EDM"
            )
            tckpt = Checkpointer(
                config.outputdir / teacher_name / "checkpoints", create=False
            )
            restored = tckpt.restore_latest_raw()
            if restored is None:
                raise SystemExit(
                    f"no teacher checkpoint under outputs/{teacher_name} — train "
                    f"the EDM first (or pass --teacher RUN_NAME)"
                )
            stored = tckpt.restore_hyperparameters()
            if stored is not None and "unet" in stored:
                # the student must share the teacher's architecture (it is
                # initialized from the teacher's weights); rebuild from the
                # teacher run's STORED hyperparameters, not the preset
                from tqdne_tpu.cli.common import _tuplify
                from tqdne_tpu.models.unet import UNet

                ucfg = _tuplify(stored["unet"])
                unet = UNet(**ucfg, dtype=dtype)
            # two separate device_puts of the host tree: the student's state
            # is DONATED each step, so it must not share buffers with the
            # frozen teacher
            teacher_params = jax.device_put(restored[0]["ema_params"])
            # student init = teacher weights (most of CD's advantage over
            # from-scratch iCT comes from this initialization)
            params = jax.device_put(restored[0]["ema_params"])
            state = TrainState.create(params, tx)

            train_step, eval_step, sample_fn = make_distillation_steps(
                unet, tx, autoencoder=ae, device_representation=device_rep,
                latent_moments=cached_latents,
                ema_decay=getattr(args, "ema_decay", 0.95),
            )
        elif recipe.kind == "ddpm":
            from tqdne_tpu.diffusion.ddpm import DDPMConfig, make_ddpm_steps

            train_step, eval_step, sample_fn = make_ddpm_steps(unet, tx, DDPMConfig())
        else:
            raise ValueError(recipe.kind)

        if recipe.kind == "distill":
            extra = (ae_vars, teacher_params)
        else:
            extra = (ae_vars,) if recipe.latent else ()

        # sampling-eval callback (LogCallback parity): 2 val batches
        from tqdne_tpu.eval import metrics as M
        from tqdne_tpu.eval import plots as P

        val_batches = []
        for i, b in enumerate(val_loader):
            if i >= 2:
                break
            val_batches.append(jax.device_get(b))

        _cb_jit_cache: dict = {}

        def cb_sample(params, key, batch_host):
            cond = jnp.asarray(batch_host["cond"]) if "cond" in batch_host else None
            n = len(batch_host.get("signal", batch_host["waveform"]))
            if n not in _cb_jit_cache:  # jit once per batch size (avoid retracing)
                if recipe.latent:  # edm AND consistency sample_fns take ae_vars
                    _cb_jit_cache[n] = jax.jit(
                        lambda p, k, c, av: sample_fn(p, k, (n, *model_shape), cond=c,
                                                      ae_vars=av)
                    )
                else:
                    _cb_jit_cache[n] = jax.jit(
                        lambda p, k, c: sample_fn(p, k, (n, *model_shape), cond=c)
                    )
            fn = _cb_jit_cache[n]
            if recipe.latent:
                return fn(params, key, cond, extra[0])
            return fn(params, key, cond)

        hparams = {"kind": recipe.kind, "dims": recipe.dims, "latent": recipe.latent,
                   "ae_name": recipe.ae_name, "unet": ucfg}
        if recipe.kind == "distill":
            hparams["teacher"] = teacher_name

        n_wave_ch = 3
        eval_plots = [P.SamplePlot(plot_target=True, fs=config.fs, channel=c)
                      for c in range(n_wave_ch)]
        eval_plots += [P.AmplitudeSpectralDensityPlot(fs=config.fs, channel=c)
                       for c in range(n_wave_ch)]
        feature_stats = None
        if recipe.cond:
            # Bin/Grid figures need raw magnitude/distance — denormalize cond
            # with dataset stats inside the callback (evaluation.ipynb parity).
            feature_stats = common.dataset_feature_stats(config)
            eval_plots += [
                P.BinPlot(M.AmplitudeSpectralDensity(fs=config.fs, channel=0, isotropic=True),
                          configs.MAG_BINS, configs.DIST_BINS),
                P.MovingAverageEnvelopeGrid(config.fs, 0, configs.MAG_BINS, configs.DIST_BINS),
                P.AmplitudeSpectralDensityGrid(config.fs, 0, configs.MAG_BINS, configs.DIST_BINS),
            ]
        callbacks = (
            SamplingEvalCallback(
                cb_sample,
                val_batches,
                representation,
                metrics=[M.AmplitudeSpectralDensity(fs=config.fs, channel=c, isotropic=True)
                         for c in range(n_wave_ch)],
                plots=eval_plots,
                every_n_epochs=args.eval_every,
                feature_stats=feature_stats,
                features_keys=config.features_keys,
            ),
        )

    trainer = Trainer(
        train_step, eval_step, mesh, workdir,
        max_epochs=epochs, max_steps=args.max_steps,
        extra_args=extra, callbacks=callbacks, seed=args.seed,
        project=config.project_name, lr_schedule=lr_schedule,
        hparams=hparams, checkpoint_every_epochs=args.checkpoint_every,
        eval_every_epochs=args.val_every,
    )
    trainer.fit(state, train_loader, val_loader, resume=not args.no_resume)


def _run_classifier(recipe, config, args, mesh, batch, epochs, dtype, workdir):
    from tqdne_tpu.data.dataset import ClassificationDataset
    from tqdne_tpu.data.pipeline import BatchLoader
    from tqdne_tpu.models.classifier import Classifier
    from tqdne_tpu.parallel.mesh import batch_sharding
    from tqdne_tpu.train.steps import make_classifier_steps

    device_rep = None
    if getattr(args, "device_representation", False):
        from tqdne_tpu.data.representation import Identity
        from tqdne_tpu.ops.representation import device_representation_fn

        device_rep = device_representation_fn(config.make_representation())
        if device_rep is None:
            raise SystemExit(
                f"no device transform for {type(config.make_representation()).__name__}"
            )

    # with --device-representation the loader ships raw waveforms and the
    # jitted step computes the spectrogram on the accelerator
    ds_rep = Identity() if device_rep is not None else config.make_representation()
    ds_train = ClassificationDataset(
        config.datapath, ds_rep, config.mag_bins, config.dist_bins,
        cut=config.t, split="train_validation",
    )
    ds_val = ClassificationDataset(
        config.datapath, ds_rep, config.mag_bins, config.dist_bins,
        cut=config.t, split="test",
    )
    sharding = batch_sharding(mesh)
    keys = ("waveform", "label") if device_rep is not None else ("signal", "label")
    n_dev = mesh.devices.size
    train_loader = BatchLoader(ds_train, batch, sharding=sharding, keys=keys)
    vb = max(n_dev, min(batch, (len(ds_val) // n_dev) * n_dev or n_dev))
    val_loader = BatchLoader(ds_val, vb, shuffle=False, drop_last=True, sharding=sharding,
                             keys=keys)

    enc_cfg = configs.get_classifier_encoder_config(config)
    if args.tiny:
        enc_cfg["model_channels"] = 16
        enc_cfg["out_channels"] = 32
    clf = Classifier(encoder_config=enc_cfg, num_classes=config.num_classes, train=True,
                     dtype=dtype)
    sig_shape = common.signal_shape(config)
    params = jax.jit(clf.init)(jax.random.key(args.seed), jnp.zeros((1, *sig_shape)))

    max_steps = args.max_steps or epochs * len(train_loader)
    lr_schedule = cosine_annealing(1e-4, max_steps)
    tx = make_optimizer("adam", lr_schedule)
    train_step, eval_step, metric_post = make_classifier_steps(
        clf, tx, ds_train.get_class_weights(), ema_decay=0.0,  # no EMA, reference parity
        device_representation=device_rep,
    )
    state = TrainState.create(params, tx)

    trainer = Trainer(
        train_step, eval_step, mesh, workdir, max_epochs=epochs, max_steps=args.max_steps,
        seed=args.seed, project=config.project_name, lr_schedule=lr_schedule,
        metric_postprocess=metric_post,
        hparams={"kind": "classifier", "encoder": enc_cfg,
                 "num_classes": config.num_classes},
        checkpoint_every_epochs=args.checkpoint_every,
        eval_every_epochs=args.val_every,
    )
    trainer.fit(state, train_loader, val_loader, resume=not args.no_resume)


def main(argv=None):
    parser = argparse.ArgumentParser("tqdne-train", description=__doc__)
    sub = parser.add_subparsers(dest="recipe", required=True)
    for key in RECIPES:
        p = sub.add_parser(key)
        common.add_common_args(p)
        if RECIPES[key].kind == "distill":
            p.add_argument("--teacher", type=str, default=None,
                           help="teacher run name under outputs/ (default: the "
                                "matching EDM run)")
            p.add_argument("--ema-decay", type=float, default=0.95,
                           help="CD target-network decay mu (Song 2023 uses "
                                "0.95 for short runs; raise towards 0.999 for "
                                "longer budgets — the EMA doubles as the "
                                "deployed student)")
    args = parser.parse_args(argv)
    run(args.recipe, args)


if __name__ == "__main__":
    main()

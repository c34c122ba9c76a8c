"""Shared CLI wiring: model/loader/trainer assembly.

Replaces the copy-pasted preamble of the reference experiment scripts
(/root/reference/experiments/train_*.py) with one declarative recipe
table (tqdne_tpu.cli.train).  Run names match the reference exactly so
checkpoint path conventions carry over (e.g. the latent EDM loading the
frozen AE from outputs/Autoencoder-32x32x4-LogSpectrogram).
"""

from __future__ import annotations

import logging
import sys
from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp

from tqdne_tpu import configs
from tqdne_tpu.data.dataset import Dataset, make_synthetic_dataset
from tqdne_tpu.data.pipeline import BatchLoader, DeviceResidentLoader
from tqdne_tpu.models.autoencoder import AutoencoderKL
from tqdne_tpu.models.unet import UNet
from tqdne_tpu.parallel.mesh import batch_sharding
from tqdne_tpu.train.checkpoint import Checkpointer

logger = logging.getLogger("tqdne_tpu")


def setup_logging():
    root = logging.getLogger()
    root.setLevel(logging.INFO)
    if not root.handlers:
        handler = logging.StreamHandler(sys.stdout)
        handler.setFormatter(
            logging.Formatter("%(asctime)s - %(name)s - %(levelname)s - %(message)s")
        )
        root.addHandler(handler)
    # kill -USR1 <pid> dumps all Python thread stacks to stderr — the only
    # way to diagnose a wedged device call through the remote-TPU tunnel
    import faulthandler
    import signal

    try:
        faulthandler.register(signal.SIGUSR1)
    except (AttributeError, ValueError):  # non-main thread / no SIGUSR1
        pass
    enable_compilation_cache()


def enable_compilation_cache(path: str | None = None):
    """Persistent XLA compilation cache — on the axon tunnel a flagship
    train-step compile costs 10-20 min; with the cache a fresh process
    reuses it in seconds."""
    import os

    import jax

    cache_dir = path or os.environ.get("JAX_COMPILATION_CACHE_DIR") or str(
        Path(__file__).resolve().parents[2] / ".jax_cache"
    )
    try:
        if jax.default_backend() == "cpu":
            # CPU AOT artifacts embed host machine features; through the axon
            # remote-compile service they may not match this host (SIGILL
            # risk), and CPU compiles are fast anyway — skip the cache.
            return
        Path(cache_dir).mkdir(parents=True, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception as e:  # pragma: no cover
        logger.warning("compilation cache unavailable: %s", e)


def enable_fast_prng():
    """Use the XLA RngBitGenerator PRNG ('rbg') for in-step randomness on
    TPU: the flagship train step drops 39.4 -> 34.8 ms/step (+13%
    throughput) vs threefry, which dominates the dropout-mask / sigma /
    latent-noise generation cost (BENCH_NOTES.md round 2).  Deterministic
    given the same key; stream differs from threefry — the reference's RNG
    streams are unmatchable across frameworks anyway (SURVEY §7 hard
    parts).  Opt out with TQDNE_PRNG=threefry."""
    import os

    import jax

    if os.environ.get("TQDNE_PRNG", "rbg") != "rbg":
        return
    try:
        if jax.default_backend() != "cpu":
            jax.config.update("jax_default_prng_impl", "rbg")
    except Exception as e:  # pragma: no cover
        logger.warning("fast PRNG unavailable: %s", e)


def parse_dtype(name: str):
    return {"f32": jnp.float32, "float32": jnp.float32, "bf16": jnp.bfloat16,
            "bfloat16": jnp.bfloat16}[name]


def ensure_dataset(config, synthetic_n: int | None):
    """Create a synthetic dataset if requested and no real one exists."""
    if not Path(config.datapath).exists():
        if synthetic_n:
            logger.warning("no dataset at %s — generating synthetic data (n=%d)",
                           config.datapath, synthetic_n)
            make_synthetic_dataset(config.datapath, n=synthetic_n, t=(config.t or 4064))
        else:
            raise FileNotFoundError(
                f"dataset not found: {config.datapath}. Run tqdne-build-dataset, or pass "
                "--synthetic N for a smoke run."
            )


def make_loaders(config, batch_size: int, *, cond: bool, mesh, val_batch: int | None = None,
                 keys=("signal", "cond", "waveform"), val_keys=None,
                 host_representation: bool = True, latents_path=None):
    """``host_representation=False``: the datasets ship raw waveforms only
    (Identity in place of the representation — the device computes the
    signal inside the train step, ops/representation.py); the returned
    representation object is still the real one for inversion/eval.
    ``latents_path``: use CachedLatentsDataset (precomputed AE moments)."""
    from tqdne_tpu.data import representation as rep_mod

    representation = config.make_representation()
    ds_rep = representation if host_representation else rep_mod.Identity()
    if latents_path is not None:
        from tqdne_tpu.data.dataset import CachedLatentsDataset

        def make_ds(split):
            return CachedLatentsDataset(config.datapath, latents_path, ds_rep,
                                        cut=config.t, cond=cond, split=split)
    else:
        def make_ds(split):
            return Dataset(config.datapath, ds_rep, cut=config.t, cond=cond, split=split)

    ds_train = make_ds("train")
    ds_val = make_ds("validation")
    sharding = batch_sharding(mesh)
    n_dev = mesh.devices.size
    vb = val_batch or max(n_dev, min(batch_size, (len(ds_val) // n_dev) * n_dev or n_dev))
    if latents_path is not None and DeviceResidentLoader.fits(ds_train, keys):
        # cached-latent training: upload the (small) latent columns ONCE
        # and gather batches on device.  Avoids the measured axon PJRT
        # host-staging leak (~8 MB RSS per 8 MB device_put, gc-immune)
        # that OOM-killed the 640-epoch distill run at 130 GB, and takes
        # the host loader off the step critical path (data/pipeline.py).
        train_loader = DeviceResidentLoader(ds_train, batch_size,
                                            sharding=sharding, keys=keys)
    else:
        train_loader = BatchLoader(ds_train, batch_size, sharding=sharding, keys=keys)
    val_loader = BatchLoader(
        ds_val, vb, shuffle=False, drop_last=True, sharding=sharding,
        keys=val_keys if val_keys is not None else keys,
    )
    return train_loader, val_loader, representation


def build_autoencoder(config, dims: int, dtype=jnp.float32, train: bool = False,
                      model_channels: int | None = None):
    get = configs.get_1d_autoencoder_configs if dims == 1 else configs.get_2d_autoencoder_configs
    enc_cfg, dec_cfg = get(config)
    if model_channels:
        enc_cfg = enc_cfg | {"model_channels": model_channels}
        dec_cfg = dec_cfg | {"model_channels": model_channels}
    return AutoencoderKL(encoder_config=enc_cfg, decoder_config=dec_cfg, train=train,
                         dtype=dtype), enc_cfg, dec_cfg


def build_unet(config, dims: int, in_channels: int, out_channels: int, dtype=jnp.float32,
               **overrides):
    get = configs.get_1d_unet_config if dims == 1 else configs.get_2d_unet_config
    ucfg = get(config, in_channels, out_channels)
    ucfg.pop("flash_attention", None)
    ucfg.update(overrides)
    return UNet(**ucfg, dtype=dtype), ucfg


def signal_shape(config) -> tuple[int, ...]:
    """Channels-last signal shape for one example under the config's
    representation (the reference probes with fake_represent)."""
    rep = config.make_representation()
    # waveforms are always 3-component in the storage contract; the
    # representation decides the signal channel count (e.g. envelope: 3->6)
    dummy = np.zeros((1, 3, config.t or 4064), np.float32)
    sig = rep.get_representation(dummy)
    return tuple(np.moveaxis(sig, 1, -1).shape[1:])  # drop batch


def load_ae_variables(config, ae_name: str, ae, example_signal_shape):
    """Restore frozen AE weights for latent diffusion: our orbax run dir
    (outputs/<name>/checkpoints) or a reference torch .ckpt (converted).
    When the run saved hyperparameters, the architecture is verified
    against them (reference save_hyperparameters semantics)."""
    rundir = Path(config.outputdir) / ae_name
    ckptdir = rundir / "checkpoints"
    if ckptdir.exists():
        ckpt = Checkpointer(ckptdir, create=False)
        stored = ckpt.restore_hyperparameters()
        if stored is not None:
            ckpt.verify_hyperparameters(
                {"kind": "autoencoder",
                 "dims": dict(ae.encoder_config).get("dims"),
                 "encoder": dict(ae.encoder_config), "decoder": dict(ae.decoder_config),
                 "kl_weight": getattr(config, "kl_weight", None)},
                strict=False,
            )
        restored = ckpt.restore_latest_raw()
        if restored is None:
            raise FileNotFoundError(f"no checkpoint under {ckptdir}")
        state, _ = restored
        logger.info("loaded frozen AE (EMA params) from %s", ckptdir)
        return state["ema_params"]
    torch_ckpt = rundir / "last.ckpt"
    if torch_ckpt.exists():
        from tqdne_tpu.utils.torch_convert import convert_autoencoder, load_lightning_checkpoint

        sd, _ = load_lightning_checkpoint(torch_ckpt, prefix="")
        logger.info("converted torch AE checkpoint %s", torch_ckpt)
        return convert_autoencoder(sd, dict(ae.encoder_config), dict(ae.decoder_config))
    raise FileNotFoundError(
        f"frozen autoencoder not found under {rundir} (train it first with "
        f"`tqdne-train autoencoder --workdir ...`)"
    )


def _tuplify(cfg: dict) -> dict:
    """JSON round-trips turn tuples into lists; restore tuple-typed keys."""
    out = dict(cfg)
    for k in ("channel_mult", "attention_resolutions"):
        if k in out and isinstance(out[k], list):
            out[k] = tuple(out[k])
    return out


class InferenceBundle:
    """Everything needed to sample from a trained run of any model family.

    The reference selects the experiment config *by name* at evaluation
    time (`getattr(conf, args.config)`, /root/reference/experiments/
    evaluate.py:210, generate.py:210) and rebuilds the matching model from
    the checkpoint.  ``build_inference`` is the equivalent here: the
    recipe key names the family (cli.train.RECIPES), and every shape
    (signal, latent, waveform length) is derived from the config + AE
    instead of hardcoded flagship constants.
    """

    def __init__(self, recipe_key, recipe, config, representation, sig_shape, model_shape,
                 params, ae_vars, raw_sample, mesh=None):
        self.recipe_key = recipe_key
        self.recipe = recipe
        self.config = config
        self.representation = representation
        self.sig_shape = sig_shape  # channels-last, no batch
        self.model_shape = model_shape  # channels-last latent/signal shape, no batch
        # params/ae_vars arrive as HOST numpy trees (orbax restore); they ride
        # as jit ARGUMENTS (see jit_sample), so without an explicit device_put
        # every sampling call would re-upload the full weight tree through the
        # axon tunnel (~62 MB for the 1D UNet — measured 2-4 s/call, dwarfing
        # the 40 ms of device compute for few-eval consistency sampling).
        # Pin them on device once here (replicated over the serving mesh
        # when spatial partitioning is on).
        put = jax.device_put if mesh is None else (
            lambda t: jax.device_put(
                t, jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec()))
        )
        self.mesh = mesh
        self.provenance: dict = {}  # filled by build_inference
        self.params = put(params)
        self.ae_vars = put(ae_vars) if ae_vars is not None else None
        self._raw_sample = raw_sample
        self._jit_cache = {}

    @property
    def t(self) -> int:
        return self.config.t or 4064

    def jit_sample(self, batch_size: int):
        """A callable f(key, cond) -> channels-last signal (B, *sig_shape).

        jitted once per batch size; params/ae_vars ride as jit arguments
        (never closure constants — the axon remote-compile endpoint
        rejects large HLO constants)."""
        if batch_size not in self._jit_cache:
            shape = (batch_size, *self.model_shape)

            def fn(params, ae_vars, key, cond):
                return self._raw_sample(params, ae_vars, key, shape, cond)

            self._jit_cache[batch_size] = jax.jit(fn)
        jitted = self._jit_cache[batch_size]
        return lambda key, cond: jitted(self.params, self.ae_vars, key, cond)


def build_inference(recipe_key: str, workdir: str, dtype=jnp.bfloat16, *,
                    num_steps: int = 25, tiny: bool = False,
                    run_name: str | None = None, ae_name: str | None = None,
                    edm_checkpoint: str | None = None,
                    exported_weights: str | None = None,
                    autoencoder_checkpoint: str | None = None,
                    solver: str = "heun", int8: bool = False,
                    spatial: int = 0,
                    consistency_noise: str = "auto",
                    refine_sigma: float = 1.0,
                    gl_iters: int | None = None) -> InferenceBundle:
    """Rebuild a sampleable model for any diffusion recipe (1d_edm,
    1d_latent_edm, edm, latent_edm, consistency, ddpm) from its run dir,
    deriving all shapes from the config + AE.

    ``int8=True``: quality-gated fast mode — the SAMPLING program (UNet +
    AE decode) traces with int8 MXU convolutions (nn/quant.py); other
    programs in the process (classifier metrics, training) stay f32/bf16.

    ``spatial=K`` (K>1): small-batch serving layout — sample over a
    2D ("data", "model") mesh of the local devices with each sample's
    spatial extent split K ways (parallel/spatial.py), so a request batch
    smaller than the chip count still uses every chip.  EDM recipes only.
    """
    from tqdne_tpu.cli.train import RECIPES  # late import: train imports common

    recipe = RECIPES[recipe_key]
    if recipe.kind in ("autoencoder", "classifier"):
        raise SystemExit(f"recipe {recipe_key!r} has no sampler (kind={recipe.kind})")
    config = recipe.config_cls(workdir=workdir)
    if gl_iters is not None:
        if not hasattr(config, "griffin_lim_iters"):
            raise SystemExit(f"recipe {recipe_key!r} has no Griffin-Lim inversion")
        config.griffin_lim_iters = gl_iters
    representation = config.make_representation()
    sig_shape = signal_shape(config)
    tiny_mc = 32 if tiny else None

    ae = None
    ae_vars = None
    model_shape = sig_shape
    enc_cfg = dec_cfg = None
    if recipe.latent:
        ae_run = ae_name or recipe.ae_name
        ae_stored = Checkpointer(
            Path(config.outputdir) / ae_run / "checkpoints", create=False
        ).restore_hyperparameters() if not autoencoder_checkpoint else None
        if ae_stored is not None and "encoder" in ae_stored:
            ae = AutoencoderKL(
                encoder_config=_tuplify(ae_stored["encoder"]),
                decoder_config=_tuplify(ae_stored["decoder"]), dtype=dtype,
            )
            enc_cfg, dec_cfg = dict(ae.encoder_config), dict(ae.decoder_config)
        else:
            ae, enc_cfg, dec_cfg = build_autoencoder(config, recipe.dims, dtype,
                                                     model_channels=tiny_mc)
        if autoencoder_checkpoint:
            from tqdne_tpu.utils.torch_convert import (
                convert_autoencoder,
                load_lightning_checkpoint,
            )

            ae_sd, _ = load_lightning_checkpoint(autoencoder_checkpoint, prefix="")
            ae_vars = convert_autoencoder(ae_sd, enc_cfg, dec_cfg)
        else:
            ae_vars = load_ae_variables(config, ae_name or recipe.ae_name, ae, sig_shape)
        from tqdne_tpu.train.steps import infer_latent_shape

        model_shape = infer_latent_shape(ae, ae_vars, sig_shape)

    cond_features = len(config.features_keys) if recipe.cond else None
    overrides = dict(cond_features=cond_features)
    if tiny:
        overrides["model_channels"] = 32
    # self-describing checkpoints: when the run saved hyperparameters,
    # rebuild the UNet from the STORED architecture (Lightning
    # load_from_checkpoint semantics) so preset drift or forgotten --tiny
    # flags can't silently mismatch the weights
    stored = None
    if not edm_checkpoint:
        ckpt_probe = Checkpointer(
            Path(config.outputdir) / (run_name or recipe.name) / "checkpoints",
            create=False,
        )
        stored = ckpt_probe.restore_hyperparameters()
    if stored is not None and "unet" in stored:
        from tqdne_tpu.models.unet import UNet

        ucfg = _tuplify(stored["unet"])
        unet = UNet(**ucfg, dtype=dtype)
    else:
        unet, ucfg = build_unet(config, recipe.dims, model_shape[-1], model_shape[-1],
                                dtype, **overrides)

    # training-budget provenance: which checkpoint (and how much training)
    # produced the weights being sampled.  Propagated by tqdne-evaluate into
    # the output HDF5 and by eval.report into the report JSON, so quality
    # claims carry the budget that bought them (the reference stores the
    # epoch inside the Lightning checkpoint; progress.json is our equivalent,
    # train/loop.py _write_progress).
    provenance = {"run_name": run_name or recipe.name, "recipe": recipe_key}
    if edm_checkpoint:
        from tqdne_tpu.utils.torch_convert import convert_unet, load_lightning_checkpoint

        unet_sd, _ = load_lightning_checkpoint(edm_checkpoint, prefix="unet")
        params = convert_unet(unet_sd, ucfg)
        provenance["torch_checkpoint"] = str(edm_checkpoint)
    elif exported_weights:
        # release-artifact path (cli/export_weights.py): digest-verified
        # against its manifest, provenance carries the artifact identity
        from tqdne_tpu.cli.export_weights import load_exported

        params, manifest = load_exported(exported_weights)
        provenance["exported_weights"] = str(exported_weights)
        if manifest is not None:
            provenance["checkpoint_step"] = manifest.get("checkpoint_step")
            provenance["weights_sha256"] = manifest.get("sha256")
    else:
        name = run_name or recipe.name
        ckptdir = Path(config.outputdir) / name / "checkpoints"
        restored = Checkpointer(ckptdir, create=False).restore_latest_raw()
        if restored is None:
            raise SystemExit(f"no checkpoint under {ckptdir} (train with "
                             f"`tqdne-train {recipe_key} --workdir {workdir}`)")
        params = restored[0]["ema_params"]
        provenance["checkpoint_step"] = int(restored[1])
        progress = ckptdir / "progress.json"
        if progress.exists():
            import json as _json

            prog = _json.loads(progress.read_text())
            # progress.json tracks the LIVE run; if evaluation races a
            # training process that saved a newer checkpoint in between,
            # merging it verbatim would overstate the restored
            # checkpoint's training budget (ADVICE r4) — only merge when
            # the steps agree, else record both sides and flag it
            if int(prog.get("step", -1)) == int(restored[1]):
                provenance.update({f"train_{k}": v for k, v in prog.items()})
            else:
                provenance["progress_mismatch"] = {
                    f"train_{k}": v for k, v in prog.items()}

    mesh = eps_sharding = None
    if spatial and spatial > 1:
        if recipe.kind != "edm":
            raise SystemExit(f"--spatial serves EDM recipes only (got {recipe.kind})")
        from tqdne_tpu.parallel.spatial import signal_sharding, spatial_mesh

        mesh = spatial_mesh(model=spatial)
        eps_sharding = signal_sharding(mesh, ndim=len(model_shape) + 1)

    if recipe.kind == "edm":
        from tqdne_tpu.train.steps import make_edm_steps

        _, _, sample_fn = make_edm_steps(unet, tx=None, autoencoder=ae,
                                         num_sampling_steps=num_steps)

        # pre-cast weights once before the sampling scan when computing in
        # bf16 (removes 2N-1 in-loop f32->bf16 full-param casts, pure HBM
        # traffic — same option bench.py uses; measured 146 -> ~196 wf/s on
        # the flagship latent sampler)
        cast = dtype if dtype == jnp.bfloat16 else None

        def raw_sample(params, ae_vars, key, shape, cond):
            return sample_fn(params, key, shape, cond=cond, ae_vars=ae_vars,
                             solver=solver, cast_params=cast,
                             eps_sharding=eps_sharding)
    elif recipe.kind == "consistency":
        from tqdne_tpu.diffusion.consistency import ConsistencyConfig, make_consistency_steps

        _, _, sample_fn = make_consistency_steps(unet, tx=None, cfg=ConsistencyConfig(),
                                                 max_steps=1, autoencoder=ae)
        # num_steps = total network evals: one sigma_max shot + N-1
        # refinement passes at refine_sigma (consistency_model.py:81-106
        # defaults sigma=1); consistency_noise default "auto" = the
        # measured-best convention ("song" at every NFE on the converged
        # round-5 student — see diffusion/consistency.py:consistency_sample)
        refine_sigmas = (refine_sigma,) * max(0, num_steps - 1)
        cast = dtype if dtype == jnp.bfloat16 else None

        def raw_sample(params, ae_vars, key, shape, cond):
            return sample_fn(params, key, shape, sigmas=refine_sigmas, cond=cond,
                             ae_vars=ae_vars, cast_params=cast,
                             noise=consistency_noise)
    elif recipe.kind == "distill":
        from tqdne_tpu.diffusion.distillation import make_distillation_steps

        _, _, sample_fn = make_distillation_steps(unet, tx=None, autoencoder=ae)
        refine_sigmas = (refine_sigma,) * max(0, num_steps - 1)
        cast = dtype if dtype == jnp.bfloat16 else None

        def raw_sample(params, ae_vars, key, shape, cond):
            return sample_fn(params, key, shape, sigmas=refine_sigmas, cond=cond,
                             ae_vars=ae_vars, cast_params=cast,
                             noise=consistency_noise)
    elif recipe.kind == "ddpm":
        from tqdne_tpu.diffusion.ddpm import DDPMConfig, make_ddpm_steps

        _, _, sample_fn = make_ddpm_steps(unet, tx=None, cfg=DDPMConfig())

        def raw_sample(params, ae_vars, key, shape, cond):
            return sample_fn(params, key, shape, cond=cond)
    else:  # pragma: no cover
        raise ValueError(recipe.kind)

    if int8:
        from tqdne_tpu.nn.quant import int8_scope

        inner_sample = raw_sample

        def raw_sample(params, ae_vars, key, shape, cond):
            # the scope is live while jit traces this body, so every
            # conv_nd in the sampler's trace picks the QuantConv path
            with int8_scope():
                return inner_sample(params, ae_vars, key, shape, cond)

    bundle = InferenceBundle(recipe_key, recipe, config, representation, sig_shape,
                             model_shape, params, ae_vars, raw_sample, mesh=mesh)
    bundle.provenance = provenance
    return bundle


def add_common_args(parser):
    parser.add_argument("--workdir", type=str, required=True,
                        help="working directory (data/ and outputs/ live here)")
    parser.add_argument("-b", "--batchsize", type=int, default=None)
    parser.add_argument("-d", "--num-devices", type=int, default=None,
                        help="devices to use (default: all)")
    parser.add_argument("--num-slices", type=int, default=None,
                        help="multi-slice pods: train over a DCN-aware (replica, data) "
                             "mesh with this many slices (default: auto-detect from "
                             "MEGASCALE_NUM_SLICES / device slice info; 1 = flat mesh)")
    parser.add_argument("--max-epochs", type=int, default=None)
    parser.add_argument("--max-steps", type=int, default=None)
    parser.add_argument("--dtype", type=str, default="bf16", choices=["f32", "bf16"],
                        help="compute dtype (params are always f32)")
    parser.add_argument("--synthetic", type=int, default=0,
                        help="if no dataset exists, generate a synthetic one with N examples")
    parser.add_argument("--no-resume", action="store_true")
    parser.add_argument("--eval-every", type=int, default=10,
                        help="sampling-eval callback period (epochs)")
    parser.add_argument("--val-every", type=int, default=1,
                        help="validation-loss pass period in epochs (default 1, "
                             "reference parity; raise it for short epochs where "
                             "the val pass + loader turnaround dominates — e.g. "
                             "cached-latent distillation epochs run ~6 s of "
                             "steps but ~7 s of per-epoch overhead)")
    parser.add_argument("--checkpoint-every", type=int, default=1,
                        help="checkpoint period in epochs (default 1, reference parity; "
                             "raise it when the epoch is short — each save device_gets "
                             "the full train state, which dominates short epochs on a "
                             "remote-attached chip)")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--cached-latents", action="store_true",
                        help="latent recipes: read precomputed AE moments "
                             "(tqdne-precompute-latents) instead of encoding every step "
                             "(+31%% flagship training throughput)")
    parser.add_argument("--device-representation", action="store_true",
                        help="compute the signal representation on the accelerator inside "
                             "the train step (loader ships raw waveforms; removes the host "
                             "CPU bottleneck for LogSpectrogram/MovingAverageEnvelope)")
    parser.add_argument("--skip-nonfinite", type=int, default=0, metavar="N",
                        help="skip (zero-update) steps with NaN/inf gradients, erroring "
                             "after N consecutive bad steps (0 = off, reference behavior)")
    parser.add_argument("--tiny", action="store_true",
                        help="shrink model widths for smoke/integration runs")
    return parser


def dataset_feature_stats(config) -> "np.ndarray":
    """(5, 2) [mean, std] of the conditioning features from the dataset —
    the normalization the reference's generate.py derives from data
    (experiments/generate.py:82-106) instead of the CLI's hardcoded table."""
    import h5py

    with h5py.File(config.datapath, "r", locking=False) as f:
        stats = []
        for key in config.features_keys:
            arr = f[key][:]
            stats.append([float(arr.mean()), float(arr.std())])
    return np.array(stats)

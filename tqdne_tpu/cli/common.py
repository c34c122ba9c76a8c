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
from tqdne_tpu.data.pipeline import BatchLoader
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
                 keys=("signal", "cond", "waveform")):
    representation = config.make_representation()
    ds_train = Dataset(config.datapath, representation, cut=config.t, cond=cond, split="train")
    ds_val = Dataset(config.datapath, representation, cut=config.t, cond=cond, split="validation")
    sharding = batch_sharding(mesh)
    n_dev = mesh.devices.size
    vb = val_batch or max(n_dev, min(batch_size, (len(ds_val) // n_dev) * n_dev or n_dev))
    train_loader = BatchLoader(ds_train, batch_size, sharding=sharding, keys=keys)
    val_loader = BatchLoader(
        ds_val, vb, shuffle=False, drop_last=True, sharding=sharding, keys=keys
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
    (outputs/<name>/checkpoints) or a reference torch .ckpt (converted)."""
    rundir = Path(config.outputdir) / ae_name
    ckptdir = rundir / "checkpoints"
    if ckptdir.exists():
        restored = Checkpointer(ckptdir, create=False).restore_latest_raw()
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


def add_common_args(parser):
    parser.add_argument("--workdir", type=str, required=True,
                        help="working directory (data/ and outputs/ live here)")
    parser.add_argument("-b", "--batchsize", type=int, default=None)
    parser.add_argument("-d", "--num-devices", type=int, default=None,
                        help="devices to use (default: all)")
    parser.add_argument("--max-epochs", type=int, default=None)
    parser.add_argument("--max-steps", type=int, default=None)
    parser.add_argument("--dtype", type=str, default="bf16", choices=["f32", "bf16"],
                        help="compute dtype (params are always f32)")
    parser.add_argument("--synthetic", type=int, default=0,
                        help="if no dataset exists, generate a synthetic one with N examples")
    parser.add_argument("--no-resume", action="store_true")
    parser.add_argument("--eval-every", type=int, default=10,
                        help="sampling-eval callback period (epochs)")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--tiny", action="store_true",
                        help="shrink model widths for smoke/integration runs")
    return parser


def dataset_feature_stats(config) -> "np.ndarray":
    """(5, 2) [mean, std] of the conditioning features from the dataset —
    the normalization the reference's generate.py derives from data
    (experiments/generate.py:82-106) instead of the CLI's hardcoded table."""
    import h5py

    with h5py.File(config.datapath, "r") as f:
        stats = []
        for key in config.features_keys:
            arr = f[key][:]
            stats.append([float(arr.mean()), float(arr.std())])
    return np.array(stats)

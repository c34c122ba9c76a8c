"""`tqdne-import-checkpoint` — reference torch .ckpt -> orbax run dir.

Converts a Lightning checkpoint (e.g. the released Zenodo weights,
records 15687691/16405538) into a tqdne-tpu orbax checkpoint under
outputs/<run-name>/checkpoints, so every tool (tqdne-evaluate,
tqdne-generate-waveforms, sampling callbacks, resume) works on the
imported weights.

Handles the reference's checkpoint layout: `state_dict` with `unet.*` /
`encoder.*`+`decoder.*` / classifier keys, `global_step`, and the EMA
callback state persisted as checkpoint["ema_state"] with parameter-name
keys (/root/reference/tqdne/ema.py:50-54) — imported into
TrainState.ema_params (eval paths read EMA, matching the reference's
swap semantics).
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np

import jax.numpy as jnp

from tqdne_tpu import configs
from tqdne_tpu.cli import common


def _ema_state_dict(ckpt: dict, base_sd: dict, prefix: str) -> dict | None:
    """Merge checkpoint['ema_state'] (trainable params only) over the base
    state_dict and strip the prefix; None when absent."""
    ema = None
    for container in (ckpt, ckpt.get("callbacks", {})):
        if isinstance(container, dict):
            for key, val in container.items():
                if key == "ema_state":
                    ema = val
                elif isinstance(val, dict) and "ema_state" in val:
                    ema = val["ema_state"]
    if ema is None:
        return None
    merged = dict(base_sd)
    plen = len(prefix) + 1 if prefix else 0
    for name, tensor in ema.items():
        name = name[plen:] if prefix and name.startswith(prefix + ".") else name
        if name in merged:
            merged[name] = tensor.numpy() if hasattr(tensor, "numpy") else np.asarray(tensor)
    return merged


def import_checkpoint(kind: str, ckpt_path: str, workdir: str, name: str | None = None,
                      model_channels: int | None = None):
    import torch

    from tqdne_tpu.train.checkpoint import Checkpointer
    from tqdne_tpu.train.state import TrainState, make_optimizer
    from tqdne_tpu.utils.torch_convert import (
        convert_autoencoder,
        convert_classifier,
        convert_unet,
        strip_prefix,
    )

    config = configs.LatentSpectrogramConfig(workdir=workdir)
    ckpt = torch.load(ckpt_path, map_location="cpu", weights_only=False)
    sd = {k: v.numpy() for k, v in ckpt["state_dict"].items()}
    step = int(ckpt.get("global_step", 0))

    if kind == "edm":
        name = name or "Latent-EDM-32x32x8-LogSpectrogram"
        ucfg = configs.get_2d_unet_config(config, config.latent_channels, config.latent_channels)
        if model_channels:
            ucfg["model_channels"] = model_channels
        ucfg.pop("flash_attention", None)
        base = strip_prefix(sd, "unet")
        params = convert_unet(base, ucfg)
        ema_sd = _ema_state_dict(ckpt, base, "unet")
        ema = convert_unet(ema_sd, ucfg) if ema_sd else params
    elif kind == "autoencoder":
        name = name or "Autoencoder-32x32x4-LogSpectrogram"
        enc_cfg, dec_cfg = configs.get_2d_autoencoder_configs(config)
        params = convert_autoencoder(sd, enc_cfg, dec_cfg)
        ema_sd = _ema_state_dict(ckpt, sd, "")
        ema = convert_autoencoder(ema_sd, enc_cfg, dec_cfg) if ema_sd else params
    elif kind == "classifier":
        name = name or "Classifier-LogSpectrogram"
        clf_cfg = configs.SpectrogramClassificationConfig(workdir=workdir)
        enc_cfg = configs.get_classifier_encoder_config(clf_cfg)
        params = convert_classifier(sd, enc_cfg)
        ema_sd = _ema_state_dict(ckpt, sd, "")
        ema = convert_classifier(ema_sd, enc_cfg) if ema_sd else params
    else:
        raise SystemExit(f"unknown kind {kind}")

    to_f32 = lambda t: jnp.asarray(np.asarray(t), jnp.float32)  # noqa: E731
    import jax

    params = jax.tree_util.tree_map(to_f32, params)
    ema = jax.tree_util.tree_map(to_f32, ema)

    tx = make_optimizer("adam", 1e-4)
    state = TrainState.create(params, tx)
    state = state.replace(step=jnp.asarray(step, jnp.int32), ema_params=ema)

    outdir = Path(config.outputdir) / name / "checkpoints"
    ckpt_mgr = Checkpointer(outdir)
    ckpt_mgr.save(step, jax.device_get(state))
    ckpt_mgr.close()
    print(f"imported {kind} checkpoint (step {step}) -> {outdir}")
    return outdir


def main(argv=None):
    parser = argparse.ArgumentParser("tqdne-import-checkpoint", description=__doc__)
    parser.add_argument("kind", choices=["edm", "autoencoder", "classifier"])
    parser.add_argument("--ckpt", required=True, help="reference Lightning .ckpt path")
    parser.add_argument("--workdir", required=True)
    parser.add_argument("--name", default=None, help="run name (defaults to flagship names)")
    args = parser.parse_args(argv)
    common.setup_logging()
    import_checkpoint(args.kind, args.ckpt, args.workdir, args.name)


if __name__ == "__main__":
    main()

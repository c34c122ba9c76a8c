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


def _verify_conversion(kind: str, base_sd: dict, variables: dict, cfgs, tol: float = 1e-4):
    """Numerical torch<->JAX parity on the just-imported weights.

    Rebuilds the reference torch module (the pip-installable ``tqdne``
    package, the same code the released Zenodo weights were trained
    with), loads the checkpoint state_dict into it, and asserts the
    converted flax forward matches on a fixed random input to ``tol``
    relative error.  This is the released-weights analogue of
    tests/test_flagship_parity.py, runnable by any user with egress:
    see scripts/verify_release_weights.sh.
    """
    import torch

    from tqdne_tpu.utils.torch_convert import strip_prefix

    try:
        from tqdne.blocks import Decoder as RefDecoder
        from tqdne.blocks import Encoder as RefEncoder
        from tqdne.unet import UNetModel
    except ImportError as e:  # pragma: no cover - env-dependent
        raise SystemExit(
            "--verify needs the reference 'tqdne' torch package on the "
            f"path (pip install tqdne): {e}"
        )

    def to_torch(sd):
        return {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()}

    def to_last(x):
        return np.moveaxis(x, 1, -1)

    def check(got, want, what):
        got, want = np.asarray(got), np.asarray(want)
        rel = (np.abs(got - want) / np.maximum(np.abs(want), 1e-3)).max()
        print(f"verify[{kind}/{what}]: max rel err {rel:.3e} (tol {tol:g})")
        if rel > tol:
            raise SystemExit(f"--verify FAILED for {kind}/{what}: {rel:.3e} > {tol:g}")

    rng = np.random.default_rng(0)
    if kind == "edm":
        ucfg = cfgs
        ref = UNetModel(**ucfg, flash_attention=False).eval()
        ref.load_state_dict(to_torch(base_sd), strict=True)
        x = rng.standard_normal((2, ucfg["in_channels"], 32, 32)).astype(np.float32)
        t = rng.standard_normal(2).astype(np.float32)
        cond = rng.standard_normal((2, ucfg["cond_features"])).astype(np.float32)
        with torch.no_grad():
            want = ref(torch.tensor(x), torch.tensor(t), torch.tensor(cond)).numpy()
        from tqdne_tpu.models.unet import UNet

        got = UNet(**ucfg).apply(
            variables, jnp.asarray(to_last(x)), jnp.asarray(t), jnp.asarray(cond))
        check(np.moveaxis(np.asarray(got), -1, 1), want, "unet_forward")
    elif kind == "autoencoder":
        enc_cfg, dec_cfg = cfgs
        ref_enc = RefEncoder(**enc_cfg, flash_attention=False).eval()
        ref_dec = RefDecoder(**dec_cfg, flash_attention=False).eval()
        ref_enc.load_state_dict(to_torch(strip_prefix(base_sd, "encoder")), strict=True)
        ref_dec.load_state_dict(to_torch(strip_prefix(base_sd, "decoder")), strict=True)
        from tqdne_tpu.models.autoencoder import AutoencoderKL

        ae = AutoencoderKL(encoder_config=enc_cfg, decoder_config=dec_cfg)
        x = rng.standard_normal((1, enc_cfg["in_channels"], 128, 128)).astype(np.float32)
        with torch.no_grad():
            want_moments = ref_enc(torch.tensor(x)).numpy()
        mean, logstd = ae.apply(variables, jnp.asarray(to_last(x)), method="moments")
        got_moments = np.concatenate(
            [np.moveaxis(np.asarray(mean), -1, 1), np.moveaxis(np.asarray(logstd), -1, 1)], axis=1)
        check(got_moments, want_moments, "encoder_moments")
        z = rng.standard_normal((1, dec_cfg["in_channels"], 32, 32)).astype(np.float32)
        with torch.no_grad():
            want_dec = ref_dec(torch.tensor(z)).numpy()
        got_dec = ae.apply(variables, jnp.asarray(to_last(z)), method="decode")
        check(np.moveaxis(np.asarray(got_dec), -1, 1), want_dec, "decoder")
    elif kind == "classifier":
        enc_cfg = cfgs
        ref_enc = RefEncoder(**enc_cfg, flash_attention=False).eval()
        ref_enc.load_state_dict(to_torch(strip_prefix(base_sd, "encoder")), strict=True)
        x = rng.standard_normal((2, enc_cfg["in_channels"], 64, 64)).astype(np.float32)
        with torch.no_grad():
            h = ref_enc(torch.tensor(x)).mean(dim=(2, 3))
            # classifier.py:51-59 head: SiLU -> Linear -> SiLU -> Linear -> head
            # (the Lightning wrapper needs lightning; compose from the
            # state_dict with functional ops, as test_convert_autoencoder does)
            w = {k: torch.from_numpy(np.ascontiguousarray(v))
                 for k, v in base_sd.items() if not k.startswith("encoder.")}
            silu, linear = torch.nn.functional.silu, torch.nn.functional.linear
            emb = linear(silu(linear(silu(h), w["output_MLP.1.weight"],
                                     w["output_MLP.1.bias"])),
                         w["output_MLP.3.weight"], w["output_MLP.3.bias"])
            want = linear(emb, w["output_layer.weight"], w["output_layer.bias"]).numpy()
        from tqdne_tpu.models.classifier import Classifier

        n_classes = base_sd["output_layer.weight"].shape[0]
        clf = Classifier(encoder_config=enc_cfg, num_classes=n_classes)
        got = clf.apply(variables, jnp.asarray(to_last(x)))
        check(got, want, "classifier_logits")


def import_checkpoint(kind: str, ckpt_path: str, workdir: str, name: str | None = None,
                      model_channels: int | None = None, verify: bool = False):
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
        if verify:
            _verify_conversion("edm", base, params, ucfg)
            if ema_sd:
                _verify_conversion("edm", ema_sd, ema, ucfg)
    elif kind == "autoencoder":
        name = name or "Autoencoder-32x32x4-LogSpectrogram"
        enc_cfg, dec_cfg = configs.get_2d_autoencoder_configs(config)
        params = convert_autoencoder(sd, enc_cfg, dec_cfg)
        ema_sd = _ema_state_dict(ckpt, sd, "")
        ema = convert_autoencoder(ema_sd, enc_cfg, dec_cfg) if ema_sd else params
        if verify:
            _verify_conversion("autoencoder", sd, params, (enc_cfg, dec_cfg))
    elif kind == "classifier":
        name = name or "Classifier-LogSpectrogram"
        clf_cfg = configs.SpectrogramClassificationConfig(workdir=workdir)
        enc_cfg = configs.get_classifier_encoder_config(clf_cfg)
        params = convert_classifier(sd, enc_cfg)
        ema_sd = _ema_state_dict(ckpt, sd, "")
        ema = convert_classifier(ema_sd, enc_cfg) if ema_sd else params
        if verify:
            _verify_conversion("classifier", sd, params, enc_cfg)
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
    parser.add_argument(
        "--verify", action="store_true",
        help="after conversion, rebuild the torch reference model from the "
             "checkpoint and assert forward parity <=1e-4 on a fixed input "
             "(needs the 'tqdne' torch package)")
    args = parser.parse_args(argv)
    common.setup_logging()
    import_checkpoint(args.kind, args.ckpt, args.workdir, args.name, verify=args.verify)


if __name__ == "__main__":
    main()

"""Convert reference (torch) checkpoints to tqdne-tpu flax params.

Enables loading the released Zenodo weights
(/root/reference/tqdne/generate_waveforms.py:44-64; records 15687691 /
16405538) into the TPU-native models, and underpins the numeric-parity
benchmark (EDM sampling matching the reference to 1e-4 with shared
weights — BASELINE.md).

The mapping walks the architecture config to enumerate the reference's
module names (torch layout, channels-first) and our flax param paths
(channels-last) in lockstep:

  torch                                    flax (ours)
  -----------------------------------      --------------------------------
  conv{1,2}d weight (O,I,K...)             kernel (K..., I, O)
  linear weight (O,I)                      kernel (I, O)
  GroupNorm weight/bias                    <norm>/GroupNorm_0/scale/bias
  time_mlp.0 / time_mlp.2                  time_mlp/fc1 / fc2
  input_blocks.0.0                         in_conv
  input_blocks.i.0 (ResBlock)              down_{i-1}_res/...
  input_blocks.i.1 (AttentionBlock)        down_{i-1}_attn/...
  input_blocks.i.0.op (Downsample)         down_{i-1}_downsample/op
  middle_block.{0,1,2}                     mid_res1 / mid_attn / mid_res2
  output_blocks.j.{...}                    up_{j}_res / up_{j}_attn /
                                           up_{j}_upsample/conv
  out.0 / out.2                            out_norm / out_conv
"""

from __future__ import annotations

import numpy as np


def _conv(sd: dict, prefix: str) -> dict:
    w = np.asarray(sd[f"{prefix}.weight"])
    if w.ndim == 3:  # conv1d (O, I, K) -> (K, I, O)
        kernel = w.transpose(2, 1, 0)
    elif w.ndim == 4:  # conv2d (O, I, kH, kW) -> (kH, kW, I, O)
        kernel = w.transpose(2, 3, 1, 0)
    else:
        raise ValueError(f"unexpected conv weight ndim {w.ndim} at {prefix}")
    return {"kernel": kernel, "bias": np.asarray(sd[f"{prefix}.bias"])}


def _linear(sd: dict, prefix: str) -> dict:
    return {
        "kernel": np.asarray(sd[f"{prefix}.weight"]).T,
        "bias": np.asarray(sd[f"{prefix}.bias"]),
    }


def _norm(sd: dict, prefix: str) -> dict:
    return {
        "GroupNorm_0": {
            "scale": np.asarray(sd[f"{prefix}.weight"]),
            "bias": np.asarray(sd[f"{prefix}.bias"]),
        }
    }


def _mlp(sd: dict, prefix: str) -> dict:
    return {"fc1": _linear(sd, f"{prefix}.0"), "fc2": _linear(sd, f"{prefix}.2")}


def _resblock(sd: dict, prefix: str) -> dict:
    out = {
        "in_norm": _norm(sd, f"{prefix}.in_layers.0"),
        "in_conv": _conv(sd, f"{prefix}.in_layers.2"),
        "emb_proj": _linear(sd, f"{prefix}.emb_layers.1"),
        "out_norm": _norm(sd, f"{prefix}.out_layers.0"),
        "out_conv": _conv(sd, f"{prefix}.out_layers.3"),
    }
    if f"{prefix}.skip_connection.weight" in sd:
        out["skip"] = _conv(sd, f"{prefix}.skip_connection")
    return out


def _plain_resblock(sd: dict, prefix: str) -> dict:
    out = {
        "in_norm": _norm(sd, f"{prefix}.in_layers.0"),
        "in_conv": _conv(sd, f"{prefix}.in_layers.2"),
        "out_norm": _norm(sd, f"{prefix}.out_layers.0"),
        "out_conv": _conv(sd, f"{prefix}.out_layers.3"),
    }
    if f"{prefix}.skip_connection.weight" in sd:
        out["skip"] = _conv(sd, f"{prefix}.skip_connection")
    return out


def _attention(sd: dict, prefix: str) -> dict:
    return {
        "norm": _norm(sd, f"{prefix}.norm"),
        "qkv": _conv(sd, f"{prefix}.qkv"),
        "proj_out": _conv(sd, f"{prefix}.proj_out"),
    }


def strip_prefix(state_dict: dict, prefix: str) -> dict:
    """Select keys under ``prefix.`` (e.g. 'unet', 'encoder') and strip it."""
    plen = len(prefix) + 1
    return {k[plen:]: v for k, v in state_dict.items() if k.startswith(prefix + ".")}


def convert_unet(state_dict: dict, cfg: dict) -> dict:
    """UNetModel state_dict -> flax variables for tqdne_tpu.models.unet.UNet.

    ``cfg`` is the architecture dict (model_channels, channel_mult,
    num_res_blocks, attention_resolutions, ...).
    """
    sd = state_dict
    mult = tuple(cfg["channel_mult"])
    nrb = int(cfg["num_res_blocks"])
    attn_res = set(cfg.get("attention_resolutions", ()))

    p: dict = {
        "time_embed": {"W": np.asarray(sd["time_embed.W"])},
        "time_mlp": _mlp(sd, "time_mlp"),
        "in_conv": _conv(sd, "input_blocks.0.0"),
        "out_norm": _norm(sd, "out.0"),
        "out_conv": _conv(sd, "out.2"),
        "mid_res1": _resblock(sd, "middle_block.0"),
        "mid_attn": _attention(sd, "middle_block.1"),
        "mid_res2": _resblock(sd, "middle_block.2"),
    }
    if cfg.get("cond_features") is not None:
        p["cond_mlp"] = _mlp(sd, "cond_mlp")
        if "cond_embed.W" in sd:
            p["cond_embed"] = {"W": np.asarray(sd["cond_embed.W"])}

    # down path: input_blocks index i >= 1 maps to down_{i-1}
    i = 1
    ds = 1
    for level in range(len(mult)):
        for _ in range(nrb):
            p[f"down_{i-1}_res"] = _resblock(sd, f"input_blocks.{i}.0")
            if ds in attn_res:
                p[f"down_{i-1}_attn"] = _attention(sd, f"input_blocks.{i}.1")
            i += 1
        if level != len(mult) - 1:
            p[f"down_{i-1}_downsample"] = {"op": _conv(sd, f"input_blocks.{i}.0.op")}
            i += 1
            ds *= 2

    # up path: output_blocks index j maps to up_{j}
    j = 0
    for level in reversed(range(len(mult))):
        for k in range(nrb + 1):
            p[f"up_{j}_res"] = _resblock(sd, f"output_blocks.{j}.0")
            idx = 1
            if ds in attn_res:
                p[f"up_{j}_attn"] = _attention(sd, f"output_blocks.{j}.{idx}")
                idx += 1
            if level and k == nrb:
                p[f"up_{j}_upsample"] = {
                    "conv": _conv(sd, f"output_blocks.{j}.{idx}.conv")
                }
                ds //= 2
            j += 1

    return {"params": p}


def _conv_stack(sd: dict, cfg: dict, *, decoder: bool) -> dict:
    """Encoder/Decoder (blocks.py:263-436): flattened Sequential (torch
    down_blocks.k / up_blocks.k) vs our per-role names."""
    mult = tuple(cfg["channel_mult"])
    nrb = int(cfg["num_res_blocks"])
    attn_res = set(cfg.get("attention_resolutions", ()))
    seq = "up_blocks" if decoder else "down_blocks"

    p: dict = {
        "in_conv": _conv(sd, "input_layer"),
        "out_conv": _conv(sd, "output_layer"),
    }
    k = 0  # torch flattened index
    b = 0  # our block counter
    if not decoder:
        ds = 1
        for level in range(len(mult)):
            for _ in range(nrb):
                p[f"down_{b}_res"] = _plain_resblock(sd, f"{seq}.{k}")
                k += 1
                if ds in attn_res:
                    p[f"down_{b}_attn"] = _attention(sd, f"{seq}.{k}")
                    k += 1
                b += 1
            if level != len(mult) - 1:
                p[f"down_{b}_downsample"] = {"op": _conv(sd, f"{seq}.{k}.op")}
                k += 1
                b += 1
                ds *= 2
    else:
        ds = 2 ** (len(mult) - 1)
        for level in reversed(range(len(mult))):
            if level != len(mult) - 1:
                p[f"up_{b}_upsample"] = {"conv": _conv(sd, f"{seq}.{k}.conv")}
                k += 1
                b += 1
                ds //= 2
            for _ in range(nrb):
                p[f"up_{b}_res"] = _plain_resblock(sd, f"{seq}.{k}")
                k += 1
                if ds in attn_res:
                    p[f"up_{b}_attn"] = _attention(sd, f"{seq}.{k}")
                    k += 1
                b += 1
    return p


def convert_autoencoder(state_dict: dict, encoder_cfg: dict, decoder_cfg: dict) -> dict:
    """LightningAutoencoder state_dict ('encoder.*' / 'decoder.*') ->
    flax variables for AutoencoderKL."""
    return {
        "params": {
            "encoder": _conv_stack(strip_prefix(state_dict, "encoder"), encoder_cfg, decoder=False),
            "decoder": _conv_stack(strip_prefix(state_dict, "decoder"), decoder_cfg, decoder=True),
        }
    }


def convert_classifier(state_dict: dict, encoder_cfg: dict) -> dict:
    """LithningClassifier state_dict -> flax variables for Classifier."""
    return {
        "params": {
            "encoder": _conv_stack(strip_prefix(state_dict, "encoder"), encoder_cfg, decoder=False),
            "mlp1": _linear(state_dict, "output_MLP.1"),
            "mlp2": _linear(state_dict, "output_MLP.3"),
            "head": _linear(state_dict, "output_layer"),
        }
    }


def load_lightning_checkpoint(path, prefix: str = "unet") -> tuple[dict, dict]:
    """Read a Lightning .ckpt (torch.save zip) -> (sub state_dict, hparams).

    Requires torch on the host; returns numpy arrays.
    """
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = {k: v.numpy() for k, v in ckpt["state_dict"].items()}
    hparams = dict(ckpt.get("hyper_parameters", {}))
    return strip_prefix(sd, prefix) if prefix else sd, hparams

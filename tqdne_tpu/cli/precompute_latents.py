"""`tqdne-precompute-latents` — cache the frozen AE's latent moments.

The reference's latent diffusion re-encodes every sample on every train
step (/root/reference/tqdne/edm.py:121-124), but the encoder moments
(mean, log_std) are a deterministic function of the input: computing them
once and sampling `mean + eps * exp(log_std)` in the step removes the
whole encoder forward from the hot loop (60.2 -> 46.0 ms/step on the
flagship, +31% training throughput — BENCH_NOTES round 2).

Writes ``data/latents-<ae_name>.h5`` next to the dataset, with
"latent_mean" / "latent_log_std" (N, *latent_shape, channels-last) rows
aligned with the dataset's storage order (so every split indexes it the
same way).  Train with ``tqdne-train <latent recipe> --cached-latents``.
"""

from __future__ import annotations

import argparse

import numpy as np

import jax
import jax.numpy as jnp

from tqdne_tpu.cli import common


def latents_path(config, ae_name: str):
    return config.datapath.parent / f"latents-{ae_name}.h5"


def ae_fingerprint(ae_vars) -> str:
    """Collision-resistant exact-weights fingerprint: the sidecar must be
    regenerated whenever the AE weights change (same architecture,
    retrained weights would otherwise silently shift the latent space).
    SHA-256 over every leaf's tree path, shape, and deterministic byte
    slices (head/tail elements as float32) — unlike a sum of |w|, not
    invariant to permutations or sign flips."""
    import hashlib

    h = hashlib.sha256()
    for path, leaf in sorted(
        jax.tree_util.tree_flatten_with_path(ae_vars)[0], key=lambda kv: str(kv[0])
    ):
        arr = np.asarray(leaf, dtype=np.float32).ravel()
        h.update(str(path).encode())
        h.update(str(np.shape(leaf)).encode())
        h.update(arr[:64].tobytes())
        h.update(arr[-64:].tobytes())
    return h.hexdigest()


def run(args):
    import h5py

    from tqdne_tpu.cli.train import RECIPES
    from tqdne_tpu.data.pipeline import to_channels_last
    from tqdne_tpu.ops.representation import device_representation_fn

    recipe = RECIPES[args.config]
    if not recipe.latent:
        raise SystemExit(f"recipe {args.config!r} is not a latent recipe")
    config = recipe.config_cls(workdir=args.workdir)
    dtype = common.parse_dtype(args.dtype)
    ae_name = args.ae_name or recipe.ae_name

    ae, _, _ = common.build_autoencoder(config, recipe.dims, dtype,
                                        model_channels=32 if args.tiny else None)
    sig_shape = common.signal_shape(config)
    ae_vars = common.load_ae_variables(config, ae_name, ae, sig_shape)

    out_path_probe = latents_path(config, ae_name)
    if out_path_probe.exists() and not getattr(args, "force", False):
        # idempotent re-runs (pipeline retries): skip when the sidecar
        # already matches these exact AE weights; a corrupt/truncated file
        # (killed mid-write) falls through to a full rewrite
        try:
            with h5py.File(out_path_probe, "r", locking=False) as f:
                complete = f["latent_mean"].shape[0] == f.attrs.get("n_rows_written", -1)
                if complete and str(f.attrs.get("ae_fingerprint", "")) == \
                        ae_fingerprint(ae_vars):
                    print(f"latents up to date for these AE weights -> {out_path_probe}")
                    return out_path_probe
        except (OSError, KeyError):
            pass

    representation = config.make_representation()
    dev_rep = device_representation_fn(representation)

    @jax.jit
    def moments(ae_vars, wf_cl):
        signal = dev_rep(wf_cl) if dev_rep is not None else wf_cl
        return ae.apply(ae_vars, signal, method="moments")

    out_path = latents_path(config, ae_name)
    with h5py.File(config.datapath, "r", locking=False) as src, \
            h5py.File(out_path, "w") as dst:
        wfs = src["waveforms"]  # (N, 3, T) preprocessed storage contract
        n = wfs.shape[0]
        mean_ds = std_ds = None
        done = 0
        for s in range(0, n, args.batch):
            block = np.asarray(wfs[s : s + args.batch], np.float32)
            block = np.moveaxis(block, 1, -1)  # channels-last for the device
            if config.t:
                block = block[:, : config.t]
            if dev_rep is None:  # host representation fallback
                sig = representation.get_representation(np.moveaxis(block, -1, 1))
                block = to_channels_last({"signal": sig})["signal"]
            m, ls = moments(ae_vars, jnp.asarray(block))
            m, ls = np.asarray(m, np.float32), np.asarray(ls, np.float32)
            if mean_ds is None:
                mean_ds = dst.create_dataset("latent_mean", (n, *m.shape[1:]), np.float32)
                std_ds = dst.create_dataset("latent_log_std", (n, *m.shape[1:]), np.float32)
                dst.attrs["ae_name"] = ae_name
                dst.attrs["dtype"] = args.dtype
                dst.attrs["ae_fingerprint"] = ae_fingerprint(ae_vars)
            mean_ds[s : s + len(m)] = m
            std_ds[s : s + len(m)] = ls
            done += len(m)
            print(f"latent moments {done}/{n}", flush=True)  # watchdog heartbeat
        dst.attrs["n_rows_written"] = done  # completeness marker for re-runs
        print(f"wrote {done} latent moment rows -> {out_path}")
    return out_path


def main(argv=None):
    parser = argparse.ArgumentParser("tqdne-precompute-latents", description=__doc__)
    parser.add_argument("--workdir", type=str, required=True)
    parser.add_argument("--config", type=str, default="latent_edm",
                        help="latent recipe name: latent_edm, 1d_latent_edm")
    parser.add_argument("--ae-name", type=str, default=None)
    parser.add_argument("-b", "--batch", type=int, default=64)
    # f32 default: the encode runs ONCE — exactness beats speed here (bf16
    # moments would quietly degrade an f32 cached-latents training run)
    parser.add_argument("--dtype", type=str, default="f32", choices=["f32", "bf16"])
    parser.add_argument("--tiny", action="store_true")
    parser.add_argument("--force", action="store_true",
                        help="recompute even when the sidecar matches the AE weights")
    args = parser.parse_args(argv)
    common.setup_logging()
    run(args)


if __name__ == "__main__":
    main()

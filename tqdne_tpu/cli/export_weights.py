"""Export a trained run's EMA weights as a standalone release artifact.

The reference ships released weights (Zenodo 15687691;
/root/reference/tqdne/generate_waveforms.py:44-64 downloads .ckpt files and
loads them by run name).  This is OUR side of that contract: a trained run
under ``<workdir>/outputs/<name>/checkpoints`` is exported as one
self-describing msgpack file + a manifest with SHA256 digests, so quality
evidence (docs/quality/*.json provenance) can be tied tamper-evidently to
the exact parameters that produced it — without committing hundreds of MB
of weights to git (the flagship UNet alone is ~203 MB in bf16; the
committed artifact is the DIGEST, the weights file travels out of band,
exactly like the reference's Zenodo weights travel out of its repo).

    tqdne-export-weights latent_distill --workdir qrun --out weights/
    tqdne-export-weights latent_edm --workdir qrun --out weights/ \
        --digest-out docs/quality/WEIGHTS_DIGESTS.json

Load an exported artifact with ``load_exported`` (used by serving and the
generate CLI's ``--weights`` flag):

    params, manifest = load_exported("weights/Latent-Distill-...-ema.msgpack")
"""

from __future__ import annotations

import argparse
import hashlib
import json
from datetime import datetime, timezone
from pathlib import Path


def _sha256(path: Path) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def export_weights(recipe_key: str, workdir: str, out_dir: str,
                   dtype: str = "bf16", digest_out: str | None = None,
                   run_name: str | None = None) -> Path:
    import jax.numpy as jnp
    from flax import serialization

    from tqdne_tpu.cli import common
    from tqdne_tpu.cli.train import RECIPES
    from tqdne_tpu.train.checkpoint import Checkpointer

    recipe = RECIPES[recipe_key]
    config = recipe.config_cls(workdir=workdir)
    name = run_name or recipe.name
    ckptdir = Path(config.outputdir) / name / "checkpoints"
    ckpt = Checkpointer(ckptdir, create=False)
    restored = ckpt.restore_latest_raw()
    if restored is None:
        raise SystemExit(f"no checkpoint under {ckptdir}")
    state, step = restored
    params = state["ema_params"]

    cast = common.parse_dtype(dtype)
    if cast is not None:
        import jax

        params = jax.tree_util.tree_map(
            lambda p: p.astype(cast) if hasattr(p, "astype") and
            jnp.issubdtype(p.dtype, jnp.floating) else p, params)

    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    wpath = out / f"{name}-ema.msgpack"
    wpath.write_bytes(serialization.to_bytes(params))

    import jax

    manifest = {
        "run_name": name,
        "recipe": recipe_key,
        "checkpoint_step": int(step),
        "dtype": dtype,
        "param_count": int(sum(x.size for x in jax.tree_util.tree_leaves(params))),
        "sha256": _sha256(wpath),
        "file": wpath.name,
        "exported_at": datetime.now(timezone.utc).isoformat(timespec="seconds"),
    }
    hp = ckpt.restore_hyperparameters()
    if hp is not None:
        manifest["hparams"] = hp
    progress = ckptdir / "progress.json"
    if progress.exists():
        prog = json.loads(progress.read_text())
        # same race rule as cli/common.py provenance (ADVICE r4): only
        # claim the live progress as this artifact's budget if it matches
        if int(prog.get("step", -1)) == int(step):
            manifest["train_progress"] = prog
    mpath = out / f"{name}-ema.manifest.json"
    mpath.write_text(json.dumps(manifest, indent=1, sort_keys=True) + "\n")

    if digest_out:
        dpath = Path(digest_out)
        digests = json.loads(dpath.read_text()) if dpath.exists() else {}
        digests[name] = {k: manifest[k] for k in
                         ("sha256", "checkpoint_step", "dtype", "param_count",
                          "recipe", "file")}
        dpath.parent.mkdir(parents=True, exist_ok=True)
        dpath.write_text(json.dumps(digests, indent=1, sort_keys=True) + "\n")
        print(f"digest recorded in {dpath}")

    print(f"exported {manifest['param_count'] / 1e6:.1f}M params "
          f"(step {step}, {dtype}) -> {wpath}")
    return wpath


def load_exported(weights_path: str):
    """Load an exported artifact; verifies the manifest digest when the
    sibling manifest exists.  Returns (params, manifest_or_None)."""
    from flax import serialization

    wpath = Path(weights_path)
    data = wpath.read_bytes()
    manifest = None
    mpath = wpath.parent / (wpath.stem + ".manifest.json")
    if mpath.exists():
        manifest = json.loads(mpath.read_text())
        digest = hashlib.sha256(data).hexdigest()
        if digest != manifest["sha256"]:
            raise SystemExit(
                f"{wpath}: sha256 mismatch vs manifest ({digest[:12]}... != "
                f"{manifest['sha256'][:12]}...) — artifact corrupted or swapped")
    params = serialization.msgpack_restore(data)
    return params, manifest


def main(argv=None):
    from tqdne_tpu.cli.train import RECIPES

    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("recipe", choices=sorted(RECIPES))
    p.add_argument("--workdir", default="qrun")
    p.add_argument("--out", default="weights")
    p.add_argument("--dtype", default="bf16", choices=["bf16", "f32"])
    p.add_argument("--digest-out", default=None,
                   help="also append {run: sha256,...} to this committed "
                        "digest registry (docs/quality/WEIGHTS_DIGESTS.json)")
    p.add_argument("--run-name", default=None)
    args = p.parse_args(argv)
    export_weights(args.recipe, args.workdir, args.out, args.dtype,
                   args.digest_out, args.run_name)


if __name__ == "__main__":
    main()

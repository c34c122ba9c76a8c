"""Release-artifact export (cli/export_weights.py): a trained run exports
to a digest-verified msgpack + manifest, loads back bit-for-bit, and the
generate CLI samples from the artifact instead of the orbax checkpoint
(the reference's released-weights UX, generate_waveforms.py:44-64 — ours
travels out of band with a committed digest instead of a Zenodo DOI)."""

import json

import numpy as np
import pytest

import jax


@pytest.mark.slow
def test_export_load_generate_roundtrip(tmp_path):
    from tqdne_tpu.cli import train as train_cli

    wd = str(tmp_path)
    train_cli.main([
        "1d_edm", "--workdir", wd, "--synthetic", "16", "--max-epochs", "1",
        "-b", "8", "--eval-every", "99", "--tiny", "--dtype", "f32",
    ])

    from tqdne_tpu.cli.export_weights import export_weights, load_exported

    out = tmp_path / "weights"
    digest_reg = tmp_path / "digests.json"
    wpath = export_weights("1d_edm", wd, str(out), dtype="bf16",
                           digest_out=str(digest_reg))
    manifest = json.loads((out / (wpath.stem + ".manifest.json")).read_text())
    assert manifest["recipe"] == "1d_edm"
    assert manifest["param_count"] > 0
    reg = json.loads(digest_reg.read_text())
    assert reg[manifest["run_name"]]["sha256"] == manifest["sha256"]

    params, m2 = load_exported(str(wpath))
    assert m2["sha256"] == manifest["sha256"]
    leaves = jax.tree_util.tree_leaves(params)
    assert all(np.asarray(x).dtype == np.dtype("bfloat16") for x in leaves
               if np.issubdtype(np.asarray(x).dtype, np.floating) or
               np.asarray(x).dtype.name == "bfloat16")

    # tampering must be detected
    data = bytearray(wpath.read_bytes())
    data[len(data) // 2] ^= 0xFF
    bad = out / "tampered-ema.msgpack"
    bad.write_bytes(bytes(data))
    (out / "tampered-ema.manifest.json").write_text(json.dumps(manifest))
    with pytest.raises(SystemExit, match="sha256 mismatch"):
        load_exported(str(bad))

    # generate CLI samples from the artifact
    from tqdne_tpu.cli import generate_waveforms as gen

    gen_out = tmp_path / "gen.h5"
    gen.main([
        "--config", "1d_edm", "--workdir", wd, "--outfile", str(gen_out),
        "--weights", str(wpath),
        "--num_samples", "2", "--hypocentral_distance", "50", "--magnitude",
        "5.5", "--vs30", "400", "--hypocentre_depth", "20", "--azimuthal_gap",
        "100", "--batch_size", "2", "--num_steps", "2", "--tiny",
        "--dtype", "bf16",
    ])
    import h5py

    with h5py.File(gen_out) as f:
        assert f["waveforms"].shape == (2, 3, 4064)

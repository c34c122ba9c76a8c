"""Backfill provenance into committed quality reports that predate the
stamping path (VERDICT r4 #6).

Reports produced after commit f39ee1d are stamped by the pipeline itself
(cli/evaluate.py writes provenance into the eval HDF5; eval/report.py
copies it into the JSON).  The artifacts below were produced by EARLIER
rounds whose training workdirs no longer exist, so their provenance cannot
be re-emitted — it is RECONSTRUCTED here from the loop script that
produced each artifact plus the README prose recorded at the time, and
honestly marked ``"reconstructed": true`` so nobody mistakes it for a
pipeline stamp.  Fresh reports (already stamped) are never touched.

    python scripts/restamp_reports.py          # writes in place
    python scripts/restamp_reports.py --check  # exit 1 if any report lacks provenance
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

QUALITY = Path(__file__).resolve().parents[1] / "docs" / "quality"

_NOTE = ("reconstructed from the producing loop script + README prose; "
         "artifact predates the provenance-stamping path (round 4)")

# file -> reconstructed provenance (run/budget facts recorded when the
# artifact was committed; see docs/quality/README.md and the named script)
RECONSTRUCTED = {
    "report.json": {
        "run_name": "Latent-EDM-32x32x8-LogSpectrogram",
        "recipe": "latent_edm", "train_epoch": 100,
        "num_steps": 25, "solver": "heun", "split": "test",
        "script": "scripts/quality_loop.sh", "round": 2,
    },
    "report_consistency_long.json": {
        "run_name": "Consistency-MovingAvg",
        "recipe": "consistency", "train_epoch": 480,
        "num_steps": 2, "split": "test",
        "script": "scripts/consistency_long.sh", "round": 3,
    },
    "report_latent_consistency.json": {
        "run_name": "Latent-Consistency-32x32x8-LogSpectrogram",
        "recipe": "latent_consistency", "train_epoch": 200,
        "num_steps": 2, "split": "test",
        "script": "scripts/latent_consistency_loop.sh", "round": 4,
    },
    "report_r4_teacher.json": {
        "run_name": "Latent-EDM-32x32x8-LogSpectrogram",
        "recipe": "latent_edm", "train_epoch": 100,
        "num_steps": 25, "solver": "heun", "split": "test",
        "script": "scripts/round4_loop.sh", "round": 4,
    },
}
# the 160-epoch CD student's convention table (budget-ablation row of the
# round-5 long retrain): all six share the same training provenance
for _name, _nfe, _noise, _rs in (
    ("report_latent_distill_nfe1.json", 1, "reference", 1.0),
    ("report_latent_distill_nfe2.json", 2, "reference", 1.0),
    ("report_latent_distill_song_nfe1.json", 1, "song", 1.0),
    ("report_latent_distill_song_nfe2.json", 2, "song", 1.0),
    ("report_latent_distill_song_nfe2_rs0.5.json", 2, "song", 0.5),
    ("report_latent_distill_song_nfe2_rs2.0.json", 2, "song", 2.0),
):
    RECONSTRUCTED[_name] = {
        "run_name": "Latent-Distill-32x32x8-LogSpectrogram",
        "recipe": "latent_distill", "train_epoch": 160, "train_step": 4320,
        "ema_decay": 0.95, "num_steps": _nfe, "consistency_noise": _noise,
        "refine_sigma": _rs, "split": "test",
        "script": "scripts/latent_distill_loop.sh", "round": 4,
    }
# the round-3 NFE sweep (scripts/nfe_sweep.sh): same 100-epoch teacher as
# report.json, solver x step-count grid on the test split
for _solver in ("heun", "dpmpp_2m"):
    for _steps in (5, 10, 25):
        RECONSTRUCTED[f"report-{_solver}{_steps}.json"] = {
            "run_name": "Latent-EDM-32x32x8-LogSpectrogram",
            "recipe": "latent_edm", "train_epoch": 100,
            "num_steps": _steps, "solver": _solver, "split": "test",
            "script": "scripts/nfe_sweep.sh", "round": 3,
        }
# the round-4 dpmpp_2m@10 seed repeat (scripts/round4_loop.sh)
for _seed in (1, 2, 3):
    RECONSTRUCTED[f"report_dpmpp10_seed{_seed}.json"] = {
        "run_name": "Latent-EDM-32x32x8-LogSpectrogram",
        "recipe": "latent_edm", "train_epoch": 100,
        "num_steps": 10, "solver": "dpmpp_2m", "seed": _seed,
        "split": "test",
        "script": "scripts/round4_loop.sh", "round": 4,
    }
# residuals.json is produced by tqdne-residuals from the same evaluation
# HDF5 as report.json
RECONSTRUCTED["residuals.json"] = dict(RECONSTRUCTED["report.json"])


def main(check: bool = False) -> int:
    missing = []
    for path in sorted(QUALITY.glob("*.json")):
        if path.name == "WEIGHTS_DIGESTS.json":
            continue
        data = json.loads(path.read_text())
        if "provenance" in data:
            continue
        recon = RECONSTRUCTED.get(path.name)
        if recon is None:
            missing.append(path.name)
            continue
        if check:
            missing.append(path.name)
            continue
        data["provenance"] = {"reconstructed": True, "note": _NOTE, **recon}
        path.write_text(json.dumps(data, indent=1) + "\n")
        print(f"stamped (reconstructed): {path.name}")
    if missing:
        print(("unstamped reports: " if check else
               "no reconstruction table entry for: ") + ", ".join(missing))
        return 1
    print("all reports carry provenance")
    return 0


if __name__ == "__main__":
    sys.exit(main(check="--check" in sys.argv))

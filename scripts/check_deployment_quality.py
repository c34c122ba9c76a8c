"""Deployment-point quality regression guard (VERDICT r3 #5).

docs/quality recommends dpmpp_2m @ 10 NFE as the deployment point.  That
recommendation must not silently rot when solver/numerics change, so the
quality loop seed-repeats the evaluation (scripts/round4_loop.sh: seeds
1-3) and this checker asserts the seed-mean FID stays inside a stated band
around the committed value.  Run:

    python scripts/check_deployment_quality.py qrun/evaluation/report_dpmpp10_seed*.json

Exit 0 = within band; exit 1 = regression (or missing reports).
"""

from __future__ import annotations

import json
import statistics
import sys

# The committed round-4 seed-repeat mean lives in docs/quality/README.md;
# the band is generous enough for synthetic-dataset re-draws (the observed
# seed spread) but catches a solver/numerics regression that pushes the
# deployment point toward the Heun-25 FID (~20) or worse.
EXPECTED_MEAN = float(sys.argv[sys.argv.index("--expect") + 1]) if "--expect" in sys.argv else 13.0
BAND = float(sys.argv[sys.argv.index("--band") + 1]) if "--band" in sys.argv else 6.0


def main(paths: list[str]) -> int:
    paths = [p for p in paths if not p.startswith("--") and p.endswith(".json")]
    if len(paths) < 2:
        print(f"need >=2 seed reports, got {len(paths)}: {paths}")
        return 1
    fids = []
    for p in paths:
        with open(p) as f:
            r = json.load(f)
        if r.get("fid") is None:
            print(f"{p}: no fid")
            return 1
        fids.append(float(r["fid"]))
        print(f"{p}: FID {r['fid']:.2f}")
    mean = statistics.mean(fids)
    spread = max(fids) - min(fids)
    print(f"seed-mean FID {mean:.2f} +- {spread / 2:.2f} "
          f"(expected {EXPECTED_MEAN:.1f} +- {BAND:.1f})")
    if abs(mean - EXPECTED_MEAN) > BAND:
        print("DEPLOYMENT-POINT QUALITY REGRESSION")
        return 1
    print("ok")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))

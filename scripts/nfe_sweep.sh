#!/bin/bash
# Sampler quality-vs-NFE study (DESIGN roadmap #1): evaluate the trained
# flagship at {5, 10, 25} sampling steps x {heun, dpmpp_2m} on the test
# split, then report FID / ASD-Frechet / accuracy per point against the
# same train-vs-test calibration file.  Heun spends 2N-1 network evals,
# dpmpp_2m spends N — the study quantifies what the 2x faster solver and
# reduced step counts cost in sample quality.
# Requires a quality_loop.sh-trained workdir ($W).
set -euo pipefail
W=${W:-/root/repo/qrun}
PY=${PY:-python}
RUN=Latent-EDM-32x32x8-LogSpectrogram
cd /root/repo

source "$(dirname "$0")/_watchdog.sh"

test -d "$W/outputs/$RUN/checkpoints" || { echo "train the flagship first (quality_loop.sh)"; exit 1; }

CAL="$W/evaluation/$RUN-split_train-rank_0.h5"
test -f "$CAL" || { echo "missing calibration file $CAL (quality_loop.sh produces it)"; exit 1; }

for solver in heun dpmpp_2m; do
  for steps in 25 10 5; do
    tag="-${solver}${steps}"
    stage "evaluate $solver steps=$steps"
    run_watched $PY -m tqdne_tpu.cli.evaluate --workdir "$W" --config latent_edm \
      --split test -b 64 --num-steps "$steps" --solver "$solver" "--suffix=$tag"
    stage "report $solver steps=$steps"
    run_watched $PY -m tqdne_tpu.eval.report "$W/evaluation/$RUN$tag-split_test-rank_0.h5" \
      --calibration-files "$CAL" --out "$W/evaluation/report$tag.json"
  done
done

stage "summary"
$PY - <<EOF
import json
from pathlib import Path

rows = []
for solver in ("heun", "dpmpp_2m"):
    for steps in (25, 10, 5):
        p = Path("$W/evaluation") / f"report-{solver}{steps}.json"
        r = json.loads(p.read_text())
        nfe = 2 * steps - 1 if solver == "heun" else steps
        rows.append((solver, steps, nfe, r))
print(f"{'solver':10} {'steps':>5} {'NFE':>4} {'FID':>8} {'ASD-Frechet(ch0)':>16} {'acc':>6}")
for solver, steps, nfe, r in rows:
    fid = r.get("fid") or float("nan")
    asd = (r.get("asd_frechet_per_channel") or [float("nan")])[0]
    acc = r.get("classifier_accuracy_predicted") or float("nan")
    print(f"{solver:10} {steps:>5} {nfe:>4} {fid:>8.2f} {asd:>16.1f} {acc:>6.3f}")
EOF

stage "done"

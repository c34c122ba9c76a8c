#!/bin/bash
# Round-4 evidence pipeline (VERDICT r3 items #1 and #5): rebuild the
# quality-loop workdir, run the consistency-distillation quality loop that
# round 3 committed but never executed, train the from-scratch latent-iCT
# comparison point, and seed-repeat the dpmpp_2m@10 deployment report so the
# recommendation carries a spread, not a single draw.  Artifacts land in $W;
# the curated reports are copied into docs/quality/ and committed afterwards.
set -euo pipefail
W=${W:-/root/repo/qrun}
PY=${PY:-python}
export W PY
cd /root/repo

source "$(dirname "$0")/_watchdog.sh"

bash scripts/quality_loop.sh

bash scripts/latent_distill_loop.sh

bash scripts/latent_consistency_loop.sh

RUN=Latent-EDM-32x32x8-LogSpectrogram
CAL="$W/evaluation/$RUN-split_train-rank_0.h5"
for SEED in 1 2 3; do
  stage "seed-repeat dpmpp_2m@10 (seed $SEED)"
  run_watched $PY -m tqdne_tpu.cli.evaluate --workdir "$W" --config latent_edm \
    --split test -b 64 --solver dpmpp_2m --num-steps 10 --seed "$SEED" \
    "--suffix=-dpmpp10-s$SEED"
  run_watched $PY -m tqdne_tpu.eval.report \
    "$W/evaluation/$RUN-dpmpp10-s$SEED-split_test-rank_0.h5" \
    --calibration-files "$CAL" \
    --out "$W/evaluation/report_dpmpp10_seed$SEED.json"
done

stage "round4 pipeline done"

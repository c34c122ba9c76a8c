#!/bin/bash
# Longer iCT training budget (round 3): the 120-epoch run matched the EDM
# baseline's envelope MSE but paid ~3x ASD Frechet; iCT quality improves
# markedly with training budget (the discretization-doubling schedule is
# tied to total steps).  Train 480 epochs on the same structured synthetic
# dataset, evaluate through the same machinery, append the new trade-off
# row to docs/quality + BENCH_NOTES.
set -euo pipefail
W=${W:-/root/repo/qrun2}
N=${N:-8192}
PY=${PY:-python}
cd /root/repo
mkdir -p "$W"

source "$(dirname "$0")/_watchdog.sh"

if [ ! -f "$W/data/preprocessed_waveforms.h5" ]; then
  stage "synthetic dataset (n=$N)"
  $PY - <<EOF
from tqdne_tpu.data.dataset import make_synthetic_dataset
make_synthetic_dataset("$W/data/preprocessed_waveforms.h5", n=$N, t=4064)
EOF
fi

stage "train consistency model (iCT, long budget)"
# checkpoint every 20 epochs: the axon relay occasionally wedges the
# process mid-run (watchdog kills + retries); frequent saves turn a
# retry into a resume instead of a from-scratch restart
run_watched $PY -m tqdne_tpu.cli.train consistency --workdir "$W" \
  --max-epochs "${CM_EPOCHS:-480}" -b 256 --eval-every 120 --checkpoint-every 20

stage "evaluate consistency (test split, 2 network evals)"
run_watched $PY -m tqdne_tpu.cli.evaluate --workdir "$W" --config consistency --split test -b 64 \
  --no-classifier --num-steps 2

stage "report"
run_watched $PY -m tqdne_tpu.eval.report "$W/evaluation/Consistency-MovingAvg-split_test-rank_0.h5" \
  --out "$W/evaluation/report_consistency_long.json"

stage "done"

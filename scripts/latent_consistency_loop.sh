#!/bin/bash
# Latent consistency model (beyond reference): iCT in the flagship's
# frozen-VAE latent space, trained on a quality_loop.sh workdir (reuses
# its AE, cached latents, classifier, and train-split calibration file).
# Deliverable: FID / IS / ASD-Frechet at 2 network evals next to the
# 49-eval Heun flagship's numbers — the few-eval speed/quality frontier
# at flagship shape (794 vs 196 wf/s, BENCH_NOTES round 3).
set -euo pipefail
W=${W:-/root/repo/qrun}
PY=${PY:-python}
RUN=Latent-Consistency-32x32x8-LogSpectrogram
CAL="$W/evaluation/Latent-EDM-32x32x8-LogSpectrogram-split_train-rank_0.h5"
cd /root/repo

source "$(dirname "$0")/_watchdog.sh"

test -f "$CAL" || { echo "run quality_loop.sh first (calibration + AE + latents)"; exit 1; }

stage "train latent consistency (iCT, long budget)"
run_watched $PY -m tqdne_tpu.cli.train latent_consistency --workdir "$W" \
  --max-epochs "${LCM_EPOCHS:-480}" -b 256 --cached-latents --eval-every 120 \
  --checkpoint-every 20

stage "evaluate latent consistency (test split, 2 network evals)"
run_watched $PY -m tqdne_tpu.cli.evaluate --workdir "$W" --config latent_consistency \
  --split test -b 64 --num-steps 2

stage "report (same calibration file as the flagship EDM)"
run_watched $PY -m tqdne_tpu.eval.report "$W/evaluation/$RUN-split_test-rank_0.h5" \
  --calibration-files "$CAL" --out "$W/evaluation/report_latent_consistency.json"

stage "done"

#!/bin/bash
# Consistency DISTILLATION of the flagship (beyond reference): a consistency
# student regressed onto the trained latent-EDM teacher's PF-ODE trajectory
# (diffusion/distillation.py), on a quality_loop.sh workdir (reuses its AE,
# cached latents, teacher checkpoint, classifier, and train-split
# calibration file).  Deliverable: FID / IS / ASD-Frechet at 1 and 2 network
# evals next to the teacher's numbers and the from-scratch iCT row (which
# lands at FID ~4700 at 2 evals — distillation is the right tool once the
# teacher exists).
set -euo pipefail
W=${W:-/root/repo/qrun}
PY=${PY:-python}
RUN=Latent-Distill-32x32x8-LogSpectrogram
CAL="$W/evaluation/Latent-EDM-32x32x8-LogSpectrogram-split_train-rank_0.h5"
cd /root/repo

source "$(dirname "$0")/_watchdog.sh"

test -f "$CAL" || { echo "run quality_loop.sh first (calibration + AE + latents)"; exit 1; }

stage "distill from the latent-EDM teacher"
run_watched $PY -m tqdne_tpu.cli.train latent_distill --workdir "$W" \
  --max-epochs "${CD_EPOCHS:-160}" -b 256 --cached-latents --eval-every 40 \
  --checkpoint-every 20

for NFE in 2 1; do
  stage "evaluate distilled student (test split, $NFE network evals)"
  run_watched $PY -m tqdne_tpu.cli.evaluate --workdir "$W" --config latent_distill \
    --split test -b 64 --num-steps "$NFE" "--suffix=-nfe$NFE"

  stage "report (same calibration file as the flagship EDM)"
  run_watched $PY -m tqdne_tpu.eval.report "$W/evaluation/$RUN-nfe$NFE-split_test-rank_0.h5" \
    --calibration-files "$CAL" --out "$W/evaluation/report_latent_distill_nfe$NFE.json"
done

stage "done"

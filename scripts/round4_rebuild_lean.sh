#!/bin/bash
# Lean rebuild of the quality-loop workdir for the long-budget distill run
# (VERDICT r3 #1 follow-through, second session).  The full quality_loop.sh
# spends most of its ~2h wall budget on mid-training sampling evals
# (SamplingEvalCallback: full Heun sampling + Griffin-Lim + figures every
# 20-25 epochs); those reports are already committed in docs/quality/ from
# the two prior from-scratch chains.  This variant trains the same chain at
# the same budgets but with sampling evals disabled (--eval-every 100000 —
# evaluate/report afterwards is the quality measurement), producing exactly
# what scripts/round4_distill_long.sh needs: AE + cached latents + teacher
# EDM + classifier + the train-split calibration file, plus a fresh-teacher
# test-split report so the long-distill table compares student and teacher
# from the SAME chain.
set -euo pipefail
W=${W:-/root/repo/qrun}
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

stage "train autoencoder (no mid-train sampling evals)"
run_watched $PY -m tqdne_tpu.cli.train autoencoder --workdir "$W" \
  --max-epochs "${AE_EPOCHS:-40}" -b 128 --eval-every 100000 \
  --device-representation --checkpoint-every 20

stage "precompute latents"
run_watched $PY -m tqdne_tpu.cli.precompute_latents --workdir "$W" --config latent_edm

stage "train latent EDM teacher (no mid-train sampling evals)"
run_watched $PY -m tqdne_tpu.cli.train latent_edm --workdir "$W" \
  --max-epochs "${EDM_EPOCHS:-100}" -b 256 --cached-latents --eval-every 100000 \
  --checkpoint-every 50

stage "train classifier"
run_watched $PY -m tqdne_tpu.cli.train classifier --workdir "$W" \
  --max-epochs "${CLF_EPOCHS:-30}" -b 64 --eval-every 100000 \
  --device-representation --checkpoint-every 15

RUN=Latent-EDM-32x32x8-LogSpectrogram
stage "calibration eval (train split slice)"
run_watched $PY -m tqdne_tpu.cli.evaluate --workdir "$W" --config latent_edm \
  --split train -b 64 --limit-batches 13

stage "teacher eval (test split)"
run_watched $PY -m tqdne_tpu.cli.evaluate --workdir "$W" --config latent_edm \
  --split test -b 64

stage "teacher report"
run_watched $PY -m tqdne_tpu.eval.report "$W/evaluation/$RUN-split_test-rank_0.h5" \
  --calibration-files "$W/evaluation/$RUN-split_train-rank_0.h5" \
  --out "$W/evaluation/report_teacher.json"

stage "lean rebuild done"

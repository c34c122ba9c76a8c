#!/bin/bash
# Quality-loop demonstration on the synthetic dataset (VERDICT round-2 #2):
# train the flagship chain (AE -> cached latents -> latent EDM) plus the
# evaluation classifier to convergence on the structured synthetic dataset
# (make_synthetic_dataset embeds feature->waveform physics), then run
# evaluate -> report -> residuals.  Artifacts land in $W; the curated
# report JSON + figures are committed under docs/quality/.
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

stage "train autoencoder"
run_watched $PY -m tqdne_tpu.cli.train autoencoder --workdir "$W" \
  --max-epochs "${AE_EPOCHS:-40}" -b 128 --eval-every 20 --device-representation \
  --checkpoint-every 10

stage "precompute latents"
run_watched $PY -m tqdne_tpu.cli.precompute_latents --workdir "$W" --config latent_edm

stage "train latent EDM (flagship)"
run_watched $PY -m tqdne_tpu.cli.train latent_edm --workdir "$W" \
  --max-epochs "${EDM_EPOCHS:-100}" -b 256 --cached-latents --eval-every 25 \
  --checkpoint-every 25

stage "train classifier"
run_watched $PY -m tqdne_tpu.cli.train classifier --workdir "$W" \
  --max-epochs "${CLF_EPOCHS:-30}" -b 64 --eval-every 99 --device-representation \
  --checkpoint-every 10

RUN=Latent-EDM-32x32x8-LogSpectrogram
stage "evaluate (sampled vs target HDF5, test split)"
run_watched $PY -m tqdne_tpu.cli.evaluate --workdir "$W" --config latent_edm --split test -b 64

stage "evaluate (train split slice, for the train-vs-test calibration FID)"
run_watched $PY -m tqdne_tpu.cli.evaluate --workdir "$W" --config latent_edm --split train -b 64 \
  --limit-batches 13

stage "report"
run_watched $PY -m tqdne_tpu.eval.report "$W/evaluation/$RUN-split_test-rank_0.h5" \
  --calibration-files "$W/evaluation/$RUN-split_train-rank_0.h5" \
  --out "$W/evaluation/report.json" --figures "$W/evaluation/figures"

stage "residuals"
run_watched $PY -m tqdne_tpu.eval.residuals "$W/evaluation/$RUN-split_test-rank_0.h5" \
  --out "$W/evaluation/residuals.json" --plot "$W/evaluation/residuals.png"

stage "done"

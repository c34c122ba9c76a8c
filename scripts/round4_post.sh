#!/bin/bash
# Round-4 follow-up evidence (runs after round4_loop.sh frees the chip):
# re-evaluate the distilled consistency student with the corrected 'song'
# sampling convention (consistency.py: variance-matched N(0, sigma_max^2)
# init + Gaussian refinement — the round-4 fix for the reference's
# unscaled-init/uniform-refinement conventions, which measured WORSE at
# 2 NFE than 1), and sweep the refinement sigma at 2 NFE.  The original
# -nfe{1,2} reports (reference convention) stay as the measured cost of
# the reference's sampler bug.
set -euo pipefail
W=${W:-/root/repo/qrun}
PY=${PY:-python}
RUN=Latent-Distill-32x32x8-LogSpectrogram
CAL="$W/evaluation/Latent-EDM-32x32x8-LogSpectrogram-split_train-rank_0.h5"
cd /root/repo

source "$(dirname "$0")/_watchdog.sh"

test -f "$CAL" || { echo "run quality_loop.sh first"; exit 1; }

for NFE in 1 2; do
  stage "evaluate distilled student, song convention ($NFE network evals)"
  run_watched $PY -m tqdne_tpu.cli.evaluate --workdir "$W" --config latent_distill \
    --split test -b 64 --num-steps "$NFE" --consistency-noise song \
    "--suffix=-song-nfe$NFE"
  stage "report (song, nfe $NFE)"
  run_watched $PY -m tqdne_tpu.eval.report \
    "$W/evaluation/$RUN-song-nfe$NFE-split_test-rank_0.h5" \
    --calibration-files "$CAL" \
    --out "$W/evaluation/report_latent_distill_song_nfe$NFE.json"
done

for RS in 0.5 2.0; do
  stage "refine-sigma sweep: 2 NFE, sigma $RS"
  run_watched $PY -m tqdne_tpu.cli.evaluate --workdir "$W" --config latent_distill \
    --split test -b 64 --num-steps 2 --consistency-noise song \
    --refine-sigma "$RS" "--suffix=-song-nfe2-rs$RS"
  stage "report (song, nfe 2, refine sigma $RS)"
  run_watched $PY -m tqdne_tpu.eval.report \
    "$W/evaluation/$RUN-song-nfe2-rs$RS-split_test-rank_0.h5" \
    --calibration-files "$CAL" \
    --out "$W/evaluation/report_latent_distill_song_nfe2_rs$RS.json"
done

stage "round4 post pipeline done"

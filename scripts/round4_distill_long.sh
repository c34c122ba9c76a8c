#!/bin/bash
# Round-4 CD retrain at 4x budget (VERDICT r3 #1 follow-through): the first
# executed distillation run (160 epochs / 4320 steps, mu=0.95) measured
# NFE1 FID 39.2 but NFE2 WORSE than NFE1 (121.8 reference-convention /
# 73.7 song-convention) — the training-limited signature, not a sampler
# bug (conventions were swept: rs in {0.5, 1, 2} moved FID < 3 points).
# This run quadruples the budget and slows the target/deployment EMA to
# mu=0.999 (Song 2023 uses 0.95 only for short runs; the EMA here is
# also the deployed student, so the slow decay doubles as a deployment
# average over the last ~1000 steps).
#
# Keeps the 160-epoch run's reports (already in qrun/evaluation) as the
# budget-ablation row; archives its checkpoints under -short160.
set -euo pipefail
W=${W:-/root/repo/qrun}
PY=${PY:-python}
RUN=Latent-Distill-32x32x8-LogSpectrogram
CAL="$W/evaluation/Latent-EDM-32x32x8-LogSpectrogram-split_train-rank_0.h5"
cd /root/repo

source "$(dirname "$0")/_watchdog.sh"

test -f "$CAL" || { echo "run quality_loop.sh first"; exit 1; }

# archive a completed SHORT run before training long (round-4 flow).  Only
# with ARCHIVE_SHORT=1: an unconditional mv would clobber a resumable
# in-progress long run with itself (re-running this script must RESUME).
if [ -n "${ARCHIVE_SHORT:-}" ] && [ -d "$W/outputs/$RUN" ] && \
   [ ! -d "$W/outputs/$RUN-short160" ]; then
  mv "$W/outputs/$RUN" "$W/outputs/$RUN-short160"
fi

# cadence: cached-latent distill epochs are ~6 s of compute, so per-epoch
# validation + the ~1.5 GiB orbax save (4-5 min at this disk's ~11 MiB/s)
# would double the wall time at 640 epochs — validate every 8, checkpoint
# and sampling-eval every 160
stage "distill 640 epochs, mu=0.999"
run_watched $PY -m tqdne_tpu.cli.train latent_distill --workdir "$W" \
  --max-epochs "${CD_EPOCHS:-640}" -b 256 --cached-latents --eval-every 160 \
  --checkpoint-every 160 --val-every 8 --ema-decay 0.999

# full convention x NFE table for the long-budget student (the 'auto'
# default's per-NFE table in diffusion/consistency.py is pinned to whatever
# wins here): song + reference at 1 and 2 network evals, explicitly — the
# CLI default is now NFE-aware 'auto', so sweeps must name the convention
for NOISE in song reference; do
  for NFE in 2 1; do
    [ "$NOISE" = song ] && TAG="-long-nfe$NFE" || TAG="-long-ref-nfe$NFE"
    [ "$NOISE" = song ] && OUT="report_latent_distill_long_nfe$NFE.json" \
      || OUT="report_latent_distill_long_ref_nfe$NFE.json"
    stage "evaluate long-budget student ($NOISE convention, $NFE evals)"
    run_watched $PY -m tqdne_tpu.cli.evaluate --workdir "$W" --config latent_distill \
      --split test -b 64 --num-steps "$NFE" --consistency-noise "$NOISE" \
      "--suffix=$TAG"
    stage "report (long, $NOISE, nfe $NFE)"
    run_watched $PY -m tqdne_tpu.eval.report \
      "$W/evaluation/$RUN$TAG-split_test-rank_0.h5" \
      --calibration-files "$CAL" \
      --out "$W/evaluation/$OUT"
  done
done

stage "round4 distill-long done"

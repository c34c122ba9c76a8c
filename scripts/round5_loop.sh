#!/bin/bash
# Round-5 evidence pipeline (VERDICT r4 tasks #2, #5, #6, #7): on the fresh
# from-scratch chain rebuilt by round4_rebuild_lean.sh, produce the complete
# provenance-stamped flagship quality evidence from ONE chain:
#   1. long-budget CD retrain + full convention x NFE table
#      (round4_distill_long.sh — resumable; song/reference x 1/2 evals)
#   2. NFE sweep (heun/dpmpp_2m x 5/10/25) on the same teacher
#   3. dpmpp_2m@10 seed-repeat (3 seeds)
#   4. residuals vs GMMs
#   5. quality guards vs the COMMITTED evidence (regression check runs
#      BEFORE the fresh reports replace it)
#   6. release-artifact export + digest registry
# The curated reports are then copied into docs/quality/ and
# scripts/restamp_reports.py backfills reconstructed provenance on the
# historical artifacts whose workdirs no longer exist.
set -euo pipefail
W=${W:-/root/repo/qrun}
PY=${PY:-python}
export W PY
cd /root/repo

source "$(dirname "$0")/_watchdog.sh"

RUN=Latent-EDM-32x32x8-LogSpectrogram
DRUN=Latent-Distill-32x32x8-LogSpectrogram
CAL="$W/evaluation/$RUN-split_train-rank_0.h5"

bash scripts/round4_distill_long.sh

bash scripts/nfe_sweep.sh

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

stage "residuals vs GMMs"
run_watched $PY -m tqdne_tpu.eval.residuals \
  "$W/evaluation/$RUN-split_test-rank_0.h5" \
  --out "$W/evaluation/residuals.json" --plot "$W/evaluation/residuals.png"

stage "quality guards (fresh numbers vs committed expectations)"
run_watched $PY scripts/check_deployment_quality.py \
  "$W"/evaluation/report_dpmpp10_seed*.json
run_watched $PY scripts/check_deployment_quality.py --cd \
  --teacher "$W/evaluation/report_teacher.json" \
  "$W"/evaluation/report_latent_distill_long_nfe*.json \
  "$W"/evaluation/report_latent_distill_long_ref_nfe*.json

stage "release-artifact export + digests"
for RECIPE in latent_edm latent_distill autoencoder classifier; do
  run_watched $PY -m tqdne_tpu.cli.export_weights "$RECIPE" --workdir "$W" \
    --out weights --digest-out docs/quality/WEIGHTS_DIGESTS.json
done

stage "curate reports into docs/quality"
cp "$W/evaluation/report_teacher.json" docs/quality/report_r5_teacher.json
for f in report-heun25 report-heun10 report-heun5 report-dpmpp_2m25 \
         report-dpmpp_2m10 report-dpmpp_2m5 report_dpmpp10_seed1 \
         report_dpmpp10_seed2 report_dpmpp10_seed3 \
         report_latent_distill_long_nfe1 report_latent_distill_long_nfe2 \
         report_latent_distill_long_ref_nfe1 \
         report_latent_distill_long_ref_nfe2 residuals; do
  cp "$W/evaluation/$f.json" "docs/quality/$f.json"
done
cp "$W/evaluation/residuals.png" docs/quality/residuals.png

stage "backfill reconstructed provenance on historical reports"
run_watched $PY scripts/restamp_reports.py
run_watched $PY scripts/restamp_reports.py --check

stage "round5 pipeline done"

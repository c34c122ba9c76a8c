#!/bin/bash
# Consistency-model speedup demonstration (VERDICT round-2 #3): train the
# 1D EDM (Heun baseline) and the improved-techniques consistency model on
# the same structured synthetic dataset / MovingAverageEnvelope family,
# evaluate both through the same machinery, and time their samplers.
# Reuses the quality-loop workdir (same dataset).
set -euo pipefail
W=${W:-/root/repo/qrun}
PY=${PY:-python}
cd /root/repo

source "$(dirname "$0")/_watchdog.sh"

test -f "$W/data/preprocessed_waveforms.h5" || { echo "run quality_loop.sh first"; exit 1; }

stage "train 1D EDM (Heun quality baseline)"
run_watched $PY -m tqdne_tpu.cli.train 1d_edm --workdir "$W" \
  --max-epochs "${EDM1D_EPOCHS:-80}" -b 256 --eval-every 40 --device-representation \
  --checkpoint-every 20

stage "train consistency model (iCT)"
run_watched $PY -m tqdne_tpu.cli.train consistency --workdir "$W" \
  --max-epochs "${CM_EPOCHS:-120}" -b 256 --eval-every 60 --checkpoint-every 20

stage "evaluate 1D EDM (test split)"
run_watched $PY -m tqdne_tpu.cli.evaluate --workdir "$W" --config 1d_edm --split test -b 64 \
  --no-classifier

stage "evaluate consistency (test split, 2 network evals)"
run_watched $PY -m tqdne_tpu.cli.evaluate --workdir "$W" --config consistency --split test -b 64 \
  --no-classifier --num-steps 2

stage "reports"
run_watched $PY -m tqdne_tpu.eval.report "$W/evaluation/EDM-MovingAvg-split_test-rank_0.h5" \
  --out "$W/evaluation/report_1d_edm.json"
run_watched $PY -m tqdne_tpu.eval.report "$W/evaluation/Consistency-MovingAvg-split_test-rank_0.h5" \
  --out "$W/evaluation/report_consistency.json"

stage "residuals"
run_watched $PY -m tqdne_tpu.eval.residuals "$W/evaluation/Consistency-MovingAvg-split_test-rank_0.h5" \
  --out "$W/evaluation/residuals_consistency.json"

stage "sampler timing (trained checkpoints, batch 64)"
$PY - <<'EOF'
import time, json
import numpy as np
import jax, jax.numpy as jnp
from tqdne_tpu.cli import common

common.enable_compilation_cache()
for key, steps in (("1d_edm", 25), ("consistency", 2), ("consistency", 1)):
    b = common.build_inference(key, "/root/repo/qrun", jnp.bfloat16, num_steps=steps)
    run = b.jit_sample(64)
    cond = jnp.zeros((64, 5))
    out = run(jax.random.key(0), cond); float(np.asarray(out).sum())
    t0 = time.perf_counter()
    for i in range(5):
        out = run(jax.random.key(i + 1), cond)
    float(np.asarray(out).sum())
    dt = time.perf_counter() - t0
    print(json.dumps({"model": key, "num_steps": steps,
                      "waveforms_per_sec_per_chip": round(64 * 5 / dt, 2)}))
EOF

stage "done"

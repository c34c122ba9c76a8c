#!/bin/bash
# Training stage of round4_distill_long.sh alone, resumable, with a stall
# watchdog keyed on PROGRESS (metrics.jsonl mtime OR stdout) rather than
# stdout alone: steady-state training logs to the metrics JSONL, not
# stdout, so _watchdog.sh's output-mtime rule can't distinguish healthy
# silence from the axon first-device-call wedge (observed again round 5:
# blocked forever in jax.Array._value during the teacher restore).
set -euo pipefail
W=${W:-/root/repo/qrun}
PY=${PY:-python}
STALL_SECS=${STALL_SECS:-420}
METRICS="$W/outputs/Latent-Distill-32x32x8-LogSpectrogram/metrics.jsonl"
cd /root/repo

stage() { echo "=== [$(date +%H:%M:%S)] $1 ==="; }

newest_mtime() {
  local m1=0 m2=0
  [ -f "$METRICS" ] && m1=$(stat -c %Y "$METRICS")
  [ -f "$1" ] && m2=$(stat -c %Y "$1")
  echo $(( m1 > m2 ? m1 : m2 ))
}

for attempt in 1 2 3 4 5; do
  out=$(mktemp /tmp/distill_stage.XXXXXX)
  stage "distill train (attempt $attempt) -> $out"
  ( exec env PYTHONUNBUFFERED=1 $PY -m tqdne_tpu.cli.train latent_distill \
      --workdir "$W" --max-epochs "${CD_EPOCHS:-640}" -b 256 \
      --cached-latents --eval-every 160 --checkpoint-every 160 \
      --val-every 8 --ema-decay 0.999 > "$out" 2>&1 ) &
  pid=$!
  while kill -0 "$pid" 2>/dev/null; do
    sleep 30
    age=$(( $(date +%s) - $(newest_mtime "$out") ))
    if [ "$age" -gt "$STALL_SECS" ]; then
      stage "stalled ${age}s, dumping stacks + killing"
      kill -USR1 "$pid" 2>/dev/null || true
      sleep 5
      kill "$pid" 2>/dev/null; sleep 5; kill -9 "$pid" 2>/dev/null || true
      break
    fi
  done
  rc=0
  wait "$pid" 2>/dev/null || rc=$?
  tail -5 "$out"
  if [ "$rc" -eq 0 ]; then stage "train stage done"; exit 0; fi
  stage "attempt $attempt exited rc=$rc, retrying (resume picks up the last checkpoint)"
done
stage "train stage FAILED after 5 attempts"
exit 1

# Shared stage-runner for the loop scripts.
#
# The axon relay occasionally wedges a freshly-started process on its first
# device call (observed twice round 3: all threads idle, blocked in
# jax.Array._value forever).  Every stage is resumable, so: run the stage,
# watch its PROGRESS; if none for STALL_SECS (default 25 min — longer
# than the worst remote compile), kill and retry up to 3 times.
#
# Progress = newest mtime of the stage's stdout OR any metrics.jsonl under
# $W/outputs (training stages log there, not to stdout; the train loop
# also prints a 60 s stdout heartbeat, so either signal keeps a healthy
# stage alive — round-5 lesson: the stdout-only rule killed a healthy
# 40-epoch autoencoder run mid-stage and restarted it from its last
# checkpoint, and would livelock any stage whose checkpoint interval
# exceeds the stall window).
STALL_SECS=${STALL_SECS:-1500}

stage() { echo "=== [$(date +%H:%M:%S)] $1 ==="; }

_newest_progress_mtime() {
  # newest mtime among stage stdout ($1) and training metrics files
  {
    stat -c %Y "$1" 2>/dev/null
    [ -n "${W:-}" ] && stat -c %Y "$W"/outputs/*/metrics.jsonl 2>/dev/null
  } | sort -n | tail -1
}

run_watched() {
  # 5 attempts: the axon wedge can strike any device call (round 5: a
  # mid-run block_until_ready at step 8424 of a healthy distill stage),
  # and every stage is checkpoint-resumable, so retries are cheap — the
  # cap only guards against a deterministic crash looping forever
  local attempt
  for attempt in 1 2 3 4 5; do
    local out
    out=$(mktemp /tmp/stage_out.XXXXXX)
    echo "--- stage output: $out (attempt $attempt) ---"
    ( exec env PYTHONUNBUFFERED=1 "$@" > "$out" 2>&1 ) &
    local pid=$!
    while kill -0 "$pid" 2>/dev/null; do
      sleep 30
      local age=$(( $(date +%s) - $(_newest_progress_mtime "$out") ))
      if [ "$age" -gt "$STALL_SECS" ]; then
        echo "--- stage stalled ${age}s (attempt $attempt), dumping stacks + killing ---"
        kill -USR1 "$pid" 2>/dev/null || true
        sleep 5
        kill "$pid" 2>/dev/null; sleep 5; kill -9 "$pid" 2>/dev/null || true
        break
      fi
    done
    local rc=0
    wait "$pid" 2>/dev/null || rc=$?  # '||' keeps set -e from killing the script
    cat "$out"; rm -f "$out"
    if [ "$rc" -eq 0 ]; then return 0; fi
    echo "--- stage attempt $attempt exited rc=$rc, retrying ---"
  done
  echo "--- stage failed after 3 attempts ---"
  return 1
}

# Shared stage-runner for the loop scripts.
#
# The axon relay occasionally wedges a freshly-started process on its first
# device call (observed twice round 3: all threads idle, blocked in
# jax.Array._value forever).  Every stage is resumable, so: run the stage,
# watch its stdout; if no output for STALL_SECS (default 25 min — longer
# than the worst remote compile), kill and retry up to 3 times.
STALL_SECS=${STALL_SECS:-1500}

stage() { echo "=== [$(date +%H:%M:%S)] $1 ==="; }

run_watched() {
  local attempt
  for attempt in 1 2 3; do
    local out
    out=$(mktemp /tmp/stage_out.XXXXXX)
    echo "--- stage output: $out (attempt $attempt) ---"
    ( exec env PYTHONUNBUFFERED=1 "$@" > "$out" 2>&1 ) &
    local pid=$!
    while kill -0 "$pid" 2>/dev/null; do
      sleep 30
      local age=$(( $(date +%s) - $(stat -c %Y "$out") ))
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

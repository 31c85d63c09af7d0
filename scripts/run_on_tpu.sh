#!/bin/bash
# Self-healing TPU bench runner for the fragile axon tunnel: launches the
# given command, watches its log for progress, and on a stall (no output
# growth for STALL_S seconds — the backend-init / first-execute wedge this
# tunnel exhibits after unclean client exits) kills the specific PID,
# cools down, and retries.
#
# Usage: run_on_tpu.sh LOGFILE TIMEOUT_S -- cmd args...
set -u
LOG="$1"; TIMEOUT_S="$2"; shift 3   # LOG TIMEOUT --
STALL_S=${STALL_S:-240}
COOLDOWN_S=${COOLDOWN_S:-120}
ATTEMPTS=${ATTEMPTS:-4}
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/root/.jax_cache}

for attempt in $(seq 1 "$ATTEMPTS"); do
  : > "$LOG"
  "$@" >> "$LOG" 2>&1 &
  PID=$!
  start=$(date +%s)
  last_sig=""
  last_change=$start
  while kill -0 "$PID" 2>/dev/null; do
    sleep 10
    now=$(date +%s)
    size=$(stat -c %s "$LOG" 2>/dev/null || echo 0)
    # progress = log growth OR real CPU burn (XLA compiles are silent but
    # busy; the tunnel wedge is silent and only ticks heartbeat CPU, so
    # require >=1 s of CPU growth per 10 s window to count as alive)
    cpu=$(awk '{print $14+$15}' "/proc/$PID/stat" 2>/dev/null || echo 0)
    prev_cpu=${last_cpu:-$cpu}
    last_cpu=$cpu
    if [ "$size" != "${last_size:-}" ] || [ $((cpu - prev_cpu)) -ge 100 ]; then
      last_size=$size
      last_change=$now
    fi
    if [ $((now - start)) -gt "$TIMEOUT_S" ]; then
      echo "[run_on_tpu] timeout after ${TIMEOUT_S}s (attempt $attempt)" >> "$LOG"
      kill "$PID" 2>/dev/null; sleep 5; kill -9 "$PID" 2>/dev/null
      break
    fi
    if [ $((now - last_change)) -gt "$STALL_S" ]; then
      echo "[run_on_tpu] stalled ${STALL_S}s without output (attempt $attempt)" >> "$LOG"
      kill "$PID" 2>/dev/null; sleep 5; kill -9 "$PID" 2>/dev/null
      break
    fi
  done
  wait "$PID" 2>/dev/null
  rc=$?
  if [ $rc -eq 0 ]; then
    echo "[run_on_tpu] success on attempt $attempt" >> "$LOG"
    exit 0
  fi
  echo "[run_on_tpu] attempt $attempt rc=$rc; cooling down ${COOLDOWN_S}s" >> "$LOG"
  sleep "$COOLDOWN_S"
done
echo "[run_on_tpu] FAILED after $ATTEMPTS attempts" >> "$LOG"
exit 1

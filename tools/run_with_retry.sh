#!/bin/bash
# Retry runner for long TPU jobs on the axon tunnel.
#
# The axon TPU worker crashes intermittently under sustained load (observed
# cadence ~5 min mid-round-5, docs/KNOWN_ISSUES.md); every long driver in
# examples/ is resumable (--resume + per-epoch/chunk checkpoints), so the
# defense is: run the driver in a loop, check a success predicate between
# attempts, stop when it holds.
#
# Usage: tools/run_with_retry.sh <logfile> <max_attempts> <per_attempt_timeout_s> \
#            <success_check_cmd> -- <driver_cmd...>
# The driver command is re-run verbatim each attempt (include --resume in it).
set -u
LOG="$1"; MAX="$2"; TMO="$3"; CHECK="$4"; shift 4
[ "$1" = "--" ] && shift
for i in $(seq 1 "$MAX"); do
  if bash -c "$CHECK" >/dev/null 2>&1; then
    echo "[retry-runner] success predicate holds after $((i-1)) attempts" | tee -a "$LOG"
    exit 0
  fi
  echo "[retry-runner] attempt $i/$MAX: $*" | tee -a "$LOG"
  timeout --signal=KILL "$TMO" "$@" >>"$LOG" 2>&1
  rc=$?
  echo "[retry-runner] attempt $i exited rc=$rc" | tee -a "$LOG"
  sleep 5
done
if bash -c "$CHECK" >/dev/null 2>&1; then
  echo "[retry-runner] success predicate holds at exit" | tee -a "$LOG"
  exit 0
fi
echo "[retry-runner] FAILED after $MAX attempts" | tee -a "$LOG"
exit 1

#!/bin/bash
# Kills a hung TPU driver when its results directory stops advancing.
#
# The axon tunnel has a hang failure mode (docs/KNOWN_ISSUES.md: stuck RPC —
# the client blocks forever instead of crashing); per-attempt timeouts alone
# waste most of the attempt window. This pairs with tools/run_with_retry.sh:
# when the driver's checkpoint/journal directory has not changed for
# <stall_s> AND the driver process itself is older than <stall_s>, the driver
# is killed so the retry loop restarts it from the banked state.
#
# Safety rules (learned the hard way, 2026-08-21: a substring match killed
# the watchdog itself and the retry runner, whose argv both contain the
# driver path):
#   * only processes whose cmdline STARTS with "python <driver_path>" match —
#     never bash/timeout wrappers, never this script;
#   * the kill fires only if the matched process is older than <stall_s>, so
#     a fresh retry attempt (rebuild phase writes nothing for minutes) is
#     never shot at startup;
#   * exact PIDs only, one signal per PID.
#
# Usage: tools/stall_watchdog.sh <watch_dir> <stall_s> <driver_path>
set -u
DIR="$1"; STALL="$2"; DRIVER="$3"
HZ=$(getconf CLK_TCK)
while true; do
  sleep 30
  newest=$(find "$DIR" -type f -printf '%T@\n' 2>/dev/null | sort -n | tail -1)
  [ -z "${newest:-}" ] && continue
  now=$(date +%s)
  age=$(awk -v a="$now" -v b="$newest" 'BEGIN{printf "%d", a-b}')
  [ "$age" -le "$STALL" ] && continue
  up=$(cut -d' ' -f1 /proc/uptime | cut -d. -f1)
  for p in /proc/[0-9]*/cmdline; do
    c=$(tr '\0' ' ' < "$p" 2>/dev/null)
    case "$c" in
      python\ "$DRIVER"\ *|python\ "$DRIVER")
        pid=$(basename "$(dirname "$p")")
        start_ticks=$(awk '{print $22}' "/proc/$pid/stat" 2>/dev/null) || continue
        proc_age=$(( up - start_ticks / HZ ))
        if [ "$proc_age" -gt "$STALL" ]; then
          echo "[stall-watchdog] $(date +%T) dir stale ${age}s, driver $pid age ${proc_age}s: kill"
          kill -9 "$pid" 2>/dev/null
          sleep 60
        else
          echo "[stall-watchdog] $(date +%T) dir stale ${age}s but driver $pid only ${proc_age}s old: wait"
        fi
        ;;
    esac
  done
done

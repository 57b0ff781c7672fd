#!/bin/bash
# Round-5 serial TPU queue: the axon tunnel is single-client
# (docs/KNOWN_ISSUES.md), so every TPU driver runs strictly in sequence,
# each under the crash-retry runner with a stage-scoped stall watchdog.
#
# Stages (r4 verdict items 2, 6, 7b):
#   3d       fresh post-fix train_scaled_3d run (old checkpoints cleared)
#   stencil  stencil-matvec bandwidth study
#   plas     scaled J2 plasticity with the elastic two-level preconditioner
#
# Usage: tools/round5_queue.sh [start_stage]
set -u
cd "$(dirname "$0")/.."
START="${1:-3d}"

assert_tunnel_free() {
  # The axon tunnel is single-client; a SURVIVING driver from a previous
  # session (observed 2026-08-21: a chained retry-runner outlived its
  # session, woke when the tunnel freed, and contended with this queue —
  # 66 s build inflated to 787 s) silently poisons every timing artifact.
  # Refuse to start a stage while any other examples/ driver is alive.
  local stray=""
  for p in /proc/[0-9]*/cmdline; do
    local c
    c=$(tr '\0' ' ' < "$p" 2>/dev/null)
    case "$c" in
      python\ examples/*)
        stray="$stray $(basename "$(dirname "$p")"):${c%% --*}" ;;
    esac
  done
  if [ -n "$stray" ]; then
    echo "[queue] REFUSING to start: stray TPU driver(s):$stray"
    return 1
  fi
  return 0
}

run_stage() {
  local name="$1" watch_dir="$2" check="$3"; shift 3
  local driver="$1"; shift
  assert_tunnel_free || return 3
  echo "[queue] === stage $name: python $driver $* ==="
  tools/stall_watchdog.sh "$watch_dir" 420 "$driver" \
    >> "/tmp/wd_$name.log" 2>&1 &
  local wd=$!
  tools/run_with_retry.sh "/tmp/stage_$name.log" 30 1800 "$check" \
    -- python "$driver" "$@"
  local rc=$?
  kill "$wd" 2>/dev/null
  echo "[queue] stage $name rc=$rc"
  return $rc
}

stage_3d() {
  # fresh run: the point is a post-a788ad8 artifact, so old checkpoints
  # (which --resume would otherwise load as "finished") are cleared; the
  # old summary stays in git history
  rm -rf results_scaled_3d/step1 results_scaled_3d/step2 \
         results_scaled_3d/temp_data.mat results_scaled_3d/dataset_cache.npz \
         results_scaled_3d/summary.json
  run_stage 3d results_scaled_3d \
    "python -c \"import json,sys; d=json.load(open('results_scaled_3d/summary.json')); sys.exit(0 if 'validation_vs_refined' in d else 1)\"" \
    examples/train_scaled_3d.py --resume
}

stage_stencil() {
  rm -rf results_stencil_study/summary.json
  run_stage stencil results_stencil_study \
    "test -f results_stencil_study/summary.json" \
    examples/stencil_kernel_study.py
}

stage_plas() {
  run_stage plas results_scaled_plasticity \
    "python -c \"import json,sys; d=json.load(open('results_scaled_plasticity/summary.json')); sys.exit(0 if 'validation_vs_refined' in d else 1)\"" \
    examples/train_plasticity_vi.py --nx 80 --ny 40 --two-level \
      --scan-chunk 5 --results results_scaled_plasticity --resume
}

case "$START" in
  3d)      stage_3d && stage_stencil && stage_plas ;;
  stencil) stage_stencil && stage_plas ;;
  plas)    stage_plas ;;
  *) echo "unknown stage $START"; exit 2 ;;
esac
rc=$?
echo "[queue] done rc=$rc"
exit $rc

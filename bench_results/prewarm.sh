#!/bin/bash
# Per-stage bench prewarm: compiles each stage's loop programs into
# bench_cache/ one at a time, with retries — so the driver's round-end
# `python bench.py` (420s budget) finds every executable warm.
#
# Why per-stage: the r2 full-budget prewarm passes (DIHPC_BENCH_BUDGET_S=3000)
# burned their entire budget inside the first stage's compiles and died at
# 9/12 stages twice, which is exactly why the driver's run then missed the
# north-star vtrace + train_step stages (VERDICT.md round 2).  A per-stage
# loop retries ONLY what hasn't landed and cannot starve later stages.
#
# Usage: bash bench_results/prewarm.sh [stage ...]
#   (no args = all stages, in bench.py's run order)
set -u
cd "$(dirname "$0")/.."
STAGES=("$@")
if [ ${#STAGES[@]} -eq 0 ]; then
  STAGES=(
    ppo_grad_B4096_N128 ppo_fast_grad_B4096_N128 dntd_B128_N128_atoms51
    gae_T1024_B4096 lstm_s64_b3_i1792_h384_l3 scatter_add_grad_B256_M256
    scatter_cover_grad_B256_M256
    upgo_T128_B512_N128 td_lambda_T1024_B4096 vtrace_grad_T128_B512_N128
    train_step_T32_B256_h512 vtrace_T1024_B4096_N32
    train_step_bf16_T32_B256_h512 train_step_bf16_T64_B1024_h128
    padding_ops actor_critic_ops td_point_ops
  )
fi
mkdir -p bench_results/prewarm_logs
for stage in "${STAGES[@]}"; do
  for attempt in 1 2 3; do
    log="bench_results/prewarm_logs/${stage}.a${attempt}.log"
    echo "=== $stage attempt $attempt $(date +%H:%M:%S) ==="
    # Inner watchdog (budget+90s) exits cleanly before the outer timeout:
    # a SIGKILL mid-TPU-op can wedge the tunneled chip for an hour.
    DIHPC_BENCH_STAGES="$stage" DIHPC_BENCH_BUDGET_S=2400 \
      timeout -k 60 2700 python bench.py >"$log.json" 2>"$log"
    rc=$?
    if [ $rc -eq 0 ] && grep -Eq '"stages_completed": ?1[,}]' "$log.json"; then
      echo "  OK: $(cat "$log.json" | head -c 300)"
      break
    fi
    echo "  rc=$rc; tail:"
    tail -3 "$log"
  done
done

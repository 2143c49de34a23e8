#!/bin/bash
# Round-4 priority queue, take 2. The original chain ordered distillation
# before the torso rerun; with round wall-clock uncertain, this
# orchestrator takes over the TPU tunnel as soon as the CORE chain
# finishes (before its distill tail) and runs the remaining stages in
# strict value order:
#   1. torso retrain (the stall-watchdog casualty; compile-grace fixed)
#   2. composite evals (production output: head+torso+SR, GT- and
#      audio-driven) — the numbers the round's quality claims hang on
#   3. grid->fourier distillation (converted-reference-ckpt fast path)
#   4. trained-ckpt bench + bf16-activation A/B
#   5. tiledgrid equal-budget parity leg (resumable; soaks leftover time)
# Each stage is timeout-bounded so a late-stage hang cannot strand the
# tunnel for the driver's end-of-round bench.
set -u
cd /root/repo
# take over right after the core chain (the distill tail is re-run here
# in priority order); kill the old chain's process tree by PID walk
while ! grep -q "\[chain\] core chain done" /tmp/r4_chain.log 2>/dev/null; do
  sleep 15
done
if [ -f /tmp/chain.pid ]; then
  cp=$(cat /tmp/chain.pid)
  # collect the chain bash + descendants (specific PIDs only)
  pids=$cp
  for p in $(ps -o pid= --ppid "$cp" 2>/dev/null); do
    pids="$pids $p"
    for q in $(ps -o pid= --ppid "$p" 2>/dev/null); do pids="$pids $q"; done
  done
  kill $pids 2>/dev/null; sleep 3; kill -9 $pids 2>/dev/null
fi
echo "[followup] start $(date)" | tee /tmp/r4_followup.log

run() {
  name=$1; tmo=$2; shift 2
  echo "[followup] $name start $(date)" | tee -a /tmp/r4_followup.log
  if GFPP_STALL_TIMEOUT_S=900 GFPP_COMPILE_TIMEOUT_S=2400 \
     timeout "$tmo" "$@" > "/tmp/r4f_${name}.log" 2>&1; then
    echo "[followup] $name OK $(date)" | tee -a /tmp/r4_followup.log
  else
    echo "[followup] $name FAILED rc=$? $(date)" | tee -a /tmp/r4_followup.log
  fi
}

run torso     4200 python scripts/quality_production.py train-torso --variant fourier --steps 25000 --val_interval 5000
run evaltorso 2400 python scripts/quality_production.py eval-torso --variant fourier --clip docs/artifacts/synth512_fourier_torso_val.mp4
run evala2m   2400 python scripts/quality_production.py eval-a2m --all_holdout --clip docs/artifacts/synth512_a2m_drive.mp4
run evala2mp  2400 python scripts/quality_production.py eval-a2m --all_holdout --postnet --clip docs/artifacts/synth512_a2m_drive_postnet.mp4
run dteacher  4200 python scripts/distill_grid.py teacher --steps 800
run dpseudo   2400 python scripts/distill_grid.py pseudo
run dfit      1800 python scripts/distill_grid.py fit --steps 3000
run deval     2400 python scripts/distill_grid.py eval
run bench     1200 python bench.py
run benchbf16 1200 env BENCH_FIELD_BF16=1 python bench.py
run parity    9000 python scripts/quality_production.py parity --variants tiledgrid --steps 2500
echo "[followup] ALL done $(date)" | tee -a /tmp/r4_followup.log

#!/bin/bash
# Round-4 stage-3 queue: runs once scripts/round4_followup.sh releases the
# TPU tunnel. Captures the trained-checkpoint bench number, then puts all
# remaining chip time into the interrupted tiledgrid equal-budget parity
# leg (docs/QUALITY_PARITY.md round-3 table: fourier leg done, tiledgrid
# leg lost with the round-3 checkpoint dir). The leg checkpoints every
# val interval, so a timeout still leaves a resumable run + logged
# sec/step and PSNR-at-step numbers in /tmp/r4f2_parity.log.
set -u
cd /root/repo
while ! grep -q "\[followup\] ALL done" /tmp/r4_followup.log 2>/dev/null; do
  sleep 30
done
echo "[followup2] start $(date)" | tee /tmp/r4_followup2.log

run() {
  name=$1; tmo=$2; shift 2
  echo "[followup2] $name start $(date)" | tee -a /tmp/r4_followup2.log
  if GFPP_STALL_TIMEOUT_S=900 GFPP_COMPILE_TIMEOUT_S=2400 \
     timeout "$tmo" "$@" > "/tmp/r4f2_${name}.log" 2>&1; then
    echo "[followup2] $name OK $(date)" | tee -a /tmp/r4_followup2.log
  else
    echo "[followup2] $name FAILED rc=$? $(date)" | tee -a /tmp/r4_followup2.log
  fi
}

run bench     1200 python bench.py
# roadmap F: bf16 field activations A/B at the CURRENT crop-fast operating
# point — the round-2 "neutral" verdict predates the crop chain; the frame
# is now bandwidth-bound (scripts/flops_frame.py), so halved activation
# traffic may pay today. Same scene/ckpt as the run above; compare fps.
run benchbf16 1200 env BENCH_FIELD_BF16=1 python bench.py
run parity    9000 python scripts/quality_production.py parity --variants tiledgrid --steps 2500
echo "[followup2] ALL done $(date)" | tee -a /tmp/r4_followup2.log

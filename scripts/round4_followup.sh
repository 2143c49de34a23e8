#!/bin/bash
# Round-4 follow-up: rerun chain stages that failed (or ran degraded) the
# first time. The torso stage died to the stall watchdog at 600 s of
# first-step compile (fixed: GFPP_COMPILE_TIMEOUT_S grace in trainer.py);
# without its checkpoint the composite evals fall back to head-only, so
# they are re-graded after the torso run. Waits for the main chain to
# release the (exclusive) TPU tunnel first.
set -u
cd /root/repo
while ! grep -q "\[chain\] ALL done" /tmp/r4_chain.log 2>/dev/null; do
  sleep 30
done
echo "[followup] start $(date)" | tee /tmp/r4_followup.log

run() {
  name=$1; shift
  echo "[followup] $name start $(date)" | tee -a /tmp/r4_followup.log
  if GFPP_STALL_TIMEOUT_S=900 GFPP_COMPILE_TIMEOUT_S=2400 \
     "$@" > "/tmp/r4f_${name}.log" 2>&1; then
    echo "[followup] $name OK $(date)" | tee -a /tmp/r4_followup.log
  else
    echo "[followup] $name FAILED rc=$? $(date)" | tee -a /tmp/r4_followup.log
  fi
}

run torso     python scripts/quality_production.py train-torso --variant fourier --steps 25000 --val_interval 5000
run evaltorso python scripts/quality_production.py eval-torso --variant fourier --clip docs/artifacts/synth512_fourier_torso_val.mp4
run evala2m   python scripts/quality_production.py eval-a2m --all_holdout --clip docs/artifacts/synth512_a2m_drive.mp4
run evala2mp  python scripts/quality_production.py eval-a2m --all_holdout --postnet --clip docs/artifacts/synth512_a2m_drive_postnet.mp4
echo "[followup] ALL done $(date)" | tee -a /tmp/r4_followup.log

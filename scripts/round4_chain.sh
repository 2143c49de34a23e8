#!/bin/bash
# Round-4 sequential TPU job chain: waits for the long head+SR run (PID in
# /tmp/head_train.pid) to finish, then runs every dependent production
# stage in priority order on the (exclusive) TPU tunnel. Each stage logs to
# /tmp/r4_<stage>.log; a failure marks the stage FAILED and the chain moves
# on (stages are independent once the head ckpt exists).
set -u
cd /root/repo
PIDFILE=${1:-/tmp/head_train.pid}
if [ -f "$PIDFILE" ]; then
  pid=$(cat "$PIDFILE")
  while kill -0 "$pid" 2>/dev/null; do sleep 30; done
fi
echo "[chain] head run done at $(date)" | tee /tmp/r4_chain.log

run() {
  name=$1; shift
  echo "[chain] $name start $(date)" | tee -a /tmp/r4_chain.log
  if GFPP_STALL_TIMEOUT_S=600 "$@" > "/tmp/r4_${name}.log" 2>&1; then
    echo "[chain] $name OK $(date)" | tee -a /tmp/r4_chain.log
  else
    echo "[chain] $name FAILED rc=$? $(date)" | tee -a /tmp/r4_chain.log
  fi
}

run torso    python scripts/quality_production.py train-torso --variant fourier --steps 25000 --val_interval 5000
run a2m      python scripts/quality_production.py train-a2m --steps 30000 --val_interval 2500
run postnet  python scripts/quality_production.py train-postnet --steps 8000 --val_interval 1000
run lmd2     python scripts/quality_production.py lmd --arch v2 --iters 20000 --tpu
run lmd1     python scripts/quality_production.py lmd --arch v1 --iters 3000 --tpu
run sync     python scripts/quality_production.py train-sync --iters 2000 --tpu
run eval     python scripts/quality_production.py eval --variant fourier --clip docs/artifacts/synth512_fourier_val.mp4
run evaltorso python scripts/quality_production.py eval-torso --variant fourier --clip docs/artifacts/synth512_fourier_torso_val.mp4
run evala2m  python scripts/quality_production.py eval-a2m --all_holdout --clip docs/artifacts/synth512_a2m_drive.mp4
run evala2mp python scripts/quality_production.py eval-a2m --all_holdout --postnet --clip docs/artifacts/synth512_a2m_drive_postnet.mp4
run curve    python scripts/quality_production.py eval-curve --variant fourier --frames 12
run proftrain python scripts/prof_train.py
echo "[chain] core chain done $(date)" | tee -a /tmp/r4_chain.log

if [ "${R4_DISTILL:-1}" = "1" ]; then
  run dteacher python scripts/distill_grid.py teacher --steps 800
  run dpseudo  python scripts/distill_grid.py pseudo
  run dfit     python scripts/distill_grid.py fit --steps 3000
  run deval    python scripts/distill_grid.py eval
fi
echo "[chain] ALL done $(date)" | tee -a /tmp/r4_chain.log

#!/bin/bash
# Round-5 follow-up TPU chain: the field-capacity ablation — the single
# surviving plateau lever after round-5 ruled out more-steps (flat
# 50k->100k curve), more-data (2x leg LOST 2.3 dB at fixed capacity) and
# encoder family (fourier > tiledgrid at equal budget). Two legs at the
# standard 25k-step / 450-frame ablation methodology (control: the
# flagship's 31.8 dB val SR PSNR at 25k with 128 features / max_scale 128):
#   ablcap   — fourier_pos_features 256, max_scale 128 (capacity only)
#   ablscale — fourier_pos_features 256, max_scale 256 (capacity + bandwidth)
# Waits for the main round-5 chain (pid in /tmp/chain.pid, command line
# verified — advisor r4 fix) before touching the exclusive TPU tunnel.
set -u
cd /root/repo
if [ -f /tmp/chain.pid ]; then
  pid=$(cat /tmp/chain.pid)
  if kill -0 "$pid" 2>/dev/null && grep -q "round5_chain" "/proc/$pid/cmdline" 2>/dev/null; then
    echo "[followup] waiting for chain pid $pid $(date)"
    while kill -0 "$pid" 2>/dev/null; do sleep 30; done
  fi
fi
echo $$ > /tmp/chain.pid
echo "[followup] start $(date)" | tee /tmp/r5f_chain.log

run() {
  name=$1; tmo=$2; shift 2
  echo "[followup] $name start $(date)" | tee -a /tmp/r5f_chain.log
  GFPP_STALL_TIMEOUT_S=900 timeout "$tmo" "$@" > "/tmp/r5_${name}.log" 2>&1
  rc=$?
  echo "rc=$rc" >> "/tmp/r5_${name}.log"
  if [ "$rc" = "0" ]; then
    echo "[followup] $name OK $(date)" | tee -a /tmp/r5f_chain.log
  else
    echo "[followup] $name FAILED rc=$rc $(date)" | tee -a /tmp/r5f_chain.log
  fi
}

run ablcap 7200 env SYNTH_WORKROOT=checkpoints/ablcap256 \
  GFPP_FOURIER_POS_FEATURES=256 GFPP_FOURIER_POS_MAX_SCALE=128 \
  python scripts/quality_production.py train --variant fourier --steps 25000 --val_interval 2500

run ablscale 7200 env SYNTH_WORKROOT=checkpoints/ablscale256 \
  GFPP_FOURIER_POS_FEATURES=256 GFPP_FOURIER_POS_MAX_SCALE=256 \
  python scripts/quality_production.py train --variant fourier --steps 25000 --val_interval 2500

# re-collect so the committed evidence includes the capacity legs
run collect2 600 python scripts/collect_round_artifacts.py
git add docs/artifacts/round_results.json 2>/dev/null
git commit -q -m "Round-5 capacity-ablation evidence: fourier 256-feature legs" || true
echo "[followup] ALL done $(date)" | tee -a /tmp/r5f_chain.log

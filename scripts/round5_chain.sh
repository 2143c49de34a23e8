#!/bin/bash
# Round-5 sequential TPU job chain. Runs the remaining VERDICT-r4 items in
# priority order on the (exclusive) TPU tunnel; each stage logs to
# /tmp/r5_<stage>.log with a trailing rc=N line (the collector's contract).
# A failed stage marks FAILED and the chain moves on. The LAST stage is
# always collect+commit — the committed evidence file must contain every
# stage's outcome INCLUDING failures (VERDICT r4 weak #1).
#
# Advisor r4 fix: the chain records its OWN pid; any takeover script must
# verify the pid's command line before killing.
set -u
cd /root/repo
echo $$ > /tmp/chain.pid
WAITPID=${1:-}
if [ -n "$WAITPID" ] && [ -f "$WAITPID" ]; then
  pid=$(cat "$WAITPID")
  while kill -0 "$pid" 2>/dev/null; do sleep 30; done
fi
echo "[chain] round-5 chain start $(date)" | tee /tmp/r5_chain.log

run() {
  name=$1; tmo=$2; shift 2
  echo "[chain] $name start $(date)" | tee -a /tmp/r5_chain.log
  GFPP_STALL_TIMEOUT_S=600 timeout "$tmo" "$@" > "/tmp/r5_${name}.log" 2>&1
  rc=$?
  echo "rc=$rc" >> "/tmp/r5_${name}.log"
  if [ "$rc" = "0" ]; then
    echo "[chain] $name OK $(date)" | tee -a /tmp/r5_chain.log
  else
    echo "[chain] $name FAILED rc=$rc $(date)" | tee -a /tmp/r5_chain.log
  fi
}

# 1. postnet A/B at the deployed temperature across seeds (VERDICT #4)
run postnetab 5400 python scripts/quality_production.py postnet-ab

# 2. detector retrain with render-softness augmentation + re-grade the
#    committed clips (VERDICT #8 head-only heavy tail)
run lmd2     3600 python scripts/quality_production.py lmd --arch v2 --iters 20000 --tpu
run remhead  1800 python scripts/quality_production.py lmd-remeasure --clip docs/artifacts/synth512_fourier_val.mp4
run remtorso 1800 python scripts/quality_production.py lmd-remeasure --clip docs/artifacts/synth512_fourier_torso_val.mp4
run rema2m   1800 python scripts/quality_production.py lmd-remeasure --clip docs/artifacts/synth512_a2m_drive.mp4

# 3. plateau ablation: 2x dataset at 25k steps (VERDICT #3; control = the
#    existing 450-frame curve's 20k-30k rows). gen2x ran on CPU already.
run abl2x    7200 env SYNTH_DATA_DIR=/tmp/gfpp_synth2x SYNTH_WORKROOT=checkpoints/ablation2x \
  python scripts/quality_production.py train --variant fourier --steps 25000 --val_interval 2500

# 4. distill chain at production shape: 256^2 teacher at the documented
#    800 steps, student fps via the bench scan methodology (VERDICT #6)
run dteacher 7200 env DISTILL_SIZE=256 python scripts/distill_grid.py teacher --steps 800 --reset
run dpseudo  5400 env DISTILL_SIZE=256 python scripts/distill_grid.py pseudo
run dfit     3600 env DISTILL_SIZE=256 python scripts/distill_grid.py fit --steps 3000 --reset
run deval    3600 env DISTILL_SIZE=256 python scripts/distill_grid.py eval

# 5. optimizer step attribution (VERDICT #9)
run proftrain 2400 python scripts/prof_train.py

# LAST: collect everything (including failures) and commit the evidence
run collect  600 python scripts/collect_round_artifacts.py
git add docs/artifacts/round_results.json docs/artifacts/*.mp4 2>/dev/null
git commit -q -m "Round-5 chain evidence: postnet A/B, detector re-grade, 2x-data ablation, distill@256, optimizer profile" || true
echo "[chain] ALL done $(date)" | tee -a /tmp/r5_chain.log

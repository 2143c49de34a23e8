#!/bin/bash
# Round-5 final TPU chain. Waits for the capacity-ablation follow-up
# (pid in /tmp/chain.pid, command line verified), then:
#   1. proftrain   — rerun the fixed train-step attribution (VERDICT r4 #9:
#                    explain the 48 ms optimizer residual; the r5 rerun
#                    OOMed on an eager grad, fixed in e800412)
#   2. benchfinal  — fresh default bench.py: confirms the trained-ckpt leg
#                    (two-dispatch SIGILL fix) produces the headline number
#                    end-to-end with rc=0 (VERDICT r4 #2)
#   3. capacity carry (VERDICT r4 #3 done-bar: "single best lever carried
#      to 100k"): pick the winning 256-feature leg (ablcap vs ablscale by
#      final val SR PSNR, must beat the 128-feature control by >0.3 dB),
#      train head+SR 100k + torso 25k in checkpoints/cap256_100k, then the
#      full eval suite (GT-driven, composite, audio-driven all-holdout).
#   4. distill512  — distill chain at the flagship 512 output shape
#                    (VERDICT r4 #6 done-bar: >=25 fps @512-class scan fps
#                    within 0.5 dB of the teacher)
# collect+commit after every group so a round-end cutoff still leaves the
# completed stages in the committed evidence (VERDICT r4 weak #1).
set -u
cd /root/repo
if [ -f /tmp/chain.pid ]; then
  pid=$(cat /tmp/chain.pid)
  if kill -0 "$pid" 2>/dev/null && grep -qE "round5_(chain|followup)" "/proc/$pid/cmdline" 2>/dev/null; then
    echo "[final] waiting for chain pid $pid $(date)"
    while kill -0 "$pid" 2>/dev/null; do sleep 30; done
  fi
fi
echo $$ > /tmp/chain.pid
echo "[final] start $(date)" | tee /tmp/r5x_chain.log

run() {
  name=$1; tmo=$2; shift 2
  echo "[final] $name start $(date)" | tee -a /tmp/r5x_chain.log
  GFPP_STALL_TIMEOUT_S=900 timeout "$tmo" "$@" > "/tmp/r5_${name}.log" 2>&1
  rc=$?
  echo "rc=$rc" >> "/tmp/r5_${name}.log"
  if [ "$rc" = "0" ]; then
    echo "[final] $name OK $(date)" | tee -a /tmp/r5x_chain.log
  else
    echo "[final] $name FAILED rc=$rc $(date)" | tee -a /tmp/r5x_chain.log
  fi
}

collect_commit() {
  run "collect_$1" 600 python scripts/collect_round_artifacts.py
  git add docs/artifacts/ 2>/dev/null
  git commit -q -m "Round-5 evidence checkpoint: $1" || true
}

run proftrain2 2400 python scripts/prof_train.py
run benchfinal 2700 python bench.py
# refresh the BASELINE north-star #2 row (wav->frames streaming latency/RTF)
run latency    2400 python scripts/latency_e2e.py
collect_commit "proftrain + final bench + latency"

# ---- capacity carry -------------------------------------------------
# winner selection: final val SR PSNR of the two 256-feature legs vs the
# 128-feature control (31.8 dB at the same 25k budget, quality_curve.json)
python - <<'EOF' > /tmp/r5_capwinner.env
import re

def last_sr(path):
    best = None
    try:
        for line in open(path, errors="replace"):
            m = re.search(r"'val_sr_psnr': ([0-9.]+)", line)
            if m:
                best = float(m.group(1))
    except OSError:
        pass
    return best

cap = last_sr("/tmp/r5_ablcap.log")
scale = last_sr("/tmp/r5_ablscale.log")
control = 31.8
print(f"# ablcap(256f/ms128)={cap} ablscale(256f/ms256)={scale} control={control}")
if cap is None and scale is None:
    print("WINNER=none")
elif scale is not None and (cap is None or scale >= cap) and scale > control + 0.3:
    print("WINNER=scale"); print("export GFPP_FOURIER_POS_FEATURES=256 GFPP_FOURIER_POS_MAX_SCALE=256")
elif cap is not None and cap > control + 0.3:
    print("WINNER=cap"); print("export GFPP_FOURIER_POS_FEATURES=256 GFPP_FOURIER_POS_MAX_SCALE=128")
else:
    print("WINNER=none")
EOF
cat /tmp/r5_capwinner.env | tee -a /tmp/r5x_chain.log

if grep -q "WINNER=none" /tmp/r5_capwinner.env; then
  echo "[final] no capacity winner — skipping the 100k carry" | tee -a /tmp/r5x_chain.log
else
  eval "$(grep '^export' /tmp/r5_capwinner.env)"
  export SYNTH_WORKROOT=checkpoints/cap256_100k
  run cap100k   16200 python scripts/quality_production.py train --variant fourier --steps 100000 --val_interval 10000
  run captorso   7200 python scripts/quality_production.py train-torso --variant fourier --steps 25000 --val_interval 5000
  # audio-driven eval needs the identity's a2m prior — trained once at the
  # default workroot, field-independent; link it into the carry tree
  mkdir -p checkpoints/cap256_100k
  ln -sfn ../synth512_a2m checkpoints/cap256_100k/synth512_a2m
  run capeval    3600 python scripts/quality_production.py eval --variant fourier --clip docs/artifacts/cap256_fourier_val.mp4
  run capevaltorso 3600 python scripts/quality_production.py eval-torso --variant fourier --clip docs/artifacts/cap256_fourier_torso_val.mp4
  run capevala2m 3600 python scripts/quality_production.py eval-a2m --all_holdout --clip docs/artifacts/cap256_a2m_drive.mp4
  run capcurve   3600 python scripts/quality_production.py eval-curve --variant fourier --frames 12
  unset SYNTH_WORKROOT GFPP_FOURIER_POS_FEATURES GFPP_FOURIER_POS_MAX_SCALE
  # fps of the 256-feature flagship at the same trained-bench methodology:
  # decides whether the default bench should point at the carry tree
  run benchcap   2700 env BENCH_CKPT_HEAD=checkpoints/cap256_100k/synth512_fourier python bench.py
  collect_commit "capacity carry 100k + evals"
fi

# ---- distill at the 512 production shape -----------------------------
# own workroot so the committed 256-shape distill evidence stays intact
D512="env DISTILL_SIZE=512 SYNTH_WORKROOT=checkpoints/distill512"
run dteacher512 10800 $D512 python scripts/distill_grid.py teacher --steps 800 --reset
run dpseudo512   9000 $D512 python scripts/distill_grid.py pseudo
run dfit512      7200 $D512 python scripts/distill_grid.py fit --steps 3000 --reset
run deval512     7200 $D512 python scripts/distill_grid.py eval
collect_commit "distill at 512 production shape"
echo "[final] ALL done $(date)" | tee -a /tmp/r5x_chain.log

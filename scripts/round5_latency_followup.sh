#!/bin/bash
# Round-5 follow-up: the latency stage in round5_final.sh failed with
# ModuleNotFoundError (scripts/ ran without the repo root on sys.path —
# fixed in latency_e2e.py). Wait for the running final chain to finish,
# then re-run the streaming wav->frames latency/RTF measurement and
# collect+commit the refreshed evidence.
set -u
cd /root/repo
if [ -f /tmp/chain.pid ]; then
  pid=$(cat /tmp/chain.pid)
  if kill -0 "$pid" 2>/dev/null && grep -qE "round5_(chain|followup|final)" "/proc/$pid/cmdline" 2>/dev/null; then
    echo "[lat] waiting for chain pid $pid $(date)"
    while kill -0 "$pid" 2>/dev/null; do sleep 30; done
  fi
fi
echo $$ > /tmp/chain.pid
echo "[lat] start $(date)" | tee -a /tmp/r5x_chain.log

run() {
  name=$1; tmo=$2; shift 2
  echo "[lat] $name start $(date)" | tee -a /tmp/r5x_chain.log
  GFPP_STALL_TIMEOUT_S=900 timeout "$tmo" "$@" > "/tmp/r5_${name}.log" 2>&1
  rc=$?
  echo "rc=$rc" >> "/tmp/r5_${name}.log"
  if [ "$rc" = "0" ]; then
    echo "[lat] $name OK $(date)" | tee -a /tmp/r5x_chain.log
  else
    echo "[lat] $name FAILED rc=$rc $(date)" | tee -a /tmp/r5x_chain.log
  fi
}

run latency2 2400 python scripts/latency_e2e.py
run collect_latency2 600 python scripts/collect_round_artifacts.py
git add docs/artifacts/ 2>/dev/null
git commit -q -m "Round-5 evidence: streaming latency rerun after sys.path fix" || true
echo "[lat] done $(date)" | tee -a /tmp/r5x_chain.log

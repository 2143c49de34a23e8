#!/bin/bash
# Resilient runner for long TPU jobs: rerun-on-stall around a training command.
#
# The trainer's stall watchdog (trainer.py:_start_stall_watchdog) exits 43
# when a device RPC wedges (no progress for GFPP_STALL_TIMEOUT_S); `timeout`
# exits 124. Both are recoverable-by-restart: training resumes from the last
# val-interval checkpoint (Trainer.fit(resume=True) is the default in every
# stage script). Anything else (0 = done, other = real error) ends the loop.
#
# Usage: scripts/resilient_run.sh [-n MAX_RESTARTS] [-g GRACE_S] -- cmd args...
#   -n  max restarts after stalls (default 3)
#   -g  seconds to wait between kill and reconnect (default 90 — the remote
#       TPU session needs teardown time or the fresh client hangs pre-enumeration)
set -u
MAX_RESTARTS=3
GRACE_S=90
while getopts "n:g:" opt; do
  case $opt in
    n) MAX_RESTARTS=$OPTARG ;;
    g) GRACE_S=$OPTARG ;;
    *) echo "usage: $0 [-n MAX_RESTARTS] [-g GRACE_S] -- cmd..." >&2; exit 2 ;;
  esac
done
shift $((OPTIND - 1))
[ "${1:-}" = "--" ] && shift

attempt=0
while :; do
  "$@"
  rc=$?
  if [ $rc -ne 43 ] && [ $rc -ne 124 ]; then
    exit $rc
  fi
  attempt=$((attempt + 1))
  if [ $attempt -gt "$MAX_RESTARTS" ]; then
    echo "[resilient_run] stalled $attempt times; giving up (rc=$rc)" >&2
    exit $rc
  fi
  echo "[resilient_run] stall detected (rc=$rc); restart $attempt/$MAX_RESTARTS after ${GRACE_S}s grace" >&2
  sleep "$GRACE_S"
done

"""Consolidate round-result JSONs into one committed evidence file.

The production-quality stages write their results next to the checkpoints
they grade (checkpoints/<run>/quality_eval*.json etc.) — a gitignored
tree. This collector snapshots every known result file plus the stage
logs' final JSON lines into docs/artifacts/round_results.json so the
evidence survives the checkout boundary and reviewers get one file to
read instead of nine.

Usage: python scripts/collect_round_artifacts.py [--out PATH]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKROOT = os.environ.get("SYNTH_WORKROOT", os.path.join(REPO, "checkpoints"))

# (key, path glob) — every known result artifact, trained-run relative
RESULT_GLOBS = [
    ("eval_head_sr", "synth512_fourier/quality_eval.json"),
    ("eval_curve", "synth512_fourier/quality_curve.json"),
    ("eval_torso", "synth512_fourier_torso/quality_eval*.json"),
    ("eval_a2m", "synth512_a2m/quality_eval*.json"),
    ("distill", "distill_student_fourier/distill_eval.json"),
    ("parity128", "parity128_results.json"),
    # round-5 capacity-carry flagship (256-feature fourier field @100k)
    ("cap256_eval", "cap256_100k/synth512_fourier/quality_eval*.json"),
    ("cap256_curve", "cap256_100k/synth512_fourier/quality_curve.json"),
    ("cap256_eval_torso", "cap256_100k/synth512_fourier_torso/quality_eval*.json"),
    ("cap256_eval_a2m", "cap256_100k/synth512_a2m/quality_eval*.json"),
    # round-5 distill chain at the 512 production shape
    ("distill512", "distill512/distill_student_fourier/distill_eval.json"),
]

# stage logs whose LAST well-formed JSON line is the result (stages that
# print their summary instead of writing a file, e.g. prof_train). Every
# /tmp/r5_*.log is swept automatically; FAILED stages are recorded too —
# rc + log tail — so the committed evidence includes failures, not only
# the rosy rows (VERDICT r4 weak #1: the round-4 collector ran before the
# decisive evals and the committed record missed both failures).
LOG_JSON = [
    ("prof_train_r4", "/tmp/r4_proftrain.log"),
]
LOG_GLOBS = ["/tmp/r5_*.log"]


def _last_json_line(path: str):
    try:
        with open(path) as f:
            lines = f.readlines()
    except OSError:
        return None
    for line in reversed(lines):
        line = line.strip()
        if line.startswith("{") and line.endswith("}"):
            try:
                return json.loads(line)
            except json.JSONDecodeError:
                continue
    return None


def _trailing_rc(path: str):
    """Parse the chain convention's final 'rc=N' line, if present."""
    try:
        with open(path) as f:
            lines = f.readlines()
    except OSError:
        return None
    for line in reversed(lines[-5:]):
        line = line.strip()
        if line.startswith("rc="):
            try:
                return int(line[3:])
            except ValueError:
                return None
    return None


def collect() -> dict:
    out = {}
    for key, pat in RESULT_GLOBS:
        hits = sorted(glob.glob(os.path.join(WORKROOT, pat)))
        for path in hits:
            try:
                with open(path) as f:
                    val = json.load(f)
            except (OSError, json.JSONDecodeError) as e:
                val = {"error": str(e)}
            name = key if len(hits) == 1 else (
                key + ":" + os.path.basename(path).replace(".json", ""))
            out[name] = val
    for key, path in LOG_JSON:
        val = _last_json_line(path)
        if val is not None:
            out[key] = val
    log_paths = sorted(p for pat in LOG_GLOBS for p in glob.glob(pat))
    for path in log_paths:
        key = os.path.splitext(os.path.basename(path))[0]
        rec = {}
        val = _last_json_line(path)
        if val is not None:
            rec["result"] = val
        rc = _trailing_rc(path)
        if rc is not None:
            rec["rc"] = rc
        if rc not in (0, None) or val is None:
            try:
                with open(path) as f:
                    rec["log_tail"] = f.read()[-600:]
            except OSError:
                pass
        if rec:
            out[f"log:{key}"] = rec
    # metrics tails: final train/val rows of each production run
    for run in ("synth512_fourier", "synth512_fourier_torso",
                "synth512_a2m", "synth512_postnet"):
        row = _last_json_line(os.path.join(WORKROOT, run, "metrics.jsonl"))
        if row is not None:
            out[f"final_metrics:{run}"] = row
    # ablation legs train under SYNTH_WORKROOT=checkpoints/abl* — their
    # decisive evidence is the full val-PSNR curve, not a 600-char log
    # tail (round-5 capacity/2x-data plateau diagnosis)
    for path in sorted(glob.glob(os.path.join(WORKROOT, "abl*",
                                              "synth512_*", "metrics.jsonl"))):
        leg = os.path.relpath(os.path.dirname(path), WORKROOT)
        curve = []
        try:
            with open(path) as f:
                for line in f:
                    try:
                        row = json.loads(line)
                    except json.JSONDecodeError:
                        continue
                    if any(k.startswith("val") for k in row):
                        curve.append(row)
        except OSError:
            continue
        if curve:
            out[f"ablation_curve:{leg}"] = curve
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(
        REPO, "docs", "artifacts", "round_results.json"))
    args = ap.parse_args()
    res = collect()
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(res, f, indent=2, sort_keys=True)
    print(f"| {len(res)} artifacts -> {args.out}")
    for k in sorted(res):
        print(f"|   {k}")
    return 0


if __name__ == "__main__":
    sys.exit(main())

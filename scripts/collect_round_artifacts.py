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
]

# stage logs whose LAST well-formed JSON line is the result (stages that
# print their summary instead of writing a file, e.g. prof_train)
LOG_JSON = [
    ("prof_train", "/tmp/r4_proftrain.log"),
    ("bench_trained", "/tmp/r4f2_bench.log"),
    ("bench_bf16", "/tmp/r4f2_benchbf16.log"),
]


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
    # metrics tails: final train/val rows of each production run
    for run in ("synth512_fourier", "synth512_fourier_torso",
                "synth512_a2m", "synth512_postnet"):
        row = _last_json_line(os.path.join(WORKROOT, run, "metrics.jsonl"))
        if row is not None:
            out[f"final_metrics:{run}"] = row
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

"""CI leg for the end-to-end data-pipeline rehearsal (slow tier).

Proves the preprocessing ORCHESTRATION composes from an actual video file:
mp4 -> process.py (frames/audio/segment/landmarks/fit/binarize) -> dataset
-> short head train -> val render. Ref: data_gen/runs/nerf/run.sh."""

import json
import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_rehearse_pipeline_end_to_end(tmp_path):
    env = dict(os.environ)
    env["PALLAS_AXON_POOL_IPS"] = ""  # hermetic CPU subprocess
    env["JAX_PLATFORMS"] = "cpu"
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "rehearse_pipeline.py"),
         "--frames", "36", "--size", "128", "--train_steps", "40",
         "--n_rays", "2048", "--workdir", str(tmp_path)],
        capture_output=True, text=True, timeout=1800, env=env)
    assert out.returncode == 0, out.stdout[-3000:] + out.stderr[-3000:]
    res = json.loads(out.stdout.strip().splitlines()[-1])
    # every stage produced its artifact and the chain trained + rendered
    assert res["binary_mb"] > 0.1
    assert res["n_train_frames"] > 0 and res["n_val_frames"] > 0
    # 40 steps from scratch: just assert the render is a sane image, not
    # converged quality
    assert res["val_psnr"] > 10.0, res
    assert os.path.exists(tmp_path / "binary" / "videos" / "rehearsal"
                          / "trainval_dataset.npy")

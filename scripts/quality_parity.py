"""Quality parity: Fourier field vs reference-style tiled grid.

Trains the head NeRF twice on the same structured synthetic identity — once
with the TPU-native Fourier spatial encoder (the flagship default) and once
with the reference's tiledgrid encoder — renders the held-out frames with
each, and reports val PSNR side by side. This is the evidence for the
Fourier-field default (docs/QUALITY_PARITY.md); with a real binarized
identity pass --data <trainval_dataset.npy> for the same comparison.

Run: python scripts/quality_parity.py [--steps 600] [--data path.npy]
(CPU-safe; ~3-6 min at the default size.)
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_variant(grid_type: str, ds_train, ds_val, steps: int, seed: int = 0):
    import numpy as np

    from genefaceplusplus_tpu.models.radnerf import RADNeRFConfig
    from genefaceplusplus_tpu.training.radnerf_task import TaskHParams
    from genefaceplusplus_tpu.training.tasks.head_task import HeadNeRFTask, HeadTaskConfig

    kw = dict(
        grid_size=32, individual_embedding_num=len(ds_train) + len(ds_val),
        smo_win_size=3, hidden_dim_sigma=64, hidden_dim_ambient=64,
        hidden_dim_color=64, geo_feat_dim=32, grid_type=grid_type,
    )
    if grid_type == "fourier":
        kw.update(fourier_pos_features=32, fourier_amb_features=16)
    else:
        kw.update(log2_hashmap_size=14, desired_resolution=256)
    cfg = RADNeRFConfig(**kw)
    task = HeadNeRFTask(
        ds_train, cfg,
        HeadTaskConfig(n_rays=1024, num_coarse=16, num_samples=8, lr=5e-3,
                       finetune_lips=False, update_extra_interval=50),
        TaskHParams(), seed=seed,
    )
    state = task.create_state()
    t0 = time.time()
    for step in range(steps):
        if step % 50 == 0:
            task.update_extra_state(state)
        batch = task.sample_train_batch(global_step=step)
        batch.pop("_is_lip", None)
        state, metrics = task.train_step(state, batch)
    train_s = time.time() - t0

    # validate on the held-out split
    task.dataset = ds_val
    val = task.validate(state, max_frames=len(ds_val))
    return {
        "grid_type": grid_type,
        "val_psnr": round(val["val_psnr"], 2),
        "train_steps": steps,
        "train_seconds": round(train_s, 1),
        "final_train_psnr": round(float(metrics["head_psnr"]), 2),
    }


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=600)
    p.add_argument("--data", type=str, default="",
                   help="optional real trainval_dataset.npy")
    args = p.parse_args()

    from genefaceplusplus_tpu.data.dataset import RADNeRFDataset, synthetic

    if args.data:
        ds_train = RADNeRFDataset(args.data, split="train", smo_win_size=3, with_sr=False)
        ds_val = RADNeRFDataset(args.data, split="val", smo_win_size=3, with_sr=False)
    else:
        d = synthetic(num_frames=33, H=32, W=32, structured=True)
        ds_train = RADNeRFDataset(d, split="train", smo_win_size=3, with_sr=False)
        ds_val = RADNeRFDataset(d, split="val", smo_win_size=3, with_sr=False,
                                smooth_eval_camera=False)

    rows = [run_variant(g, ds_train, ds_val, args.steps)
            for g in ("fourier", "tiledgrid")]
    print(json.dumps(rows, indent=2))
    print("\n| grid_type | val PSNR | final train PSNR | steps | train s |")
    print("|---|---|---|---|---|")
    for r in rows:
        print(f"| {r['grid_type']} | {r['val_psnr']} | {r['final_train_psnr']} "
              f"| {r['train_steps']} | {r['train_seconds']} |")


if __name__ == "__main__":
    main()

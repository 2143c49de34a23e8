"""One-command reference-checkpoint conversion.

Converts a released GeneFace++ torch checkpoint (legacy `torch.save` layout
`{epoch, global_step, optimizer_states, state_dict: {model: ...}}`,
/root/reference/utils/commons/trainer.py:543-567) into a native checkpoint
directory this framework's inference pipeline loads directly:

    # audio2motion (audio2secc) VAE:
    python scripts/convert_ckpt.py \
        --input  checkpoints/audio2motion_vae/model_ckpt_steps_400000.ckpt \
        --type   a2m \
        --out    checkpoints/audio2motion_vae_tpu

    # RADNeRF head (grid path) incl. density grid/bitfield buffers:
    python scripts/convert_ckpt.py \
        --input  checkpoints/motion2video_nerf/may_head/model_ckpt_steps_250000.ckpt \
        --type   head --grid_size 128 \
        --out    checkpoints/may_head_tpu

    # then e.g.
    python -m genefaceplusplus_tpu.inference.cli \
        --a2m_dir checkpoints/audio2motion_vae_tpu \
        --head_dir checkpoints/may_head_tpu ...

The output dir carries a config.yaml (the self-describing-ckpt-dir
contract) merged from --config / the source dir's config.yaml when present.

Rehearsed end-to-end (without the download-gated real files) by
tests/test_convert_golden.py: a byte-faithful fake checkpoint in the exact
reference layout is written with torch.save, pushed through this script's
`convert_file`, loaded by the inference loaders, and the resulting model
outputs are compared against goldens.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def convert_file(input_path: str, kind: str, out_dir: str,
                 grid_size: int = 128, config: dict | None = None) -> str:
    """Convert one torch checkpoint -> native ckpt dir. Returns ckpt path."""
    import torch

    from genefaceplusplus_tpu.utils import convert_torch_ckpt as cvt
    from genefaceplusplus_tpu.utils.ckpt import save_checkpoint

    raw = torch.load(input_path, map_location="cpu", weights_only=False)
    step = int(raw.get("global_step", 0))
    state = cvt.load_torch_state_dict(input_path)

    cfg = dict(config or {})
    # inherit the source dir's config.yaml if one sits next to the ckpt
    src_cfg = os.path.join(os.path.dirname(input_path), "config.yaml")
    if os.path.exists(src_cfg):
        import yaml

        with open(src_cfg) as f:
            cfg = {**(yaml.safe_load(f) or {}), **cfg}

    if kind == "a2m":
        converted = cvt.convert_pitch_contour_vae(state)
        payload = {"state_dict": converted}
        n = len([k for k in state])
    elif kind == "head":
        out = cvt.convert_radnerf_grid(state, grid_size=grid_size)
        # inference template is the model.init variables dict {'params': ...}
        payload = {
            "state_dict": {"params": out["params"]},
            "extra_state": {},
        }
        rs = out["render_state"]
        if "density_grid" in rs:
            # trainer extra_state keeps the working grid [H,H,H] (cascade 0)
            payload["extra_state"]["density_grid"] = np.asarray(rs["density_grid"])[0]
        if "occupancy" in rs:
            payload["extra_state"]["occupancy"] = np.asarray(rs["occupancy"])
        cfg.setdefault("grid_type", "tiledgrid")
        cfg.setdefault("grid_size", grid_size)
        n = len([k for k in state])
    elif kind == "disc":
        # eg3d_baseline_run2's `disc` sub-model -> frozen FM discriminator
        # (SRTaskConfig.disc_model_dir); reference load radnerf_sr.py:112-123
        state = cvt.load_torch_state_dict(input_path, sub_model="disc")
        out = cvt.convert_eg3d_disc(state,
                                    img_resolution=int(cfg.get("final_resolution", 512)))
        payload = {"state_dict": {"disc": {"params": out["params"]}}}
        # record the source's mapping depth in the self-describing config so
        # sr_task builds a matching EG3DDualDiscriminator template (a
        # non-default depth would otherwise fail the strict restore)
        cfg["disc_mapping_layers"] = int(out.get("n_mapping_layers", 8))
        n = len([k for k in state])
    else:
        raise ValueError(f"unknown --type {kind!r} (a2m | head | disc)")

    from genefaceplusplus_tpu.config import Config

    path = save_checkpoint(out_dir, step, payload, config=Config(cfg),
                           num_ckpt_keep=100)
    print(f"| converted {n} torch tensors ({kind}) @ step {step} -> {path}")
    return path


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--input", required=True, help="torch .ckpt file")
    p.add_argument("--type", required=True, choices=["a2m", "head", "disc"])
    p.add_argument("--out", required=True, help="output checkpoint dir")
    p.add_argument("--grid_size", type=int, default=128)
    args = p.parse_args(argv)
    convert_file(args.input, args.type, args.out, grid_size=args.grid_size)


if __name__ == "__main__":
    main()

"""CLI: wav -> talking-head mp4.

Flag parity with /root/reference/inference/genefacepp_infer.py:552-592.
"""

from __future__ import annotations

import argparse


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="GeneFace++-TPU inference")
    p.add_argument("--a2m_ckpt", type=str, default="", help="audio2motion checkpoint dir")
    p.add_argument("--postnet_ckpt", type=str, default="")
    p.add_argument("--head_ckpt", type=str, default="", help="head NeRF checkpoint dir")
    p.add_argument("--torso_ckpt", type=str, default="", help="torso NeRF checkpoint dir")
    p.add_argument("--drv_aud", type=str, default="", help="driving wav")
    p.add_argument("--drv_aud_features", type=str, default="",
                   help="precomputed {'hubert','f0'} npy (replaces on-line HuBERT)")
    p.add_argument("--drv_pose", type=str, default="nearest",
                   help="static | <idx> | <start-end> | nearest")
    p.add_argument("--blink_mode", type=str, default="period", choices=["none", "period"])
    p.add_argument("--temperature", type=float, default=0.2)
    p.add_argument("--lle_percent", type=float, default=0.2)
    p.add_argument("--mouth_amp", type=float, default=0.4)
    p.add_argument("--out_name", type=str, default="out.mp4")
    p.add_argument("--T_thresh", "--raymarching_end_threshold", dest="T_thresh",
                   type=float, default=1e-2,
                   help="transmittance early-out (reference flag name "
                        "--raymarching_end_threshold accepted as an alias)")
    p.add_argument("--fast", action="store_true", help="T_thresh=0.05 for more fps")
    p.add_argument("--low_memory_usage", action="store_true", default=True)
    p.add_argument("--debug", action="store_true")
    # static-crop accelerations (all lossless, derived at load; "auto"
    # default). "off" renders full-frame — for A/B checks and for driving
    # poses far outside the dataset's (models/full_renderer.py).
    p.add_argument("--head_crop", type=str, default="auto",
                   help="auto | off (head field on the occupied-AABB screen crop)")
    p.add_argument("--torso_crop", type=str, default="auto",
                   help="auto | off (torso field on its static footprint rect)")
    p.add_argument("--sr_crop", type=str, default="auto",
                   help="auto | off (SR only the changing region; SR(bg) precomputed)")
    p.add_argument("--frames_per_dispatch", type=int, default=8,
                   help="frames rendered per device dispatch (lax.scan chunk)")
    p.add_argument("--color_topk", type=int, default=0,
                   help="color MLP on only the K highest-weight samples/ray "
                        "(0 = all; approximation — A/B per identity)")
    p.add_argument("--compact_frac", type=str, default="0",
                   help="field on a static budget of frac*rays*samples live "
                        "slots: a float (exact while the identity's live "
                        "fraction stays below it), 'auto' (measure this "
                        "call's poses and pick a covering budget), or 0=off")
    p.add_argument("--n_devices", type=int, default=1,
                   help="shard each frame's rays over this many chips "
                        "(jax.sharding Mesh 'rays' axis; 1 = single chip)")
    return p


def make_infer_mesh(n_devices: int):
    """Mesh over the first n_devices chips (None for single-chip)."""
    if n_devices <= 1:
        return None
    from genefaceplusplus_tpu.parallel.mesh import make_mesh

    return make_mesh(n_devices)


def main(argv=None):
    args = build_parser().parse_args(argv)
    from genefaceplusplus_tpu.inference.pipeline import GeneFaceInfer

    infer = GeneFaceInfer(
        audio2secc_dir=args.a2m_ckpt or None,
        postnet_dir=args.postnet_ckpt or None,
        head_model_dir=args.head_ckpt or None,
        torso_model_dir=args.torso_ckpt or None,
        mesh=make_infer_mesh(args.n_devices),
    )
    inp = {
        "drv_aud": args.drv_aud,
        "drv_aud_features": args.drv_aud_features,
        "drv_pose": args.drv_pose,
        "blink_mode": args.blink_mode,
        "temperature": args.temperature,
        "lle_percent": args.lle_percent,
        "mouth_amp": args.mouth_amp,
        "out_name": args.out_name,
        "T_thresh": 0.05 if args.fast else args.T_thresh,
        "low_memory_usage": args.low_memory_usage,
        "debug": args.debug,
        "head_crop": args.head_crop,
        "torso_crop": args.torso_crop,
        "sr_crop": args.sr_crop,
        "frames_per_dispatch": args.frames_per_dispatch,
        "color_topk": args.color_topk,
        "compact_frac": args.compact_frac,
    }
    out = infer.infer_once(inp)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()

"""Preprocessing orchestrator: raw video -> processed dir -> binarized dataset.

Parity: /root/reference/data_gen/runs/nerf/run.sh — per-step pipeline
(resize/audio/frames/segmentation/landmarks/3DMM-fit/binarize), each step a
separate invocation so failures resume mid-pipeline.

Environment gating (this image): mediapipe (landmarks/segmentation) and
ffmpeg (audio demux) may be absent — those steps accept precomputed
artifacts (lms_2d.npy, aud.wav, segmaps) and explain what is missing.
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def step_frames(video_path: str, out_dir: str, size: int = 512, fps: int = 25) -> int:
    """Decode + resize frames -> gt_imgs/ (run.sh ffmpeg resize equivalent)."""
    import cv2

    os.makedirs(os.path.join(out_dir, "gt_imgs"), exist_ok=True)
    cap = cv2.VideoCapture(video_path)
    i = 0
    while True:
        ok, frame = cap.read()
        if not ok:
            break
        frame = cv2.resize(frame, (size, size))
        cv2.imwrite(os.path.join(out_dir, "gt_imgs", f"{i:08d}.jpg"), frame)
        i += 1
    cap.release()
    return i


def step_audio(out_dir: str) -> None:
    """aud.wav -> mel/f0 (+ hubert when available)."""
    from genefaceplusplus_tpu.data import audio as audio_lib

    wav_path = os.path.join(out_dir, "aud.wav")
    if not os.path.exists(wav_path):
        raise FileNotFoundError(
            f"{wav_path} missing — extract audio to 16k wav first (ffmpeg or "
            "any demuxer; this image has no ffmpeg)."
        )
    wav = audio_lib.load_wav_16k(wav_path)
    wav, mel = audio_lib.extract_mel(wav)
    f0 = audio_lib.extract_f0(wav, mel_len=len(mel))
    np.save(os.path.join(out_dir, "aud_mel_f0.npy"), {"mel": mel, "f0": f0}, allow_pickle=True)
    if audio_lib.hubert_available():
        hub = audio_lib.get_hubert_from_16k_speech(wav)
        np.save(os.path.join(out_dir, "aud_hubert.npy"), hub)
    else:
        print("| hubert weights unavailable — provide aud_hubert.npy separately")


def step_landmarks(out_dir: str) -> None:
    """Mediapipe 478-pt landmarks -> lms_2d.npy (gated)."""
    try:
        import mediapipe  # noqa: F401
    except ImportError:
        if os.path.exists(os.path.join(out_dir, "lms_2d.npy")):
            print("| mediapipe absent; using existing lms_2d.npy")
            return
        raise RuntimeError(
            "mediapipe is not installed in this image; provide lms_2d.npy "
            "([T, 478, 2] pixel coords) computed elsewhere."
        )
    raise NotImplementedError(
        "mediapipe detected but the detector integration is pending; "
        "provide lms_2d.npy for now"
    )


def step_background(out_dir: str, n_samples: int = 32) -> None:
    """Static background estimate: per-pixel temporal median over sampled
    frames (the reference uses segmentation-guided KNN voting,
    extract_segment_imgs.py:63-147; median is the seg-free approximation)."""
    import cv2

    frame_dir = os.path.join(out_dir, "gt_imgs")
    names = sorted(os.listdir(frame_dir))
    idx = np.linspace(0, len(names) - 1, min(n_samples, len(names))).astype(int)
    frames = np.stack([cv2.imread(os.path.join(frame_dir, names[i])) for i in idx])
    bg = np.median(frames, axis=0).astype(np.uint8)
    cv2.imwrite(os.path.join(out_dir, "bg.jpg"), bg)


def step_fit(out_dir: str, bfm_dir: str = "deep_3drecon/BFM") -> None:
    from genefaceplusplus_tpu.data.face3d import Face3DHelper
    from genefaceplusplus_tpu.data.fit_3dmm import fit_3dmm_for_video
    from genefaceplusplus_tpu.data.landmarks import INDEX_LM68_FROM_LM478

    lms = np.load(os.path.join(out_dir, "lms_2d.npy"))
    if lms.shape[1] in (468, 478):
        helper = Face3DHelper.load(bfm_dir, keypoint_mode="mediapipe")
        lms = lms[:, :468]
    else:
        helper = Face3DHelper.load(bfm_dir, keypoint_mode="lm68")
    if lms.max() > 2.0:  # pixel coords -> [0,1]
        lms = lms / 512.0
    coeff = fit_3dmm_for_video(lms.astype(np.float32), helper)
    np.save(os.path.join(out_dir, "coeff_fit_mp.npy"), coeff, allow_pickle=True)
    print(f"| 3DMM fit done, final loss {coeff['final_loss']:.2e}")


def step_binarize(out_dir: str, binary_out: str, bfm_dir: str = "deep_3drecon/BFM") -> None:
    from genefaceplusplus_tpu.data.binarizer import binarize

    binarize(out_dir, binary_out, bfm_dir)
    print(f"| wrote {binary_out}")


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--video_id", type=str, required=True)
    p.add_argument("--data_dir", type=str, default="data")
    p.add_argument("--steps", type=str, default="frames,audio,background,landmarks,fit,binarize")
    p.add_argument("--bfm_dir", type=str, default="deep_3drecon/BFM")
    args = p.parse_args(argv)

    raw = os.path.join(args.data_dir, "raw/videos", f"{args.video_id}.mp4")
    out_dir = os.path.join(args.data_dir, "processed/videos", args.video_id)
    binary_out = os.path.join(args.data_dir, "binary/videos", args.video_id, "trainval_dataset.npy")
    os.makedirs(out_dir, exist_ok=True)

    for step in args.steps.split(","):
        step = step.strip()
        print(f"| step: {step}")
        if step == "frames":
            n = step_frames(raw, out_dir)
            print(f"| {n} frames")
        elif step == "audio":
            step_audio(out_dir)
        elif step == "background":
            step_background(out_dir)
        elif step == "landmarks":
            step_landmarks(out_dir)
        elif step == "fit":
            step_fit(out_dir, args.bfm_dir)
        elif step == "binarize":
            step_binarize(out_dir, binary_out, args.bfm_dir)
        else:
            raise ValueError(f"unknown step {step}")


if __name__ == "__main__":
    main()

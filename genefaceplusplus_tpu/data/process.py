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


def _load_frames_rgb(out_dir: str):
    import cv2

    frame_dir = os.path.join(out_dir, "gt_imgs")
    names = sorted(os.listdir(frame_dir))
    for name in names:
        yield name, cv2.cvtColor(cv2.imread(os.path.join(frame_dir, name)), cv2.COLOR_BGR2RGB)


def step_landmarks(out_dir: str, mp_model_path: str = None) -> None:
    """Mediapipe 478-pt landmarks -> lms_2d.npy [T, 478, 2] pixel coords,
    dual IMAGE+VIDEO mode fused per region (face_landmarker.py:44-126)."""
    lm_path = os.path.join(out_dir, "lms_2d.npy")
    try:
        from genefaceplusplus_tpu.data.mp_extract import MediapipeLandmarker

        landmarker = MediapipeLandmarker(mp_model_path)
    except (RuntimeError, FileNotFoundError) as e:
        if os.path.exists(lm_path):
            print(f"| landmarker unavailable ({e}); using existing lms_2d.npy")
            return
        raise
    frames = [img for _, img in _load_frames_rgb(out_dir)]
    lms = landmarker.extract_fused_lm478(frames)
    np.save(lm_path, lms.astype(np.float32))
    print(f"| wrote {lm_path} {lms.shape}")


def step_segment(out_dir: str, mp_model_path: str = None) -> None:
    """Segmentation-guided data prep (extract_segment_imgs.py): per-frame
    segmaps + head/torso/person RGBA crops + inpainted torso images + KNN
    background + com_imgs (person composited over the background).

    Segmaps come from mediapipe when available, else from precomputed
    segmaps/ pngs."""
    import cv2

    from genefaceplusplus_tpu.data import segmenter as seg_lib

    seg_dir = os.path.join(out_dir, "segmaps")
    frame_dir = os.path.join(out_dir, "gt_imgs")
    names = sorted(os.listdir(frame_dir))
    T = len(names)

    have_pngs = os.path.isdir(seg_dir) and len(os.listdir(seg_dir)) >= T
    mp_seg = None
    if have_pngs:
        print("| using precomputed segmaps/")
    else:
        from genefaceplusplus_tpu.data.mp_extract import MediapipeSegmenter

        mp_seg = MediapipeSegmenter(mp_model_path)
        mp_video_seg = mp_seg._vision.ImageSegmenter.create_from_options(
            mp_seg.video_options)

    def load_frame(name):
        return cv2.cvtColor(cv2.imread(os.path.join(frame_dir, name)),
                            cv2.COLOR_BGR2RGB)

    def get_segmap(i, name, img):
        if have_pngs:
            return seg_lib.load_segmap(
                os.path.join(seg_dir, os.path.splitext(name)[0] + ".png"))
        import mediapipe as mp

        image = mp.Image(image_format=mp.ImageFormat.SRGB,
                         data=np.asarray(img, np.uint8))
        cat = mp_video_seg.segment_for_video(image, 40 * i).category_mask
        return seg_lib.onehot_from_categories(cat.numpy_view().copy().astype(np.int64))

    # streaming pass 1: per-frame crops + inpainted torso, keeping only the
    # bg-sampled frames in memory (a 5-min 512² video would otherwise need
    # ~6 GB; the reference hits the same wall, extract_segment_imgs.py
    # store_in_memory warning)
    interval = 5 if T <= 100 else (20 if T < 10000 else T // 500)
    sample_idx = set(range(0, T, interval)) if T > interval else {0}
    bg_frames, bg_segmaps = [], []
    for i, name in enumerate(names):
        img = load_frame(name)
        segmap = get_segmap(i, name, img)
        seg_lib.generate_segment_images(out_dir, name, img, segmap)
        if i in sample_idx:
            bg_frames.append(img)
            bg_segmaps.append(segmap)

    # KNN background over the sampled frames only
    bg = seg_lib.extract_background(bg_frames, bg_segmaps, select_interval=1)
    cv2.imwrite(os.path.join(out_dir, "bg.jpg"), cv2.cvtColor(bg, cv2.COLOR_RGB2BGR))

    # streaming pass 2: com_imgs = person over reconstructed background
    com_dir = os.path.join(out_dir, "com_imgs")
    os.makedirs(com_dir, exist_ok=True)
    for i, name in enumerate(names):
        img = load_frame(name)
        segmap = seg_lib.load_segmap(
            os.path.join(seg_dir, os.path.splitext(name)[0] + ".png"))
        person, mask = seg_lib.segment_out(img, segmap, "person")
        com = np.where(mask[..., None], person, bg)
        cv2.imwrite(
            os.path.join(com_dir, os.path.splitext(name)[0] + ".jpg"),
            cv2.cvtColor(com, cv2.COLOR_RGB2BGR),
        )
    print(f"| segment step done: {T} frames")


def step_background(out_dir: str, n_samples: int = 32) -> None:
    """Static background estimate WITHOUT segmentation: per-pixel temporal
    median over sampled frames (fallback when no segmaps exist; the primary
    path is step_segment's KNN background, extract_segment_imgs.py:63-147)."""
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
    p.add_argument("--steps", type=str, default="frames,audio,segment,landmarks,fit,binarize")
    p.add_argument("--mp_model_dir", type=str, default=None,
                   help="dir holding face_landmarker.task / selfie_multiclass_256x256.tflite")
    p.add_argument("--bfm_dir", type=str, default="deep_3drecon/BFM")
    p.add_argument("--size", type=int, default=512,
                   help="frame resize target (the reference pipeline is 512)")
    args = p.parse_args(argv)

    raw = os.path.join(args.data_dir, "raw/videos", f"{args.video_id}.mp4")
    out_dir = os.path.join(args.data_dir, "processed/videos", args.video_id)
    binary_out = os.path.join(args.data_dir, "binary/videos", args.video_id, "trainval_dataset.npy")
    os.makedirs(out_dir, exist_ok=True)

    for step in args.steps.split(","):
        step = step.strip()
        print(f"| step: {step}")
        if step == "frames":
            n = step_frames(raw, out_dir, size=args.size)
            print(f"| {n} frames")
        elif step == "audio":
            step_audio(out_dir)
        elif step == "segment":
            mp_dir = args.mp_model_dir
            step_segment(out_dir, os.path.join(mp_dir, "selfie_multiclass_256x256.tflite") if mp_dir else None)
        elif step == "background":
            step_background(out_dir)
        elif step == "landmarks":
            mp_dir = args.mp_model_dir
            step_landmarks(out_dir, os.path.join(mp_dir, "face_landmarker.task") if mp_dir else None)
        elif step == "fit":
            step_fit(out_dir, args.bfm_dir)
        elif step == "debug_fit":
            from genefaceplusplus_tpu.data.visualization import debug_fit_video

            debug_fit_video(out_dir, bfm_dir=args.bfm_dir)
        elif step == "binarize":
            step_binarize(out_dir, binary_out, args.bfm_dir)
        else:
            raise ValueError(f"unknown step {step}")


if __name__ == "__main__":
    main()

"""Video output: streaming frame writer + audio mux.

Parity: the imageio h264 writer + ffmpeg audio mux of the reference
(inference/genefacepp_infer.py:449-518). This environment may lack an
ffmpeg binary; the writer falls back to cv2's mp4v and, without any muxer,
emits video + wav side-by-side (documented in the return value).
"""

from __future__ import annotations

import os
import shutil
import subprocess
from typing import Optional

import numpy as np


def _ffmpeg() -> Optional[str]:
    return shutil.which("ffmpeg")


class StreamingVideoWriter:
    """Writes uint8 RGB frames incrementally (low_memory_usage-style)."""

    def __init__(self, path: str, fps: int = 25):
        self.path = path
        self.fps = fps
        self._writer = None
        self._cv2_writer = None
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)

    def _ensure(self, frame: np.ndarray):
        if self._writer is not None or self._cv2_writer is not None:
            return
        try:
            import imageio

            self._writer = imageio.get_writer(self.path, fps=self.fps)
        except Exception:
            import cv2

            h, w = frame.shape[:2]
            fourcc = cv2.VideoWriter_fourcc(*"mp4v")
            self._cv2_writer = cv2.VideoWriter(self.path, fourcc, self.fps, (w, h))

    def append(self, frame: np.ndarray):
        """frame: [H, W, 3] float in [0,1] or uint8 RGB."""
        if frame.dtype != np.uint8:
            frame = (np.clip(frame, 0, 1) * 255).astype(np.uint8)
        self._ensure(frame)
        if self._writer is not None:
            self._writer.append_data(frame)
        else:
            import cv2

            self._cv2_writer.write(cv2.cvtColor(frame, cv2.COLOR_RGB2BGR))

    def close(self):
        if self._writer is not None:
            self._writer.close()
        if self._cv2_writer is not None:
            self._cv2_writer.release()


def mux_audio(video_path: str, wav_path: str, out_path: str, remove_wav: bool = False) -> str:
    """Mux wav into the video via ffmpeg; if unavailable, leave the wav
    alongside and return the video path (capability degraded, not broken)."""
    ff = _ffmpeg()
    if ff is None:
        side = os.path.splitext(out_path)[0] + ".wav"
        if os.path.abspath(side) != os.path.abspath(wav_path):
            shutil.move(wav_path, side) if remove_wav else shutil.copy(wav_path, side)
        if os.path.abspath(video_path) != os.path.abspath(out_path):
            shutil.move(video_path, out_path)
        return out_path
    cmd = [ff, "-y", "-v", "quiet", "-i", video_path, "-i", wav_path,
           "-c:v", "copy", "-c:a", "aac", "-shortest", out_path]
    subprocess.check_call(cmd)
    os.remove(video_path)
    if remove_wav:
        os.remove(wav_path)
    return out_path

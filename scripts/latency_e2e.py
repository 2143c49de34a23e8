"""End-to-end wav -> frames latency + real-time factor on the attached TPU.

BASELINE.md north star #2: "End-to-end wav->mp4 latency: track & minimize
(streaming path: chunked audio, rays sharded)". This drives the production
streaming path (inference/serving.py:stream_infer — chunk-level pipelining:
device renders chunk k while the host extracts features + runs audio2motion
for chunk k+1) on the reference's shipped validation wav
(data/raw/val_wavs/MacronSpeech.wav) with random model weights (timing is
weight-independent) and random hubert features (the hubert checkpoint is
not redistributable; mel/F0 are extracted for real).

Prints one JSON line:
  {"first_frame_latency_s", "rtf", "fps", "audio_s", "frames"}
rtf < 1 means faster than real time (generation keeps up with speech).
"""
import json
import os
import sys
import time

import numpy as np
import jax

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_CACHE_DIR", "/tmp/jax_bench_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

WAV = "/root/reference/data/raw/val_wavs/MacronSpeech.wav"


def build_infer(H=512):
    import tempfile

    from genefaceplusplus_tpu.config import save_config
    from genefaceplusplus_tpu.data.dataset import RADNeRFDataset, synthetic
    from genefaceplusplus_tpu.inference.pipeline import GeneFaceInfer

    tmp = tempfile.mkdtemp(prefix="gf_latency_")
    a2m_dir = os.path.join(tmp, "a2m")
    head_dir = os.path.join(tmp, "head")
    save_config({"use_pitch": True, "audio_in_dim": 1024, "motion_type": "exp"},
                a2m_dir)
    save_config({"with_sr": True, "smo_win_size": 3, "cond_win_size": 1,
                 "add_eye_blink_cond": True}, head_dir)
    ds = RADNeRFDataset(synthetic(num_frames=24, H=H, W=H), split="train",
                        smo_win_size=3, with_sr=True)
    return GeneFaceInfer(audio2secc_dir=a2m_dir, head_model_dir=head_dir,
                         dataset=ds)


def run(infer, wav, hubert_full, label, chunk_seconds=2.0):
    from genefaceplusplus_tpu.inference.serving import stream_infer

    inp = {"hubert_full": hubert_full, "blink_mode": "period",
           "lle_percent": 0.0, "temperature": 0.5}
    t0 = time.perf_counter()
    first = None
    n = 0
    for frame in stream_infer(infer, wav, inp=inp, chunk_seconds=chunk_seconds):
        if first is None:
            first = time.perf_counter() - t0
        n += 1
    total = time.perf_counter() - t0
    audio_s = len(wav) / 16000.0
    out = {
        "label": label,
        "first_frame_latency_s": round(first, 3),
        "rtf": round(total / audio_s, 4),
        "fps": round(n / total, 1),
        "audio_s": round(audio_s, 1),
        "frames": n,
    }
    print(json.dumps(out), flush=True)
    return out


def main():
    from genefaceplusplus_tpu.data import audio as audio_lib

    wav = audio_lib.load_wav_16k(WAV)
    max_s = float(os.environ.get("LAT_MAX_SECONDS", "20"))
    wav = wav[: int(max_s * 16000)]
    t50 = len(wav) // (2 * audio_lib.HOP_SIZE) + 8
    rng = np.random.RandomState(0)
    hubert_full = rng.randn(t50, 1024).astype(np.float32)

    infer = build_infer(H=int(os.environ.get("LAT_RES", "512")))
    run(infer, wav, hubert_full, "cold (includes jit compile)")
    run(infer, wav, hubert_full, "warm (steady-state serving)")


if __name__ == "__main__":
    main()

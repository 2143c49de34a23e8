"""Serving: multi-chip ray-sharded frame rendering + streaming audio driver.

The reference serves on a single GPU (inference/genefacepp_infer.py). The
TPU-native serving design (SURVEY.md §2.8, §7 stage 8):
  * rays shard over the mesh 'rays' axis — the per-frame 65k rays split
    across chips; params/occupancy replicate; XLA all-gathers the image
    slices over ICI. Zero hand-written collectives.
  * audio streams in fixed-size chunks; each chunk runs audio2motion once
    and then renders its frames back-to-back, so video frames emit with
    chunk-level latency instead of clip-level (parity-plus over the
    reference's whole-clip batch path; its --low_memory_usage only streams
    the writer).
  * one-chunk pipelining: renders are DISPATCHED async (JAX dispatch
    returns before the device finishes) and fetched only after the next
    chunk's audio2motion is issued — the host-side feature extraction and
    a2m of chunk k+1 overlap the device render of chunk k.
"""

from __future__ import annotations

from typing import Dict, Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from genefaceplusplus_tpu.parallel.mesh import make_mesh


class ShardedFrameRenderer:
    """Wraps a frame function with ray-axis sharding over a device mesh.

    frame_fn(head_params, torso_params, sr_params, rays_o, rays_d, cond_win,
             eye_area, occupancy, bg_color, bg_coords, lm68) -> image
    Ray-shaped args (leading dim = n_rays) shard over 'rays'; the rest
    replicate. n_rays must divide by the mesh size (pad upstream).
    """

    RAY_ARGS = (3, 4, 8, 9)  # rays_o, rays_d, bg_color, bg_coords

    def __init__(self, frame_fn, mesh: Optional[Mesh] = None):
        self.mesh = mesh if mesh is not None else make_mesh()
        repl = NamedSharding(self.mesh, P())
        shard = NamedSharding(self.mesh, P("rays"))
        shard2 = NamedSharding(self.mesh, P("rays", None))

        n_args = 11
        in_shardings = []
        for i in range(n_args):
            in_shardings.append(shard2 if i in self.RAY_ARGS else repl)
        self._fn = jax.jit(frame_fn, in_shardings=tuple(in_shardings), out_shardings=repl)

    def __call__(self, *args):
        args = list(args)
        for i in self.RAY_ARGS:
            if args[i] is not None:
                n = args[i].shape[0]
                assert n % self.mesh.size == 0, (
                    f"n_rays {n} must divide mesh size {self.mesh.size}"
                )
        return self._fn(*args)


def stream_infer(
    infer,  # GeneFaceInfer
    wav16k: np.ndarray,
    inp: Optional[Dict] = None,
    chunk_seconds: float = 2.0,
    mesh: Optional[Mesh] = None,
) -> Iterator[np.ndarray]:
    """Stream frames from a long (or live) 16 kHz waveform.

    Yields uint8 RGB frames as soon as each audio chunk's motion+render is
    done. Chunks overlap by one smoothing window to avoid boundary pops in
    the landmark sequence.

    Reconnect protocol: a client that lost its connection after receiving
    k frames re-requests with ``inp['resume_from_frame'] = k`` (plus any
    previous resume offset); the stream restarts at the exact audio/pose
    cursor of frame k — the pose schedule (`mirror_index`) and the audio
    position are both functions of the absolute frame index, so resumed
    frames match what an uninterrupted stream would have produced at a
    chunk boundary.
    """
    from genefaceplusplus_tpu.data import audio as audio_lib
    from genefaceplusplus_tpu.inference.pipeline import default_inp

    inp = default_inp(**(inp or {}))
    sr = audio_lib.SAMPLE_RATE
    hop_frames = int(chunk_seconds * 25)  # motion frames per chunk
    chunk_samples = hop_frames * 2 * audio_lib.HOP_SIZE  # 50 Hz features

    total = len(wav16k)
    frame_offset = int(inp.get("resume_from_frame", 0) or 0)
    pos = frame_offset * 2 * audio_lib.HOP_SIZE  # samples already streamed
    # one-chunk pipeline: the device renders chunk k (async dispatch) while
    # the host runs feature extraction + audio2motion for chunk k+1; frames
    # of chunk k are fetched (sync) only after k+1's render is dispatched.
    pending = None  # (device_images, n_real)
    while pos < total:
        chunk = wav16k[pos : pos + chunk_samples]
        if len(chunk) < sr // 5:  # <0.2s tail: drop
            break
        chunk_padded, mel = audio_lib.extract_mel(chunk.astype(np.float32))
        f0 = audio_lib.extract_f0(chunk_padded, mel_len=len(mel))
        if audio_lib.hubert_available():
            hubert = audio_lib.get_hubert_from_16k_speech(chunk_padded)
        elif "hubert_full" in inp:
            t50 = len(f0)
            start = frame_offset * 2
            hubert = inp["hubert_full"][start : start + t50]
        else:
            raise RuntimeError("no hubert source for streaming")

        t8 = len(hubert) // 8 * 8  # a2m needs a multiple-of-8 feature length
        if t8 == 0:
            break  # tail shorter than one motion block
        batch = {
            "hubert": hubert[:t8],
            "f0": f0[:t8],
            "wav16k": chunk_padded[: t8 * audio_lib.HOP_SIZE],
            "T": t8 // 2,
        }
        # pose schedule continues across chunks
        from genefaceplusplus_tpu.utils.smoothing import mirror_index

        ds = infer.dataset
        idxs = [mirror_index(frame_offset + i, len(ds)) for i in range(batch["T"])]
        batch["pose_idx"] = np.asarray(idxs)
        batch["poses"] = np.stack([ds.frame_pose(i) for i in idxs])
        batch["eulers"] = np.asarray(ds.ds["euler"])[idxs]
        batch["transs"] = np.asarray(ds.ds["trans"])[idxs]

        batch = infer.forward_audio2secc(batch, inp)
        dispatched = _dispatch_render(infer, batch, inp, mesh=mesh)  # async
        if pending is not None:
            yield from _drain(pending)
        pending = dispatched
        frame_offset += batch["T"]
        # advance by CONSUMED samples, not the nominal chunk size: the
        # multiple-of-8 feature truncation otherwise drops ~4 frames per
        # chunk and audio/pose positions drift apart (cumulative A/V
        # desync of 160 ms per 2 s chunk, and an eventual empty batch)
        pos += batch["T"] * 2 * audio_lib.HOP_SIZE
    if pending is not None:
        yield from _drain(pending)


def _drain(dispatched) -> Iterator[np.ndarray]:
    for imgs, fits, n_real in dispatched:
        arr = np.asarray(imgs)  # device sync happens here
        misses = int(np.sum(~np.asarray(fits)[:n_real])) if fits is not None else 0
        if misses:
            print(f"| WARNING: head exceeded the auto head-crop window on "
                  f"{misses}/{n_real} streamed frames — use head_crop='off' "
                  f"for poses outside the dataset envelope")
        for j in range(n_real):
            if arr.dtype == np.uint8:  # quantised on device (4x less transfer)
                yield arr[j]
            else:
                yield (np.clip(arr[j], 0, 1) * 255).astype(np.uint8)


def _dispatch_render(infer, batch, inp, mesh: Optional[Mesh] = None):
    """Dispatch the chunk's frame renders (lax.scan chunk fn, async) and
    return a list of (device_images, fits, n_real) — NO host sync here, so
    the caller can overlap the next chunk's audio2motion with this render.
    With `mesh` (or infer.mesh) the frame rays shard over the mesh's 'rays'
    axis (pipeline._build_chunk_fn in_shardings) — multi-chip streaming."""
    from genefaceplusplus_tpu.models.renderer import RenderOptions
    from genefaceplusplus_tpu.utils.rays import get_bg_coords

    ds = infer.dataset
    H, W = ds.H, ds.W
    opts = RenderOptions(
        num_coarse=48,
        num_samples=int(inp.get("num_samples", 10)),
        T_thresh=float(inp.get("T_thresh", 1e-2)),
        entry_mode=str(inp.get("entry_mode", "probe")),
        color_topk=int(inp.get("color_topk", 0)),
        # streaming chunks arrive before the full pose track exists, so
        # "auto" budget probing is offline-only; pass an explicit float here
        compact_frac=(0.0 if str(inp.get("compact_frac", 0.0)) == "auto"
                      else float(inp.get("compact_frac", 0.0))),
    )
    T = batch["T"]
    chunk = max(1, min(int(inp.get("frames_per_dispatch", 8)), T))
    from genefaceplusplus_tpu.inference.pipeline import resolve_crop

    head_crop = resolve_crop(inp, "head_crop", infer.head_crop)
    torso_crop = resolve_crop(inp, "torso_crop", infer.torso_crop)
    sr_crop = resolve_crop(inp, "sr_crop", infer.sr_crop)
    chunk_fn = infer._build_chunk_fn(opts, H, W, chunk, head_crop=head_crop,
                                     torso_crop=torso_crop, sr_crop=sr_crop,
                                     out_dtype="uint8", mesh=mesh)
    bg_coords = get_bg_coords(H, W)[0]
    bg_color = jnp.asarray(ds.bg_img.reshape(-1, 3))
    conds = jnp.asarray(batch["cond"])
    cond_windows = infer._jit_cond_windows(conds, jnp.arange(T), infer.head_cfg.smo_win_size)
    eye_areas = jnp.asarray(batch["eye_area_percent"])
    lm68s = jnp.asarray(batch["lm68"], jnp.float32)

    dispatched = []
    for start in range(0, T, chunk):
        idxs = [min(start + j, T - 1) for j in range(chunk)]
        n_real = min(chunk, T - start)
        poses = jnp.asarray(batch["poses"][idxs])
        rays_o, rays_d, _ = infer._jit_rays(poses, tuple(ds.intrinsics), H, W)
        imgs, fits = chunk_fn(
            infer.head_params, infer.torso_params, infer.sr_params,
            rays_o, rays_d, cond_windows[jnp.asarray(idxs)],
            eye_areas[jnp.asarray(idxs)][:, None, :],
            infer.occupancy, bg_color, bg_coords,
            lm68s[jnp.asarray(idxs)][:, None],
        )
        dispatched.append((imgs, fits if head_crop is not None else None, n_real))
    return dispatched


def _render_frames(infer, batch, inp) -> Iterator[np.ndarray]:
    """Render + yield a chunk's frames (sync); kept for non-pipelined use."""
    yield from _drain(_dispatch_render(infer, batch, inp))


class ClientGone(OSError):
    """The push socket died mid-stream: abort rendering early."""


class FramePusher:
    """Bounded-queue sender between the render loop and a (possibly slow)
    client socket.

    Without this, a slow client applies TCP backpressure straight into the
    render loop: `wfile.write` blocks, the renderer (holding the serve
    lock) stalls, and every other client starves behind one bad downlink.
    With it:
      * the render loop enqueues frames and never blocks on the network;
      * a dedicated sender thread writes to the socket at the client's pace;
      * when the queue is full the OLDEST frame is dropped (live-stream
        semantics: staying realtime beats completeness) and counted in
        the serving metrics;
      * if the socket dies, the next `push()` raises ClientGone so the
        render loop aborts instead of burning TPU time on a dead client.

    The reference has no analogue (its app returns a finished mp4,
    inference/app_genefacepp.py); this is hardening for the TPU streaming
    path that the reference never ships.
    """

    def __init__(self, send_fn, maxsize: int = 16, metrics=None):
        import queue
        import threading

        if metrics is None:
            from genefaceplusplus_tpu.inference.metrics import METRICS
            metrics = METRICS
        self._send = send_fn
        self._metrics = metrics
        self._q = queue.Queue(maxsize=max(1, int(maxsize)))
        self._dead: Optional[BaseException] = None
        self.dropped = 0
        self.sent = 0
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    def _run(self):
        import time as _time

        while True:
            item = self._q.get()
            if item is None:
                return
            try:
                t0 = _time.perf_counter()
                self._send(item)
                self._metrics.frame_pushed((_time.perf_counter() - t0) * 1e3)
                self.sent += 1
            except BaseException as e:  # socket gone / encoder error
                self._dead = e
                # drain so producers never block on a dead sender
                while True:
                    leftover = self._q.get()
                    if leftover is None:
                        return
                    self._metrics.frame_dropped()

    def push(self, payload) -> None:
        """Enqueue one frame. Never blocks: on a full queue the oldest
        queued frame is discarded first. Raises ClientGone if the sender
        already died."""
        import queue

        if self._dead is not None:
            raise ClientGone(str(self._dead))
        while True:
            try:
                self._q.put_nowait(payload)
                return
            except queue.Full:
                try:
                    self._q.get_nowait()
                    self.dropped += 1
                    self._metrics.frame_dropped()
                except queue.Empty:
                    pass  # sender drained it between our calls; retry put

    def close(self, timeout: float = 30.0) -> None:
        """Flush the queue and stop the sender thread."""
        self._q.put(None)
        self._thread.join(timeout=timeout)

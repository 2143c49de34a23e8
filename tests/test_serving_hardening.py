"""Serving hardening: backpressure pusher, reconnect cursor, /metrics.

The reference ships a batch CLI + gradio app (inference/app_genefacepp.py)
with no streaming layer; these tests cover the hardening of the TPU-native
streaming path (SURVEY.md §2.8): bounded-queue frame push with drop-oldest
backpressure, early abort on client death, the `resume_from_frame`
reconnect cursor, and the /metrics observability endpoint.
"""

import json
import threading
import time

import numpy as np
import pytest


# ---------------------------------------------------------------------------
# FramePusher unit tests (no model, no sockets)
# ---------------------------------------------------------------------------

def test_pusher_slow_client_drops_oldest_never_blocks():
    from genefaceplusplus_tpu.inference.metrics import ServingMetrics
    from genefaceplusplus_tpu.inference.serving import FramePusher

    metrics = ServingMetrics()
    sent = []

    def slow_send(item):
        time.sleep(0.02)
        sent.append(item)

    pusher = FramePusher(slow_send, maxsize=4, metrics=metrics)
    t0 = time.time()
    n = 100
    for i in range(n):
        pusher.push(i)
    # producer must not be paced by the 20 ms/frame client
    assert time.time() - t0 < 1.0
    pusher.close()

    assert pusher.sent == len(sent)
    assert pusher.sent + pusher.dropped == n
    assert pusher.dropped > 0  # the slow client forced drops
    # frames arrive in order (a subsequence of the pushed sequence)
    assert sent == sorted(sent)
    snap = metrics.snapshot()
    assert snap["frames"]["pushed"] == pusher.sent
    assert snap["frames"]["dropped"] == pusher.dropped


def test_pusher_fast_client_keeps_every_frame():
    from genefaceplusplus_tpu.inference.metrics import ServingMetrics
    from genefaceplusplus_tpu.inference.serving import FramePusher

    sent = []
    pusher = FramePusher(sent.append, maxsize=8, metrics=ServingMetrics())
    for i in range(50):
        pusher.push(i)
        time.sleep(0.001)  # renderer slower than the sink
    pusher.close()
    assert sent == list(range(50))
    assert pusher.dropped == 0


def test_pusher_dead_client_raises_client_gone():
    from genefaceplusplus_tpu.inference.metrics import ServingMetrics
    from genefaceplusplus_tpu.inference.serving import ClientGone, FramePusher

    def broken_send(item):
        raise OSError("connection reset")

    pusher = FramePusher(broken_send, maxsize=4, metrics=ServingMetrics())
    with pytest.raises(ClientGone):
        for i in range(1000):
            pusher.push(i)
            time.sleep(0.001)
    pusher.close()


# ---------------------------------------------------------------------------
# Metrics registry + instrumented iterator
# ---------------------------------------------------------------------------

def test_instrumented_records_gaps_and_rtf():
    from genefaceplusplus_tpu.inference.metrics import ServingMetrics, instrumented

    m = ServingMetrics()
    frames = list(instrumented((i for i in range(30)), metrics=m))
    assert frames == list(range(30))
    snap = m.snapshot()
    assert snap["streams"] == {"started": 1, "completed": 1, "failed": 0}
    assert snap["frame_gap_ms"]["total"] == 30
    assert snap["rtf"]["last"] is not None and snap["rtf"]["last"] > 0


def test_instrumented_marks_failed_stream():
    from genefaceplusplus_tpu.inference.metrics import ServingMetrics, instrumented

    m = ServingMetrics()

    def boom():
        yield 1
        raise RuntimeError("render died")

    with pytest.raises(RuntimeError):
        list(instrumented(boom(), metrics=m))
    assert m.snapshot()["streams"]["failed"] == 1


def test_histogram_buckets_cover_range():
    from genefaceplusplus_tpu.inference.metrics import LatencyHistogram

    h = LatencyHistogram(edges_ms=(10.0, 100.0))
    for v in (1.0, 50.0, 1e6):
        h.record(v)
    snap = h.snapshot()
    assert snap["buckets"] == {"le_10ms": 1, "le_100ms": 1, "gt_100ms": 1}
    assert snap["total"] == 3 and snap["max_ms"] == 1e6


def test_metrics_endpoint_serves_json():
    """/metrics never touches the model — serve(None) is enough."""
    import http.client
    import socket

    from genefaceplusplus_tpu.inference.app import serve
    from genefaceplusplus_tpu.inference.metrics import METRICS

    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    t = threading.Thread(target=serve, args=(None, "127.0.0.1", port), daemon=True)
    t.start()
    time.sleep(0.3)

    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=30)
    conn.request("GET", "/metrics")
    resp = conn.getresponse()
    assert resp.status == 200
    snap = json.loads(resp.read().decode())
    conn.close()
    for key in ("streams", "frames", "frame_gap_ms", "push_latency_ms", "rtf"):
        assert key in snap
    # the module-level registry backs the endpoint
    assert snap["frames"]["pushed"] == METRICS.snapshot()["frames"]["pushed"]


# ---------------------------------------------------------------------------
# Reconnect cursor: resumed stream == tail of the uninterrupted stream
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def infer():
    import os
    import tempfile

    from genefaceplusplus_tpu.config import save_config
    from genefaceplusplus_tpu.data.dataset import RADNeRFDataset, synthetic
    from genefaceplusplus_tpu.inference.pipeline import GeneFaceInfer

    tmp = tempfile.mkdtemp()
    a2m = os.path.join(tmp, "a2m")
    save_config({"use_pitch": True, "audio_in_dim": 64, "a2m_hidden_channels": 64,
                 "a2m_enc_layers": 2, "a2m_dec_layers": 2, "a2m_flow_hidden": 16,
                 "a2m_flow_blocks": 2}, a2m)
    head = os.path.join(tmp, "head")
    save_config({"with_sr": False, "grid_size": 16, "smo_win_size": 3,
                 "hidden_dim_sigma": 32, "hidden_dim_ambient": 32,
                 "hidden_dim_color": 32, "geo_feat_dim": 16,
                 "individual_embedding_num": 32}, head)
    ds = RADNeRFDataset(synthetic(num_frames=24, H=16, W=16), split="train",
                        smo_win_size=3, with_sr=False)
    return GeneFaceInfer(audio2secc_dir=a2m, head_model_dir=head, dataset=ds)


def test_resume_from_frame_matches_uninterrupted_tail(infer):
    import jax

    from genefaceplusplus_tpu.inference.serving import stream_infer

    rng = np.random.RandomState(7)
    T50 = 128  # -> chunk 1: T=48 frames (t8=96), chunk 2: T=12 frames
    hubert_full = rng.randn(T50, 64).astype(np.float32)
    wav = rng.randn(T50 * 320).astype(np.float32) * 0.05
    base = {"blink_mode": "none", "lle_percent": 0.0, "temperature": 0.0}

    infer.rng = jax.random.PRNGKey(42)
    inp = dict(base, hubert_full=hubert_full)
    full = [f.copy() for f in stream_infer(infer, wav, inp)]
    assert len(full) == 60

    # reconnect after chunk 1 (48 frames): replay the PRNG to the state the
    # uninterrupted stream had entering chunk 2, then resume at the cursor
    infer.rng = jax.random.split(jax.random.PRNGKey(42))[0]
    inp = dict(base, hubert_full=hubert_full, resume_from_frame=48)
    resumed = [f.copy() for f in stream_infer(infer, wav, inp)]

    assert len(resumed) == len(full) - 48
    for a, b in zip(resumed, full[48:]):
        np.testing.assert_array_equal(a, b)

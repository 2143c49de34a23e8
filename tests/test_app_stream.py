"""Web app: live MJPEG streaming endpoint over the stdlib HTTP server."""

import io
import threading
import time

import numpy as np
import pytest


@pytest.fixture(scope="module")
def infer():
    from genefaceplusplus_tpu.config import save_config
    from genefaceplusplus_tpu.data.dataset import RADNeRFDataset, synthetic
    from genefaceplusplus_tpu.inference.pipeline import GeneFaceInfer
    import tempfile, os

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


def test_mjpeg_stream_endpoint(infer, tmp_path):
    import http.client
    import socket

    from genefaceplusplus_tpu.inference.app import serve

    # free port
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()

    t = threading.Thread(target=serve, args=(infer, "127.0.0.1", port), daemon=True)
    t.start()
    time.sleep(0.5)

    rng = np.random.RandomState(0)
    T50 = 64
    feats = {"hubert": rng.randn(T50, 64).astype(np.float32),
             "f0": (np.abs(rng.randn(T50)) * 100 + 80).astype(np.float32),
             "wav16k": rng.randn(T50 * 320).astype(np.float32) * 0.05}
    fpath = tmp_path / "feats.npy"
    np.save(fpath, feats, allow_pickle=True)

    boundary = "x"
    body = io.BytesIO()
    body.write(f"--{boundary}\r\n".encode())
    body.write(b'Content-Disposition: form-data; name="feats"; filename="feats.npy"\r\n')
    body.write(b"Content-Type: application/octet-stream\r\n\r\n")
    body.write(open(fpath, "rb").read())
    body.write(f"\r\n--{boundary}--\r\n".encode())

    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=300)
    conn.request("POST", "/stream", body=body.getvalue(),
                 headers={"Content-Type": f"multipart/form-data; boundary={boundary}"})
    resp = conn.getresponse()
    assert resp.status == 200
    assert "multipart/x-mixed-replace" in resp.getheader("Content-Type", "")
    # read until we have at least 2 JPEG frames
    data = b""
    t0 = time.time()
    while data.count(b"\xff\xd8") < 2 and time.time() - t0 < 240:
        chunk = resp.read(4096)
        if not chunk:
            break
        data += chunk
    assert data.count(b"--frame") >= 2
    assert data.count(b"\xff\xd8") >= 2  # JPEG SOI markers
    conn.close()


def test_websocket_stream_endpoint(infer, tmp_path):
    """RFC 6455 push endpoint: upgrade -> send JSON inp (one masked text
    frame) -> receive binary JPEG frames -> close frame."""
    import base64
    import json
    import os
    import socket
    import struct
    import threading

    from genefaceplusplus_tpu.inference.app import serve

    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    t = threading.Thread(target=serve, args=(infer, "127.0.0.1", port), daemon=True)
    t.start()
    time.sleep(0.5)

    rng = np.random.RandomState(1)
    T50 = 64
    feats = {"hubert": rng.randn(T50, 64).astype(np.float32),
             "f0": (np.abs(rng.randn(T50)) * 100 + 80).astype(np.float32),
             "wav16k": rng.randn(T50 * 320).astype(np.float32) * 0.05}
    fpath = str(tmp_path / "feats_ws.npy")
    np.save(fpath, feats, allow_pickle=True)

    sock = socket.create_connection(("127.0.0.1", port), timeout=300)
    key = base64.b64encode(os.urandom(16)).decode()
    sock.sendall((f"GET /ws HTTP/1.1\r\nHost: x\r\nUpgrade: websocket\r\n"
                  f"Connection: Upgrade\r\nSec-WebSocket-Key: {key}\r\n"
                  f"Sec-WebSocket-Version: 13\r\n\r\n").encode())
    f = sock.makefile("rb")
    status = f.readline()
    assert b"101" in status, status
    while f.readline().strip():  # drain headers
        pass

    # one masked client text frame with the JSON inp
    payload = json.dumps({"drv_aud_features": fpath, "blink_mode": "none",
                          "lle_percent": 0.0}).encode()
    mask = os.urandom(4)
    masked = bytes(b ^ mask[i % 4] for i, b in enumerate(payload))
    hdr = bytes([0x81])
    n = len(payload)
    assert n < 65536
    hdr += (bytes([0x80 | n]) if n < 126
            else bytes([0x80 | 126]) + struct.pack(">H", n))
    sock.sendall(hdr + mask + masked)

    frames = []
    while True:
        h = f.read(2)
        assert len(h) == 2, "server closed mid-frame"
        opcode = h[0] & 0x0F
        n = h[1] & 0x7F
        if n == 126:
            n = struct.unpack(">H", f.read(2))[0]
        elif n == 127:
            n = struct.unpack(">Q", f.read(8))[0]
        data = f.read(n)
        if opcode == 0x8:  # close
            break
        if opcode == 0x2:
            frames.append(data)
    sock.close()
    assert len(frames) >= 2
    for jpg in frames:
        assert jpg[:2] == b"\xff\xd8"  # JPEG SOI

"""Minimal web UI for interactive inference.

Parity target: the Gradio Blocks app (/root/reference/inference/app_genefacepp.py:121-239)
with its slider surface (blink / lle_percent / temperature / mouth_amp /
T_thresh). Gradio is not installed in this image, so this is a dependency-
free stdlib HTTP app exposing the same controls; with gradio present a
functionally identical Blocks app is built instead.
"""

from __future__ import annotations

import os
import threading

FORM = """<!doctype html><title>GeneFace++-TPU</title>
<h2>GeneFace++-TPU inference</h2>
<form method=post enctype=multipart/form-data action=/infer>
wav file: <input type=file name=wav><br>
precomputed features npy: <input type=file name=feats><br>
blink mode: <select name=blink_mode><option>period</option><option>none</option></select><br>
temperature: <input name=temperature value=0.2><br>
lle_percent: <input name=lle_percent value=0.2><br>
mouth_amp: <input name=mouth_amp value=0.4><br>
T_thresh: <input name=T_thresh value=0.01><br>
drv_pose: <input name=drv_pose value=nearest><br>
<input type=submit value=Generate>
</form>
<form method=post enctype=multipart/form-data action=/stream>
wav file: <input type=file name=wav>
<input type=submit value="Live stream (MJPEG)">
</form>"""


# ---- RFC 6455 WebSocket (stdlib-only, server->client frame push) --------
_WS_GUID = "258EAFA5-E914-47DA-95CA-C5AB0DC85B11"


def _ws_accept_key(key: str) -> str:
    import base64
    import hashlib

    return base64.b64encode(hashlib.sha1((key + _WS_GUID).encode()).digest()).decode()


def ws_send(wfile, payload: bytes, opcode: int = 0x2) -> None:
    """Write one unmasked server frame (FIN set). opcode 0x1 text, 0x2
    binary, 0x8 close."""
    import struct

    n = len(payload)
    head = bytes([0x80 | opcode])
    if n < 126:
        head += bytes([n])
    elif n < 65536:
        head += bytes([126]) + struct.pack(">H", n)
    else:
        head += bytes([127]) + struct.pack(">Q", n)
    wfile.write(head + payload)
    wfile.flush()


class WSMessageTooBig(ValueError):
    """Client declared a frame longer than the server accepts."""


# The only inbound WS message is the JSON `inp` dict — a few KB. Cap well
# above that but far below anything that could exhaust memory: the declared
# length is attacker-controlled (up to 2^64-1 via the 127 extended form).
WS_MAX_PAYLOAD = 4 * 2 ** 20


def ws_recv(rfile, max_len: int = WS_MAX_PAYLOAD):
    """Read one client frame -> (opcode, payload); client frames are
    masked per RFC 6455 §5.3. Returns (None, b\"\") on EOF. Raises
    WSMessageTooBig before allocating when the declared length exceeds
    `max_len` (callers answer with a 1009 close frame)."""
    import struct

    hdr = rfile.read(2)
    if len(hdr) < 2:
        return None, b""
    b1, b2 = hdr
    opcode = b1 & 0x0F
    masked = b2 & 0x80
    n = b2 & 0x7F
    if n == 126:
        n = struct.unpack(">H", rfile.read(2))[0]
    elif n == 127:
        n = struct.unpack(">Q", rfile.read(8))[0]
    if n > max_len:
        raise WSMessageTooBig(f"ws frame of {n} bytes exceeds cap {max_len}")
    mask = rfile.read(4) if masked else b"\x00\x00\x00\x00"
    data = bytearray(rfile.read(n))
    for i in range(len(data)):
        data[i] ^= mask[i % 4]
    return opcode, bytes(data)


def _load_stream_audio(inp):
    """wav16k from inp: a wav path, or precomputed features (hubert goes to
    inp['hubert_full'] for the streaming fallback)."""
    import numpy as np

    from genefaceplusplus_tpu.data import audio as audio_lib

    wav = audio_lib.load_wav_16k(inp["drv_aud"]) if inp.get("drv_aud") else None
    if wav is None and inp.get("drv_aud_features"):
        feats = np.load(inp["drv_aud_features"], allow_pickle=True).tolist()
        inp["hubert_full"] = np.asarray(feats["hubert"], np.float32)
        t = len(inp["hubert_full"]) * audio_lib.HOP_SIZE
        wav = np.asarray(feats.get("wav16k", np.zeros(t, np.float32)))
    return wav


def build_gradio_app(infer):
    import gradio as gr

    def run(wav, blink_mode, temperature, lle_percent, mouth_amp, t_thresh, drv_pose):
        inp = {
            "drv_aud": wav, "blink_mode": blink_mode, "temperature": temperature,
            "lle_percent": lle_percent, "mouth_amp": mouth_amp,
            "T_thresh": t_thresh, "drv_pose": drv_pose, "out_name": "webui_out.mp4",
        }
        return infer.infer_once(inp)

    with gr.Blocks() as demo:
        wav = gr.Audio(type="filepath", label="driving audio")
        blink = gr.Radio(["period", "none"], value="period", label="blink mode")
        temp = gr.Slider(0.0, 1.0, 0.2, label="temperature")
        lle = gr.Slider(0.0, 1.0, 0.2, label="lle_percent")
        mouth = gr.Slider(0.0, 1.0, 0.4, label="mouth_amp")
        tt = gr.Slider(0.0, 0.1, 0.01, label="T_thresh")
        pose = gr.Textbox("nearest", label="drv_pose")
        btn = gr.Button("Generate")
        out = gr.Video()
        btn.click(run, [wav, blink, temp, lle, mouth, tt, pose], out)
    return demo


def serve(infer, host: str = "0.0.0.0", port: int = 7860):
    try:
        import gradio  # noqa: F401

        build_gradio_app(infer).launch(server_name=host, server_port=port)
        return
    except ImportError:
        pass

    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    lock = threading.Lock()

    class Handler(BaseHTTPRequestHandler):
        def do_GET(self):
            route = self.path.split("?")[0].rstrip("/")
            if (route == "/ws"
                    and "websocket" in self.headers.get("Upgrade", "").lower()):
                self._handle_ws()
                return
            if route == "/metrics":
                # serving observability: stream counts, pushed/dropped
                # frames, inter-frame emit cadence + socket push latency
                # histograms, realtime factor (docs/RUNBOOK.md)
                import json as _json

                from genefaceplusplus_tpu.inference.metrics import METRICS

                body = _json.dumps(METRICS.snapshot(), indent=1).encode()
                self.send_response(200)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
                return
            self.send_response(200)
            self.send_header("Content-Type", "text/html")
            self.end_headers()
            self.wfile.write(FORM.encode())

        def _handle_ws(self):
            """WebSocket frame push: the client upgrades, sends ONE text
            frame of JSON inp (server-side wav / features paths), and
            receives each rendered frame as a binary JPEG message, then a
            close frame. Lower per-frame overhead than the MJPEG endpoint
            and usable from browser JS (`new WebSocket(...)`) without
            multipart parsing."""
            import json as _json
            import struct as _struct

            # RFC 6455 requires an HTTP/1.1 status line; the handler's
            # default HTTP/1.0 makes browsers reject the upgrade
            self.protocol_version = "HTTP/1.1"
            key = self.headers.get("Sec-WebSocket-Key", "")
            self.send_response(101)
            self.send_header("Upgrade", "websocket")
            self.send_header("Connection", "Upgrade")
            self.send_header("Sec-WebSocket-Accept", _ws_accept_key(key))
            self.end_headers()
            # after the WS session the socket carries leftover WS bytes, not
            # HTTP — stop the HTTP/1.1 keep-alive loop from re-parsing them
            self.close_connection = True
            try:
                try:
                    opcode, payload = ws_recv(self.rfile)
                except WSMessageTooBig:
                    ws_send(self.wfile,
                            _struct.pack(">H", 1009) + b"message too big",
                            opcode=0x8)
                    return
                if opcode != 0x1:  # expected the JSON text frame
                    ws_send(self.wfile, b"", opcode=0x8)
                    return
                import cv2

                from genefaceplusplus_tpu.inference.metrics import instrumented
                from genefaceplusplus_tpu.inference.serving import (
                    ClientGone, FramePusher, stream_infer)

                inp = _json.loads(payload.decode())
                wav = _load_stream_audio(inp)
                if wav is None:
                    raise ValueError("inp needs 'drv_aud' or 'drv_aud_features'")
                # bounded-queue sender: a slow client drops frames (live
                # semantics) instead of stalling the renderer + serve lock
                pusher = FramePusher(
                    lambda jpg: ws_send(self.wfile, jpg, opcode=0x2),
                    maxsize=int(inp.get("push_queue_frames", 16)))
                try:
                    with lock:
                        for frame in instrumented(stream_infer(infer, wav, inp)):
                            ok, jpg = cv2.imencode(
                                ".jpg", cv2.cvtColor(frame, cv2.COLOR_RGB2BGR))
                            if ok:
                                pusher.push(jpg.tobytes())
                except ClientGone:
                    return  # client went away mid-stream; nothing to tell it
                finally:
                    pusher.close()
            except Exception as e:  # tell the client before closing
                try:
                    ws_send(self.wfile, f"error: {e}".encode(), opcode=0x1)
                except OSError:
                    return
            finally:
                self.close_connection = True
            try:
                ws_send(self.wfile, b"", opcode=0x8)
            except OSError:
                pass

        def do_POST(self):
            import cgi

            form = cgi.FieldStorage(fp=self.rfile, headers=self.headers,
                                    environ={"REQUEST_METHOD": "POST",
                                             "CONTENT_TYPE": self.headers["Content-Type"]})
            inp = {"out_name": "/tmp/webui_out.mp4"}
            for k in ("blink_mode", "temperature", "lle_percent", "mouth_amp", "T_thresh", "drv_pose"):
                if form.getvalue(k):
                    v = form.getvalue(k)
                    inp[k] = float(v) if k not in ("blink_mode", "drv_pose") else v
            for field, key in (("wav", "drv_aud"), ("feats", "drv_aud_features")):
                item = form[field] if field in form else None
                if item is not None and getattr(item, "filename", ""):
                    path = os.path.join("/tmp", os.path.basename(item.filename))
                    with open(path, "wb") as f:
                        f.write(item.file.read())
                    inp[key] = path

            if self.path.rstrip("/") == "/stream":
                # live MJPEG (multipart/x-mixed-replace): frames push to the
                # browser as the pipelined renderer emits them — video
                # starts after the first audio chunk, not the whole clip
                import cv2

                from genefaceplusplus_tpu.inference.metrics import instrumented
                from genefaceplusplus_tpu.inference.serving import (
                    ClientGone, FramePusher, stream_infer)

                wav = _load_stream_audio(inp)
                self.send_response(200)
                self.send_header("Content-Type",
                                 "multipart/x-mixed-replace; boundary=frame")
                self.end_headers()

                def send_part(jpg: bytes) -> None:
                    self.wfile.write(b"--frame\r\nContent-Type: image/jpeg\r\n\r\n")
                    self.wfile.write(jpg)
                    self.wfile.write(b"\r\n")

                pusher = FramePusher(
                    send_part, maxsize=int(inp.get("push_queue_frames", 16)))
                try:
                    with lock:
                        for frame in instrumented(stream_infer(infer, wav, inp)):
                            ok, jpg = cv2.imencode(
                                ".jpg", cv2.cvtColor(frame, cv2.COLOR_RGB2BGR))
                            if ok:
                                pusher.push(jpg.tobytes())
                except ClientGone:
                    pass  # browser closed the MJPEG tab mid-stream
                finally:
                    pusher.close()
                return

            with lock:
                out_path = infer.infer_once(inp)
            self.send_response(200)
            self.send_header("Content-Type", "video/mp4")
            self.end_headers()
            with open(out_path, "rb") as f:
                self.wfile.write(f.read())

        def log_message(self, *a):
            pass

    print(f"| serving on http://{host}:{port}")
    # threaded: a long-running /stream or /ws push must not block other
    # clients (renders still serialise on `lock`; form GETs stay live)
    ThreadingHTTPServer((host, port), Handler).serve_forever()


def main(argv=None):
    from genefaceplusplus_tpu.inference.cli import build_parser, make_infer_mesh
    from genefaceplusplus_tpu.inference.pipeline import GeneFaceInfer

    p = build_parser()
    p.add_argument("--port", type=int, default=7860)
    args = p.parse_args(argv)
    infer = GeneFaceInfer(
        audio2secc_dir=args.a2m_ckpt or None,
        head_model_dir=args.head_ckpt or None,
        torso_model_dir=args.torso_ckpt or None,
        mesh=make_infer_mesh(args.n_devices),
    )
    serve(infer, port=args.port)


if __name__ == "__main__":
    main()

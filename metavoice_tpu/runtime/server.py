"""HTTP serving: POST /tts + GET /health, matching the reference API surface.

The reference uses FastAPI + uvicorn (serving.py:54-151: multipart form with
``text``, ``speaker_ref_path`` or uploaded ``audiodata``, ``guidance`` in
[0,5], ``top_p`` in [0,1]; wav bytes response; a single global TTS built at
startup; all requests serialized). FastAPI isn't available here, so the
server is a dependency-free stdlib ``ThreadingHTTPServer`` with a hand-rolled
multipart parser; synthesis is serialized through a lock around the one
compiled engine, same effective behavior as the reference's single worker.

Endpoints:
  GET  /health            -> {"status": "ok"}  (serving.py:54-56)
  POST /tts               -> audio/wav bytes   (serving.py:59-109)
       fields: text (required), speaker_ref_path | audiodata (one required),
               guidance (default 3.0, clamped to [0,5]),
               top_p (default 0.95, clamped to [0,1]),
               temperature (default 1.0)
       content types: multipart/form-data, application/x-www-form-urlencoded,
               or application/json
"""

from __future__ import annotations

import io
import json
import os
import re
import tempfile
import threading
import urllib.parse
from dataclasses import dataclass
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer


@dataclass
class ServingConfig:
    """Mirrors reference ServingConfig (serving.py:29-42)."""

    host: str = "0.0.0.0"
    port: int = 58003
    seed: int = 1337
    output_dir: str = "outputs"


def _parse_multipart(body: bytes, content_type: str) -> dict[str, bytes | str]:
    m = re.search(r"boundary=([^;]+)", content_type)
    if not m:
        raise ValueError("multipart body without boundary")
    boundary = m.group(1).strip('"').encode()
    fields: dict[str, bytes | str] = {}
    for part in body.split(b"--" + boundary):
        part = part.strip(b"\r\n")
        if not part or part == b"--":
            continue
        if b"\r\n\r\n" not in part:
            continue
        header_blob, content = part.split(b"\r\n\r\n", 1)
        headers = header_blob.decode("utf-8", errors="replace")
        name_m = re.search(r'name="([^"]+)"', headers)
        if not name_m:
            continue
        name = name_m.group(1)
        is_file = 'filename="' in headers
        fields[name] = content if is_file else content.decode("utf-8", errors="replace")
    return fields


def _parse_request_fields(handler: BaseHTTPRequestHandler) -> dict:
    length = int(handler.headers.get("Content-Length", 0))
    body = handler.rfile.read(length) if length else b""
    ctype = handler.headers.get("Content-Type", "")
    if ctype.startswith("multipart/form-data"):
        return _parse_multipart(body, ctype)
    if ctype.startswith("application/json"):
        return json.loads(body.decode("utf-8") or "{}")
    if ctype.startswith("application/x-www-form-urlencoded"):
        return {k: v[0] for k, v in urllib.parse.parse_qs(body.decode()).items()}
    raise ValueError(f"unsupported content type: {ctype}")


_INDEX_HTML = """<!doctype html>
<html><head><title>metavoice-tpu</title></head>
<body style="font-family:sans-serif;max-width:640px;margin:2em auto">
<h2>metavoice-tpu — text to speech</h2>
<p>Zero-shot voice cloning; speaker reference must be &ge; 30 s of audio.
(Equivalent of the reference's Gradio app, app.py.)</p>
<form method="post" action="/tts" enctype="multipart/form-data">
  <p><textarea name="text" rows="4" cols="60" maxlength="220"
      placeholder="Up to 220 characters per request..."></textarea></p>
  <p>Speaker reference (wav): <input type="file" name="audiodata"></p>
  <p>top_p <input name="top_p" value="0.95" size="5">
     guidance <input name="guidance" value="3.0" size="5"></p>
  <p><button type="submit">Synthesise</button></p>
</form></body></html>"""


def make_handler(tts, config: ServingConfig, batching_engine=None):
    """Build the request handler bound to one TTS engine instance.

    With ``batching_engine`` (runtime/engine.BatchingEngine), concurrent
    requests share batched first-stage decodes instead of serializing.
    """
    lock = threading.Lock()  # serialize synthesis on the single engine

    class Handler(BaseHTTPRequestHandler):
        server_version = "metavoice-tpu/0.1"

        def log_message(self, fmt, *args):  # quieter default logging
            pass

        def _send(self, code: int, payload: bytes, ctype: str):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(payload)))
            self.send_header("Access-Control-Allow-Origin", "*")
            self.end_headers()
            self.wfile.write(payload)

        def _json(self, code: int, obj: dict):
            self._send(code, json.dumps(obj).encode(), "application/json")

        def do_GET(self):
            if self.path == "/health":
                self._json(200, {"status": "ok"})
            elif self.path in ("/", "/index.html"):
                self._send(200, _INDEX_HTML.encode(), "text/html")
            else:
                self._json(404, {"detail": "not found"})

        def do_POST(self):
            if self.path != "/tts":
                self._json(404, {"detail": "not found"})
                return
            tmp_upload = None
            try:
                fields = _parse_request_fields(self)
                text = fields.get("text")
                if not text or not isinstance(text, str):
                    self._json(400, {"detail": "field 'text' is required"})
                    return
                ref_path = fields.get("speaker_ref_path")
                audiodata = fields.get("audiodata")
                # exactly one speaker source (serving.py:67-72)
                if (ref_path is None) == (audiodata is None):
                    self._json(
                        400,
                        {"detail": "provide exactly one of speaker_ref_path | audiodata"},
                    )
                    return
                if audiodata is not None:
                    fd, tmp_upload = tempfile.mkstemp(suffix=".wav")
                    with os.fdopen(fd, "wb") as f:
                        f.write(audiodata if isinstance(audiodata, bytes) else audiodata.encode())
                    ref_path = tmp_upload

                guidance = min(max(float(fields.get("guidance", 3.0)), 0.0), 5.0)
                top_p = min(max(float(fields.get("top_p", 0.95)), 0.0), 1.0)
                temperature = float(fields.get("temperature", 1.0))

                if batching_engine is not None:
                    wav_path = batching_engine.submit(
                        str(text),
                        str(ref_path),
                        top_p=top_p,
                        guidance_scale=guidance,
                        temperature=temperature,
                    ).result()
                else:
                    with lock:
                        wav_path = tts.synthesise(
                            str(text),
                            str(ref_path),
                            top_p=top_p,
                            guidance_scale=guidance,
                            temperature=temperature,
                        )
                with open(wav_path, "rb") as f:
                    self._send(200, f.read(), "audio/wav")
            except ValueError as e:
                self._json(400, {"detail": str(e)})
            except Exception as e:  # parity: 500 on engine errors (serving.py:98-106)
                self._json(500, {"detail": f"synthesis failed: {e}"})
            finally:
                if tmp_upload and os.path.exists(tmp_upload):
                    os.unlink(tmp_upload)

    return Handler


def serve(tts, config: ServingConfig | None = None) -> ThreadingHTTPServer:
    """Start the server (non-blocking; returns the server object)."""
    config = config or ServingConfig()
    httpd = ThreadingHTTPServer((config.host, config.port), make_handler(tts, config))
    thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    thread.start()
    return httpd


def main():
    import argparse

    from metavoice_tpu.runtime.tts import TTS

    ap = argparse.ArgumentParser(description="metavoice-tpu TTS server")
    ap.add_argument("--host", default="0.0.0.0")
    ap.add_argument("--port", type=int, default=58003)
    ap.add_argument("--first_stage_path")
    ap.add_argument("--second_stage_path")
    ap.add_argument("--speaker_encoder_path")
    ap.add_argument("--random_weights", action="store_true", help="dev mode")
    ap.add_argument("--small", action="store_true", help="small dev models")
    args = ap.parse_args()

    if args.random_weights or not args.first_stage_path:
        tts = TTS.from_random(small=args.small)
    else:
        tts = TTS.from_checkpoints(
            args.first_stage_path, args.second_stage_path, args.speaker_encoder_path
        )
    cfg = ServingConfig(host=args.host, port=args.port)
    httpd = ThreadingHTTPServer((cfg.host, cfg.port), make_handler(tts, cfg))
    print(f"serving on {cfg.host}:{cfg.port}")
    httpd.serve_forever()


if __name__ == "__main__":
    main()

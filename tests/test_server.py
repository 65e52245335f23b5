"""HTTP serving tests: /health, /tts (json + multipart), validation errors."""

import json
import threading
import urllib.request
import urllib.error

import jax
import numpy as np
import pytest

from metavoice_tpu.runtime.server import ServingConfig, make_handler
from metavoice_tpu.runtime.tts import TTS
from metavoice_tpu.utils import audio_io as aio
from http.server import ThreadingHTTPServer


@pytest.fixture(scope="module")
def ref_wav(tmp_path_factory):
    sr = 16000
    t = np.arange(31 * sr) / sr
    wav = (0.3 * np.sin(2 * np.pi * 180 * t)).astype(np.float32)
    path = str(tmp_path_factory.mktemp("refs") / "ref.wav")
    aio.write_wav(path, wav, sr)
    return path


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("outputs"))
    tts = TTS.from_random(jax.random.PRNGKey(0), small=True, output_dir=out)
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(tts, ServingConfig()))
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    yield f"http://127.0.0.1:{httpd.server_address[1]}"
    httpd.shutdown()


def _post_json(url, payload):
    req = urllib.request.Request(
        url,
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
        method="POST",
    )
    return urllib.request.urlopen(req, timeout=300)


def test_health(server):
    with urllib.request.urlopen(server + "/health", timeout=30) as r:
        assert json.loads(r.read()) == {"status": "ok"}


def test_tts_json(server, ref_wav):
    with _post_json(
        server + "/tts",
        {"text": "Hello from the server.", "speaker_ref_path": ref_wav},
    ) as r:
        assert r.headers["Content-Type"] == "audio/wav"
        body = r.read()
    assert body[:4] == b"RIFF"
    assert len(body) > 1000


def test_tts_multipart_upload(server, ref_wav):
    with open(ref_wav, "rb") as f:
        audio = f.read()
    boundary = "testboundary123"
    parts = []
    parts.append(
        f'--{boundary}\r\nContent-Disposition: form-data; name="text"\r\n\r\nHi there.\r\n'.encode()
    )
    parts.append(
        f'--{boundary}\r\nContent-Disposition: form-data; name="audiodata"; filename="ref.wav"\r\n'
        f"Content-Type: audio/wav\r\n\r\n".encode()
        + audio
        + b"\r\n"
    )
    parts.append(f"--{boundary}--\r\n".encode())
    body = b"".join(parts)
    req = urllib.request.Request(
        server + "/tts",
        data=body,
        headers={"Content-Type": f"multipart/form-data; boundary={boundary}"},
        method="POST",
    )
    with urllib.request.urlopen(req, timeout=300) as r:
        assert r.read()[:4] == b"RIFF"


def test_tts_missing_text(server, ref_wav):
    with pytest.raises(urllib.error.HTTPError) as exc:
        _post_json(server + "/tts", {"speaker_ref_path": ref_wav})
    assert exc.value.code == 400


def test_tts_both_speaker_sources_rejected(server, ref_wav):
    with pytest.raises(urllib.error.HTTPError) as exc:
        _post_json(server + "/tts", {"text": "hi"})
    assert exc.value.code == 400


def test_unknown_route(server):
    with pytest.raises(urllib.error.HTTPError) as exc:
        urllib.request.urlopen(server + "/nope", timeout=30)
    assert exc.value.code == 404

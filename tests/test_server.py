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


def test_serve_cli_graceful_shutdown(tmp_path):
    """SIGTERM on the serve CLI drains and exits cleanly (rc 0)."""
    import signal
    import socket
    import subprocess
    import sys
    import time

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    import os

    env = dict(os.environ, JAX_PLATFORMS="cpu")
    # the axon TPU plugin (registered by sitecustomize when this var is set)
    # blocks JAX init in NEW processes whenever another client holds the
    # tunnel session — even under JAX_PLATFORMS=cpu. Strip it so this
    # CPU-only subprocess starts hermetically regardless of chip activity.
    env.pop("PALLAS_AXON_POOL_IPS", None)
    proc = subprocess.Popen(
        [sys.executable, "-m", "metavoice_tpu.cli", "serve", "--random_weights",
         "--small", "--no_warmup", "--host", "127.0.0.1", "--port", str(port)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env,
    )
    try:
        deadline = time.time() + 240
        while time.time() < deadline:
            try:
                with urllib.request.urlopen(
                    f"http://127.0.0.1:{port}/health", timeout=5
                ) as r:
                    assert json.loads(r.read())["status"] == "ok"
                break
            except Exception:
                time.sleep(1.0)
        else:
            raise AssertionError("server never became healthy")
        proc.send_signal(signal.SIGTERM)
        out, _ = proc.communicate(timeout=60)
    finally:
        if proc.poll() is None:
            proc.kill()
    assert proc.returncode == 0, out
    assert "server stopped" in out


def test_tts_streaming(server, ref_wav):
    """stream=true: live WAV (0xFFFFFFFF RIFF sizes), PCM arrives in pieces."""
    with _post_json(
        server + "/tts",
        {"text": "Hello streaming.", "speaker_ref_path": ref_wav, "stream": "true"},
    ) as r:
        assert r.headers["Content-Type"] == "audio/wav"
        assert r.headers.get("Content-Length") is None
        header = r.read(44)
        assert header[:4] == b"RIFF" and header[8:12] == b"WAVE"
        assert header[4:8] == b"\xff\xff\xff\xff"  # live-stream size
        pcm = r.read()
    assert len(pcm) > 2000 and len(pcm) % 2 == 0
    wav = np.frombuffer(pcm, dtype="<i2").astype(np.float32) / 32768.0
    assert np.isfinite(wav).all()


def test_streaming_client_disconnect_is_contained(server, ref_wav):
    """A client that drops mid-stream must not crash the handler, splice a
    JSON error into the audio, or count as a synthesis error."""
    import http.client
    import time as _time
    import urllib.parse

    host = urllib.parse.urlparse(server).netloc
    with urllib.request.urlopen(server + "/metrics", timeout=30) as r:
        errors_before = [
            line for line in r.read().decode().splitlines()
            if line.startswith("tts_errors_total")
        ][0]

    conn = http.client.HTTPConnection(host, timeout=300)
    body = json.dumps(
        {"text": "Disconnect test.", "speaker_ref_path": ref_wav, "stream": "1"}
    )
    conn.request("POST", "/tts", body=body, headers={"Content-Type": "application/json"})
    resp = conn.getresponse()
    assert resp.status == 200
    resp.read(44)  # just the header, then hang up mid-stream
    conn.close()
    _time.sleep(1.0)

    # server is still healthy and the disconnect did not count as an error.
    # A follow-up synthesis serializes behind the disconnected handler via
    # the engine lock — draining it so its metrics don't land mid-window in
    # later tests.
    with urllib.request.urlopen(server + "/health", timeout=30) as r:
        assert json.loads(r.read())["status"] == "ok"
    with _post_json(
        server + "/tts",
        {"text": "After disconnect.", "speaker_ref_path": ref_wav},
    ) as r:
        assert r.read()[:4] == b"RIFF"
    with urllib.request.urlopen(server + "/metrics", timeout=60) as r:
        errors_after = [
            line for line in r.read().decode().splitlines()
            if line.startswith("tts_errors_total")
        ][0]
    assert errors_after == errors_before


def test_metrics_counts_requests(server, ref_wav):
    def scrape():
        with urllib.request.urlopen(server + "/metrics", timeout=30) as r:
            assert r.headers["Content-Type"].startswith("text/plain")
            text = r.read().decode()
        return {
            line.split()[0]: float(line.split()[1])
            for line in text.splitlines()
            if line and not line.startswith("#")
        }

    before = scrape()
    with _post_json(
        server + "/tts",
        {"text": "Metrics test.", "speaker_ref_path": ref_wav},
    ) as r:
        r.read()
    after = scrape()
    assert after["tts_requests_total"] == before["tts_requests_total"] + 1
    assert after["tts_audio_seconds_total"] > before["tts_audio_seconds_total"]
    assert after["tts_wall_seconds_total"] > before["tts_wall_seconds_total"]
    # streaming requests are counted separately
    with _post_json(
        server + "/tts",
        {"text": "Metrics stream.", "speaker_ref_path": ref_wav, "stream": "1"},
    ) as r:
        r.read()
    final = scrape()
    assert (
        final["tts_streaming_requests_total"]
        == after["tts_streaming_requests_total"] + 1
    )
    assert final["tts_errors_total"] == after["tts_errors_total"]


def _post_multipart_upload(server, data: bytes, text="Upload test."):
    boundary = "testboundary42"
    body = (
        f'--{boundary}\r\nContent-Disposition: form-data; name="text"\r\n\r\n{text}\r\n'
        f'--{boundary}\r\nContent-Disposition: form-data; name="audiodata"; filename="ref.bin"\r\n'
        f"Content-Type: application/octet-stream\r\n\r\n"
    ).encode() + data + f"\r\n--{boundary}--\r\n".encode()
    req = urllib.request.Request(
        server + "/tts",
        data=body,
        headers={"Content-Type": f"multipart/form-data; boundary={boundary}"},
        method="POST",
    )
    return urllib.request.urlopen(req, timeout=300)


def test_non_wav_upload_rejected_cleanly(server):
    """Without ffmpeg an mp3-ish upload must 400 with a clear message, not
    crash mid-synthesis (reference transcodes via ffmpeg, serving.py:112-123)."""
    import shutil

    if shutil.which("ffmpeg"):
        pytest.skip("ffmpeg present; non-wav uploads are transcoded instead")
    fake_mp3 = b"ID3\x04\x00" + b"\x00" * 2048
    with pytest.raises(urllib.error.HTTPError) as e:
        _post_multipart_upload(server, fake_mp3)
    assert e.value.code == 400
    assert b"wav" in e.value.read().lower()


def test_short_upload_duration_gated(server):
    """Uploads under 30 s are rejected (reference serving.py:79)."""
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(1); f.setsampwidth(2); f.setframerate(16000)
        f.writeframes(np.zeros(16000 * 5, np.int16).tobytes())  # 5 s
    with pytest.raises(urllib.error.HTTPError) as e:
        _post_multipart_upload(server, buf.getvalue())
    assert e.value.code == 400
    assert b"too short" in e.value.read()


def test_index_page_has_ui_parity_controls(server):
    """The web page ships the reference app's knobs (app.py:21-62): preset
    voices, stability/similarity sliders with denormalization, upload checks."""
    html = urllib.request.urlopen(server + "/", timeout=30).read().decode()
    for preset in ("Bria", "Alex", "Jacob"):
        assert preset in html
    assert "denormTopP" in html and "denormGuidance" in html
    assert 'type="range"' in html
    assert "50 MB" in html or "50 * 1024" in html
    # streaming playback controls (beyond the reference app)
    assert 'id="stream"' in html and "streamPlay" in html and "AudioContext" in html


def test_disconnect_counter_exposed(server):
    """Partial streams are tracked separately from successful requests."""
    with urllib.request.urlopen(server + "/metrics", timeout=30) as r:
        text = r.read().decode()
    assert "tts_client_disconnects_total" in text


def test_streaming_segment_params(server, ref_wav):
    """segment_tokens / first_segment_tokens ride /tts to the streamer
    (values outside [20,600] / [10,segment] are clamped, not errors)."""
    with _post_json(
        server + "/tts",
        {
            "text": "Segment parameter test.",
            "speaker_ref_path": ref_wav,
            "stream": "1",
            "segment_tokens": 60,
            "first_segment_tokens": 20,
        },
    ) as r:
        assert r.headers["Content-Type"] == "audio/wav"
        pcm = r.read()
    assert pcm[:4] == b"RIFF" and len(pcm) > 44

    # degenerate values clamp instead of crashing
    with _post_json(
        server + "/tts",
        {
            "text": "Clamped segments.",
            "speaker_ref_path": ref_wav,
            "stream": "1",
            "segment_tokens": 1,
            "first_segment_tokens": 0,
        },
    ) as r:
        assert r.read()[:4] == b"RIFF"

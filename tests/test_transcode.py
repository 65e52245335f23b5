"""Upload transcoding with the reference's 2-minute cap (serving.py:112-123)."""

import io
import wave

import numpy as np
import pytest

from metavoice_tpu.utils import audio_io as aio


def _wav_bytes(seconds: float, sr: int = 8000) -> bytes:
    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(1); f.setsampwidth(2); f.setframerate(sr)
        t = np.arange(int(seconds * sr)) / sr
        f.writeframes((0.2 * np.sin(2 * np.pi * 100 * t) * 32767).astype(np.int16).tobytes())
    return buf.getvalue()


def test_wav_upload_roundtrip(tmp_path):
    out = str(tmp_path / "out.wav")
    aio.transcode_upload_to_wav(_wav_bytes(3.0), out)
    wav, sr = aio.read_wav(out)
    assert abs(len(wav) / sr - 3.0) < 0.05


def test_two_minute_cap(tmp_path):
    out = str(tmp_path / "out.wav")
    aio.transcode_upload_to_wav(_wav_bytes(150.0), out)  # 2.5 min in
    wav, sr = aio.read_wav(out)
    assert len(wav) / sr <= 120.0 + 0.1


def test_empty_upload_rejected(tmp_path):
    with pytest.raises(ValueError, match="empty"):
        aio.transcode_upload_to_wav(b"", str(tmp_path / "out.wav"))


def test_non_wav_without_ffmpeg(tmp_path):
    import shutil

    if shutil.which("ffmpeg"):
        pytest.skip("ffmpeg present")
    with pytest.raises(ValueError, match="wav"):
        aio.transcode_upload_to_wav(b"OggS" + b"\0" * 64, str(tmp_path / "out.wav"))


@pytest.fixture
def stub_ffmpeg(tmp_path, monkeypatch):
    """A PATH-visible `ffmpeg` that emulates `-t N -y -i IN -f wav OUT`.

    The image ships without ffmpeg by design; this exercises the subprocess
    branch of transcode_upload_to_wav (argument order, output discovery) so
    ffmpeg-present hosts aren't the first place it runs.
    """
    import os
    import stat
    import sys

    script = tmp_path / "ffmpeg"
    script.write_text(
        "#!%s\n"
        "import sys, wave, numpy as np\n"
        "args = sys.argv[1:]\n"
        "dur = float(args[args.index('-t') + 1])\n"
        "out = args[-1]\n"
        "assert args[args.index('-f') + 1] == 'wav'\n"
        "sr = 16000\n"
        "n = int(min(dur, 45.0) * sr)\n"
        "with wave.open(out, 'wb') as f:\n"
        "    f.setnchannels(1); f.setsampwidth(2); f.setframerate(sr)\n"
        "    f.writeframes(np.zeros(n, np.int16).tobytes())\n" % sys.executable
    )
    script.chmod(script.stat().st_mode | stat.S_IEXEC)
    monkeypatch.setenv("PATH", f"{tmp_path}{os.pathsep}{os.environ['PATH']}")
    return str(script)


def test_non_wav_with_ffmpeg_transcodes(tmp_path, stub_ffmpeg):
    """With ffmpeg on PATH, a non-WAV upload rides the transcode branch
    (reference serving.py:112-123) instead of the native-WAV fallback."""
    out = str(tmp_path / "out.wav")
    fake_mp3 = b"ID3\x04\x00" + b"\x00" * 2048
    assert aio.transcode_upload_to_wav(fake_mp3, out) == out
    wav, sr = aio.read_wav(out)
    assert sr == 16000 and len(wav) / sr > 30  # stub emits 45 s of silence


def test_ffmpeg_receives_duration_cap(tmp_path, stub_ffmpeg):
    """The 2-minute cap is passed to ffmpeg as `-t 120` (serving.py:118)."""
    out = str(tmp_path / "out.wav")
    aio.transcode_upload_to_wav(b"OggS" + b"\0" * 64, out, max_duration_s=2.0)
    wav, sr = aio.read_wav(out)
    assert abs(len(wav) / sr - 2.0) < 0.05  # stub honored -t

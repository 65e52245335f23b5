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

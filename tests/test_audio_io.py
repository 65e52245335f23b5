import numpy as np
import pytest

from metavoice_tpu.utils import audio_io as aio


def test_wav_roundtrip(tmp_path):
    sr = 24000
    wav = (0.5 * np.sin(2 * np.pi * 440 * np.arange(sr) / sr)).astype(np.float32)
    path = str(tmp_path / "tone.wav")
    aio.write_wav(path, wav, sr)
    out, sr2 = aio.read_wav(path)
    assert sr2 == sr
    np.testing.assert_allclose(out, wav, atol=1e-4)


def test_check_audio_file_gate(tmp_path):
    sr = 16000
    short = np.zeros(sr * 5, np.float32)
    path = str(tmp_path / "short.wav")
    aio.write_wav(path, short, sr)
    with pytest.raises(ValueError, match="too short"):
        aio.check_audio_file(path)
    long_path = str(tmp_path / "long.wav")
    aio.write_wav(long_path, np.zeros(sr * 31, np.float32), sr)
    aio.check_audio_file(long_path)  # no raise


def test_loudness_of_calibrated_sine():
    """A full-scale 1 kHz sine should measure ~ -3.0 LUFS per BS.1770
    (0 dBFS sine = -3.01 LKFS with K-weighting ~0 dB at 1 kHz)."""
    sr = 48000
    t = np.arange(sr * 3) / sr
    wav = np.sin(2 * np.pi * 997.0 * t)
    lufs = aio.measure_loudness_lufs(wav, sr)
    assert abs(lufs - (-3.01)) < 0.3


def test_normalize_loudness_hits_target():
    sr = 24000
    rng = np.random.default_rng(0)
    wav = rng.normal(size=sr * 2).astype(np.float32) * 0.01
    out = aio.normalize_loudness(wav, sr, target_lufs=-14.0)
    measured = aio.measure_loudness_lufs(out, sr)
    # either on-target or limited by clipping protection
    assert measured > aio.measure_loudness_lufs(wav, sr)
    assert np.abs(out).max() <= 0.991
    if np.abs(out).max() < 0.98:
        assert abs(measured - (-14.0)) < 0.5


def test_mono_downmix(tmp_path):
    import wave

    sr = 8000
    left = (np.ones(100) * 0.5 * 32767).astype("<i2")
    right = (np.ones(100) * -0.5 * 32767).astype("<i2")
    inter = np.empty(200, "<i2")
    inter[0::2], inter[1::2] = left, right
    path = str(tmp_path / "stereo.wav")
    with wave.open(path, "wb") as f:
        f.setnchannels(2)
        f.setsampwidth(2)
        f.setframerate(sr)
        f.writeframes(inter.tobytes())
    out, _ = aio.read_wav(path)
    np.testing.assert_allclose(out, 0.0, atol=1e-4)


def test_get_cached_file_local(tmp_path):
    p = str(tmp_path / "a.wav")
    aio.write_wav(p, np.zeros(100, np.float32), 8000)
    assert aio.get_cached_file(p) == p
    with pytest.raises(FileNotFoundError):
        aio.get_cached_file(str(tmp_path / "missing.wav"))


def test_get_cached_file_uri_cache_key(tmp_path, monkeypatch):
    """URI downloads go to an md5-keyed cache path; cache hits skip download."""
    calls = []

    def fake_retrieve(uri, dest):
        calls.append(uri)
        aio.write_wav(dest, np.zeros(100, np.float32), 8000)

    import urllib.request

    monkeypatch.setattr(urllib.request, "urlretrieve", fake_retrieve)
    uri = "http://example.test/voice.mp3"
    p1 = aio.get_cached_file(uri, cache_dir=str(tmp_path))
    p2 = aio.get_cached_file(uri, cache_dir=str(tmp_path))
    assert p1 == p2 and p1.endswith(".mp3") and len(calls) == 1


def test_wav_streaming_header_and_pcm16(tmp_path):
    """Live-stream header + PCM16 payload parse back as a normal WAV once
    the sizes are patched (the stream_client recipe)."""
    import struct

    from metavoice_tpu.utils.audio_io import (
        float_to_pcm16,
        read_wav,
        wav_streaming_header,
    )

    sr = 24000
    wav = (0.5 * np.sin(2 * np.pi * 440 * np.arange(2400) / sr)).astype(np.float32)
    header = wav_streaming_header(sr)
    assert len(header) == 44
    assert header[:4] == b"RIFF" and header[8:12] == b"WAVE"
    assert header[4:8] == b"\xff\xff\xff\xff" and header[40:44] == b"\xff\xff\xff\xff"
    pcm = float_to_pcm16(wav)
    assert len(pcm) == 2 * len(wav)

    body = header + pcm
    data_len = len(pcm)
    fixed = (
        body[:4] + struct.pack("<I", 36 + data_len) + body[8:40]
        + struct.pack("<I", data_len) + body[44:]
    )
    path = str(tmp_path / "stream.wav")
    with open(path, "wb") as f:
        f.write(fixed)
    out, out_sr = read_wav(path)
    assert out_sr == sr and len(out) == len(wav)
    np.testing.assert_allclose(out, wav, atol=1.0 / 16000)

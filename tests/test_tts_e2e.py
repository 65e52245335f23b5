"""End-to-end TTS pipeline smoke test with small random-weight models.

Exercises: text normalize -> BPE -> first-stage while_loop decode -> token
split -> second-stage completion -> EnCodec decode -> loudness-normalized
wav on disk. (Quality needs real weights; this validates the plumbing and
shapes across all five stages.)
"""

import os

import jax
import numpy as np
import pytest

from metavoice_tpu.runtime.tts import TTS
from metavoice_tpu.utils import audio_io as aio


@pytest.fixture(scope="module")
def tts(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("outputs"))
    return TTS.from_random(jax.random.PRNGKey(0), small=True, output_dir=out)


@pytest.fixture(scope="module")
def ref_wav(tmp_path_factory):
    """A >=30s synthetic 'speaker reference' (noise-modulated tone)."""
    sr = 16000
    rng = np.random.default_rng(0)
    t = np.arange(31 * sr) / sr
    wav = (0.3 * np.sin(2 * np.pi * 150 * t) * (1 + 0.5 * rng.normal(size=len(t)) * 0.1)).astype(np.float32)
    path = str(tmp_path_factory.mktemp("refs") / "ref.wav")
    aio.write_wav(path, wav, sr)
    return path


def test_synthesise_writes_wav(tts, ref_wav):
    out_path = tts.synthesise("Hello world.", ref_wav)
    assert os.path.exists(out_path)
    wav, sr = aio.read_wav(out_path)
    assert sr == tts.c.encodec_cfg.sample_rate
    assert len(wav) > 0
    assert np.isfinite(wav).all()
    assert np.abs(wav).max() <= 1.0


def test_speaker_embedding_cached(tts, ref_wav):
    e1 = tts._get_speaker_embedding(ref_wav)
    assert len(tts._emb_cache) == 1
    e2 = tts._get_speaker_embedding(ref_wav)
    assert e1 is e2  # cache hit returns the same object


def test_min_ref_duration_enforced(ref_wav, tmp_path):
    short = str(tmp_path / "short.wav")
    aio.write_wav(short, np.zeros(16000, np.float32), 16000)
    strict = TTS.from_random(
        jax.random.PRNGKey(1), small=True, output_dir=str(tmp_path),
        enforce_min_ref_duration=True,
    )
    with pytest.raises(ValueError, match="too short"):
        strict.synthesise("Hi.", short)


def test_quantised_tts_int8(tmp_path, ref_wav):
    """--quantisation_mode int8 parity: full pipeline with quantized stage 1.

    "int8" is the reference's mode name and now selects the packed
    int8-in-int32 serving format (2-byte-ceiling HBM reads)."""
    import jax as _jax

    t = TTS.from_random(
        _jax.random.PRNGKey(2), small=True, output_dir=str(tmp_path),
        quantisation_mode="int8",
    )
    w = t.c.first_stage_params["layers"]["wqkv"]
    assert isinstance(w, dict) and "p8" in w
    out = t.synthesise("Quantised hello.", ref_wav)
    assert os.path.exists(out)


def test_quantised_tts_int8_plain(tmp_path, ref_wav):
    """quantisation_mode='int8_plain': plain per-channel int8 arrays (the
    1-byte-DMA-ceiling layout, kept for experiments)."""
    import jax as _jax

    t = TTS.from_random(
        _jax.random.PRNGKey(2), small=True, output_dir=str(tmp_path),
        quantisation_mode="int8_plain",
    )
    w = t.c.first_stage_params["layers"]["wqkv"]
    assert isinstance(w, dict) and "q" in w
    out = t.synthesise("Plain int8 hello.", ref_wav)
    assert os.path.exists(out)


def test_invalid_quantisation_mode(tmp_path):
    import jax as _jax

    with pytest.raises(ValueError, match="Invalid quantisation mode"):
        TTS.from_random(
            _jax.random.PRNGKey(3), small=True, output_dir=str(tmp_path),
            quantisation_mode="int2",
        )


def test_fused_stage2_vocode_matches_two_call(tts, ref_wav):
    """The streaming fused stage2+vocoder jit produces the same waveform as
    the two-call path for the same key (one host round-trip saved, zero
    semantic change)."""
    import jax as _jax

    spk = tts._get_speaker_embedding(ref_wav)
    prompt = tts.c.tokenizer.encode("Fused parity.")
    # a plausible first-stage stream: text echo + interleaved audio + EOA
    h0 = list(range(10))
    h1 = [900 + i for i in range(10)]
    stream = [t for pair in zip(h0, [v + 1024 for v in h1]) for t in pair]
    stream = np.asarray(stream + [2048], np.int32)
    key = _jax.random.PRNGKey(42)

    fused = tts._tokens_to_wav("x", prompt, stream, spk, key, fused=True)
    plain = tts._tokens_to_wav("x", prompt, stream, spk, key, fused=False)
    assert fused.shape == plain.shape
    np.testing.assert_allclose(fused, plain, atol=2e-3)


def test_int8_kv_cache_tts(tmp_path, ref_wav):
    """kv_cache_dtype='int8' rides the constructor down to the cache buffer
    and the full pipeline still synthesises."""
    import jax as _jax
    import jax.numpy as _jnp

    t = TTS.from_random(
        _jax.random.PRNGKey(4), small=True, output_dir=str(tmp_path),
        kv_cache_dtype="int8",
    )
    assert t._kv_cache.quantized and t._kv_cache.k.dtype == _jnp.int8
    out = t.synthesise("Quantised cache hello.", ref_wav)
    assert os.path.exists(out)


def test_invalid_kv_cache_dtype(tmp_path):
    import jax as _jax

    with pytest.raises(ValueError, match="Invalid kv_cache_dtype"):
        TTS.from_random(
            _jax.random.PRNGKey(5), small=True, output_dir=str(tmp_path),
            kv_cache_dtype="fp8",
        )


def test_streaming_synthesis(tts, ref_wav):
    """Streaming yields >=1 chunks of finite 24 kHz audio."""
    chunks = list(
        tts.synthesise_streaming("Streaming hello world.", ref_wav, segment_tokens=20)
    )
    assert len(chunks) >= 1
    for c in chunks:
        assert c.ndim == 1 and len(c) > 0
        assert np.isfinite(c).all()
    # each segment of n pairs renders n//2 frames * hop samples
    hop = tts.c.encodec_cfg.hop_length
    assert all(len(c) % hop == 0 for c in chunks)


def test_mbd_vocoder_path(tmp_path, ref_wav):
    """vocoder='mbd' routes synthesis through the diffusion vocoder."""
    import jax as _jax

    t = TTS.from_random(
        _jax.random.PRNGKey(4), small=True, vocoder="mbd", output_dir=str(tmp_path)
    )
    assert t.c.vocoder == "mbd" and t.c.mbd_params is not None
    out = t.synthesise("Diffusion vocoder hello.", ref_wav)
    assert os.path.exists(out)
    wav, sr = aio.read_wav(out)
    assert len(wav) > 0 and np.isfinite(wav).all()


def test_warmup_runs(tts):
    """warmup precompiles the hot programs without error."""
    tts.warmup(prompt_buckets=(32,))


def test_telemetry_user_ran_tts_event(tmp_path, ref_wav):
    """synthesise must emit a user_ran_tts event with the reference's
    property set (fast_inference.py:173-193) into the JSONL spool."""
    import json

    from metavoice_tpu.telemetry import TelemetryClient

    spool = str(tmp_path / "tele")
    client = TelemetryClient(spool_dir=spool, enabled=True)
    t = TTS.from_random(
        jax.random.PRNGKey(0), small=True, output_dir=str(tmp_path / "out"),
        telemetry_client=client, telemetry_origin="pytest",
    )
    t.synthesise("Telemetry check.", ref_wav)
    records = [
        json.loads(line)
        for line in open(f"{spool}/telemetry.jsonl")
    ]
    events = [r for r in records if r["event"] == "user_ran_tts"]
    assert len(events) == 1
    props = events[0]["properties"]
    assert props["text"] == "Telemetry check."
    assert props["telemetry_origin"] == "pytest"
    assert props["real_time_factor"] > 0
    assert "distinct_id" in events[0]


def test_telemetry_disabled_under_pytest_by_default(tmp_path, ref_wav):
    from metavoice_tpu.telemetry import TelemetryClient

    client = TelemetryClient(spool_dir=str(tmp_path / "tele2"))
    assert not client.enabled  # auto-disable under pytest


def test_emb_cache_lru_bounded(tts, tmp_path):
    """The speaker-embedding cache is LRU-bounded for long-lived servers."""
    tts._emb_cache.clear()
    tts._emb_cache_max = 2
    paths = []
    for i in range(3):
        p = str(tmp_path / f"spk{i}.wav")
        rng = np.random.default_rng(i)
        aio.write_wav(p, rng.standard_normal(16000 * 31).astype(np.float32) * 0.1, 16000)
        paths.append(p)
        tts._get_speaker_embedding(p)
    assert len(tts._emb_cache) == 2
    # oldest entry was evicted; newest two are hits
    e2 = tts._get_speaker_embedding(paths[2])
    assert tts._get_speaker_embedding(paths[2]) is e2
    tts._emb_cache_max = 256


def test_get_tokens_roundtrip(tts, ref_wav):
    """TTS.get_tokens EnCodec-tokenizes audio (reference decoders.py:49-64)."""
    codes = tts.get_tokens(ref_wav)
    n_q = tts.c.encodec_cfg.n_q
    assert len(codes) == n_q
    t = len(codes[0])
    assert t > 0 and all(len(row) == t for row in codes)
    flat = [c for row in codes for c in row]
    assert all(0 <= c < tts.c.encodec_cfg.codebook_size for c in flat)


def test_min_output_duration_guard(tmp_path, ref_wav):
    """MBD output under 400 ms is rejected (reference decoders.py:88-91)."""
    import jax as _jax

    t = TTS.from_random(
        _jax.random.PRNGKey(7), small=True, vocoder="mbd",
        output_dir=str(tmp_path), enforce_min_output_duration=True,
    )
    spk = t._get_speaker_embedding(ref_wav)
    prompt = t.c.tokenizer.encode("Too short.")
    # a 10-frame stream -> 3200 samples @24 kHz, far under the 9600 gate
    h0 = list(range(10))
    stream = np.asarray(
        [v for pair in zip(h0, [i + 1024 for i in h0]) for v in pair] + [2048],
        np.int32,
    )
    with pytest.raises(RuntimeError, match="400ms"):
        t._tokens_to_wav("x", prompt, stream, spk, _jax.random.PRNGKey(0))
    # the same stream passes with the guard off (from_random default)
    t2 = TTS.from_random(
        _jax.random.PRNGKey(7), small=True, vocoder="mbd", output_dir=str(tmp_path)
    )
    wav = t2._tokens_to_wav("x", prompt, stream, spk, _jax.random.PRNGKey(0))
    assert wav.shape[-1] > 0


def test_quantised_tts_int8_packed(tmp_path, ref_wav):
    """quantisation_mode='int8_packed': int8 weights in i32 words (2-byte-
    ceiling HBM reads through the stack kernel on TPU; reference path on
    CPU). Full pipeline must run."""
    import jax as _jax

    t = TTS.from_random(
        _jax.random.PRNGKey(6), small=True, output_dir=str(tmp_path),
        quantisation_mode="int8_packed",
    )
    w = t.c.first_stage_params["layers"]["wqkv"]
    assert isinstance(w, dict) and "p8" in w and "sc8" in w
    out = t.synthesise("Packed int8 hello.", ref_wav)
    assert os.path.exists(out)

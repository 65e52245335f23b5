"""Continuous-batching engine: concurrent requests share batched decodes."""

import os
import threading

import jax
import numpy as np
import pytest

from metavoice_tpu.runtime.engine import BatchingEngine
from metavoice_tpu.runtime.tts import TTS
from metavoice_tpu.utils import audio_io as aio


@pytest.fixture(scope="module")
def ref_wav(tmp_path_factory):
    sr = 16000
    t = np.arange(31 * sr) / sr
    wav = (0.3 * np.sin(2 * np.pi * 200 * t)).astype(np.float32)
    path = str(tmp_path_factory.mktemp("refs") / "ref.wav")
    aio.write_wav(path, wav, sr)
    return path


@pytest.fixture(scope="module")
def engine(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("outputs"))
    tts = TTS.from_random(jax.random.PRNGKey(0), small=True, output_dir=out)
    eng = BatchingEngine(tts, max_batch=4, batch_window_s=0.2)
    yield eng
    eng.shutdown()


def test_concurrent_requests_complete(engine, ref_wav):
    texts = [f"Concurrent request number {i}." for i in range(4)]
    futures = [engine.submit(t, ref_wav) for t in texts]
    paths = [f.result(timeout=600) for f in futures]
    assert len(set(paths)) == 4
    for p in paths:
        assert os.path.exists(p)
        wav, sr = aio.read_wav(p)
        assert len(wav) > 0 and np.isfinite(wav).all()


def test_single_request(engine, ref_wav):
    fut = engine.submit("Just one.", ref_wav)
    path = fut.result(timeout=600)
    assert os.path.exists(path)


def test_error_propagates_to_future(engine, ref_wav):
    with pytest.raises(ValueError):
        engine.submit("日本語テキスト", ref_wav).result(timeout=10)


def test_mixed_sampling_params_in_one_batch(engine, ref_wav):
    """Per-request temperature/top_p/guidance ride the same compiled batch
    as traced (B, 1) vectors — both requests must complete."""
    f1 = engine.submit("Mixed settings one.", ref_wav, temperature=0.7, top_p=0.9, guidance_scale=2.0)
    f2 = engine.submit("Mixed settings two.", ref_wav, temperature=1.3, top_p=0.99, guidance_scale=4.0)
    p1, p2 = f1.result(timeout=600), f2.result(timeout=600)
    assert os.path.exists(p1) and os.path.exists(p2) and p1 != p2

"""Continuous-batching engine with a GQA first stage (n_local_heads < n_head).

VERDICT r4 #2 asks GQA through the engine's shared cache: the KV cache and
the int8 scale tables carry n_local_heads rows, joins/merges key the scale
width on n_local_heads, and the public synthesise/engine surfaces must work
unchanged. CPU runs the XLA reference path (the Pallas routing is
chip-verified separately); the cache/table shapes and merge math are
identical either way.
"""

import os

import jax
import numpy as np
import pytest

from metavoice_tpu.runtime.engine import ContinuousBatchingEngine
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


@pytest.mark.parametrize("kv_dtype", [None, "int8"])
def test_engine_gqa_requests_complete(tmp_path, ref_wav, kv_dtype):
    tts = TTS.from_random(
        jax.random.PRNGKey(11), small=True, output_dir=str(tmp_path),
        first_stage_overrides={"n_local_heads": 2},
        kv_cache_dtype=kv_dtype,
    )
    assert tts.c.first_stage_cfg.n_local_heads == 2
    eng = ContinuousBatchingEngine(tts, slots=2, segment_tokens=8)
    try:
        # one in-group request + one mid-flight join (exercises the GQA
        # cache merge + int8 scale-table merge keyed on n_local_heads)
        f1 = eng.submit("GQA request one.", ref_wav, max_new_tokens=24)
        f2 = eng.submit("GQA request two joins later.", ref_wav, max_new_tokens=24)
        p1 = f1.result(timeout=600)
        p2 = f2.result(timeout=600)
        for p in (p1, p2):
            assert os.path.exists(p)
            wav, _sr = aio.read_wav(p)
            assert len(wav) > 0 and np.isfinite(wav).all()
    finally:
        eng.shutdown()

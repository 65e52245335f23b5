"""TTS runtime with tensor_parallel: the user-facing TP serving path.

End-to-end synthesise through the shard_map TP decode (small random models
on the virtual CPU mesh), plus the configuration guards: unsupported
quantisation modes and the single-device batching engine.
"""

import os

import jax
import numpy as np
import pytest

from metavoice_tpu.runtime.tts import TTS
from metavoice_tpu.utils import audio_io as aio

pytestmark = pytest.mark.skipif(
    jax.device_count() < 2, reason="needs >= 2 (virtual) devices"
)


@pytest.fixture(scope="module")
def ref_wav(tmp_path_factory):
    sr = 16000
    t = np.arange(31 * sr) / sr
    wav = (0.3 * np.sin(2 * np.pi * 150 * t)).astype(np.float32)
    path = str(tmp_path_factory.mktemp("refs") / "ref.wav")
    aio.write_wav(path, wav, sr)
    return path


@pytest.fixture(scope="module")
def tts_tp(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("outputs"))
    return TTS.from_random(
        jax.random.PRNGKey(0), small=True, output_dir=out, tensor_parallel=2
    )


def test_tp_synthesise_writes_wav(tts_tp, ref_wav):
    out_path = tts_tp.synthesise("Tensor parallel hello.", ref_wav)
    assert os.path.exists(out_path)
    wav, sr = aio.read_wav(out_path)
    assert sr == tts_tp.c.encodec_cfg.sample_rate
    assert len(wav) > 0 and np.isfinite(wav).all()
    # the first-stage params really are TP-sharded over the mesh
    w = tts_tp.c.first_stage_params["layers"]["wqkv"]
    assert w.sharding.shard_shape(w.shape)[-1] == w.shape[-1] // 2


def test_tp_streaming_segments(tts_tp, ref_wav):
    chunks = list(
        tts_tp.synthesise_streaming(
            "Stream me in parallel.", ref_wav, segment_tokens=16,
            first_segment_tokens=8,
        )
    )
    assert len(chunks) >= 1
    assert all(np.isfinite(c).all() for c in chunks)


def test_tp_rejects_unsupported_quant_mode(tmp_path):
    with pytest.raises(ValueError, match="not supported with"):
        TTS.from_random(
            jax.random.PRNGKey(0), small=True, output_dir=str(tmp_path),
            tensor_parallel=2, quantisation_mode="int8_plain",
        )


def test_engine_rejects_tp_instance(tts_tp):
    from metavoice_tpu.runtime.engine import ContinuousBatchingEngine

    with pytest.raises(ValueError, match="does not support tensor_parallel"):
        ContinuousBatchingEngine(tts_tp)

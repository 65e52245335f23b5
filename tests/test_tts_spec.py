"""Speculative decoding through the TTS surface.

With the target itself as the draft and greedy sampling, the speculative
path must produce the exact same audio as ordinary synthesis (tokens are
pinned identical by tests/test_spec_decode.py; this pins the TTS wiring:
key threading, stats ledger, constructor plumbing)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from metavoice_tpu.core.config import RuntimeConfig
from metavoice_tpu.runtime.tts import TTS
from metavoice_tpu.utils import audio_io as aio


@pytest.fixture(scope="module")
def ref_wav(tmp_path_factory):
    p = tmp_path_factory.mktemp("spec") / "ref.wav"
    sr = 16000
    t = np.arange(31 * sr) / sr
    aio.write_wav(str(p), (0.25 * np.sin(2 * np.pi * 180 * t)).astype(np.float32), sr)
    return str(p)


def _mk(tmp_path, tag, **kw):
    rt = RuntimeConfig(dtype="float32", output_dir=str(tmp_path / tag), seed=11)
    base = TTS.from_random(
        jax.random.PRNGKey(5), small=True, output_dir=str(tmp_path / tag),
        runtime=rt, **kw,
    )
    return base


def test_tts_self_draft_greedy_identical(tmp_path, ref_wav):
    plain = _mk(tmp_path, "plain")
    spec = TTS(
        plain.c,
        runtime=RuntimeConfig(dtype="float32", output_dir=str(tmp_path / "spec"), seed=11),
        output_dir=str(tmp_path / "spec"),
        enforce_min_ref_duration=False,
        enforce_min_output_duration=False,
        draft_params=plain.c.first_stage_params,
        draft_cfg=plain.c.first_stage_cfg,
        speculative_gamma=4,
    )
    kw = dict(temperature=1e-6, top_p=1.0, guidance_scale=3.0, max_new_tokens=48)
    p1 = plain.synthesise("Speculation must not change the audio.", ref_wav, **kw)
    p2 = spec.synthesise("Speculation must not change the audio.", ref_wav, **kw)
    w1, sr1 = aio.read_wav(p1)
    w2, sr2 = aio.read_wav(p2)
    assert sr1 == sr2
    np.testing.assert_array_equal(w1, w2)
    st = spec.spec_stats
    assert st["rounds"] >= 1
    assert st["accepted"] == st["proposed"], st
    assert st["emitted"] >= st["rounds"]
    assert plain.spec_stats["rounds"] == 0


def test_tts_draft_requires_cfg(tmp_path):
    with pytest.raises(ValueError, match="draft_cfg"):
        TTS.from_random(
            jax.random.PRNGKey(0), small=True, output_dir=str(tmp_path),
            draft_params={"x": jnp.zeros(())},
        )

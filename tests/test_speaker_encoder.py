"""Speaker-encoder pipeline tests (parity with torch LSTM is in
test_checkpoint_parity.py)."""

import jax
import numpy as np

from metavoice_tpu.models import speaker_encoder as se


def test_partial_slices_matches_reference_math():
    # 5 s at 16 kHz, rate 1.3, coverage 0.75 (reference model.py:60-83)
    wav_slices, mel_slices = se.compute_partial_slices(5 * 16000)
    assert len(wav_slices) == len(mel_slices)
    assert mel_slices[0] == slice(0, 160)
    # frame step = round((16000/1.3)/160) = 77
    assert mel_slices[1].start == 77
    # all windows are 160 frames
    assert all(s.stop - s.start == 160 for s in mel_slices)


def test_embed_utterance_shape_and_norm():
    params = se.init_params(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    wav = rng.normal(size=3 * 16000).astype(np.float32) * 0.1
    emb = se.embed_utterance(params, wav)
    assert emb.shape == (256,)
    np.testing.assert_allclose(np.linalg.norm(emb), 1.0, rtol=1e-5)
    assert (emb >= 0).sum() > 0  # post-ReLU mean stays non-negative


def test_trim_silence():
    sr = 16000
    sig = np.concatenate(
        [np.zeros(sr // 2), np.sin(2 * np.pi * 440 * np.arange(sr) / sr), np.zeros(sr // 2)]
    ).astype(np.float32)
    trimmed = se.trim_silence(sig)
    assert len(trimmed) < len(sig)
    assert len(trimmed) >= sr  # the tone survives
    assert np.abs(trimmed).max() > 0.9

"""Unit tests for token layout math — hand-computed vectors.

The reference has no tests for this (SURVEY.md section 4); behavior oracles
are fam/llm/preprocessing/audio_token_mode.py and fam/llm/adapters/*.
"""

import numpy as np
import pytest

from metavoice_tpu.core import tokens as T


def test_constants():
    assert T.END_OF_AUDIO_TOKEN == 2048
    assert T.TEXT_OFFSET == 2049
    assert T.FIRST_STAGE_VOCAB_SIZE == 2562
    assert T.HIERARCHY_EOA == 1024


def test_combine_flattened_interleaved():
    audio = np.array([[1, 2, 3], [4, 5, 6]])
    text = np.array([2050, 2051])
    out = T.combine_flattened_interleaved(audio, text)
    assert out.shape == (1, 8)
    np.testing.assert_array_equal(
        out[0], [2050, 2051, 1, 4 + 1024, 2, 5 + 1024, 3, 6 + 1024]
    )


def test_combine_requires_two_hierarchies():
    with pytest.raises(ValueError):
        T.combine_flattened_interleaved(np.array([[1, 2]]), np.array([2050]))


def test_combine_rejects_floats():
    with pytest.raises(TypeError):
        T.combine_flattened_interleaved(
            np.array([[1.0, 2.0], [3.0, 4.0]]), np.array([2050])
        )


def test_split_flattened_interleaved_roundtrip():
    audio = np.array([[7, 9, 11], [13, 15, 17]])
    text = np.array([2100, 2200, 2049 + 1537])  # last text id = EOT, dropped on split
    flat = T.combine_flattened_interleaved(audio, text)[0]
    # append end-of-audio token, as the sampler would emit
    flat = np.concatenate([flat, [T.END_OF_AUDIO_TOKEN]])
    text_ids, hierarchies = T.split_flattened_interleaved(flat)
    assert text_ids == [2100, 2200]
    np.testing.assert_array_equal(hierarchies[0], audio[0])
    np.testing.assert_array_equal(hierarchies[1], audio[1])


def test_split_truncates_unequal_hierarchies():
    # h0 has 3 ids, h1 has 2 (decode stopped mid-pair)
    stream = [10, 1024 + 20, 11, 1024 + 21, 12, T.END_OF_AUDIO_TOKEN, 2100, 2101]
    text_ids, (h0, h1) = T.split_flattened_interleaved(stream)
    assert h0 == [10, 11]
    assert h1 == [20, 21]
    assert text_ids == [2100]  # 2101 dropped as end-of-text


def test_split_tilted():
    tokens = [
        [2100, 2101, 5, 6, 1024],  # text + h0 + eoa/pad
        [1024, 1024, 7, 8, 1024],
    ]
    text_ids, hierarchies = T.split_tilted(tokens)
    assert text_ids == [2100]
    assert hierarchies == [[5, 6], [7, 8]]


def test_get_params_for_mode():
    p = T.get_params_for_mode("flattened_interleaved", num_max_audio_tokens_timesteps=1024)
    assert p.text_tokenisation_offset == 2049
    assert p.pad_token == 2048
    assert p.ctx_window == 2048
    assert p.second_hierarchy_flattening_offset == 1024


def test_pad_tokens():
    row = np.array([[1, 2, 3]])
    out = T.pad_tokens(row, ctx_window=5)
    assert out.shape == (1, 6)
    np.testing.assert_array_equal(out[0], [1, 2, 3, 2048, 2048, 2048])
    # truncation path
    long = np.arange(10)[None, :]
    out = T.pad_tokens(long, ctx_window=5)
    np.testing.assert_array_equal(out[0], [0, 1, 2, 3, 4, 5])


def test_build_second_stage_input():
    x = T.build_second_stage_input(
        text_tokens=[2100, 2101],
        coarse_hierarchies=[[1, 2, 3], [4, 5, 6]],
        ctx_window=10,
    )
    assert x.shape == (2, 10)
    np.testing.assert_array_equal(x[0], [2100, 2101, 1, 2, 3, 1024, 1024, 1024, 1024, 1024])
    np.testing.assert_array_equal(x[1], [1024, 1024, 4, 5, 6, 1024, 1024, 1024, 1024, 1024])


def test_build_second_stage_input_truncates_overflow():
    """Audio beyond ctx_window - len(text) is silently dropped — reference
    behavior (fam/llm/inference.py:279-301 truncates rows at the context
    window). This pins the overflow case for long chunks near the 220-char
    boundary (VERDICT weak #9)."""
    text = list(range(2049, 2049 + 6))  # 6 text tokens
    h0 = list(range(100, 100 + 10))  # 10 audio frames, only 4+... fit
    h1 = list(range(200, 200 + 10))
    ctx = 12
    out = T.build_second_stage_input(text, [h0, h1], ctx)
    assert out.shape == (2, ctx)
    # row 0: 6 text + first (ctx-6)=6 h0 codes, NO room for the pad sentinel
    np.testing.assert_array_equal(out[0], text + h0[:6])
    # row 1: 6 pads + first 6 h1 codes
    np.testing.assert_array_equal(out[1], [T.ENCODEC_PAD_TOKEN] * 6 + h1[:6])
    # dropped frames never appear
    assert 107 not in out[0] and 207 not in out[1]


def test_build_second_stage_input_exact_fit_keeps_pad_sentinel():
    text = [2049, 2050]
    h0, h1 = [1, 2, 3], [4, 5, 6]
    out = T.build_second_stage_input(text, [h0, h1], ctx_window=6)
    np.testing.assert_array_equal(out[0], [2049, 2050, 1, 2, 3, T.ENCODEC_PAD_TOKEN])
    np.testing.assert_array_equal(out[1], [T.ENCODEC_PAD_TOKEN] * 2 + [4, 5, 6, T.ENCODEC_PAD_TOKEN])

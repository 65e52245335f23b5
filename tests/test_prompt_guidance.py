"""Double (speaker + prompt) classifier-free guidance, the reference's 3-row
CFG batch (fam/llm/mixins/causal.py:89-105,229-262; guidance tuple default
(3.0, 1.0) at fam/llm/inference.py:646)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from metavoice_tpu.core.config import first_stage_config
from metavoice_tpu.models import first_stage as fs
from metavoice_tpu.models import transformer as tfm

# EOA=96, text ids 97..., eot 120 — a scaled-down copy of the real token space
TINY = first_stage_config(n_layer=2, n_head=4, dim=64, block_size=128, vocab_sizes=(121,))
EOA = 96
EOT = 120


@pytest.fixture(scope="module")
def params():
    return tfm.init_params(jax.random.PRNGKey(0), TINY)


def test_normalize_guidance():
    assert fs._normalize_guidance(3.0) == (3.0, 1.0, 2)
    assert fs._normalize_guidance((3.0, 1.0)) == (3.0, 1.0, 2)
    assert fs._normalize_guidance((3.0, 2.0)) == (3.0, 2.0, 3)
    assert fs._normalize_guidance(None) == (1.0, 1.0, 2)
    # a plain float rides the FAST path, which accepts the server's whole
    # [0, 5] clamp range (only the tuple/slow path asserts >= 1, reference
    # causal.py:90-92) — guidance=0.5 was valid before 3-row CFG landed
    assert fs._normalize_guidance(0.5) == (0.5, 1.0, 2)
    with pytest.raises(ValueError):
        fs._normalize_guidance((0.5, 1.0))
    with pytest.raises(ValueError):
        fs._normalize_guidance((0.5, 1.0))
    with pytest.raises(ValueError):
        fs._normalize_guidance((3.0, 0.9))


def test_uncond_prompt_rows_replaces_only_text():
    toks = jnp.asarray([[10, EOA, 97, 110, 50]], jnp.int32)
    out = np.asarray(fs._uncond_prompt_rows(toks, EOT, end_of_audio_token=EOA))
    np.testing.assert_array_equal(out[0], [10, EOA, EOT, EOT, 50])


def test_spk_cond_mask_rows():
    m2 = np.asarray(fs.make_spk_cond_mask(2, 2)).reshape(-1)
    np.testing.assert_array_equal(m2, [1, 1, 0, 0])
    # third group (prompt-uncond) keeps speaker conditioning
    m3 = np.asarray(fs.make_spk_cond_mask(2, 3)).reshape(-1)
    np.testing.assert_array_equal(m3, [1, 1, 0, 0, 1, 1])


def test_tuple_with_unit_prompt_scale_equals_float(params):
    """(3.0, 1.0) must take the 2-row path and reproduce guidance=3.0 exactly."""
    prompt = list(range(97, 105))
    spk = jnp.ones((1, 256))
    kw = dict(
        key=jax.random.PRNGKey(3), max_new_tokens=10, end_of_audio_token=EOA,
        prompt_pad_multiple=16, compute_dtype=jnp.float32,
    )
    out_float = fs.generate(params, TINY, prompt, spk, guidance_scale=3.0, **kw)
    out_tuple = fs.generate(params, TINY, prompt, spk, guidance_scale=(3.0, 1.0), **kw)
    np.testing.assert_array_equal(out_float, out_tuple)


def test_three_row_generation_runs(params):
    prompt = list(range(97, 105)) + [EOT]
    spk = jnp.ones((1, 256))
    out = fs.generate(
        params, TINY, prompt, spk, guidance_scale=(3.0, 2.0), end_of_text_token=EOT,
        key=jax.random.PRNGKey(4), max_new_tokens=10, end_of_audio_token=EOA,
        prompt_pad_multiple=16, compute_dtype=jnp.float32,
    )
    gen = out[len(prompt):]
    assert 1 <= len(gen) <= 10
    assert (np.asarray(out) >= 0).all() and (np.asarray(out) < 121).all()


def test_three_row_streaming_segments(params):
    """generate_segments with double guidance (3-row CFG) yields valid
    segments (the streaming path builds the same uncond rows)."""
    prompt = list(range(97, 105)) + [EOT]
    spk = jnp.ones((256,))
    segs = list(
        fs.generate_segments(
            params, TINY, prompt, spk, guidance_scale=(3.0, 2.0),
            end_of_text_token=EOT, key=jax.random.PRNGKey(5),
            segment_tokens=6, first_segment_tokens=4, max_new_tokens=14,
            end_of_audio_token=EOA, prompt_pad_multiple=16,
            compute_dtype=jnp.float32,
        )
    )
    assert len(segs) >= 1
    joined = np.concatenate(segs)
    assert 1 <= len(joined) <= 15
    assert (joined >= 0).all() and (joined < 121).all()


def test_three_row_requires_eot(params):
    with pytest.raises(ValueError, match="end_of_text_token"):
        fs.generate(
            params, TINY, [97, 98], jnp.ones((1, 256)),
            guidance_scale=(3.0, 2.0), key=jax.random.PRNGKey(0),
        )


def test_three_row_prefill_uses_uncond_text(params):
    """The 3-row prefill's third group must see eot-substituted text: with
    prompt guidance 2.0 the merged logits differ from the 2-row merge unless
    the prompt contains no text tokens at all."""
    spk = jnp.ones((1, 256))
    prompt_text = jnp.asarray([list(range(97, 105))], jnp.int32)  # text ids
    kv3 = tfm.KVCache.create(TINY, 3, TINY.block_size, dtype=jnp.float32)

    # identical keys: the only difference is the guidance math + third row
    tok3, _ = fs.prefill(
        params, TINY, prompt_text, jnp.asarray(8, jnp.int32), spk, kv3,
        jax.random.PRNGKey(5), jnp.asarray(1.0), jnp.asarray(1.0),
        jnp.asarray(3.0), compute_dtype=jnp.float32,
        cfg_rows=3, prompt_guidance_scale=jnp.asarray(2.0),
        end_of_text_token=jnp.asarray(EOT, jnp.int32),
    )
    assert tok3.shape == (1,)
    assert 0 <= int(tok3[0]) < 121

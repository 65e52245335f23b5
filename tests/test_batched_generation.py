"""Ragged-batch generation: left-padding isolation + batch==single parity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from metavoice_tpu.core.config import first_stage_config
from metavoice_tpu.models import first_stage as fs
from metavoice_tpu.models import transformer as tfm

TINY = first_stage_config(n_layer=2, n_head=4, dim=64, block_size=128, vocab_sizes=(97,))


@pytest.fixture(scope="module")
def params():
    return tfm.init_params(jax.random.PRNGKey(0), TINY)


def test_left_pad_prompts():
    padded, pad_lens = fs.left_pad_prompts([[1, 2, 3], [4]], bucket=8)
    np.testing.assert_array_equal(padded[0], [0, 0, 0, 0, 0, 1, 2, 3])
    np.testing.assert_array_equal(padded[1], [0, 0, 0, 0, 0, 0, 0, 4])
    np.testing.assert_array_equal(pad_lens, [5, 7])


def test_generate_batch_shapes(params):
    prompts = [list(range(50, 60)), list(range(60, 64))]
    spk = jnp.ones((2, 256))
    outs = fs.generate_batch(
        params, TINY, prompts, spk, key=jax.random.PRNGKey(1),
        max_new_tokens=12, end_of_audio_token=96, prompt_pad_multiple=16,
        compute_dtype=jnp.float32,
    )
    assert len(outs) == 2
    for o in outs:
        assert 1 <= len(o) <= 13
        assert (o >= 0).all() and (o < 97).all()


def test_padding_isolation(params):
    """A row's output must not depend on other rows in the batch.

    Teacher-forcing check via prefill logits: the same prompt left-padded to
    two different bucket lengths must produce identical first-token logits
    distribution (greedy argmax with temperature ~0).
    """
    prompt = list(range(40, 52))
    spk = jnp.ones((1, 256))

    def greedy_first(bucket):
        padded, pad_lens = fs.left_pad_prompts([prompt], bucket=bucket)
        kv = tfm.KVCache.create(TINY, 2, TINY.block_size, dtype=jnp.float32)
        tok, _ = fs.prefill_batch(
            params, TINY, jnp.asarray(padded), jnp.asarray(pad_lens), spk, kv,
            jax.random.PRNGKey(0), jnp.asarray(1e-6, jnp.float32),
            jnp.asarray(1.0, jnp.float32), jnp.asarray(1.0, jnp.float32),
            compute_dtype=jnp.float32,
        )
        return int(tok[0])

    assert greedy_first(16) == greedy_first(32)


def test_batch_matches_single_greedy(params):
    """Greedy batched decode == greedy single decode for the same prompt."""
    prompt = list(range(30, 42))
    spk_b = jnp.ones((2, 256))

    outs = fs.generate_batch(
        params, TINY, [prompt, list(range(50, 55))], spk_b,
        key=jax.random.PRNGKey(3), temperature=1e-6, top_p=1.0,
        guidance_scale=1.0, max_new_tokens=8, end_of_audio_token=96,
        prompt_pad_multiple=16, compute_dtype=jnp.float32,
    )
    outs_single = fs.generate_batch(
        params, TINY, [prompt], jnp.ones((1, 256)),
        key=jax.random.PRNGKey(99), temperature=1e-6, top_p=1.0,
        guidance_scale=1.0, max_new_tokens=8, end_of_audio_token=96,
        prompt_pad_multiple=16, compute_dtype=jnp.float32,
    )
    # greedy => RNG-independent; row 0 identical regardless of batch mates
    np.testing.assert_array_equal(outs[0], outs_single[0])


def test_batch_int8_cache_matches_bf16_greedy(params):
    """Greedy batched decode with the int8 KV cache tracks the f32 cache.

    Cache quantization noise can flip a greedy pick only where the top-2
    logits are near-ties; with this tiny random model the sequences must
    agree on the large majority of steps.
    """
    prompts = [list(range(30, 42)), list(range(50, 55))]
    spk_b = jnp.ones((2, 256))

    def run(cache_dtype):
        return fs.generate_batch(
            params, TINY, prompts, spk_b,
            key=jax.random.PRNGKey(3), temperature=1e-6, top_p=1.0,
            guidance_scale=1.0, max_new_tokens=8, end_of_audio_token=10_000,
            prompt_pad_multiple=16, compute_dtype=jnp.float32,
            cache_dtype=cache_dtype,
        )

    ref = run(None)
    q = run(jnp.int8)
    matches = sum(
        int(a == b) for r, s in zip(ref, q) for a, b in zip(r, s)
    )
    total = sum(len(r) for r in ref)
    assert matches / total >= 0.75, (ref, q)


def test_generate_segments_matches_generate(params):
    """Streaming segments concatenated == one-shot generate (same key)."""
    prompt = list(range(50, 60))
    spk = jnp.ones((256,))
    one = fs.generate(
        params, TINY, prompt, spk, key=jax.random.PRNGKey(11),
        max_new_tokens=17, end_of_audio_token=10_000, prompt_pad_multiple=16,
        compute_dtype=jnp.float32,
    )[len(prompt):]
    segs = list(
        fs.generate_segments(
            params, TINY, prompt, spk, key=jax.random.PRNGKey(11),
            segment_tokens=6, max_new_tokens=17, end_of_audio_token=10_000,
            prompt_pad_multiple=16, compute_dtype=jnp.float32,
        )
    )
    assert len(segs) >= 2
    joined = np.concatenate(segs)
    assert len(joined) == len(one)
    # NOTE: not token-identical — the RNG key splitting differs between the
    # single-loop and segmented paths by design; check validity instead
    assert (joined >= 0).all() and (joined < 97).all()


def test_generate_segments_stops_at_eoa(params):
    """With an in-vocab EOA, the stream terminates and includes it."""
    prompt = list(range(50, 58))
    segs = list(
        fs.generate_segments(
            params, TINY, prompt, jnp.ones((256,)), key=jax.random.PRNGKey(5),
            segment_tokens=8, end_of_audio_token=96, prompt_pad_multiple=16,
            compute_dtype=jnp.float32,
        )
    )
    joined = np.concatenate(segs)
    if (joined == 96).any():
        assert joined[-1] == 96  # EOA ends the stream


def test_per_row_sampling_matches_scalar(params):
    """A batch where every row uses the same per-row vector values must
    reproduce the scalar-parameter program exactly (same key)."""
    prompts = [list(range(50, 60)), list(range(60, 64))]
    spk = jnp.ones((2, 256))
    kw = dict(
        key=jax.random.PRNGKey(9), max_new_tokens=8, end_of_audio_token=96,
        prompt_pad_multiple=16, compute_dtype=jnp.float32,
    )
    outs_scalar = fs.generate_batch(
        params, TINY, prompts, spk, temperature=0.8, top_p=0.9, guidance_scale=2.0, **kw
    )
    outs_vector = fs.generate_batch(
        params, TINY, prompts, spk,
        temperature=[0.8, 0.8], top_p=[0.9, 0.9], guidance_scale=[2.0, 2.0], **kw
    )
    for a, b in zip(outs_scalar, outs_vector):
        np.testing.assert_array_equal(a, b)


def test_per_row_sampling_mixed_runs(params):
    prompts = [list(range(50, 58)), list(range(60, 64))]
    spk = jnp.ones((2, 256))
    outs = fs.generate_batch(
        params, TINY, prompts, spk, key=jax.random.PRNGKey(10),
        temperature=[0.5, 1.5], top_p=[0.9, 0.99], guidance_scale=[1.5, 4.0],
        max_new_tokens=8, end_of_audio_token=96, prompt_pad_multiple=16,
        compute_dtype=jnp.float32,
    )
    assert len(outs) == 2
    for o in outs:
        assert (o >= 0).all() and (o < 97).all()


def test_generate_segments_first_segment_ramp(params):
    """first_segment_tokens < segment_tokens: the first yield is small (low
    TTFA), later yields ramp to the full segment size."""
    prompt = list(range(50, 60))
    spk = jnp.ones((1, 256))
    segs = list(
        fs.generate_segments(
            params, TINY, prompt, spk, key=jax.random.PRNGKey(11),
            segment_tokens=12, first_segment_tokens=4, max_new_tokens=30,
            end_of_audio_token=10**6, prompt_pad_multiple=16,
            compute_dtype=jnp.float32,
        )
    )
    assert len(segs[0]) == 4
    assert len(segs[1]) == 12
    total = np.concatenate(segs)
    assert len(total) == 30  # max_new_tokens, counting the prefill-sampled token

"""Transformer core tests on a tiny config (CPU).

Key oracle: KV-cache incremental decoding must produce bit-comparable logits
to the full parallel causal forward (the JAX analogue of the reference's
`_slow_causal_sampling_loop` equivalence oracle, fam/llm/mixins/causal.py:473).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from metavoice_tpu.core.config import TransformerConfig, first_stage_config, second_stage_config
from metavoice_tpu.models import first_stage as fs
from metavoice_tpu.models import transformer as tfm

TINY = first_stage_config(n_layer=2, n_head=4, dim=64, block_size=64, vocab_sizes=(97,))


@pytest.fixture(scope="module")
def tiny_params():
    return tfm.init_params(jax.random.PRNGKey(0), TINY)


def test_param_shapes(tiny_params):
    assert tiny_params["wtes"][0].shape == (97, 64)
    assert tiny_params["wpe"].shape == (64, 64)
    assert tiny_params["layers"]["wqkv"].shape == (2, 64, 3 * 64)
    assert tiny_params["layers"]["w1"].shape == (2, 64, TINY.intermediate_size)
    assert tiny_params["speaker_cond"].shape == (256, 64)
    assert "lm_heads" not in tiny_params  # weight-tied


def test_forward_shapes(tiny_params):
    idx = jnp.zeros((2, 10), jnp.int32)
    spk = jnp.ones((2, 256))
    logits, kv = tfm.forward(
        tiny_params, TINY, idx, spk_emb=spk, compute_dtype=jnp.float32
    )
    assert kv is None
    assert len(logits) == 1
    assert logits[0].shape == (2, 10, 97)
    assert logits[0].dtype == jnp.float32


def test_causal_masking(tiny_params):
    """Changing a future token must not change past logits."""
    key = jax.random.PRNGKey(1)
    idx = jax.random.randint(key, (1, 12), 0, 97)
    spk = jnp.ones((1, 256))
    logits_a, _ = tfm.forward(tiny_params, TINY, idx, spk_emb=spk, compute_dtype=jnp.float32)
    idx_b = idx.at[0, 8].set((idx[0, 8] + 1) % 97)
    logits_b, _ = tfm.forward(tiny_params, TINY, idx_b, spk_emb=spk, compute_dtype=jnp.float32)
    np.testing.assert_allclose(
        np.asarray(logits_a[0][0, :8]), np.asarray(logits_b[0][0, :8]), atol=1e-5
    )
    assert not np.allclose(np.asarray(logits_a[0][0, 8:]), np.asarray(logits_b[0][0, 8:]))


def test_kv_cache_matches_parallel_forward(tiny_params):
    """Incremental cache decode == full causal forward, position by position."""
    key = jax.random.PRNGKey(2)
    t = 9
    idx = jax.random.randint(key, (1, t), 0, 97)
    spk = jnp.ones((1, 256))

    ref_logits, _ = tfm.forward(tiny_params, TINY, idx, spk_emb=spk, compute_dtype=jnp.float32)
    ref = np.asarray(ref_logits[0])  # (1, t, V)

    # NOTE: on TPU these paths match exactly (0.0 diff); XLA:CPU picks
    # different matmul codepaths for different kv lengths, giving ~1e-3
    # noise, hence the loose tolerances here.
    tol = dict(atol=3e-3, rtol=2e-2)
    kv = tfm.KVCache.create(TINY, 1, TINY.block_size, dtype=jnp.float32)
    # prefill on the first 4 tokens
    t0 = 4
    logits_pre, kv = tfm.forward(
        tiny_params, TINY, idx[:, :t0], spk_emb=spk, kv_cache=kv, cache_pos=0,
        compute_dtype=jnp.float32,
    )
    np.testing.assert_allclose(np.asarray(logits_pre[0]), ref[:, :t0], **tol)
    # then decode one token at a time
    for p in range(t0, t):
        logits_p, kv = tfm.forward(
            tiny_params, TINY, idx[:, p : p + 1], spk_emb=spk, kv_cache=kv,
            cache_pos=p, compute_dtype=jnp.float32,
        )
        np.testing.assert_allclose(np.asarray(logits_p[0][:, 0]), ref[:, p], **tol)


def test_spk_cond_mask_zeroes_conditioning(tiny_params):
    """Unconditioned CFG rows must be independent of the speaker embedding."""
    idx = jnp.zeros((2, 6), jnp.int32)
    mask = fs.make_spk_cond_mask(1)  # rows: [cond, uncond]
    spk_a = jnp.ones((2, 256))
    spk_b = jnp.full((2, 256), 5.0)
    la, _ = tfm.forward(tiny_params, TINY, idx, spk_emb=spk_a, spk_cond_mask=mask, compute_dtype=jnp.float32)
    lb, _ = tfm.forward(tiny_params, TINY, idx, spk_emb=spk_b, spk_cond_mask=mask, compute_dtype=jnp.float32)
    # uncond row identical, cond row different
    np.testing.assert_allclose(np.asarray(la[0][1]), np.asarray(lb[0][1]), atol=1e-6)
    assert not np.allclose(np.asarray(la[0][0]), np.asarray(lb[0][0]))


def test_non_causal_multi_hierarchy():
    cfg = second_stage_config(n_layer=2, n_head=2, dim=32, block_size=16)
    params = tfm.init_params(jax.random.PRNGKey(3), cfg)
    assert len(params["wtes"]) == 2
    assert len(params["lm_heads"]) == 6
    idx = jnp.zeros((2, 2, 16), jnp.int32)
    spk = jnp.ones((2, 256))
    logits, _ = tfm.forward(params, cfg, idx, spk_emb=spk, compute_dtype=jnp.float32)
    assert len(logits) == 6
    assert logits[0].shape == (2, 16, 1025)
    # non-causal: changing the last input token changes logits everywhere
    idx_b = idx.at[0, 0, 15].set(7)
    logits_b, _ = tfm.forward(params, cfg, idx_b, spk_emb=spk, compute_dtype=jnp.float32)
    assert not np.allclose(np.asarray(logits[0][0, 0]), np.asarray(logits_b[0][0, 0]))


def test_generate_end_to_end(tiny_params):
    """Full prefill+decode on random weights: shape/type sanity + determinism."""
    prompt = np.arange(5) + 50
    spk = jnp.ones((256,))
    out1 = fs.generate(
        tiny_params, TINY, prompt, spk, key=jax.random.PRNGKey(7),
        max_new_tokens=10, end_of_audio_token=96, prompt_pad_multiple=8,
        compute_dtype=jnp.float32,
    )
    out2 = fs.generate(
        tiny_params, TINY, prompt, spk, key=jax.random.PRNGKey(7),
        max_new_tokens=10, end_of_audio_token=96, prompt_pad_multiple=8,
        compute_dtype=jnp.float32,
    )
    np.testing.assert_array_equal(out1, out2)  # same key => same sequence
    assert (out1[:5] == prompt).all()
    assert 5 < len(out1) <= 5 + 10
    assert (out1 >= 0).all() and (out1 < 97).all()


def test_generate_respects_block_size(tiny_params):
    prompt = np.arange(5) + 20
    spk = jnp.zeros((256,))
    out = fs.generate(
        tiny_params, TINY, prompt, spk, key=jax.random.PRNGKey(9),
        end_of_audio_token=10_000,  # never emitted
        prompt_pad_multiple=8, compute_dtype=jnp.float32,
    )
    # 5 prompt + 1 prefill token + (block_size - 8_padded... ) bounded by block
    assert len(out) <= TINY.block_size + 5


def test_decode_eoa_latch(tiny_params):
    """If prefill emits EOA immediately, decode generates nothing."""
    prompt = np.arange(4) + 30
    spk = jnp.zeros((256,))
    kv = tfm.KVCache.create(TINY, 2, TINY.block_size, dtype=jnp.float32)
    first = jnp.asarray([96], jnp.int32)
    buf, lens, _ = fs.decode(
        tiny_params, TINY, first, jnp.asarray(4, jnp.int32), spk[None],
        kv, jax.random.PRNGKey(0), jnp.asarray(1.0), jnp.asarray(0.95),
        jnp.asarray(3.0), jnp.asarray(20, jnp.int32), 32, 96, jnp.float32,
    )
    assert int(lens[0]) == 0

"""Sampling semantics tests, validated against a numpy oracle that mirrors
the reference's torch implementation (fam/llm/fast_inference_utils.py:61-120)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from metavoice_tpu.core import sampling as S


def _reference_top_p_keep(logits: np.ndarray, top_p: float) -> np.ndarray:
    """Numpy port of the reference ascending-sort top-p filter (:68-82)."""
    order = np.argsort(logits, kind="stable")  # ascending
    sorted_logits = logits[order]
    probs = np.exp(sorted_logits - sorted_logits.max())
    probs = probs / probs.sum()
    cum = np.cumsum(probs)
    remove_sorted = cum <= (1 - top_p)
    remove_sorted[-1] = False
    remove = np.empty_like(remove_sorted)
    remove[order] = remove_sorted
    return ~remove


def test_top_p_matches_reference_filter():
    rng = np.random.default_rng(0)
    for top_p in [0.5, 0.9, 0.95, 0.99]:
        logits = rng.normal(size=64).astype(np.float32) * 3
        keep_ref = _reference_top_p_keep(logits, top_p)
        out = np.asarray(S.top_p_mask(jnp.asarray(logits), top_p))
        keep_ours = out > S.NEG_INF / 2
        np.testing.assert_array_equal(keep_ours, keep_ref)


def test_top_p_always_keeps_argmax():
    logits = jnp.array([0.0, 100.0, 0.0, 0.0])
    out = S.top_p_mask(logits, 0.01)
    assert out[1] == 100.0
    assert np.sum(np.asarray(out) > S.NEG_INF / 2) == 1


def test_top_p_batched():
    rng = np.random.default_rng(1)
    logits = rng.normal(size=(4, 32)).astype(np.float32)
    out = np.asarray(S.top_p_mask(jnp.asarray(logits), 0.9))
    for b in range(4):
        keep_ref = _reference_top_p_keep(logits[b], 0.9)
        np.testing.assert_array_equal(out[b] > S.NEG_INF / 2, keep_ref)


def test_top_k_mask():
    logits = jnp.array([1.0, 5.0, 3.0, 2.0, 4.0])
    out = np.asarray(S.top_k_mask(logits, 2))
    keep = out > S.NEG_INF / 2
    np.testing.assert_array_equal(keep, [False, True, False, False, True])
    # k >= vocab keeps everything
    out = np.asarray(S.top_k_mask(logits, 10))
    assert (out > S.NEG_INF / 2).all()


def test_temperature_floor():
    logits = jnp.array([1.0, 2.0])
    out = S.apply_temperature(logits, 0.0)
    assert np.isfinite(np.asarray(out)).all()


def test_cfg_merge():
    cond = np.array([[1.0, 2.0]])
    uncond = np.array([[3.0, 0.0]])
    logits = jnp.asarray(np.concatenate([cond, uncond], axis=0))
    out = np.asarray(S.cfg_merge(logits, 3.0))
    # 3*cond + (1-3)*uncond
    np.testing.assert_allclose(out, 3 * cond - 2 * uncond, rtol=1e-6)


def test_sample_deterministic_when_peaked():
    logits = jnp.full((2, 16), -10.0).at[:, 5].set(30.0)
    key = jax.random.PRNGKey(0)
    tok = S.sample_from_logits(key, logits, temperature=1.0, top_p=0.95)
    assert tok.shape == (2,)
    assert (np.asarray(tok) == 5).all()


def test_sample_distribution_matches_probs():
    # Empirical frequency ~ softmax probabilities.
    logits = jnp.log(jnp.array([0.1, 0.2, 0.3, 0.4]))
    keys = jax.random.split(jax.random.PRNGKey(42), 4000)
    draws = jax.vmap(lambda k: S.sample_from_logits(k, logits))(keys)
    freq = np.bincount(np.asarray(draws), minlength=4) / 4000
    np.testing.assert_allclose(freq, [0.1, 0.2, 0.3, 0.4], atol=0.03)


def test_logits_to_probs_normalized():
    logits = jnp.asarray(np.random.default_rng(3).normal(size=(2, 100)).astype(np.float32))
    probs = np.asarray(S.logits_to_probs(logits, temperature=0.8, top_p=0.9, top_k=50))
    np.testing.assert_allclose(probs.sum(-1), 1.0, rtol=1e-5)
    assert (probs >= 0).all()


def test_sample_cfg_shape():
    logits = jnp.asarray(np.random.default_rng(4).normal(size=(4, 32)).astype(np.float32))
    tok = S.sample_cfg(jax.random.PRNGKey(0), logits, guidance_scale=3.0, top_p=0.95)
    assert tok.shape == (2,)
    assert tok.dtype == jnp.int32


def _reference_cfg_merge3(logits: np.ndarray, g_spk: float, g_prompt: float) -> np.ndarray:
    """Numpy oracle of the reference double-guidance merge
    (fam/llm/mixins/causal.py:89-105): split into thirds, then
    base*cond + (1-g_spk)*uncond_spk + (1-g_prompt)*uncond_prompt."""
    b = logits.shape[0] // 3
    cond, uncond_spk, uncond_prompt = logits[:b], logits[b : 2 * b], logits[2 * b :]
    base = g_spk + g_prompt - 1
    return base * cond + (1 - g_spk) * uncond_spk + (1 - g_prompt) * uncond_prompt


def test_cfg_merge3_matches_reference_formula():
    rng = np.random.default_rng(7)
    logits = rng.normal(size=(6, 40)).astype(np.float32)
    for g_spk, g_prompt in [(3.0, 1.0), (3.0, 2.0), (2.0, 1.5), (1.0, 1.0)]:
        ref = _reference_cfg_merge3(logits, g_spk, g_prompt)
        ours = np.asarray(S.cfg_merge3(jnp.asarray(logits), g_spk, g_prompt))
        np.testing.assert_allclose(ours, ref, rtol=1e-6, atol=1e-6)


def test_cfg_merge3_prompt_scale_one_reduces_to_pair_merge():
    # With prompt guidance 1.0 the third term vanishes and the merge equals
    # the 2-row speaker CFG on the first two groups.
    rng = np.random.default_rng(8)
    logits3 = rng.normal(size=(3, 40)).astype(np.float32)
    merged3 = np.asarray(S.cfg_merge3(jnp.asarray(logits3), 3.0, 1.0))
    merged2 = np.asarray(S.cfg_merge(jnp.asarray(logits3[:2]), 3.0))
    np.testing.assert_allclose(merged3, merged2, rtol=1e-6, atol=1e-6)


def test_sample_cfg3_shape():
    logits = jnp.asarray(np.random.default_rng(9).normal(size=(6, 32)).astype(np.float32))
    tok = S.sample_cfg3(jax.random.PRNGKey(0), logits, 3.0, 2.0, top_p=0.95)
    assert tok.shape == (2,)
    assert tok.dtype == jnp.int32


def test_top_p_probs_matches_torch_slow_path_oracle():
    """Prob-space variant == a numpy transcription of mixins/causal.py:9-30."""
    rng = np.random.default_rng(0)
    probs = rng.dirichlet(np.ones(50), size=4).astype(np.float32)

    def oracle(p, top_p):
        order = np.argsort(-p, axis=-1, kind="stable")
        sp = np.take_along_axis(p, order, axis=-1)
        cum = np.cumsum(sp, axis=-1)
        remove = cum > top_p
        remove[:, 1:] = remove[:, :-1].copy()  # shift right: keep first above
        remove[:, 0] = False
        sp = np.where(remove, 0.0, sp)
        inv = np.argsort(order, axis=-1, kind="stable")
        out = np.take_along_axis(sp, inv, axis=-1)
        return out / out.sum(axis=-1, keepdims=True)

    for tp in (0.3, 0.75, 0.95):
        ours = np.asarray(S.top_p_probs(jnp.asarray(probs), tp))
        ref = oracle(probs, tp)
        np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_top_p_variants_diverge_only_at_exact_ties():
    """The logit-space fast variant (<) and prob-space slow variant (<=)
    agree on generic inputs and differ exactly when a token's exclusive
    cumulative probability EQUALS top_p (SURVEY hard-part #3)."""
    # generic random inputs: identical keep sets
    rng = np.random.default_rng(1)
    logits = rng.normal(size=(8, 40)).astype(np.float32) * 2
    probs = np.asarray(jax.nn.softmax(jnp.asarray(logits), axis=-1))
    for tp in (0.5, 0.9):
        fast_kept = np.asarray(S.top_p_mask(jnp.asarray(logits), tp)) > S.NEG_INF / 2
        slow_kept = np.asarray(S.top_p_probs(jnp.asarray(probs), tp)) > 0
        np.testing.assert_array_equal(fast_kept, slow_kept)

    # crafted exact tie: probs (.5, .25, .125, .125), top_p = 0.75 — token 2
    # has cum_excl == 0.75 exactly (powers of two, exact in f32)
    p = jnp.asarray([[0.5, 0.25, 0.125, 0.125]], jnp.float32)
    slow = np.asarray(S.top_p_probs(p, 0.75))[0]
    assert slow[2] > 0, slow  # <= keeps the boundary token
    assert slow[3] == 0
    # the fast variant's rule on the same exact cumulative mass drops it:
    # keep <=> cum_excl < top_p
    cum_excl = np.asarray([0.0, 0.5, 0.75, 0.875], np.float32)
    assert not (cum_excl[2] < 0.75)

"""On-device sampling primitives: temperature, top-k, top-p, CFG, categorical.

Everything here is pure JAX, shape-polymorphic over leading batch axes, and
designed to run *inside* the compiled decode loop — sampling never leaves the
device (the reference samples on-GPU too, but syncs each step to check the
stop token; we keep the whole loop on-device).

Semantics match the reference fast path (fam/llm/fast_inference_utils.py):

  * temperature floor of 1e-5                          (:92)
  * top-k keeps logits >= the k-th largest             (:94-97)
  * top-p uses the ascending-sort variant: drop tokens whose inclusive
    ascending cumulative probability is <= (1 - top_p), always keeping the
    argmax                                             (:68-82)
  * CFG: g * cond + (1 - g) * uncond over a leading batch pair  (:116-117)
  * categorical sampling via the exponential race argmax(probs / Exp(1))
    (:61-65), which is distribution-identical to Gumbel-max; we use
    jax.random.categorical with explicit PRNG keys (the reference relies on
    torch's global seed).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

NEG_INF = -1e30  # finite "-inf" that keeps softmax numerics exact in bf16/f32


def apply_temperature(logits: jax.Array, temperature: jax.Array | float) -> jax.Array:
    """logits / max(temperature, 1e-5); reference fast_inference_utils.py:92."""
    t = jnp.maximum(jnp.asarray(temperature, dtype=logits.dtype), 1e-5)
    return logits / t


def top_k_mask(logits: jax.Array, k: int) -> jax.Array:
    """Mask all but the top-k logits (last axis) to -inf.

    ``k`` must be static. Ties with the k-th value are kept, matching
    ``logits < pivot -> -inf`` in the reference (:94-97).
    """
    k = min(int(k), logits.shape[-1])
    pivot = jax.lax.top_k(logits, k)[0][..., -1:]
    return jnp.where(logits < pivot, jnp.asarray(NEG_INF, logits.dtype), logits)


def top_p_mask(logits: jax.Array, top_p: jax.Array | float) -> jax.Array:
    """Nucleus filtering over the last axis, reference variant (:68-82).

    Keep token i iff the exclusive cumulative probability of all
    strictly-higher-ranked tokens is < top_p (equivalently: the reference
    removes tokens whose inclusive ascending cumsum <= 1 - top_p). The
    highest-probability token is always kept.
    """
    top_p = jnp.asarray(top_p, dtype=jnp.float32)
    # Sort VALUES only (no index payload), find how many ranks survive (k)
    # and the boundary value (c), then rebuild the keep mask in vocabulary
    # order arithmetically. This avoids the argsort's (f32, i32) variadic
    # sort, the full-vocab gather, and the scatter back to vocab order — on
    # TPU those dominated the sampling epilogue (an earlier version with
    # three full sorts cost ~0.2 ms/step; argsort+gather+scatter was the
    # round-2 fix; this is the round-3 one). Bit-identical to the sorted
    # formulation away from exact ties at the boundary value; at a tie it
    # keeps the lowest vocab ids, matching the previous argsort (stable,
    # ascending index among equal keys) implementation.
    lf = logits.astype(jnp.float32)
    sorted_desc = jnp.flip(jnp.sort(lf, axis=-1), axis=-1)
    probs = jax.nn.softmax(sorted_desc, axis=-1)
    cum_excl = jnp.cumsum(probs, axis=-1) - probs
    keep_sorted = cum_excl < top_p
    keep_sorted = keep_sorted.at[..., 0].set(True)
    k = jnp.sum(keep_sorted.astype(jnp.int32), axis=-1, keepdims=True)  # >= 1
    c = jnp.take_along_axis(sorted_desc, k - 1, axis=-1)  # smallest kept value
    gt = lf > c
    eq = lf == c
    n_gt = jnp.sum(gt.astype(jnp.int32), axis=-1, keepdims=True)
    m = k - n_gt  # ties at c to keep (lowest vocab ids first)
    tie_rank = jnp.cumsum(eq.astype(jnp.int32), axis=-1) - 1
    keep = gt | (eq & (tie_rank < m))
    return jnp.where(keep, logits, jnp.asarray(NEG_INF, logits.dtype))


def cfg_merge(logits: jax.Array, guidance_scale: jax.Array | float) -> jax.Array:
    """Classifier-free-guidance merge over a leading conditioned/unconditioned pair.

    ``logits``: (2*B, V) where rows [0, B) are speaker-conditioned and rows
    [B, 2B) are unconditioned. Returns (B, V):
    g * cond + (1 - g) * uncond. Reference fast_inference_utils.py:116-117.
    """
    b2 = logits.shape[0]
    cond, uncond = jnp.split(logits, 2, axis=0)
    del b2
    g = jnp.asarray(guidance_scale, dtype=logits.dtype)
    return g * cond + (1.0 - g) * uncond


def cfg_merge3(
    logits: jax.Array,
    spkemb_guidance_scale: jax.Array | float,
    prompt_guidance_scale: jax.Array | float,
) -> jax.Array:
    """Double classifier-free guidance over a leading row triple.

    ``logits``: (3B, V) where rows [0, B) are fully conditioned, rows
    [B, 2B) drop the speaker conditioning, and rows [2B, 3B) keep the
    speaker but had their text tokens replaced by end-of-text (prompt
    unconditioning). Returns (B, V):

        base * cond + (1 - g_spk) * uncond_spk + (1 - g_prompt) * uncond_prompt
        with base = g_spk + g_prompt - 1.

    Reference fam/llm/mixins/causal.py:89-105 (guidance tuple default
    (3.0, 1.0), fam/llm/inference.py:646).
    """
    cond, uncond_spk, uncond_prompt = jnp.split(logits, 3, axis=0)
    g_s = jnp.asarray(spkemb_guidance_scale, dtype=logits.dtype)
    g_p = jnp.asarray(prompt_guidance_scale, dtype=logits.dtype)
    base = g_s + g_p - 1.0
    return base * cond + (1.0 - g_s) * uncond_spk + (1.0 - g_p) * uncond_prompt


def logits_to_probs(
    logits: jax.Array,
    temperature: jax.Array | float = 1.0,
    top_p: jax.Array | float | None = None,
    top_k: int | None = None,
) -> jax.Array:
    """Temperature -> top-k -> top-p -> softmax, as fast_inference_utils.py:85-104."""
    logits = apply_temperature(logits, temperature)
    if top_k is not None:
        logits = top_k_mask(logits, top_k)
    if top_p is not None:
        logits = top_p_mask(logits, top_p)
    return jax.nn.softmax(logits.astype(jnp.float32), axis=-1)


def sample_from_logits(
    key: jax.Array,
    logits: jax.Array,
    temperature: jax.Array | float = 1.0,
    top_p: jax.Array | float | None = None,
    top_k: int | None = None,
) -> jax.Array:
    """Draw one token per row of ``logits`` (..., V) -> (...,) int32.

    Gumbel-max over the filtered logits — identical in distribution to the
    reference's softmax + exponential-race multinomial (:61-65,102).
    """
    logits = apply_temperature(logits, temperature)
    if top_k is not None:
        logits = top_k_mask(logits, top_k)
    if top_p is not None:
        logits = top_p_mask(logits, top_p)
    return jax.random.categorical(key, logits.astype(jnp.float32), axis=-1).astype(
        jnp.int32
    )


def sample_cfg(
    key: jax.Array,
    logits: jax.Array,
    guidance_scale: jax.Array | float,
    temperature: jax.Array | float = 1.0,
    top_p: jax.Array | float | None = None,
    top_k: int | None = None,
) -> jax.Array:
    """CFG merge then sample. ``logits``: (2B, V) -> (B,) int32 tokens."""
    merged = cfg_merge(logits, guidance_scale)
    return sample_from_logits(key, merged, temperature=temperature, top_p=top_p, top_k=top_k)


def sample_cfg3(
    key: jax.Array,
    logits: jax.Array,
    spkemb_guidance_scale: jax.Array | float,
    prompt_guidance_scale: jax.Array | float,
    temperature: jax.Array | float = 1.0,
    top_p: jax.Array | float | None = None,
    top_k: int | None = None,
) -> jax.Array:
    """Double-CFG merge then sample. ``logits``: (3B, V) -> (B,) int32."""
    merged = cfg_merge3(logits, spkemb_guidance_scale, prompt_guidance_scale)
    return sample_from_logits(key, merged, temperature=temperature, top_p=top_p, top_k=top_k)


def top_p_probs(probs: jax.Array, top_p: jax.Array | float) -> jax.Array:
    """PROB-space nucleus filter — the reference's slow-path variant
    (fam/llm/mixins/causal.py:9-30), kept alongside the logit-space fast
    variant (``top_p_mask``, fast_inference_utils.py:68-82) for full parity.

    The two variants provably agree except at exact threshold ties: here a
    token whose EXCLUSIVE cumulative probability equals ``top_p`` is KEPT
    (the reference's shifted ``cum > top_p`` mask, i.e. ``<=``), while the
    fast variant drops it (``<``). tests/test_sampling.py pins both the
    agreement on generic inputs and the documented divergence at the tie.

    probs: (..., V) normalized probabilities -> renormalized filtered probs.
    """
    top_p = jnp.asarray(top_p, jnp.float32)
    order = jnp.argsort(-probs, axis=-1)
    sorted_probs = jnp.take_along_axis(probs.astype(jnp.float32), order, axis=-1)
    cum_excl = jnp.cumsum(sorted_probs, axis=-1) - sorted_probs
    keep_sorted = cum_excl <= top_p
    keep_sorted = keep_sorted.at[..., 0].set(True)
    kept_sorted = jnp.where(keep_sorted, sorted_probs, 0.0)
    shape = probs.shape
    v = shape[-1]
    order2 = order.reshape(-1, v)
    rows = jnp.arange(order2.shape[0])[:, None]
    kept = (
        jnp.zeros(order2.shape, jnp.float32)
        .at[rows, order2]
        .set(kept_sorted.reshape(-1, v))
        .reshape(shape)
    )
    return kept / jnp.maximum(kept.sum(axis=-1, keepdims=True), 1e-30)

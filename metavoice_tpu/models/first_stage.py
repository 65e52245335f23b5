"""First-stage 1.2B causal LLM: prefill + single-compilation decode loop.

This replaces the reference's gpt-fast-style Python decode loop
(fam/llm/fast_inference_utils.py:148-174), which launches one compiled CUDA
step per token and syncs with the host every iteration to check the
end-of-audio token (:161). Here the *entire* autoregressive generation is one
``jax.lax.while_loop`` inside one XLA program:

  * static-shape KV cache in the loop carry,
  * CFG as a leading batch pair — rows [0,B) speaker-conditioned, rows
    [B,2B) unconditioned via a zeroing mask on the speaker projection
    (reference fam/llm/fast_model.py:132-134,156),
  * temperature -> top-p -> Gumbel-max sampling on device,
  * per-row end-of-audio latches (the batched analogue of the reference's
    `(cur_token == end_of_audio_token).any()` early stop),
  * no host<->device traffic until the loop exits.

Prompts are right-padded to static bucket lengths so each bucket compiles
once (AOT-compilable; kills the reference's 30-90s torch.compile warmup,
README.md:98).
"""

from __future__ import annotations

import os
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from metavoice_tpu.core import sampling as S
from metavoice_tpu.core import tokens as T
from metavoice_tpu.core.config import TransformerConfig
from metavoice_tpu.models import transformer as tfm


class DecodeState(NamedTuple):
    """Carry of the decode while_loop."""

    cur_token: jax.Array  # (B,) int32 — last sampled token per utterance
    pos: jax.Array  # () int32 — absolute position of the NEXT write
    step: jax.Array  # () int32 — decode iteration counter
    kv: tfm.KVCache
    key: jax.Array
    done: jax.Array  # (B,) bool — end-of-audio latch per row
    out_buf: jax.Array  # (B, max_steps) int32 — sampled tokens
    out_len: jax.Array  # (B,) int32 — tokens emitted per row (incl. EOA)


def _cfg_rows(x: jax.Array, n: int = 2) -> jax.Array:
    """(B, ...) -> (nB, ...): duplicate rows for the CFG guidance groups.

    All groups consume the same token stream (reference
    fam/llm/fast_inference_utils.py:172 repeats the sampled token onto both
    guidance rows); only the speaker conditioning differs via the mask. With
    n=3 the third group is the prompt-unconditioned one (reference
    fam/llm/mixins/causal.py:229-262): the caller replaces its *text* tokens
    with end-of-text via :func:`_uncond_prompt_rows`.
    """
    return jnp.concatenate([x] * n, axis=0)


def _uncond_prompt_rows(
    tokens: jax.Array, end_of_text_token: jax.Array | int,
    end_of_audio_token: int = T.END_OF_AUDIO_TOKEN,
) -> jax.Array:
    """Replace text tokens (> EOA) with end-of-text for prompt unconditioning
    (reference fam/llm/mixins/causal.py:259-262)."""
    return jnp.where(
        tokens > end_of_audio_token,
        jnp.asarray(end_of_text_token, tokens.dtype),
        tokens,
    )


def _normalize_guidance(
    guidance_scale: float | tuple[float, float] | None,
) -> tuple[float, float, int]:
    """float | (spk, prompt) tuple -> (spk_scale, prompt_scale, cfg_rows).

    The reference slow path takes a (spkemb_guidance, prompt_guidance) tuple
    defaulting to (3.0, 1.0) (fam/llm/inference.py:646) and only triples the
    batch when prompt_guidance > 1 (mixins/causal.py:254-256).
    """
    if guidance_scale is None:
        return 1.0, 1.0, 2
    if isinstance(guidance_scale, (tuple, list)):
        spk_g, prompt_g = float(guidance_scale[0]), float(guidance_scale[1])
        # only the tuple (double-guidance) form asserts >= 1, matching the
        # reference's slow path (causal.py:90-92); a plain float rides the
        # fast path, which accepts any value the server clamps into [0, 5]
        if spk_g < 1.0 or prompt_g < 1.0:
            raise ValueError(
                "guidance scales must be >= 1 (reference causal.py:90-92)"
            )
        return spk_g, prompt_g, 3 if prompt_g > 1.0 else 2
    return float(guidance_scale), 1.0, 2


def make_spk_cond_mask(batch_size: int, cfg_rows: int = 2) -> jax.Array:
    """(cfg_rows*B, 1, 1) mask: 1 for speaker-conditioned row groups.

    2-row: [cond, spk-uncond]. 3-row adds the prompt-uncond group, which
    KEEPS speaker conditioning (reference causal.py:229-235 re-appends
    speaker_embs for the third group).
    """
    ones = jnp.ones((batch_size, 1, 1))
    zeros = jnp.zeros((batch_size, 1, 1))
    groups = [ones, zeros] + ([ones] if cfg_rows == 3 else [])
    return jnp.concatenate(groups, axis=0)


@partial(
    jax.jit, static_argnames=("cfg", "compute_dtype", "cfg_rows", "blocks_fn")
)
def prefill(
    params: tfm.Params,
    cfg: TransformerConfig,
    prompt: jax.Array,  # (B, T_pad) int32, right-padded
    prompt_len: jax.Array,  # () int32 — true length (uniform across batch)
    spk_emb: jax.Array,  # (B, spk_dim)
    kv_cache: tfm.KVCache,  # (L, 2B, H, S, Dh)
    key: jax.Array,
    temperature: jax.Array,
    top_p: jax.Array,
    guidance_scale: jax.Array,
    compute_dtype=jnp.bfloat16,
    *,
    cfg_rows: int = 2,
    prompt_guidance_scale: jax.Array | float = 1.0,
    end_of_text_token: jax.Array | int = 0,
    blocks_fn=None,
) -> tuple[jax.Array, tfm.KVCache]:
    """Process the prompt, fill the KV cache, sample the first new token.

    ``blocks_fn`` (static) replaces the block-stack application — signature
    ``(params, x, mask, kv, pos) -> (x, kv, head_done)`` — so alternative
    execution strategies (the shard_map tensor-parallel path,
    parallel/tp_decode.make_tp_blocks_fn) reuse this prefill unchanged.

    Mirrors reference ``prefill`` (fam/llm/fast_inference_utils.py:123-132)
    but pads to a static bucket and extracts the hidden state at the true
    last position before the lm head (single-row head matmul instead of a
    (T, V) one). Returns ((B,) next token, updated cache).

    ``cfg_rows=3`` enables double guidance (speaker + prompt, reference
    mixins/causal.py:89-105,229-262): the third row group sees the prompt
    with text tokens replaced by ``end_of_text_token``.
    """
    b = prompt.shape[0]
    if cfg_rows == 3:
        uncond = _uncond_prompt_rows(prompt, end_of_text_token)
        idx2 = jnp.concatenate([prompt, prompt, uncond], axis=0)
    else:
        idx2 = _cfg_rows(prompt, cfg_rows)
    spk2 = _cfg_rows(spk_emb, cfg_rows)
    mask2 = make_spk_cond_mask(b, cfg_rows)

    t = prompt.shape[1]
    positions = jnp.arange(t)
    x = tfm.embed_inputs(params, cfg, idx2, positions, spk2, mask2, compute_dtype)
    attn_mask = tfm.causal_mask_for(positions, kv_cache.max_seq_len)[None, None]
    if blocks_fn is not None:
        x, new_kv, _ = blocks_fn(params, x, attn_mask, kv_cache, jnp.asarray(0))
    else:
        x, new_kv = tfm.apply_blocks(params, cfg, x, attn_mask, kv_cache, jnp.asarray(0))
    # hidden at the true last prompt position (padded tail unused)
    x_last = jax.lax.dynamic_slice_in_dim(x, prompt_len - 1, 1, axis=1)  # (2B, 1, D)
    logits = tfm.output_logits(params, cfg, x_last)[0][:, 0, :]  # (2B, V)
    if cfg_rows == 3:
        next_token = S.sample_cfg3(
            key, logits, guidance_scale, prompt_guidance_scale,
            temperature=temperature, top_p=top_p,
        )
    else:
        next_token = S.sample_cfg(
            key, logits, guidance_scale, temperature=temperature, top_p=top_p
        )
    return next_token, new_kv


def _decode_fn(
    params: tfm.Params,
    cfg: TransformerConfig,
    first_token: jax.Array,  # (B,)
    start_pos: jax.Array,  # ()
    spk_emb: jax.Array,  # (B, spk_dim)
    kv_cache: tfm.KVCache,
    key: jax.Array,
    temperature: jax.Array,
    top_p: jax.Array,
    guidance_scale: jax.Array,
    max_new_tokens: jax.Array,  # () — dynamic cap (<= max_steps)
    max_steps: int,  # static buffer size
    end_of_audio_token: int = T.END_OF_AUDIO_TOKEN,
    compute_dtype=jnp.bfloat16,
    cfg_rows: int = 2,
    prompt_guidance_scale: jax.Array | float = 1.0,
    end_of_text_token: jax.Array | int = 0,
    blocks_fn=None,
    decode_steps: int = 1,
) -> tuple[jax.Array, jax.Array, tfm.KVCache]:
    """Run the full decode loop on device. Returns (tokens (B, max_steps),
    lengths (B,), cache). ``tokens[b, :lengths[b]]`` are valid and include
    the end-of-audio token if one was emitted.

    ``blocks_fn`` (static): alternative block-stack application with the
    same contract as in :func:`prefill` — the tensor-parallel shard_map path
    plugs in here, keeping the whole while_loop (EOA latching, CFG rows,
    sampling) unchanged."""
    b = first_token.shape[0]
    spk2 = _cfg_rows(spk_emb, cfg_rows)
    mask2 = make_spk_cond_mask(b, cfg_rows)
    block_size = cfg.block_size

    init_done = first_token == end_of_audio_token
    state = DecodeState(
        cur_token=first_token.astype(jnp.int32),
        pos=start_pos.astype(jnp.int32),
        step=jnp.asarray(0, jnp.int32),
        kv=kv_cache,
        key=key,
        done=init_done,
        out_buf=jnp.full((b, max_steps), end_of_audio_token, jnp.int32),
        out_len=jnp.zeros((b,), jnp.int32),
    )
    # The first sampled token (from prefill) is recorded by the caller;
    # out_buf holds tokens sampled *inside* the loop.

    def cond(s: DecodeState):
        return (
            (~jnp.all(s.done))
            & (s.step < max_new_tokens)
            & (s.pos < block_size)
        )

    def one_step(s: DecodeState) -> DecodeState:
        key, sub = jax.random.split(s.key)
        idx2 = _cfg_rows(s.cur_token, cfg_rows)[:, None]  # (cfg_rows*B, 1)
        if cfg_rows == 3:
            # sampled tokens are audio ids (<= EOA) so this is usually a
            # no-op, but it pins the reference's per-step replacement
            # semantics (causal.py:259-262)
            idx2 = jnp.concatenate(
                [idx2[: 2 * b], _uncond_prompt_rows(idx2[2 * b :], end_of_text_token)],
                axis=0,
            )
        positions = s.pos[None]  # (1,)
        x = tfm.embed_inputs(params, cfg, idx2, positions, spk2, mask2, compute_dtype)
        attn_mask = tfm.causal_mask_for(positions, s.kv.max_seq_len)[None, None]
        if blocks_fn is not None:
            out, new_kv, head_done = blocks_fn(params, x, attn_mask, s.kv, s.pos)
        else:
            out, new_kv, head_done = tfm.apply_blocks(
                params, cfg, x, attn_mask, s.kv, s.pos, fused_head=True
            )
        # head_done: the stack kernel fused final norm + int4 tied head and
        # `out` is already (cfg_rows*B, V) f32 logits
        logits = out if head_done else tfm.output_logits(params, cfg, out)[0][:, 0, :]
        if cfg_rows == 3:
            sampled = S.sample_cfg3(
                sub, logits, guidance_scale, prompt_guidance_scale,
                temperature=temperature, top_p=top_p,
            )
        else:
            sampled = S.sample_cfg(
                sub, logits, guidance_scale, temperature=temperature, top_p=top_p
            )  # (B,)
        # Rows already done keep emitting EOA (frozen).
        next_token = jnp.where(s.done, end_of_audio_token, sampled).astype(jnp.int32)
        out_buf = jax.lax.dynamic_update_slice(s.out_buf, next_token[:, None], (0, s.step))
        newly_active = ~s.done
        done = s.done | (next_token == end_of_audio_token)
        out_len = s.out_len + newly_active.astype(jnp.int32)
        return DecodeState(
            cur_token=next_token,
            pos=s.pos + 1,
            step=s.step + 1,
            kv=new_kv,
            key=key,
            done=done,
            out_buf=out_buf,
            out_len=out_len,
        )

    # decode_steps > 1 (perf experiment): run N sequential steps per
    # while_loop iteration to amortize the loop's per-iteration mechanics
    # (the measured 562 -> ~680 tok/s residual is loop bookkeeping, not
    # kernel time — CLAUDE.md round-3 facts). Steps after the first run
    # under a lax.cond replicating the loop condition, so the emitted
    # tokens are BIT-IDENTICAL to the 1-step loop (the key chain, cache
    # writes and EOA latching are all inside one_step).
    def body(s: DecodeState) -> DecodeState:
        s = one_step(s)
        for _ in range(decode_steps - 1):
            s = jax.lax.cond(cond(s), one_step, lambda x: x, s)
        return s

    final = jax.lax.while_loop(cond, body, state)
    return final.out_buf, final.out_len, final.kv


decode = jax.jit(
    _decode_fn,
    static_argnames=(
        "cfg", "max_steps", "end_of_audio_token", "compute_dtype", "cfg_rows",
        "blocks_fn", "decode_steps",
    ),
)


def pad_to_bucket(tokens, multiple: int = 128, max_len: int | None = None):
    """Right-pad a 1-D token list/array to the next multiple (static bucket)."""
    import numpy as np

    tokens = np.asarray(tokens, dtype=np.int32)
    t = len(tokens)
    bucket = -(-t // multiple) * multiple
    if max_len is not None:
        bucket = min(bucket, max_len)
    out = np.zeros((bucket,), np.int32)
    out[:t] = tokens[:bucket]
    return out, t


def generate(
    params: tfm.Params,
    cfg: TransformerConfig,
    prompt_tokens,  # 1-D int sequence (BPE-offset text ids)
    spk_emb: jax.Array,  # (spk_dim,) or (1, spk_dim)
    *,
    key: jax.Array,
    temperature: float = 1.0,
    top_p: float = 0.95,
    guidance_scale: float | tuple[float, float] = 3.0,
    max_new_tokens: int | None = None,
    end_of_audio_token: int = T.END_OF_AUDIO_TOKEN,
    end_of_text_token: int = 0,
    prompt_pad_multiple: int = 128,
    kv_cache: tfm.KVCache | None = None,
    compute_dtype=jnp.bfloat16,
    cache_dtype=None,
    blocks_fn=None,
    decode_steps: int | None = None,
):
    """Host-facing single-utterance generation (batch 1).

    Equivalent of reference ``generate`` (fam/llm/fast_inference_utils.py:
    182-228): prefill on the prompt, then decode until end-of-audio /
    max_new_tokens / block_size. Returns the full sequence
    [prompt ++ generated] as a 1-D numpy array (EOA included if emitted).

    ``guidance_scale`` is either a float (speaker CFG, 2 rows) or the
    reference's (spkemb_guidance, prompt_guidance) tuple
    (fam/llm/inference.py:646); prompt_guidance > 1 switches to the 3-row
    double-CFG batch (mixins/causal.py:229-262) and needs
    ``end_of_text_token`` (tokenizer.eot_token).
    """
    import numpy as np

    spk_g, prompt_g, cfg_rows = _normalize_guidance(guidance_scale)
    if cfg_rows == 3 and end_of_text_token <= end_of_audio_token:
        raise ValueError(
            "prompt guidance > 1 requires end_of_text_token (tokenizer.eot_token)"
        )
    padded, t_true = pad_to_bucket(
        prompt_tokens, prompt_pad_multiple, max_len=cfg.block_size
    )
    max_steps = cfg.block_size - t_true
    if max_new_tokens is not None:
        max_steps = min(max_steps, max_new_tokens)
    if max_steps <= 0:
        raise ValueError("Prompt is too long to generate more tokens")

    if kv_cache is None or kv_cache.batch_size != cfg_rows:
        kv_cache = tfm.KVCache.create(
            cfg, cfg_rows, cfg.block_size, dtype=cache_dtype or compute_dtype
        )
    spk_emb = jnp.asarray(spk_emb).reshape(1, -1)

    key_prefill, key_decode = jax.random.split(key)
    temperature = jnp.asarray(temperature, jnp.float32)
    top_p_a = jnp.asarray(top_p, jnp.float32)
    guidance = jnp.asarray(spk_g, jnp.float32)
    prompt_guidance = jnp.asarray(prompt_g, jnp.float32)
    eot = jnp.asarray(end_of_text_token, jnp.int32)

    from metavoice_tpu.utils import phases

    with phases.phase("fs.prefill"):
        first_token, kv_cache = prefill(
            params,
            cfg,
            jnp.asarray(padded)[None, :],
            jnp.asarray(t_true, jnp.int32),
            spk_emb,
            kv_cache,
            key_prefill,
            temperature,
            top_p_a,
            guidance,
            compute_dtype=compute_dtype,
            cfg_rows=cfg_rows,
            prompt_guidance_scale=prompt_guidance,
            end_of_text_token=eot,
            blocks_fn=blocks_fn,
        )
        phases.sync(first_token)

    # decode buffer is statically sized by the block; dynamic caps bound the loop
    buf_steps = cfg.block_size
    out_buf, out_len, _ = decode(
        params,
        cfg,
        first_token,
        jnp.asarray(t_true, jnp.int32),
        spk_emb,
        kv_cache,
        key_decode,
        temperature,
        top_p_a,
        guidance,
        jnp.asarray(max_steps - 1, jnp.int32),
        buf_steps,
        end_of_audio_token,
        compute_dtype,
        cfg_rows,
        prompt_guidance,
        eot,
        blocks_fn=blocks_fn,
        # loop-mechanics experiment knob; env default so bench/diag runs can
        # sweep it without API plumbing
        decode_steps=decode_steps
        or int(os.environ.get("MVTPU_DECODE_STEPS", "1")),
    )

    # single fused host transfer: [first, n, tokens...] (each np.asarray is
    # its own dispatch round-trip on the tunneled backend)
    with phases.phase("fs.decode"):
        fetch = np.asarray(
            jnp.concatenate([
                first_token.reshape(-1).astype(jnp.int32),
                out_len.reshape(-1).astype(jnp.int32),
                out_buf[0].astype(jnp.int32),
            ])
        )
    n = int(fetch[1])
    return np.concatenate(
        [np.asarray(prompt_tokens, np.int32), fetch[:1], fetch[2 : 2 + n]]
    )


# --------------------------------------------------------------------------------------
# Ragged batched generation (continuous-batching building block)
# --------------------------------------------------------------------------------------
#
# The reference batches ragged prompts by sorting on length and
# teacher-forcing the longer rows while shorter rows generate
# (fam/llm/mixins/causal.py:140-176, 290-338). The TPU-static equivalent
# here: LEFT-pad every prompt to one bucket length T, give each row a
# per-row attention window [pad_len_row, pos] (enforced by the fused kernel's
# ``starts`` operand) and per-row position ids (arange(T) - pad_len), so all
# rows prefill and decode in lockstep with no recompilation per length mix.


def left_pad_prompts(prompts: list, bucket: int, pad_id: int = 0):
    """list of 1-D int sequences -> ((B, bucket) int32, pad_lens (B,))."""
    import numpy as np

    b = len(prompts)
    out = np.full((b, bucket), pad_id, np.int32)
    pad_lens = np.zeros((b,), np.int32)
    for i, p in enumerate(prompts):
        p = np.asarray(p, np.int32)[-bucket:]
        out[i, bucket - len(p) :] = p
        pad_lens[i] = bucket - len(p)
    return out, pad_lens


def _batch_masks(pad_lens2: jax.Array, t: jax.Array | int, s: int) -> jax.Array:
    """(2B, 1, T, S) prefill mask: query at abs slot i sees slot j iff
    j <= i (causal) and j >= pad_len_row (skip left padding)."""
    q_pos = jnp.arange(t)
    kv_pos = jnp.arange(s)
    causal = q_pos[:, None] >= kv_pos[None, :]  # (T, S)
    valid = kv_pos[None, :] >= pad_lens2[:, None]  # (2B, S)
    return causal[None, None] & valid[:, None, None, :]


@partial(jax.jit, static_argnames=("cfg", "compute_dtype"), donate_argnames=("kv_cache",))
def prefill_batch(
    params: tfm.Params,
    cfg: TransformerConfig,
    prompts: jax.Array,  # (B, T) left-padded
    pad_lens: jax.Array,  # (B,)
    spk_emb: jax.Array,  # (B, spk_dim)
    kv_cache: tfm.KVCache,  # (L, S, 2B, H, Dh)
    key: jax.Array,
    temperature: jax.Array,
    top_p: jax.Array,
    guidance_scale: jax.Array,
    compute_dtype=jnp.bfloat16,
) -> tuple[jax.Array, tfm.KVCache]:
    """Batched ragged prefill; samples each row's first new token."""
    b, t = prompts.shape
    idx2 = _cfg_rows(prompts)
    spk2 = _cfg_rows(spk_emb)
    pad2 = _cfg_rows(pad_lens)
    mask2 = make_spk_cond_mask(b)

    positions = jnp.maximum(jnp.arange(t)[None, :] - pad_lens[:, None], 0)
    positions2 = _cfg_rows(positions)
    x = tfm.embed_inputs(params, cfg, idx2, positions2, spk2, mask2, compute_dtype)
    attn_mask = _batch_masks(pad2, t, kv_cache.max_seq_len)
    x, new_kv = tfm.apply_blocks(params, cfg, x, attn_mask, kv_cache, jnp.asarray(0))
    logits = tfm.output_logits(params, cfg, x[:, -1:, :])[0][:, 0, :]  # (2B, V)
    next_token = S.sample_cfg(
        key, logits, guidance_scale, temperature=temperature, top_p=top_p
    )
    return next_token, new_kv


def _decode_batch_fn(
    params: tfm.Params,
    cfg: TransformerConfig,
    first_token: jax.Array,  # (B,)
    start_pos: jax.Array,  # () — bucket length T (uniform across rows)
    pad_lens: jax.Array,  # (B,)
    spk_emb: jax.Array,  # (B, spk_dim)
    kv_cache: tfm.KVCache,
    key: jax.Array,
    temperature: jax.Array,
    top_p: jax.Array,
    guidance_scale: jax.Array,
    max_new_tokens: jax.Array,
    max_steps: int,
    end_of_audio_token: int = T.END_OF_AUDIO_TOKEN,
    compute_dtype=jnp.bfloat16,
):
    """Ragged-batch decode loop with per-row EOA latches and per-row
    attention windows."""
    b = first_token.shape[0]
    spk2 = _cfg_rows(spk_emb)
    pad2 = _cfg_rows(pad_lens)
    mask2 = make_spk_cond_mask(b)
    block_size = kv_cache.max_seq_len

    state = DecodeState(
        cur_token=first_token.astype(jnp.int32),
        pos=start_pos.astype(jnp.int32),
        step=jnp.asarray(0, jnp.int32),
        kv=kv_cache,
        key=key,
        done=first_token == end_of_audio_token,
        out_buf=jnp.full((b, max_steps), end_of_audio_token, jnp.int32),
        out_len=jnp.zeros((b,), jnp.int32),
    )

    def cond(s: DecodeState):
        return (~jnp.all(s.done)) & (s.step < max_new_tokens) & (s.pos < block_size)

    def body(s: DecodeState) -> DecodeState:
        key, sub = jax.random.split(s.key)
        idx2 = _cfg_rows(s.cur_token)[:, None]
        positions2 = (s.pos - pad2)[:, None]  # per-row logical position
        x = tfm.embed_inputs(params, cfg, idx2, positions2, spk2, mask2, compute_dtype)
        kv_pos = jnp.arange(s.kv.max_seq_len)
        attn_mask = (
            (kv_pos[None, :] <= s.pos) & (kv_pos[None, :] >= pad2[:, None])
        )[:, None, None, :]
        out, new_kv, head_done = tfm.apply_blocks(
            params, cfg, x, attn_mask, s.kv, s.pos, attn_starts=pad2,
            fused_head=True,
        )
        logits = out if head_done else tfm.output_logits(params, cfg, out)[0][:, 0, :]
        sampled = S.sample_cfg(
            sub, logits, guidance_scale, temperature=temperature, top_p=top_p
        )
        next_token = jnp.where(s.done, end_of_audio_token, sampled).astype(jnp.int32)
        out_buf = jax.lax.dynamic_update_slice(s.out_buf, next_token[:, None], (0, s.step))
        newly_active = ~s.done
        return DecodeState(
            cur_token=next_token,
            pos=s.pos + 1,
            step=s.step + 1,
            kv=new_kv,
            key=key,
            done=s.done | (next_token == end_of_audio_token),
            out_buf=out_buf,
            out_len=s.out_len + newly_active.astype(jnp.int32),
        )

    final = jax.lax.while_loop(cond, body, state)
    return final.out_buf, final.out_len, final.kv


decode_batch = jax.jit(
    _decode_batch_fn,
    static_argnames=("cfg", "max_steps", "end_of_audio_token", "compute_dtype"),
    # the multi-GB cache buffers alias in-place across the call
    donate_argnames=("kv_cache",),
)


def generate_batch(
    params: tfm.Params,
    cfg: TransformerConfig,
    prompts: list,  # B ragged int sequences
    spk_embs: jax.Array,  # (B, spk_dim)
    *,
    key: jax.Array,
    temperature: float = 1.0,  # scalar or per-row length-B sequence
    top_p: float = 0.95,  # scalar or per-row
    guidance_scale: float = 3.0,  # scalar or per-row
    max_new_tokens: int | None = None,
    end_of_audio_token: int = T.END_OF_AUDIO_TOKEN,
    prompt_pad_multiple: int = 128,
    compute_dtype=jnp.bfloat16,
    cache_dtype=None,
) -> list:
    """Decode a ragged batch; returns a list of B generated-token arrays
    (prompt not included, EOA included when emitted).

    Sampling knobs accept per-row vectors: they are traced (B, 1) operands
    that broadcast through the temperature/top-p/CFG math, so mixed-settings
    batches share one compiled program (no recompilation per combination).
    """
    import numpy as np

    b = len(prompts)
    longest = max(len(p) for p in prompts)
    bucket = min(-(-longest // prompt_pad_multiple) * prompt_pad_multiple, cfg.block_size)
    padded, pad_lens = left_pad_prompts(prompts, bucket)

    max_steps = cfg.block_size - bucket
    if max_new_tokens is not None:
        max_steps = min(max_steps, max_new_tokens)
    if max_steps <= 0:
        raise ValueError("Prompts too long to generate more tokens")

    def per_row(v):
        a = jnp.asarray(v, jnp.float32).reshape(-1)
        return jnp.broadcast_to(a, (b,)).reshape(b, 1)

    kv = tfm.KVCache.create(cfg, 2 * b, cfg.block_size, dtype=cache_dtype or compute_dtype)
    kp, kd = jax.random.split(key)
    t1 = per_row(temperature)
    tp = per_row(top_p)
    g = per_row(guidance_scale)

    first, kv = prefill_batch(
        params, cfg, jnp.asarray(padded), jnp.asarray(pad_lens),
        spk_embs, kv, kp, t1, tp, g, compute_dtype=compute_dtype,
    )
    buf, lens, _ = decode_batch(
        params, cfg, first, jnp.asarray(bucket, jnp.int32), jnp.asarray(pad_lens),
        spk_embs, kv, kd, t1, tp, g,
        jnp.asarray(max_steps - 1, jnp.int32), cfg.block_size,
        end_of_audio_token, compute_dtype,
    )
    # one fused host transfer for the whole batch (per-array np.asarray
    # costs a dispatch round-trip each on the tunneled backend)
    fetch = np.asarray(
        jnp.concatenate(
            [
                first.reshape(b, 1).astype(jnp.int32),
                lens.reshape(b, 1).astype(jnp.int32),
                buf.astype(jnp.int32),
            ],
            axis=1,
        )
    )
    return [
        np.concatenate([fetch[i, :1], fetch[i, 2 : 2 + fetch[i, 1]]]).astype(np.int32)
        for i in range(b)
    ]


# --------------------------------------------------------------------------------------
# Streaming segment generation (time-to-first-audio)
# --------------------------------------------------------------------------------------


def generate_segments(
    params: tfm.Params,
    cfg: TransformerConfig,
    prompt_tokens,
    spk_emb: jax.Array,
    *,
    key: jax.Array,
    segment_tokens: int = 150,  # 75 frames = 1 s of audio per segment
    first_segment_tokens: int | None = None,  # smaller first segment => lower TTFA
    temperature: float = 1.0,
    top_p: float = 0.95,
    guidance_scale: float | tuple[float, float] = 3.0,
    max_new_tokens: int | None = None,
    end_of_audio_token: int = T.END_OF_AUDIO_TOKEN,
    end_of_text_token: int = 0,
    prompt_pad_multiple: int = 128,
    compute_dtype=jnp.bfloat16,
    cache_dtype=None,
    kv_cache: tfm.KVCache | None = None,
    blocks_fn=None,
):
    """Yield generated tokens in ~1 s segments instead of one final array.

    ``kv_cache``/``blocks_fn``: same contracts as in :func:`generate` — a
    caller-owned (possibly TP-sharded) cache and an alternative block-stack
    application (the shard_map tensor-parallel path).

    The decode while_loop supports resuming from (cur_token, pos, cache), so
    each segment is one bounded device program; downstream stages (second
    stage + vocoder) can render segment N while the user already hears
    segment N-1 — this is what turns time-to-first-audio from full-utterance
    latency into ~one-segment latency. Segment boundaries stay even so the
    h0/h1 interleaving splits into whole EnCodec frames.
    """
    import numpy as np

    if segment_tokens % 2 != 0:
        raise ValueError("segment_tokens must be even (whole interleaved frames)")
    if first_segment_tokens is None:
        first_segment_tokens = segment_tokens
    if first_segment_tokens % 2 != 0:
        raise ValueError("first_segment_tokens must be even")
    spk_g, prompt_g, cfg_rows = _normalize_guidance(guidance_scale)
    if cfg_rows == 3 and end_of_text_token <= end_of_audio_token:
        raise ValueError(
            "prompt guidance > 1 requires end_of_text_token (tokenizer.eot_token)"
        )
    padded, t_true = pad_to_bucket(prompt_tokens, prompt_pad_multiple, max_len=cfg.block_size)
    budget = cfg.block_size - t_true
    if max_new_tokens is not None:
        budget = min(budget, max_new_tokens)
    if budget <= 0:
        raise ValueError("Prompt is too long to generate more tokens")

    kv = kv_cache
    if kv is None or kv.batch_size != cfg_rows:
        kv = tfm.KVCache.create(
            cfg, cfg_rows, cfg.block_size, dtype=cache_dtype or compute_dtype
        )
    spk_emb = jnp.asarray(spk_emb).reshape(1, -1)
    key, kp = jax.random.split(key)
    t1 = jnp.asarray(temperature, jnp.float32)
    tp = jnp.asarray(top_p, jnp.float32)
    g = jnp.asarray(spk_g, jnp.float32)
    pg = jnp.asarray(prompt_g, jnp.float32)
    eot = jnp.asarray(end_of_text_token, jnp.int32)

    cur, kv = prefill(
        params, cfg, jnp.asarray(padded)[None, :], jnp.asarray(t_true, jnp.int32),
        spk_emb, kv, kp, t1, tp, g, compute_dtype=compute_dtype,
        cfg_rows=cfg_rows, prompt_guidance_scale=pg, end_of_text_token=eot,
        blocks_fn=blocks_fn,
    )
    # The prefill token is NOT read back here: on the tunneled backend every
    # host round-trip costs dispatch latency, so the first decode runs
    # speculatively and one fused transfer returns [seed, n, tokens...].
    # (If the prefill token was already EOA we discard the speculative
    # decode on the host — rare, and correctness is unaffected.)
    pos = t_true
    pending: list[int] = []
    seed_pending = 1  # the unread prefill token logically heads `pending`
    emitted = 1
    first_iter = True
    target_tokens = first_segment_tokens  # ramps to segment_tokens after seg 1
    while emitted < budget and pos < cfg.block_size:
        key, kd = jax.random.split(key)
        step_budget = min(
            target_tokens - len(pending) - seed_pending,
            budget - emitted,
            cfg.block_size - pos,
        )
        if step_budget <= 0:
            break
        buf, lens, kv = decode(
            params, cfg, cur, jnp.asarray(pos, jnp.int32), spk_emb, kv, kd,
            t1, tp, g, jnp.asarray(step_budget, jnp.int32), cfg.block_size,
            end_of_audio_token, compute_dtype, cfg_rows, pg, eot,
            blocks_fn=blocks_fn,
        )
        # next seed stays on device; one fused host transfer per step
        next_cur = buf[:, jnp.maximum(lens[0] - 1, 0)]
        fetch = np.asarray(
            jnp.concatenate([
                cur.reshape(-1).astype(jnp.int32),
                lens.reshape(-1).astype(jnp.int32),
                buf[0].astype(jnp.int32),
            ])
        )
        seed_tok, n = int(fetch[0]), int(fetch[1])
        toks = fetch[2 : 2 + n]
        if first_iter:
            if seed_tok == end_of_audio_token:
                yield np.asarray([seed_tok], np.int32)
                return
            pending.append(seed_tok)
            seed_pending = 0
            first_iter = False
        pending.extend(int(t) for t in toks)
        emitted += n
        pos += n
        done = n > 0 and toks[-1] == end_of_audio_token
        if len(pending) >= target_tokens or done or emitted >= budget:
            yield np.asarray(pending, np.int32)
            pending = []
            target_tokens = segment_tokens
        if done or n == 0:
            return
        cur = next_cur
    if seed_pending:
        # loop never ran (budget exhausted at 1): surface the prefill token
        pending = [int(np.asarray(cur)[0])] + pending
    if pending:
        yield np.asarray(pending, np.int32)


# --------------------------------------------------------------------------------------
# Mid-flight batch joining (continuous serving)
# --------------------------------------------------------------------------------------
#
# The slot-pool serving engine (runtime/engine.py) decodes a fixed batch in
# lockstep at one shared PHYSICAL cache position while each row keeps its own
# LOGICAL timeline (wpe positions are computed as `pos - pad_len` per row,
# _decode_batch_fn above). A request can therefore join a group mid-decode:
# prefill its prompt into a small 2-row temp cache, copy those rows into the
# big cache so the prompt ENDS at the group's current position P, and set the
# row's pad_len to P - len(prompt). Its attention window [pad_len, pos] and
# logical positions come out exactly as a fresh decode's would — the physical
# offset is invisible to the model.


@partial(jax.jit, donate_argnames=("k", "v"))
def merge_slot_cache(
    k: jax.Array,  # (L, S, 2B, H, Dh) big cache
    v: jax.Array,
    tk: jax.Array,  # (L, Tpad, 2, H, Dh) temp cache (rows: cond, uncond)
    tv: jax.Array,
    phys_start: jax.Array,  # () int32 — P - Tpad
    row_c: jax.Array,  # () int32 — slot index (conditioned row)
    row_u: jax.Array,  # () int32 — n_slots + slot (unconditioned row)
) -> tuple[jax.Array, jax.Array]:
    """Copy a joining request's prefilled KV rows into the shared cache."""
    z = jnp.asarray(0, jnp.int32)
    k = jax.lax.dynamic_update_slice(k, tk[:, :, 0:1], (z, phys_start, row_c, z, z))
    k = jax.lax.dynamic_update_slice(k, tk[:, :, 1:2], (z, phys_start, row_u, z, z))
    v = jax.lax.dynamic_update_slice(v, tv[:, :, 0:1], (z, phys_start, row_c, z, z))
    v = jax.lax.dynamic_update_slice(v, tv[:, :, 1:2], (z, phys_start, row_u, z, z))
    return k, v


@partial(jax.jit, static_argnames=("n_head",), donate_argnames=("ks", "vs"))
def merge_slot_scales(
    ks: jax.Array,  # (L, S, 1, BHpad) f32 big int8-cache scale tables
    vs: jax.Array,
    tks: jax.Array,  # (L, Tpad, 1, bhpad_temp) temp tables (2 rows of heads)
    tvs: jax.Array,
    phys_start: jax.Array,
    row_c: jax.Array,
    row_u: jax.Array,
    n_head: int,
) -> tuple[jax.Array, jax.Array]:
    """int8-cache variant: also land the per-(position, head) scale columns."""
    z = jnp.asarray(0, jnp.int32)
    h = n_head
    ks = jax.lax.dynamic_update_slice(ks, tks[:, :, :, 0:h], (z, phys_start, z, row_c * h))
    ks = jax.lax.dynamic_update_slice(ks, tks[:, :, :, h : 2 * h], (z, phys_start, z, row_u * h))
    vs = jax.lax.dynamic_update_slice(vs, tvs[:, :, :, 0:h], (z, phys_start, z, row_c * h))
    vs = jax.lax.dynamic_update_slice(vs, tvs[:, :, :, h : 2 * h], (z, phys_start, z, row_u * h))
    return ks, vs


# --------------------------------------------------------------------------------------
# Group rebase (continuous serving)
# --------------------------------------------------------------------------------------
#
# The shared physical timeline only grows while any slot is active, so under
# sustained load a lockstep group eventually nears block_size: admissions
# stop and late joiners can be left with as little as min_decode_budget
# tokens before forced truncation. REBASE reclaims the dead prefix instead:
# when every active row's valid window starts at >= s, slide the whole cache
# s positions toward the origin and subtract s from the shared position and
# every row's pad. Window contents, logical wpe positions (pos - pad), and
# the sampling key sequence are all invariant, so a rebased decode is
# bit-identical to an unrebased one (pinned by tests/test_engine.py).


REBASE_ALIGN = 128  # rebase shifts must be multiples of this (see below)


def _shift_seq_left(
    arrs: tuple, s: jax.Array, chunk: int, pos: jax.Array | None, axis: int = 1
):
    """Shift ``axis`` of every array left by ``s``, chunked, donation-friendly.

    Ascending chunked copy: iteration i reads [s + i*C, s + (i+1)*C) and
    writes [i*C, (i+1)*C). For s >= 0 a later iteration's read region never
    overlaps an earlier iteration's write region (their start distance is
    (i-j)*C + s > 0 with the read strictly ahead), so XLA's in-place
    aliasing of the donated loop carry is hazard-free.

    ``s`` MUST be a multiple of ``chunk`` (callers floor it; the engine
    floors to REBASE_ALIGN): then every chunk whose read would run past the
    end (and be clamp-shifted by dynamic_slice) has its write start at
    >= S - s — past the shifted valid prefix (pos - s <= S - s), so clamped
    reads only ever copy garbage over garbage. A non-multiple ``s`` would
    let a clamped read land garbage INSIDE the valid tail.
    """
    S = arrs[0].shape[axis]
    if S % chunk != 0:
        # non-chunk-multiple sequence lengths (toy configs): jnp.roll keeps
        # the valid prefix exact for ANY s (the wrapped tail is garbage past
        # pos - s, which is invalid by definition) at the cost of a full
        # out-of-place copy — fine at toy scale.
        return tuple(jnp.roll(a, -s, axis=axis) for a in arrs)
    if pos is None:
        n = S // chunk
    else:
        # only the valid prefix [s, pos) needs to move: ceil((pos-s)/chunk)
        # chunks (traced bound — fori_loop lowers to a while_loop), instead
        # of sweeping the whole S axis on every rebase
        n = jnp.clip((pos - s + chunk - 1) // chunk, 0, S // chunk)

    def body(i, t):
        blocks = [
            jax.lax.dynamic_slice_in_dim(a, s + i * chunk, chunk, axis=axis)
            for a in t
        ]
        return tuple(
            jax.lax.dynamic_update_slice_in_dim(a, b, i * chunk, axis=axis)
            for a, b in zip(t, blocks)
        )

    return jax.lax.fori_loop(0, n, body, arrs)


@partial(jax.jit, donate_argnames=("k", "v"))
def shift_cache_left(k: jax.Array, v: jax.Array, s: jax.Array, pos: jax.Array | None = None):
    """Slide the valid prefix of the (L, S, B, H, Dh) cache left by ``s``.

    ``pos`` (the current end of the valid prefix) bounds the copy — without
    it the whole S axis is swept."""
    return _shift_seq_left((k, v), s, 128, pos)


@partial(jax.jit, donate_argnames=("ks", "vs"))
def shift_scales_left(ks: jax.Array, vs: jax.Array, s: jax.Array, pos: jax.Array | None = None):
    """int8-cache variant: slide the (L, S, 1, BHpad) scale tables too."""
    return _shift_seq_left((ks, vs), s, 128, pos)


@partial(jax.jit, donate_argnames=("k", "v"))
def shift_cache_left_packed(
    k: jax.Array, v: jax.Array, s: jax.Array, pos: jax.Array | None = None
):
    """Packed-cache variant: the (L, S/4, B, H, Dh) int32 word arrays shift
    by s/4 words. ``s`` must be a multiple of 4 (REBASE_ALIGN=128 is); the
    position residue s%4==0 also keeps every packed byte lane in place, so
    the shifted prefix is bit-identical to repacking a shifted int8 cache."""
    return _shift_seq_left(
        (k, v), s // 4, 32, None if pos is None else (pos + 3) // 4
    )


@partial(jax.jit, donate_argnames=("ks", "vs"))
def shift_scales_left_packed(
    ks: jax.Array, vs: jax.Array, s: jax.Array, pos: jax.Array | None = None
):
    """Packed-cache variant: the residue-split (L, 4, S/4, 1, BHpad) scale
    tables shift along their word axis (axis 2) by s/4."""
    return _shift_seq_left(
        (ks, vs), s // 4, 32, None if pos is None else (pos + 3) // 4, axis=2
    )


def _merge_packed_words(big, tmp, phys_start, row):
    """Byte-granular merge of one temp row into the packed word cache.

    ``big`` (L, Sw, 2B, H, Dh) i32, ``tmp`` (L, Tw, H, Dh) i32 holding the
    temp cache's packed positions [0, 4*Tw); land them at absolute positions
    [phys_start, phys_start + 4*Tw) of batch row ``row`` for every layer,
    at ANY alignment of ``phys_start``. Key identity: a target byte lane j
    of word wbase+i reads absolute position 4*(wbase+i)+j, i.e. temp
    position 4*i + r0 with r0 = 4*wbase + j - phys_start — whose residue
    r0 % 4 is CONSTANT over i, so each of the four target lanes is one
    word-axis shift of one source lane (no per-element gather)."""
    l, sw = big.shape[:2]
    tw = tmp.shape[1]
    t = 4 * tw
    nw = min(tw + 1, sw)
    wbase = jnp.clip(phys_start // 4, 0, sw - nw)
    old = jax.lax.dynamic_slice(
        big, (0, wbase, row, 0, 0), (l, nw, 1) + big.shape[3:]
    )  # (L, NW, 1, H, Dh)
    iw = jnp.arange(nw)
    new = old
    for j in range(tfm.KV_PACK):
        r0 = 4 * wbase + j - phys_start
        src_j = jax.lax.rem(jax.lax.rem(r0, 4) + 4, 4)  # source byte lane
        src_w = iw + jax.lax.div(r0 - src_j, 4)  # source word per target word
        rel = 4 * iw + r0  # temp position feeding this lane
        valid = (rel >= 0) & (rel < t)
        src = jnp.take(tmp, jnp.clip(src_w, 0, tw - 1), axis=1)  # (L, NW, H, Dh)
        byte = (src >> (8 * src_j)) & 0xFF
        vmask = valid[None, :, None, None, None]
        # NB: build the lane mask with an i32 array shift — 0xFF<<24 as a
        # Python int overflows the jnp.int32 constructor
        lane_mask = jnp.left_shift(jnp.int32(0xFF), 8 * j)
        new = jnp.where(vmask, (new & ~lane_mask) | (byte[:, :, None] << (8 * j)), new)
    return jax.lax.dynamic_update_slice(big, new, (0, wbase, row, 0, 0))


@partial(jax.jit, donate_argnames=("k", "v"))
def merge_slot_cache_packed(
    k: jax.Array,  # (L, Sw, 2B, H, Dh) i32 big packed cache
    v: jax.Array,
    tk: jax.Array,  # (L, Tw, 2, H, Dh) i32 packed temp (rows: cond, uncond)
    tv: jax.Array,
    phys_start: jax.Array,  # () int32 — P - Tpad (any alignment)
    row_c: jax.Array,
    row_u: jax.Array,
) -> tuple[jax.Array, jax.Array]:
    """Packed-cache variant of merge_slot_cache: byte-granular landing of a
    joining request's prefilled rows at an arbitrary physical offset."""
    k = _merge_packed_words(k, tk[:, :, 0], phys_start, row_c)
    k = _merge_packed_words(k, tk[:, :, 1], phys_start, row_u)
    v = _merge_packed_words(v, tv[:, :, 0], phys_start, row_c)
    v = _merge_packed_words(v, tv[:, :, 1], phys_start, row_u)
    return k, v


def _merge_packed_scales(big, tmp, phys_start, col, h):
    """Residue-split scale-table merge: ``big`` (L, 4, Sw, 1, BHpad), ``tmp``
    (L, 4, Tw, 1, h) — the h head columns of one temp row — landing at
    absolute positions [phys_start, 4*Tw + phys_start), columns
    [col, col+h). Same constant-residue identity as _merge_packed_words,
    here mapping target residue jt to ONE source residue row + word shift."""
    l, _, sw, _, bhp = big.shape
    tw = tmp.shape[2]
    t = 4 * tw
    nw = min(tw + 1, sw)
    wbase = jnp.clip(phys_start // 4, 0, sw - nw)
    old = jax.lax.dynamic_slice(
        big, (0, 0, wbase, 0, col), (l, tfm.KV_PACK, nw, 1, h)
    )  # (L, 4, NW, 1, h)
    iw = jnp.arange(nw)
    lanes = []
    for jt in range(tfm.KV_PACK):
        r0 = 4 * wbase + jt - phys_start
        src_j = jax.lax.rem(jax.lax.rem(r0, 4) + 4, 4)
        src_w = iw + jax.lax.div(r0 - src_j, 4)
        rel = 4 * iw + r0
        valid = (rel >= 0) & (rel < t)
        src_res = jnp.take(tmp, src_j, axis=1)  # (L, Tw, 1, h)
        src = jnp.take(src_res, jnp.clip(src_w, 0, tw - 1), axis=1)  # (L, NW, 1, h)
        lanes.append(jnp.where(valid[None, :, None, None], src, old[:, jt]))
    new = jnp.stack(lanes, axis=1)
    return jax.lax.dynamic_update_slice(big, new, (0, 0, wbase, 0, col))


@partial(jax.jit, static_argnames=("n_head",), donate_argnames=("ks", "vs"))
def merge_slot_scales_packed(
    ks: jax.Array,  # (L, 4, Sw, 1, BHpad) f32 big packed scale tables
    vs: jax.Array,
    tks: jax.Array,  # (L, 4, Tw, 1, bhpad_temp) temp tables (2 rows of heads)
    tvs: jax.Array,
    phys_start: jax.Array,
    row_c: jax.Array,
    row_u: jax.Array,
    n_head: int,
) -> tuple[jax.Array, jax.Array]:
    """Packed-cache variant of merge_slot_scales."""
    h = n_head
    ks = _merge_packed_scales(ks, tks[..., 0:h], phys_start, row_c * h, h)
    ks = _merge_packed_scales(ks, tks[..., h : 2 * h], phys_start, row_u * h, h)
    vs = _merge_packed_scales(vs, tvs[..., 0:h], phys_start, row_c * h, h)
    vs = _merge_packed_scales(vs, tvs[..., h : 2 * h], phys_start, row_u * h, h)
    return ks, vs

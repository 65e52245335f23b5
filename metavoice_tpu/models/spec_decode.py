"""Speculative decoding for the first stage: draft-propose, verify-in-one-pass.

The reference has no speculative path — its fast decode launches one compiled
step per token (fam/llm/fast_inference_utils.py:148-174). Our single-token
decode is weight-DMA-bound (the int4 whole-stack megakernel streams every
4-bit weight once per token, ops/decode_stack.py), so the standard lever past
quantization is speculation: a small draft model proposes ``gamma`` tokens
autoregressively, then the big target model scores all of them in ONE
multi-token forward — reading its weights once per *gamma* tokens instead of
once per token — and a rejection-sampling step accepts a prefix whose
marginal distribution provably equals ordinary sampling from the target
(Leviathan et al., "Fast Inference from Transformers via Speculative
Decoding").

TPU-native design notes:

  * the whole generation is ONE ``lax.while_loop`` program, like the normal
    decode (models/first_stage.py): draft proposals are a ``lax.scan`` of
    ``gamma`` single-token draft forwards, the verify is one ``apply_blocks``
    call with ``T=gamma`` riding the M-tiled quantized prefill kernels, and
    accept/reject/residual sampling is vectorized on device. No host syncs.
  * static shapes throughout: every round proposes exactly ``gamma`` tokens
    and emits a masked prefix; the out buffer is written with
    ``dynamic_update_slice`` and over-written garbage beyond ``n_emit`` is
    reclaimed by the next round's write at the advanced offset.
  * KV caches need NO rollback machinery: both caches are written at
    positions ``[pos, pos+gamma)`` every round, and rejected suffixes simply
    stay as stale rows ABOVE the new ``pos`` — the causal attention mask
    (query at position p sees keys <= p) makes them unreachable until they
    are overwritten by a later round.
  * CFG comes along unchanged: both draft and target run their usual 2- or
    3-row guidance batch, and the accept/reject math operates on the FINAL
    sampled distribution (guidance-merged, temperature-scaled, top-p-masked
    — core/sampling.logits_to_probs), which is the distribution ordinary
    decoding samples from. That is what makes the equivalence exact.

Scope: batch size 1 (single-stream latency — the serving-batch path is
already at the HBM roof, docs/PERFORMANCE.md "Batch-8 is at the HBM roof",
and per-row divergent acceptance lengths would break the shared-position
sequence-major cache). The draft must share the token space and may have any
smaller architecture; pass the target itself as the draft to sanity-check
(acceptance -> 100%).

No bonus token on full acceptance: emitting the free (gamma+1)-th token
would leave a position the draft never consumed, requiring a 2-token draft
step next round (a second program). We cap the per-round yield at ``gamma``
to keep every round shape-identical; raise ``gamma`` instead.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from metavoice_tpu.core import sampling as S
from metavoice_tpu.core import tokens as T
from metavoice_tpu.core.config import TransformerConfig
from metavoice_tpu.models import first_stage as fs
from metavoice_tpu.models import transformer as tfm


def accept_emit(
    key: jax.Array,
    drafted: jax.Array,  # (G,) int32 — draft proposals d_1..d_G
    q: jax.Array,  # (G, V) f32 — draft dist each d_i was sampled from
    p: jax.Array,  # (G, V) f32 — target dist at the same positions
    end_of_audio_token: int,
    limit: jax.Array | None = None,  # () int32 — emission budget cap
) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Vectorized rejection sampling over one speculation window.

    Accept d_i with probability min(1, p_i(d_i) / q_i(d_i)); at the first
    rejection j, emit a replacement drawn from the residual
    normalize(max(p_j - q_j, 0)) and stop. The marginal distribution of
    every emitted token equals sampling from ``p`` directly (the classic
    speculative-sampling identity — pinned by a frequency oracle in
    tests/test_spec_decode.py).

    Returns (emitted (G,), n_emit (), done (), n_accepted ()): the first
    ``n_emit`` entries of ``emitted`` are valid; ``done`` latches when an
    end-of-audio token lands inside the emitted prefix (which then truncates
    at it); ``n_accepted`` counts pure draft acceptances (before EOA/limit
    truncation) for telemetry.
    """
    g = drafted.shape[0]
    ku, kr = jax.random.split(key)
    rows = jnp.arange(g)
    q_d = q[rows, drafted]
    p_d = p[rows, drafted]
    u = jax.random.uniform(ku, (g,))
    acc = u < jnp.minimum(1.0, p_d / jnp.maximum(q_d, 1e-30))
    # longest accepted prefix: cumprod kills everything after the first 0
    keep = jnp.cumprod(acc.astype(jnp.int32))
    n_acc = keep.sum()
    rej = n_acc < g
    j = jnp.minimum(n_acc, g - 1)
    pj = jnp.take(p, j, axis=0)
    qj = jnp.take(q, j, axis=0)
    r = jnp.maximum(pj - qj, 0.0)
    rs = r.sum()
    # p == q makes the residual empty, but then rejection has probability 0;
    # the fallback to pj only guards numerical dust.
    r_dist = jnp.where(rs > 1e-12, r / jnp.maximum(rs, 1e-30), pj)
    repl = jax.random.categorical(kr, jnp.log(r_dist + 1e-30)).astype(jnp.int32)
    emitted = jnp.where((rows == j) & rej, repl, drafted).astype(jnp.int32)
    n_emit = jnp.where(rej, j + 1, g)
    if limit is not None:
        n_emit = jnp.minimum(n_emit, limit)
    is_eoa = (emitted == end_of_audio_token) & (rows < n_emit)
    eoa_pos = jnp.min(jnp.where(is_eoa, rows, g))
    done = eoa_pos < n_emit
    n_emit = jnp.where(done, eoa_pos + 1, n_emit)
    return emitted, n_emit, done, n_acc


class _SpecState(NamedTuple):
    cur_token: jax.Array  # () int32 — last emitted token
    pos: jax.Array  # () int32 — next cache write position (both models)
    kv_t: tfm.KVCache
    kv_d: tfm.KVCache
    key: jax.Array
    done: jax.Array  # () bool
    out_buf: jax.Array  # (max_steps + G,) int32
    out_len: jax.Array  # () int32
    n_accepted: jax.Array  # () int32 — draft tokens accepted (telemetry)
    rounds: jax.Array  # () int32


def _spec_decode_fn(
    params_t: tfm.Params,
    params_d: tfm.Params,
    first_token: jax.Array,  # () or (1,) int32 — sampled by target prefill
    start_pos: jax.Array,  # () int32
    spk_emb: jax.Array,  # (1, spk_dim)
    kv_t: tfm.KVCache,
    kv_d: tfm.KVCache,
    key: jax.Array,
    temperature: jax.Array,
    top_p: jax.Array,
    guidance_scale: jax.Array,
    max_new_tokens: jax.Array,  # () int32 dynamic cap (<= max_steps)
    draft_temperature: jax.Array | None = None,  # () f32; None = temperature
    draft_top_p: jax.Array | None = None,  # () f32; None = top_p
    *,
    cfg_t: TransformerConfig,
    cfg_d: TransformerConfig,
    gamma: int,
    max_steps: int,
    end_of_audio_token: int = T.END_OF_AUDIO_TOKEN,
    compute_dtype=jnp.bfloat16,
    cfg_rows: int = 2,
    prompt_guidance_scale: jax.Array | float = 1.0,
    end_of_text_token: jax.Array | int = 0,
    draft_rows: int = 0,  # 0 = cfg_rows; 1 = CFG-free draft (see below)
):
    """Speculative decode loop (B=1). Returns (out_buf, out_len, stats).

    ``draft_rows=1`` runs the draft WITHOUT classifier-free guidance: one
    speaker-conditioned row, proposals sampled from its plain
    temperature/top-p distribution. Rejection sampling stays exact for ANY
    proposal distribution q — q only has to be the distribution the draft
    tokens were actually sampled from — so this halves the per-round draft
    compute; a draft distilled against the target's guidance-MERGED
    distribution (scripts/distill_draft.py) bakes the guidance into its
    single row, so acceptance does not pay for the missing rows either.

    ``draft_temperature`` / ``draft_top_p`` shape the PROPOSAL distribution
    only (the target's verify distribution keeps the caller's sampling
    params). Rejection sampling is exact for any proposal q as long as q is
    the distribution the draft tokens were actually sampled from — both
    knobs are applied before sampling AND recorded in q, so output
    marginals are unchanged (frequency oracle:
    tests/test_spec_decode.py). Sharpening the proposal (temperature < 1)
    raises acceptance when the draft's modes align with the target's but
    its tails are miscalibrated — the cheap acceptance lever for distilled
    drafts.
    """
    if draft_temperature is None:
        draft_temperature = temperature
    if draft_top_p is None:
        draft_top_p = top_p
    spk2_t = fs._cfg_rows(spk_emb, cfg_rows)
    if draft_rows == 0:
        draft_rows = cfg_rows
    spk2_d = fs._cfg_rows(spk_emb, draft_rows) if draft_rows > 1 else spk_emb
    mask2 = fs.make_spk_cond_mask(1, cfg_rows)
    mask2_d = (
        fs.make_spk_cond_mask(1, draft_rows)
        if draft_rows > 1
        else jnp.ones((1, 1, 1))
    )
    block_limit = min(cfg_t.block_size, cfg_d.block_size)
    # NOTE (measured dead end, round 4): bounding the verify attention to
    # the live cache prefix via a lax.switch over static attn_len buckets —
    # to avoid reading the FULL static cache (~0.8 GB/round at block 2048)
    # — made T_round 5.0 -> 121.8 ms on the v5e: a branched conditional
    # around the block stack defeats XLA's in-place aliasing of the carried
    # KV caches (and the kernel-path routing) far more expensively than the
    # full-prefix read it saves. A length-bounded MULTI-TOKEN Pallas
    # decode-attention kernel (the T=1 kernels already stream only
    # [0, pos]) is the correct future lever.

    def _guided_probs(logits_rows: jax.Array) -> jax.Array:
        """(cfg_rows, ..., V) raw logits -> (..., V) final sampled dist."""
        if cfg_rows == 3:
            merged = S.cfg_merge3(
                logits_rows, guidance_scale, prompt_guidance_scale
            )
        else:
            merged = S.cfg_merge(logits_rows, guidance_scale)
        return S.logits_to_probs(merged[0], temperature=temperature, top_p=top_p)

    def _rows(tok2d: jax.Array) -> jax.Array:
        """(1, T) -> (cfg_rows, T) with prompt-uncond replacement on row 3."""
        idx2 = fs._cfg_rows(tok2d, cfg_rows)
        if cfg_rows == 3:
            idx2 = jnp.concatenate(
                [idx2[:2], fs._uncond_prompt_rows(idx2[2:], end_of_text_token)],
                axis=0,
            )
        return idx2

    def draft_step(carry, k_i):
        cur_d, kvd, posd = carry
        if draft_rows == 1:
            idx2 = cur_d.reshape(1, 1)
        else:
            idx2 = _rows(cur_d.reshape(1, 1))
        positions = posd[None]
        x = tfm.embed_inputs(
            params_d, cfg_d, idx2, positions, spk2_d, mask2_d, compute_dtype
        )
        am = tfm.causal_mask_for(positions, kvd.max_seq_len)[None, None]
        out, kvd = tfm.apply_blocks(params_d, cfg_d, x, am, kvd, posd)
        logits = tfm.output_logits(params_d, cfg_d, out)[0][:, 0, :]
        if draft_rows == 1:
            qdist = S.logits_to_probs(
                logits[0], temperature=draft_temperature, top_p=draft_top_p
            )
        else:
            if cfg_rows == 3:
                merged = S.cfg_merge3(
                    logits, guidance_scale, prompt_guidance_scale
                )
            else:
                merged = S.cfg_merge(logits, guidance_scale)
            qdist = S.logits_to_probs(
                merged[0], temperature=draft_temperature, top_p=draft_top_p
            )  # (V,)
        d = jax.random.categorical(k_i, jnp.log(qdist + 1e-30)).astype(jnp.int32)
        return (d, kvd, posd + 1), (d, qdist)

    def round_body(s: _SpecState) -> _SpecState:
        key, k_draft, k_acc = jax.random.split(s.key, 3)
        dkeys = jax.random.split(k_draft, gamma)
        (_, kv_d_new, _), (drafted, qs) = jax.lax.scan(
            draft_step, (s.cur_token, s.kv_d, s.pos), dkeys
        )
        # verify: target consumes [cur, d_1..d_{G-1}] at [pos, pos+G) — one
        # multi-token forward through the quantized prefill matmul path
        tok_v = jnp.concatenate([s.cur_token[None], drafted[:-1]])
        idx2 = _rows(tok_v[None, :])
        positions = s.pos + jnp.arange(gamma)
        x = tfm.embed_inputs(
            params_t, cfg_t, idx2, positions, spk2_t, mask2, compute_dtype
        )
        am = tfm.causal_mask_for(positions, s.kv_t.max_seq_len)[None, None]
        out, kv_t_new = tfm.apply_blocks(params_t, cfg_t, x, am, s.kv_t, s.pos)
        logits = tfm.output_logits(params_t, cfg_t, out)[0]  # (R, G, V)
        ps = _guided_probs(logits)  # (G, V)
        emitted, n_emit, done, n_acc = accept_emit(
            k_acc, drafted, qs, ps, end_of_audio_token,
            limit=max_new_tokens - s.out_len,
        )
        out_buf = jax.lax.dynamic_update_slice(s.out_buf, emitted, (s.out_len,))
        cur = jnp.take(emitted, n_emit - 1)
        return _SpecState(
            cur_token=cur.astype(jnp.int32),
            pos=s.pos + n_emit,
            kv_t=kv_t_new,
            kv_d=kv_d_new,
            key=key,
            done=done,
            out_buf=out_buf,
            out_len=s.out_len + n_emit,
            n_accepted=s.n_accepted + n_acc,
            rounds=s.rounds + 1,
        )

    def cond(s: _SpecState):
        return (
            (~s.done)
            & (s.out_len < max_new_tokens)
            & (s.pos + gamma <= block_limit)
        )

    first = first_token.reshape(()).astype(jnp.int32)
    state = _SpecState(
        cur_token=first,
        pos=start_pos.astype(jnp.int32),
        kv_t=kv_t,
        kv_d=kv_d,
        key=key,
        done=first == end_of_audio_token,
        out_buf=jnp.full((max_steps + gamma,), end_of_audio_token, jnp.int32),
        out_len=jnp.asarray(0, jnp.int32),
        n_accepted=jnp.asarray(0, jnp.int32),
        rounds=jnp.asarray(0, jnp.int32),
    )
    final = jax.lax.while_loop(cond, round_body, state)
    stats = jnp.stack([final.n_accepted, final.rounds, final.out_len])
    return final.out_buf, final.out_len, stats


spec_decode = jax.jit(
    _spec_decode_fn,
    static_argnames=(
        "cfg_t", "cfg_d", "gamma", "max_steps", "end_of_audio_token",
        "compute_dtype", "cfg_rows", "draft_rows",
    ),
)


@partial(jax.jit, static_argnames=("cfg_d", "compute_dtype"))
def _draft_prefill_1row(
    params_d, cfg_d, padded, spk_emb, kv_d, *, compute_dtype=jnp.bfloat16
):
    """Fill the CFG-free draft's 1-row cache with the prompt (no sampling).

    Pad rows beyond the true prompt length are harmless for the same reason
    they are in fs.prefill: a query at position p only attends [0, p], and
    row p is overwritten by that step's own K/V write before it is read.
    """
    t = padded.shape[1]
    positions = jnp.arange(t)
    x = tfm.embed_inputs(
        params_d, cfg_d, padded, positions, spk_emb,
        jnp.ones((1, 1, 1)), compute_dtype,
    )
    am = tfm.causal_mask_for(positions, kv_d.max_seq_len)[None, None]
    _, kv_d = tfm.apply_blocks(params_d, cfg_d, x, am, kv_d, jnp.asarray(0))
    return kv_d


def generate_spec(
    params_t: tfm.Params,
    cfg_t: TransformerConfig,
    params_d: tfm.Params,
    cfg_d: TransformerConfig,
    prompt_tokens,
    spk_emb: jax.Array,
    *,
    key: jax.Array,
    gamma: int = 4,
    temperature: float = 1.0,
    top_p: float = 0.95,
    guidance_scale: float | tuple[float, float] = 3.0,
    max_new_tokens: int | None = None,
    end_of_audio_token: int = T.END_OF_AUDIO_TOKEN,
    end_of_text_token: int = 0,
    prompt_pad_multiple: int = 128,
    compute_dtype=jnp.bfloat16,
    return_stats: bool = False,
    draft_use_cfg: bool = True,
    draft_temperature: float | None = None,
    draft_top_p: float | None = None,
):
    """Host-facing speculative generation (B=1), mirroring
    :func:`first_stage.generate`'s contract: returns the full sequence
    [prompt ++ first ++ emitted] as 1-D numpy (EOA included if emitted).

    One divergence near the context limit: the loop needs a full ``gamma``
    window of cache headroom per round (`pos + gamma <= block_size`), so a
    generation that runs into the block limit without an EOA can come up to
    ``gamma - 1`` tokens shorter than ``fs.generate`` with identical
    arguments. TTS chunking never operates that close to the limit.

    Both models prefill the same prompt (the target's prefill samples the
    first token, exactly as ordinary generation does; the draft's prefill
    only fills its cache). ``return_stats=True`` additionally returns
    ``{"accepted": int, "proposed": int, "rounds": int, "emitted": int}`` —
    ``accepted / proposed`` is the draft acceptance rate, ``emitted /
    rounds`` the tokens-per-target-forward yield (1.0 is ordinary decoding's
    rate; the speedup ceiling is this yield times the per-round cost ratio).

    ``draft_use_cfg=False`` runs the draft WITHOUT classifier-free guidance
    (one speaker-conditioned row): rejection sampling is exact for any
    proposal distribution, so output quality is unchanged while per-round
    draft compute halves. Use with drafts distilled against the target's
    guidance-merged distribution (scripts/distill_draft.py) — their single
    row already predicts the guided distribution.

    ``draft_temperature`` / ``draft_top_p`` (default: the target's values)
    shape the draft's PROPOSAL distribution only; output marginals are
    provably unchanged (see ``_spec_decode_fn``). Sharpened proposals
    (temperature < 1) typically raise acceptance for distilled drafts.
    """
    import numpy as np

    spk_g, prompt_g, cfg_rows = fs._normalize_guidance(guidance_scale)
    if cfg_rows == 3 and end_of_text_token <= end_of_audio_token:
        raise ValueError(
            "prompt guidance > 1 requires end_of_text_token (tokenizer.eot_token)"
        )
    padded, t_true = fs.pad_to_bucket(
        prompt_tokens, prompt_pad_multiple, max_len=cfg_t.block_size
    )
    max_steps = cfg_t.block_size - t_true
    if max_new_tokens is not None:
        max_steps = min(max_steps, max_new_tokens)
    if max_steps <= 0:
        raise ValueError("Prompt is too long to generate more tokens")

    draft_rows = cfg_rows if draft_use_cfg else 1
    kv_t = tfm.KVCache.create(cfg_t, cfg_rows, cfg_t.block_size, dtype=compute_dtype)
    kv_d = tfm.KVCache.create(cfg_d, draft_rows, cfg_d.block_size, dtype=compute_dtype)
    spk_emb = jnp.asarray(spk_emb).reshape(1, -1)

    key_prefill, key_spec = jax.random.split(key)
    temperature_a = jnp.asarray(temperature, jnp.float32)
    top_p_a = jnp.asarray(top_p, jnp.float32)
    guidance = jnp.asarray(spk_g, jnp.float32)
    prompt_guidance = jnp.asarray(prompt_g, jnp.float32)
    eot = jnp.asarray(end_of_text_token, jnp.int32)

    common = dict(
        compute_dtype=compute_dtype,
        cfg_rows=cfg_rows,
        prompt_guidance_scale=prompt_guidance,
        end_of_text_token=eot,
    )
    first_token, kv_t = fs.prefill(
        params_t, cfg_t, jnp.asarray(padded)[None, :],
        jnp.asarray(t_true, jnp.int32), spk_emb, kv_t, key_prefill,
        temperature_a, top_p_a, guidance, **common,
    )
    if draft_rows == 1:
        # CFG-free draft: one speaker-conditioned row; prefill is a plain
        # cached forward (no sampling — the target's prefill samples the
        # first token)
        kv_d = _draft_prefill_1row(
            params_d, cfg_d, jnp.asarray(padded)[None, :], spk_emb, kv_d,
            compute_dtype=compute_dtype,
        )
    else:
        # the draft's sampled token is discarded — its prefill only fills kv_d
        _, kv_d = fs.prefill(
            params_d, cfg_d, jnp.asarray(padded)[None, :],
            jnp.asarray(t_true, jnp.int32), spk_emb, kv_d, key_prefill,
            temperature_a, top_p_a, guidance, **common,
        )

    dtemp_a = jnp.asarray(
        temperature if draft_temperature is None else draft_temperature,
        jnp.float32,
    )
    dtop_a = jnp.asarray(
        top_p if draft_top_p is None else draft_top_p, jnp.float32
    )
    out_buf, out_len, stats = spec_decode(
        params_t, params_d, first_token, jnp.asarray(t_true, jnp.int32),
        spk_emb, kv_t, kv_d, key_spec, temperature_a, top_p_a, guidance,
        jnp.asarray(max_steps - 1, jnp.int32), dtemp_a, dtop_a,
        cfg_t=cfg_t, cfg_d=cfg_d, gamma=gamma, max_steps=cfg_t.block_size,
        end_of_audio_token=end_of_audio_token,
        compute_dtype=compute_dtype, cfg_rows=cfg_rows, draft_rows=draft_rows,
        prompt_guidance_scale=prompt_guidance, end_of_text_token=eot,
    )

    fetch = np.asarray(
        jnp.concatenate([
            first_token.reshape(-1).astype(jnp.int32),
            out_len.reshape(-1).astype(jnp.int32),
            stats.astype(jnp.int32),
            out_buf.astype(jnp.int32),
        ])
    )
    n = int(fetch[1])
    seq = np.concatenate(
        [np.asarray(prompt_tokens, np.int32), fetch[:1], fetch[5 : 5 + n]]
    )
    if return_stats:
        n_accepted, rounds, emitted = int(fetch[2]), int(fetch[3]), int(fetch[4])
        return seq, {
            "accepted": n_accepted,
            "proposed": rounds * gamma,
            "rounds": rounds,
            "emitted": emitted,
        }
    return seq

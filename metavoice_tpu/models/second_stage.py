"""Second-stage non-causal hierarchy completion.

Takes the 2 coarse EnCodec hierarchies (plus text) and predicts the remaining
6 hierarchies for *all* timesteps in a single forward pass — one big batched
MXU-friendly matmul stack, no autoregression (reference
fam/llm/mixins/non_causal.py:15-67 and input construction
fam/llm/inference.py:266-306).

TPU-first: the reference loops per-batch-row and per-hierarchy with
torch.multinomial; here sampling over all (hierarchy, batch, time) cells is
one vmapped Gumbel-max — a single fused kernel.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from metavoice_tpu.core import sampling as S
from metavoice_tpu.core import tokens as T
from metavoice_tpu.core.config import TransformerConfig
from metavoice_tpu.models import transformer as tfm


@partial(jax.jit, static_argnames=("cfg", "top_k", "compute_dtype"))
def non_causal_sample(
    params: tfm.Params,
    cfg: TransformerConfig,
    idx: jax.Array,  # (B, C_in, T) input hierarchies, T == cfg.block_size
    spk_emb: jax.Array | None,  # (B, spk_dim)
    key: jax.Array,
    temperature: jax.Array,
    top_k: int = 200,
    compute_dtype=jnp.bfloat16,
) -> jax.Array:
    """One forward pass, sample every timestep of every output hierarchy.

    Returns (B, C_out, T) int32. Semantics follow reference
    _non_causal_sample (fam/llm/mixins/non_causal.py:30-67): temperature
    scaling, per-cell top-k, categorical draw.
    """
    logits_list, _ = tfm.forward(
        params, cfg, idx, spk_emb=spk_emb, compute_dtype=compute_dtype
    )  # C_out x (B, T, V)
    logits = jnp.stack(logits_list, axis=1)  # (B, C_out, T, V)
    out = S.sample_from_logits(
        key, logits, temperature=temperature, top_k=top_k
    )  # (B, C_out, T)
    return out


def complete_hierarchies(
    params: tfm.Params,
    cfg: TransformerConfig,
    text_tokens: list[int],
    coarse_hierarchies: list[list[int]],
    spk_emb: jax.Array,
    *,
    key: jax.Array,
    temperature: float = 1.0,
    top_k: int = 200,
    compute_dtype=jnp.bfloat16,
) -> np.ndarray:
    """Host-facing wrapper: coarse 2 hierarchies -> full 8-codebook grid.

    Builds the (2, ctx) input (text+h0 / pad+h1, fam/llm/inference.py:279-301),
    runs the non-causal model, and stacks [input_hierarchies; sampled] as the
    reference does before decoding (fam/llm/inference.py:329). Returns
    (8, T_audio) EnCodec codes where T_audio = len(coarse h0), clipped of the
    text prefix and padding via the tilted split.
    """
    ctx = cfg.block_size
    x = T.build_second_stage_input(text_tokens, coarse_hierarchies, ctx)
    idx = jnp.asarray(x, jnp.int32)[None]  # (1, 2, ctx)
    spk = jnp.asarray(spk_emb).reshape(1, -1)
    sampled = non_causal_sample(
        params,
        cfg,
        idx,
        spk,
        key,
        jnp.asarray(temperature, jnp.float32),
        top_k=top_k,
        compute_dtype=compute_dtype,
    )  # (1, 6, ctx)
    full = np.concatenate([x[None], np.asarray(sampled)], axis=1)[0]  # (8, ctx)

    # Recover the audio region: text prefix + h0 occupy row 0 until the pad.
    n_text = len(text_tokens)
    n_audio = min(len(coarse_hierarchies[0]), ctx - n_text)
    region = slice(n_text, n_text + n_audio)
    out = np.stack([row[region] for row in full], axis=0)
    out[0] = np.asarray(coarse_hierarchies[0])[:n_audio]
    out[1] = np.asarray(coarse_hierarchies[1])[:n_audio]
    # Fine hierarchies may sample the pad id (1024) — clamp into codebook range.
    out = np.clip(out, 0, T.CODEBOOK_SIZE - 1)
    return out.astype(np.int32)


def complete_hierarchies_batch(
    params: tfm.Params,
    cfg: TransformerConfig,
    items: list,  # [(text_tokens, coarse_hierarchies), ...]
    spk_embs: jax.Array,  # (B, spk_dim)
    *,
    key: jax.Array,
    temperature: float = 1.0,
    top_k: int = 200,
    compute_dtype=jnp.bfloat16,
) -> list[np.ndarray]:
    """Batched hierarchy completion: one non-causal forward for B utterances.

    The per-item logic matches :func:`complete_hierarchies`; batching
    amortizes the forward pass across concurrent requests (used by
    runtime/engine.py). Returns B arrays of shape (8, T_audio_i).
    """
    ctx = cfg.block_size
    xs = [T.build_second_stage_input(t, c, ctx) for t, c in items]
    idx = jnp.asarray(np.stack(xs), jnp.int32)  # (B, 2, ctx)
    sampled = non_causal_sample(
        params,
        cfg,
        idx,
        jnp.asarray(spk_embs),
        key,
        jnp.asarray(temperature, jnp.float32),
        top_k=top_k,
        compute_dtype=compute_dtype,
    )  # (B, 6, ctx)
    sampled_np = np.asarray(sampled)

    outs = []
    for i, (text_tokens, coarse) in enumerate(items):
        full = np.concatenate([xs[i], sampled_np[i]], axis=0)  # (8, ctx)
        n_text = len(text_tokens)
        n_audio = min(len(coarse[0]), ctx - n_text)
        region = slice(n_text, n_text + n_audio)
        out = np.stack([row[region] for row in full], axis=0)
        out[0] = np.asarray(coarse[0])[:n_audio]
        out[1] = np.asarray(coarse[1])[:n_audio]
        outs.append(np.clip(out, 0, T.CODEBOOK_SIZE - 1).astype(np.int32))
    return outs

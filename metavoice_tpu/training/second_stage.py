"""Second-stage (non-causal hierarchy completion) training recipe.

The reference ships its second stage pretrained and never trains it
(fam/llm/finetune.py trains only the first stage; the second stage loads
from the HF snapshot, fam/llm/fast_inference.py:78-87). A complete
framework must be able to PRODUCE that checkpoint, not just consume it —
this module trains the non-causal model that maps (text, coarse h0/h1) to
the remaining 6 EnCodec codebooks, teacher-forced over all timesteps at
once (the same single-forward shape inference uses,
fam/llm/mixins/non_causal.py:30-67).

Used by the end-to-end trained-system test (tests/test_trained_system_e2e)
to close the train -> checkpoint -> TTS.from_checkpoints -> synthesise loop
entirely in-repo.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import optax

from metavoice_tpu.core import tokens as T
from metavoice_tpu.core.config import TransformerConfig
from metavoice_tpu.models import transformer as tfm
from metavoice_tpu.utils import checkpoint as ck


def build_example(
    text_tokens: list[int], codes: np.ndarray, cfg: TransformerConfig
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(text, full 8-codebook grid) -> (x, y, mask) teacher-forcing arrays.

    ``x`` is the (2, ctx) input the inference path builds
    (core/tokens.build_second_stage_input: text+h0 / pad+h1); ``y`` is the
    (6, ctx) target grid of hierarchies 2..7 aligned to the audio region;
    ``mask`` is 1.0 on audio positions only — text prefix and padding carry
    no loss (the reference's inference slices the same region,
    fam/llm/inference.py:329-340).
    """
    ctx = cfg.block_size
    n_text = len(text_tokens)
    n_audio = min(codes.shape[1], ctx - n_text)
    coarse = [codes[0, :n_audio].tolist(), codes[1, :n_audio].tolist()]
    x = T.build_second_stage_input(text_tokens, coarse, ctx)
    y = np.zeros((len(cfg.target_vocab_sizes), ctx), np.int32)
    y[:, n_text : n_text + n_audio] = codes[2 : 2 + y.shape[0], :n_audio]
    mask = np.zeros((ctx,), np.float32)
    mask[n_text : n_text + n_audio] = 1.0
    return np.asarray(x), y, mask


def loss_fn(
    params: Any,
    cfg: TransformerConfig,
    batch: dict[str, jax.Array],
    compute_dtype=jnp.float32,
) -> jax.Array:
    """Masked mean cross-entropy over the 6 output hierarchies."""
    logits_list, _ = tfm.forward(
        params, cfg, batch["x"], spk_emb=batch["spk_emb"],
        compute_dtype=compute_dtype,
    )  # C_out x (B, T, V)
    denom = jnp.maximum(batch["mask"].sum(), 1.0)
    loss = 0.0
    for i, lg in enumerate(logits_list):
        lp = jax.nn.log_softmax(lg.astype(jnp.float32), axis=-1)
        ll = jnp.take_along_axis(lp, batch["y"][:, i, :, None], axis=-1)[..., 0]
        loss = loss + -(ll * batch["mask"]).sum() / denom
    return loss / len(logits_list)


@dataclasses.dataclass(frozen=True)
class SecondStageTrainConfig:
    learning_rate: float = 1e-3
    weight_decay: float = 0.01
    grad_clip: float = 1.0
    max_iters: int = 300
    seed: int = 0


def train_second_stage(
    params: Any,
    cfg: TransformerConfig,
    batch: dict[str, np.ndarray],
    tcfg: SecondStageTrainConfig = SecondStageTrainConfig(),
    compute_dtype=jnp.float32,
    log_every: int = 0,
):
    """Full-batch overfit loop (the whole tiny dataset is one batch).

    Returns (params, final_loss). All parameters train (there is no
    pretrained checkpoint to preserve in the from-scratch setting).
    """
    opt = optax.chain(
        optax.clip_by_global_norm(tcfg.grad_clip),
        optax.adamw(
            tcfg.learning_rate,
            weight_decay=tcfg.weight_decay,
            mask=jax.tree.map(lambda p: p.ndim >= 2, params),
        ),
    )
    opt_state = opt.init(params)
    jb = {k: jnp.asarray(v) for k, v in batch.items()}

    @partial(jax.jit, static_argnames=())
    def step(params, opt_state):
        loss, grads = jax.value_and_grad(loss_fn)(params, cfg, jb, compute_dtype)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    loss = None
    for i in range(tcfg.max_iters):
        params, opt_state, loss = step(params, opt_state)
        if log_every and (i % log_every == 0 or i == tcfg.max_iters - 1):
            print(f"second-stage step {i}: loss {float(loss):.4f}")
    return params, float(loss)


def save_second_stage(
    path: str,
    params: Any,
    cfg: TransformerConfig,
    tokenizer_info: dict | None = None,
) -> str:
    """Native .npz second-stage checkpoint (TTS.from_checkpoints loads it).

    Mirrors the metadata schema of the torch second_stage.pt the reference
    distributes (model_args + meta, fam/llm/inference.py:124-131) so the
    config round-trips exactly.
    """
    meta = {
        "model_args": {
            "block_size": cfg.block_size,
            "n_layer": cfg.n_layer,
            "n_head": cfg.n_head,
            "n_embd": cfg.dim,
            "vocab_sizes": list(cfg.vocab_sizes),
            "target_vocab_sizes": list(cfg.target_vocab_sizes),
            "causal": cfg.causal,
            "norm_type": cfg.norm_type,
            "nonlinearity_type": cfg.nonlinearity_type,
            "bias": cfg.bias,
        },
        "meta": {
            "speaker_cond": True,
            "speaker_emb_size": cfg.speaker_emb_dim,
            "tokenizer": tokenizer_info or {},
        },
    }
    ck.save_npz(path, jax.tree.map(np.asarray, params), meta=meta)
    return path

"""First-stage LLM finetuning: optax AdamW + pjit-sharded train step.

Behavioral parity with the reference trainer (fam/llm/finetune.py):

  * per-hierarchy cross-entropy with ignore_index=-1
    (fam/llm/model.py:285-303),
  * AdamW with weight decay only on rank>=2 tensors
    (fam/llm/model.py:316-340),
  * cosine LR schedule with linear warmup (fam/llm/finetune.py:170-181),
  * last-N-block freezing + final norm (fam/llm/finetune.py:236-244) — done
    here as a per-layer 0/1 gradient mask broadcast along the stacked-layer
    axis (our layer params are stacked, so torch-style requires_grad flags
    don't map),
  * gradient accumulation and global-norm clipping (:320-344),
  * bf16 compute / f32 params & optimizer state.

TPU-native additions the reference lacks (its DDP is dead code): the train
step is jit-compiled over a (data, tensor) mesh; batch shards over the data
axis, params over tensor; XLA inserts the gradient all-reduce.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

from metavoice_tpu.core.config import TransformerConfig
from metavoice_tpu.core.tokens import END_OF_TEXT_TOKEN
from metavoice_tpu.models import transformer as tfm


@dataclass(frozen=True)
class FinetuneConfig:
    """Defaults mirror fam/llm/config/finetune_params.py."""

    learning_rate: float = 3e-5
    min_lr: float = 3e-6  # lr/10 rule (finetune_params.py:59)
    warmup_iters: int = 100
    lr_decay_iters: int = 5000
    weight_decay: float = 0.1
    beta1: float = 0.9
    beta2: float = 0.95
    grad_clip: float = 1.0
    batch_size: int = 2
    gradient_accumulation_steps: int = 1
    last_n_blocks_to_finetune: int = 1
    max_iters: int = 5000
    eval_interval: int = 200
    eval_iters: int = 20
    seed: int = 1337


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jax.Array


def lr_schedule(cfg: FinetuneConfig):
    """Linear warmup then cosine decay to min_lr (finetune.py:170-181)."""
    warmup = optax.linear_schedule(0.0, cfg.learning_rate, cfg.warmup_iters)
    cosine = optax.cosine_decay_schedule(
        cfg.learning_rate,
        max(cfg.lr_decay_iters - cfg.warmup_iters, 1),
        alpha=cfg.min_lr / cfg.learning_rate,
    )
    return optax.join_schedules([warmup, cosine], [cfg.warmup_iters])


def weight_decay_mask(params: Any) -> Any:
    """Decay rank>=2 tensors only (fam/llm/model.py:321-328)."""
    return jax.tree.map(lambda p: p.ndim >= 2, params)


def trainable_mask(params: Any, model_cfg: TransformerConfig, last_n_blocks: int) -> Any:
    """0/1 gradient multipliers implementing last-N-block finetuning.

    Matches reference freezing (finetune.py:236-244): everything frozen
    except the last N transformer blocks and the final norm. Stacked layer
    leaves get a per-layer (L, 1, ...) multiplier instead of a boolean.

    ``last_n_blocks < 0`` trains EVERYTHING (embeddings, heads, speaker
    conditioning included) — the from-scratch mode the end-to-end
    trained-system test uses; the reference has no equivalent (it only
    finetunes from its pretrained checkpoint).
    """
    if last_n_blocks < 0:
        return jax.tree.map(lambda p: jnp.ones((), jnp.float32), params)
    l = model_cfg.n_layer
    layer_gate = (jnp.arange(l) >= l - last_n_blocks).astype(jnp.float32)

    def mask_like(path_is_layer_stack: bool, leaf):
        if path_is_layer_stack:
            return layer_gate.reshape((l,) + (1,) * (leaf.ndim - 1))
        return jnp.zeros((), jnp.float32)

    masked = {}
    for k, v in params.items():
        if k == "layers":
            masked[k] = {lk: mask_like(True, lv) for lk, lv in v.items()}
        elif k.startswith("ln_f"):
            masked[k] = jnp.ones((), jnp.float32)
        elif isinstance(v, list):
            masked[k] = [jnp.zeros((), jnp.float32) for _ in v]
        else:
            masked[k] = jnp.zeros((), jnp.float32)
    return masked


def apply_grad_mask(grads: Any, mask: Any) -> Any:
    return jax.tree.map(lambda g, m: g * m, grads, mask)


def make_optimizer(cfg: FinetuneConfig, params: Any) -> optax.GradientTransformation:
    return optax.chain(
        optax.clip_by_global_norm(cfg.grad_clip),
        optax.adamw(
            learning_rate=lr_schedule(cfg),
            b1=cfg.beta1,
            b2=cfg.beta2,
            weight_decay=cfg.weight_decay,
            mask=weight_decay_mask(params),
        ),
    )


def hierarchy_cross_entropy(
    logits: list[jax.Array], targets: jax.Array
) -> jax.Array:
    """Mean CE over hierarchies and non-ignored positions.

    targets: (B, C, T) with -1 = ignore (fam/llm/model.py:289-301).
    """
    if targets.ndim == 2:
        targets = targets[:, None, :]
    total, count = 0.0, 0.0
    for i, lg in enumerate(logits):
        tgt = targets[:, i, :]
        valid = tgt != -1
        safe_tgt = jnp.where(valid, tgt, 0)
        logp = jax.nn.log_softmax(lg.astype(jnp.float32), axis=-1)
        nll = -jnp.take_along_axis(logp, safe_tgt[..., None], axis=-1)[..., 0]
        total = total + jnp.sum(nll * valid)
        count = count + jnp.sum(valid)
    return total / jnp.maximum(count, 1.0)


def mask_spk_emb_on_text(
    idx: jax.Array, end_of_text_token: int = END_OF_TEXT_TOKEN
) -> jax.Array:
    """(B, [C,] T) tokens -> (B, T, 1) keep-mask for speaker conditioning.

    Zeroes the speaker embedding on every position strictly before the
    end-of-text token; the EOT position itself KEEPS conditioning so the
    first predicted audio token has speaker information. Reference
    fam/llm/model.py:178-193 (_mask_spk_emb_on_text; cumsum > 0 rule).
    """
    first = idx if idx.ndim == 2 else idx[:, 0, :]
    is_eot = first == end_of_text_token
    keep = jnp.cumsum(is_eot, axis=-1) > 0
    return keep.astype(jnp.float32)[:, :, None]


def spkemb_dropout_mask(
    key: jax.Array, batch_size: int, spkemb_dropout: float
) -> jax.Array:
    """(B, 1, 1) per-row keep-mask: drop whole rows' speaker conditioning
    with probability ``spkemb_dropout`` — this is what trains the
    classifier-free-guidance uncond branch. No 1/(1-p) rescale, matching
    reference fam/llm/model.py:269-274."""
    keep = jax.random.uniform(key, (batch_size, 1, 1)) >= spkemb_dropout
    return keep.astype(jnp.float32)


def loss_fn(
    params: Any,
    model_cfg: TransformerConfig,
    batch: dict[str, jax.Array],
    compute_dtype=jnp.bfloat16,
    dropout_key: jax.Array | None = None,
) -> jax.Array:
    spk_emb = batch.get("spk_emb")
    spk_cond_mask = None
    drop_key = net_key = None
    if dropout_key is not None:
        drop_key, net_key = jax.random.split(dropout_key)
    if spk_emb is not None:
        if not model_cfg.spk_emb_on_text:
            spk_cond_mask = mask_spk_emb_on_text(batch["x"])
        if model_cfg.spkemb_dropout > 0.0 and drop_key is not None:
            row_mask = spkemb_dropout_mask(
                drop_key, spk_emb.shape[0], model_cfg.spkemb_dropout
            )
            spk_cond_mask = (
                row_mask if spk_cond_mask is None else spk_cond_mask * row_mask
            )
    logits, _ = tfm.forward(
        params,
        model_cfg,
        batch["x"],
        spk_emb=spk_emb,
        spk_cond_mask=spk_cond_mask,
        compute_dtype=compute_dtype,
        dropout_key=net_key if model_cfg.dropout > 0.0 else None,
    )
    return hierarchy_cross_entropy(logits, batch["y"])


def init_train_state(
    params: Any, cfg: FinetuneConfig
) -> tuple[TrainState, optax.GradientTransformation]:
    opt = make_optimizer(cfg, params)
    return TrainState(params=params, opt_state=opt.init(params), step=jnp.zeros((), jnp.int32)), opt


def make_train_step(
    model_cfg: TransformerConfig,
    cfg: FinetuneConfig,
    opt: optax.GradientTransformation,
    grad_mask: Any | None = None,
    compute_dtype=jnp.bfloat16,
):
    """Returns jitted train_step(state, batch) -> (state, metrics).

    With gradient_accumulation_steps > 1, ``batch`` carries a leading
    micro-step axis and grads average across micro-steps inside one
    compiled step (lax.scan), mirroring the reference's micro-step loop
    (finetune.py:320-340) without host round-trips.
    """

    def single_grads(params, micro_batch, dropout_key):
        loss, grads = jax.value_and_grad(loss_fn)(
            params, model_cfg, micro_batch, compute_dtype, dropout_key
        )
        return loss, grads

    @jax.jit
    def train_step(state: TrainState, batch: dict[str, jax.Array]):
        # per-step deterministic key for spkemb dropout (reference relies on
        # torch's global RNG; here the step index seeds it reproducibly)
        step_key = jax.random.fold_in(jax.random.PRNGKey(cfg.seed), state.step)
        if cfg.gradient_accumulation_steps > 1:
            def scan_body(carry, micro_batch):
                loss_acc, grads_acc, i = carry
                loss, grads = single_grads(
                    state.params, micro_batch, jax.random.fold_in(step_key, i)
                )
                return (
                    loss_acc + loss,
                    jax.tree.map(jnp.add, grads_acc, grads),
                    i + 1,
                ), None

            zeros = jax.tree.map(jnp.zeros_like, state.params)
            (loss_sum, grads_sum, _), _ = jax.lax.scan(
                scan_body, (jnp.zeros(()), zeros, jnp.zeros((), jnp.int32)), batch
            )
            k = cfg.gradient_accumulation_steps
            loss = loss_sum / k
            grads = jax.tree.map(lambda g: g / k, grads_sum)
        else:
            loss, grads = single_grads(state.params, batch, step_key)

        if grad_mask is not None:
            grads = apply_grad_mask(grads, grad_mask)
        updates, new_opt_state = opt.update(grads, state.opt_state, state.params)
        if grad_mask is not None:
            # AdamW's decoupled weight decay would still move frozen slices
            # (decay is grad-independent); mask the final updates too so
            # frozen parameters are bit-identical across steps.
            updates = apply_grad_mask(updates, grad_mask)
        new_params = optax.apply_updates(state.params, updates)
        gnorm = optax.global_norm(grads)
        return (
            TrainState(new_params, new_opt_state, state.step + 1),
            {"loss": loss, "grad_norm": gnorm},
        )

    return train_step


def make_eval_step(model_cfg: TransformerConfig, compute_dtype=jnp.bfloat16):
    @jax.jit
    def eval_step(params, batch):
        return loss_fn(params, model_cfg, batch, compute_dtype)

    return eval_step


# --------------------------------------------------------------------------------------
# Memory-efficient last-N-block finetuning (split trainable tail)
# --------------------------------------------------------------------------------------
#
# The grad-mask path computes gradients and Adam moments for EVERY parameter
# (3x the 1.2B model in f32 — OOM on one 16 GB chip). The reference avoids
# this with requires_grad (torch only materializes trainable grads,
# fam/llm/finetune.py:236-244). Equivalent here: split the stacked layer
# parameters into a frozen head and a trainable tail, differentiate only the
# tail, and concatenate the stacks inside the loss. Optimizer state then
# scales with the trainable fraction.


def split_trainable(params: Any, last_n_blocks: int) -> tuple[Any, Any]:
    """params -> (frozen_tree, trainable_tree).

    Trainable: the last ``last_n_blocks`` of every stacked layer leaf plus
    the final norm (reference freezing policy, finetune.py:236-244).
    """
    frozen = {k: v for k, v in params.items() if k != "layers" and not k.startswith("ln_f")}
    frozen["layers_head"] = {k: v[:-last_n_blocks] for k, v in params["layers"].items()}
    train = {"layers_tail": {k: v[-last_n_blocks:] for k, v in params["layers"].items()}}
    for k in list(params.keys()):
        if k.startswith("ln_f"):
            train[k] = params[k]
    return frozen, train


def merge_trainable(frozen: Any, train: Any) -> Any:
    params = {k: v for k, v in frozen.items() if k != "layers_head"}
    params["layers"] = {
        k: jnp.concatenate([frozen["layers_head"][k], train["layers_tail"][k]], axis=0)
        for k in frozen["layers_head"]
    }
    for k, v in train.items():
        if k != "layers_tail":
            params[k] = v
    return params


def make_finetune_step(
    model_cfg: TransformerConfig,
    cfg: FinetuneConfig,
    opt: optax.GradientTransformation,
    frozen: Any,
    compute_dtype=jnp.bfloat16,
):
    """Jitted step over the trainable tail only.

    The frozen head is a TRACED argument, not a Python closure: closing over
    it would bake multi-GB weights into the HLO as literal constants
    (XLA warned "2.38GB of constants captured during lowering" and compile
    time exploded); passing it as an operand keeps the program small and the
    weights resident in HBM.
    """

    @jax.jit
    def step(state: TrainState, batch: dict[str, jax.Array], frozen_arg):
        step_key = jax.random.fold_in(jax.random.PRNGKey(cfg.seed), state.step)

        def loss_of(train):
            return loss_fn(
                merge_trainable(frozen_arg, train), model_cfg, batch, compute_dtype,
                step_key,
            )

        loss, grads = jax.value_and_grad(loss_of)(state.params)
        updates, new_opt_state = opt.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return (
            TrainState(new_params, new_opt_state, state.step + 1),
            {"loss": loss, "grad_norm": optax.global_norm(grads)},
        )

    # device-resident operand bound once; callers keep the (state, batch) API
    frozen_dev = jax.tree.map(jnp.asarray, frozen)
    return lambda state, batch: step(state, batch, frozen_dev)

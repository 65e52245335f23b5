"""Finetuning driver: the ``finetune`` CLI loop with eval + checkpointing.

Orchestrates training/finetune.py's jitted step over training/data.py
batches, with parity to the reference loop (fam/llm/finetune.py:264-376):
periodic eval (estimate_loss :157-167), best-val + always-save checkpoint
policy (:290-315), per-iter timing logs (:351-362), and resume.

Checkpoints are orbax (train state) plus .npz (portable weights) carrying
the reference-schema meta {model_args, iter_num, best_val_loss, config,
meta} so they interconvert with reference .pt files via utils/checkpoint.
"""

from __future__ import annotations

import dataclasses
import json
import os
import time
from typing import Iterator

import jax
import jax.numpy as jnp
import numpy as np

from metavoice_tpu.core.config import TransformerConfig, first_stage_config
from metavoice_tpu.models import transformer as tfm
from metavoice_tpu.training import finetune as ft
from metavoice_tpu.utils import checkpoint as ck


def estimate_loss(eval_step, params, batches: list[dict]) -> float:
    """Mean eval loss over fixed batches (reference finetune.py:157-167)."""
    losses = [float(eval_step(params, b)) for b in batches]
    return float(np.mean(losses)) if losses else float("nan")


def save_checkpoint(
    out_dir: str,
    name: str,
    state: ft.TrainState,
    model_cfg: TransformerConfig,
    ft_cfg: ft.FinetuneConfig,
    best_val_loss: float,
    tokenizer_info: dict | None = None,
) -> str:
    """Portable .npz with reference-schema metadata (finetune.py:300-313)."""
    path = os.path.join(out_dir, f"{name}.npz")
    meta = {
        "model_args": {
            "n_layer": model_cfg.n_layer,
            "n_head": model_cfg.n_head,
            "n_local_heads": model_cfg.n_local_heads,
            "n_embd": model_cfg.dim,
            "block_size": model_cfg.block_size,
            "vocab_sizes": list(model_cfg.vocab_sizes),
            "causal": model_cfg.causal,
            "norm_type": model_cfg.norm_type,
            "nonlinearity_type": model_cfg.nonlinearity_type,
            "bias": model_cfg.bias,
            "spkemb_dropout": model_cfg.spkemb_dropout,
            "spk_emb_on_text": model_cfg.spk_emb_on_text,
        },
        "iter_num": int(state.step),
        "best_val_loss": float(best_val_loss),
        "config": dataclasses.asdict(ft_cfg),
        "meta": {
            "speaker_cond": True,
            "speaker_emb_size": model_cfg.speaker_emb_dim,
            "tokenizer": tokenizer_info or {},
        },
    }
    ck.save_npz(path, jax.tree.map(np.asarray, state.params), meta=meta)
    return path


def load_checkpoint(path: str) -> tuple[dict, dict]:
    return ck.load_npz(path)


def train(
    params: tfm.Params,
    model_cfg: TransformerConfig,
    ft_cfg: ft.FinetuneConfig,
    train_batches: Iterator[dict],
    val_batches: list[dict] | None = None,
    *,
    out_dir: str = "finetune_out",
    tokenizer_info: dict | None = None,
    log_every: int = 10,
    on_metrics=None,
) -> ft.TrainState:
    """Run the finetuning loop; returns the final train state."""
    os.makedirs(out_dir, exist_ok=True)

    # start-of-finetuning event (reference fam/llm/finetune.py:246-262)
    from metavoice_tpu import telemetry as tele

    job_props = {
        **dataclasses.asdict(ft_cfg),
        "n_layer": model_cfg.n_layer,
        "n_head": model_cfg.n_head,
        "n_embd": model_cfg.dim,
        "block_size": model_cfg.block_size,
        "out_dir": out_dir,
    }
    finetune_jobid = tele.hash_dictionary(job_props)
    tele.default_client.capture(
        tele.TelemetryEvent(
            name="user_started_finetuning",
            properties={"finetune_jobid": finetune_jobid, **job_props},
        )
    )
    n_tail = ft_cfg.last_n_blocks_to_finetune
    use_split = 0 < n_tail < model_cfg.n_layer
    if use_split:
        # memory-efficient path: grads + Adam moments only for the trainable
        # tail (reference trains last-N blocks on a 12 GB GPU; the full-tree
        # grad-mask path would triple the 1.2B model's footprint)
        frozen, train_params = ft.split_trainable(params, n_tail)
        state, opt = ft.init_train_state(train_params, ft_cfg)
        step_fn = ft.make_finetune_step(model_cfg, ft_cfg, opt, frozen)

        def full_params(st):
            return ft.merge_trainable(frozen, st.params)
    else:
        state, opt = ft.init_train_state(params, ft_cfg)
        step_fn = ft.make_train_step(model_cfg, ft_cfg, opt, grad_mask=None)

        def full_params(st):
            return st.params
    eval_fn = ft.make_eval_step(model_cfg)

    best_val = float("inf")
    last_loss = None
    t_last = time.time()
    for it, batch in enumerate(train_batches):
        if it >= ft_cfg.max_iters:
            break
        batch = {k: jnp.asarray(v) for k, v in batch.items()}
        state, metrics = step_fn(state, batch)

        if it % log_every == 0:
            loss = last_loss = float(metrics["loss"])
            dt = (time.time() - t_last) / max(log_every, 1)
            t_last = time.time()
            line = f"iter {it}: loss {loss:.4f}, {dt*1000:.0f} ms/iter"
            print(line, flush=True)
            if on_metrics:
                on_metrics({"iter": it, "loss": loss, "ms_per_iter": dt * 1000})

        if val_batches and it > 0 and it % ft_cfg.eval_interval == 0:
            val_loss = estimate_loss(eval_fn, full_params(state), val_batches)
            print(f"iter {it}: val loss {val_loss:.4f}", flush=True)
            ckpt_state = ft.TrainState(full_params(state), state.opt_state, state.step)
            save_checkpoint(out_dir, "ckpt", ckpt_state, model_cfg, ft_cfg, best_val, tokenizer_info)
            if val_loss < best_val:
                best_val = val_loss
                save_checkpoint(
                    out_dir, "best", ckpt_state, model_cfg, ft_cfg, best_val, tokenizer_info
                )

    final_state = ft.TrainState(full_params(state), state.opt_state, state.step)
    save_checkpoint(out_dir, "final", final_state, model_cfg, ft_cfg, best_val, tokenizer_info)
    # end-of-finetuning event (reference finetune.py:368-375)
    tele.default_client.capture(
        tele.TelemetryEvent(
            name="user_completed_finetuning",
            properties={"finetune_jobid": finetune_jobid, "loss": last_loss},
        )
    )
    return final_state


def main():
    """CLI: finetune the first stage on a '|'-separated CSV dataset.

    Parity with ``poetry run finetune --train X --val Y``
    (pyproject.toml:38-39, fam/llm/finetune.py:116-122).
    """
    import argparse

    from metavoice_tpu.models import encodec as ec
    from metavoice_tpu.models import speaker_encoder as se
    from metavoice_tpu.tokenizer import TrainedBPETokeniser
    from metavoice_tpu.training.data import DynamicComputeDataset, training_batches

    ap = argparse.ArgumentParser(description="finetune the first-stage LLM")
    ap.add_argument("--train", required=True, help="train CSV ('|' separated)")
    ap.add_argument("--val", required=True, help="val CSV")
    ap.add_argument("--ckpt", help="first-stage checkpoint (.pt or .npz)")
    ap.add_argument("--spk_emb_ckpt", help="speaker encoder checkpoint (.pt)")
    ap.add_argument("--out_dir", default="finetune_out")
    ap.add_argument("--batch_size", type=int, default=2)
    ap.add_argument("--max_iters", type=int, default=5000)
    ap.add_argument("--learning_rate", type=float, default=3e-5)
    ap.add_argument("--last_n_blocks", type=int, default=1)
    ap.add_argument("--seed", type=int, default=1337)
    ap.add_argument("--small", action="store_true", help="small dev model (no ckpt)")
    ap.add_argument(
        "--dropout", type=float, default=0.1,
        help="residual/embedding dropout during finetuning (reference "
        "finetune_params.py:43 default 0.1; attention-prob dropout not "
        "reproduced — see transformer.apply_blocks docstring)",
    )
    ap.add_argument(
        "--spkemb_dropout", type=float, default=None,
        help="drop whole rows' speaker conditioning with this probability "
        "(trains the CFG uncond branch; reference fam/llm/model.py:269-274). "
        "Default: keep the checkpoint's value.",
    )
    ap.add_argument(
        "--no_spk_emb_on_text", action="store_true",
        help="mask speaker conditioning on text positions "
        "(reference _mask_spk_emb_on_text, fam/llm/model.py:178-193)",
    )
    ap.add_argument(
        "--param_dtype",
        choices=["bfloat16", "float32"],
        default="bfloat16",
        help="bf16 params halve the training footprint (the reference "
        "finetunes in fp16 with a GradScaler; bf16 needs no scaler)",
    )
    args = ap.parse_args()

    tokenizer_info: dict = {}
    if args.ckpt and args.ckpt.endswith(".pt"):
        params, model_cfg, tokenizer_info = ck.load_first_stage_pt(args.ckpt)
        params = jax.tree.map(jnp.asarray, params)
    elif args.ckpt:
        params, meta = ck.load_npz(args.ckpt)
        margs = dict(meta.get("model_args", {}))
        if "n_embd" in margs:
            margs["dim"] = margs.pop("n_embd")
        keep = (
            "n_layer", "n_head", "dim", "block_size", "causal", "norm_type",
            "nonlinearity_type", "bias", "spkemb_dropout", "spk_emb_on_text",
        )
        overrides = {k: v for k, v in margs.items() if k in keep}
        if margs.get("vocab_sizes"):
            overrides["vocab_sizes"] = tuple(margs["vocab_sizes"])
        model_cfg = first_stage_config(**overrides)
        tokenizer_info = meta.get("meta", {}).get("tokenizer", {})
        params = jax.tree.map(jnp.asarray, params)
    else:
        print("no checkpoint given; random init (dev mode)")
        model_cfg = (
            first_stage_config(n_layer=2, n_head=4, dim=128, block_size=256)
            if args.small
            else first_stage_config()
        )
        params = tfm.init_params(jax.random.PRNGKey(args.seed), model_cfg)

    cfg_overrides = {"dropout": args.dropout}
    if args.spkemb_dropout is not None:
        cfg_overrides["spkemb_dropout"] = args.spkemb_dropout
    if args.no_spk_emb_on_text:
        cfg_overrides["spk_emb_on_text"] = False
    if cfg_overrides:
        model_cfg = dataclasses.replace(model_cfg, **cfg_overrides)

    params = jax.tree.map(
        lambda a: jnp.asarray(a, jnp.bfloat16 if args.param_dtype == "bfloat16" else jnp.float32),
        params,
    )
    tokenizer = TrainedBPETokeniser(**tokenizer_info) if tokenizer_info else TrainedBPETokeniser()
    spk_params = (
        ck.load_speaker_encoder_pt(args.spk_emb_ckpt)
        if args.spk_emb_ckpt
        else se.init_params(jax.random.PRNGKey(0))
    )
    ecfg = ec.EncodecConfig()
    eparams = ec.init_params(jax.random.PRNGKey(1), ecfg)

    ft_cfg = ft.FinetuneConfig(
        batch_size=args.batch_size,
        max_iters=args.max_iters,
        learning_rate=args.learning_rate,
        last_n_blocks_to_finetune=args.last_n_blocks,
        seed=args.seed,
    )

    train_ds = DynamicComputeDataset.from_csv(
        args.train, eparams, ecfg, tokenizer, spk_params,
        num_max_audio_tokens_timesteps=model_cfg.block_size // 2,
    )
    val_ds = DynamicComputeDataset.from_csv(
        args.val, eparams, ecfg, tokenizer, spk_params,
        num_max_audio_tokens_timesteps=model_cfg.block_size // 2,
    )
    val_batches = list(
        training_batches(val_ds, ft_cfg.batch_size, shuffle=False, epochs=1)
    )[: ft_cfg.eval_iters]

    train(
        params,
        model_cfg,
        ft_cfg,
        training_batches(train_ds, ft_cfg.batch_size, seed=args.seed),
        val_batches,
        out_dir=args.out_dir,
        tokenizer_info=tokenizer_info,
    )


if __name__ == "__main__":
    main()


# --------------------------------------------------------------------------------------
# Orbax train-state checkpointing (resume with optimizer state)
# --------------------------------------------------------------------------------------
#
# The reference resumes from torch pickles carrying model + optimizer +
# iter_num (fam/llm/finetune.py:91-113,133-144,298-315). The .npz files above
# are the portable weights; full training state (params + Adam moments +
# step) goes through orbax so a killed run restarts exactly.


def save_train_state(ckpt_dir: str, state: ft.TrainState, step: int | None = None) -> str:
    import orbax.checkpoint as ocp

    path = os.path.abspath(os.path.join(ckpt_dir, f"state_{step if step is not None else int(state.step)}"))
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, state, force=True)
    ckptr.wait_until_finished()
    return path


def restore_train_state(path: str, template: ft.TrainState) -> ft.TrainState:
    """Restore a TrainState saved by save_train_state; ``template`` supplies
    the pytree structure/shapes (build it from the same configs)."""
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    restored = ckptr.restore(os.path.abspath(path), template)
    return ft.TrainState(*restored) if not isinstance(restored, ft.TrainState) else restored

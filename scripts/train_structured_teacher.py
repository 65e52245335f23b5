"""Make the bench target LEARNABLE: finetune its last K blocks on a
synthetic low-entropy process, so speculative decoding has something a
draft can actually learn.

WHY (round-5 measurement, scripts/diag_draft_holdout.py): distilling a
draft against the RANDOM-weight bench target is information-theoretically
futile — the 6L/1280d draft hit train KL 0.13 but HELD-OUT KL 1.303 on
fresh target generations (pure memorization; a random 1.24B map has no
structure a 250M student can compress), and its measured acceptance 0.19
sits exactly at the TV bound 1 - sqrt(KL/2). Early-exit drafts (the
target's own first N layers) measure acceptance 0.02 — the remaining
random layers dominate the residual stream. Real pretrained weights are
learnable (that's what LM distillation is); this script reproduces that
property in-repo with no external data: it teaches the bench 1.24B target
a seeded 128-state noisy-permutation token process (last-K-block finetune,
the proven split-tail recipe from training/finetune.py), then the standard
distillation recipe (scripts/distill_draft.py --target_cache ...) gets an
honest, generalizing draft and a realized end-to-end speculative win at
full model scale.

Process: states S = {16*i : i < 128} (within the audio-token range);
next = PERM[s] w.p. 0.9, uniform over S w.p. 0.1  (H ~= 0.80 nats).
Sequences: [fixed 64-token text prompt | T process tokens], the same
prompt the distillation recipe and bench spec section use.

Artifacts:
  /tmp/mv_structured_delta.npz   - trained tail slices (bf16) + ln_f
  /tmp/mv_structured_int4.npz    - full int4-packed target cache
                                   (load_target format, distill-ready)

Usage: python scripts/train_structured_teacher.py [--steps 600] [--tail 2]
"""

import argparse
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax

jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/mvtpu_jax"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np
import optax

from metavoice_tpu.core.config import first_stage_config
from metavoice_tpu.models import first_stage as fs
from metavoice_tpu.models import transformer as tfm
from metavoice_tpu.ops import quantized as qz
from metavoice_tpu.training import finetune as ft


def log(*a):
    print(*a, file=sys.stderr, flush=True)


# ---- the seeded process ---------------------------------------------------
PROC_SEED = 123
N_STATES = 128
STATES = np.arange(N_STATES, dtype=np.int64) * 16  # 0..2032, inside [0, 2048)
PERM = np.random.default_rng(PROC_SEED).permutation(N_STATES)
NOISE = 0.1
PROMPT = list(range(2100, 2164))  # the distill/bench spec prompt


def sample_process(rng, b, t):
    """(b, t) int64 token matrix of process states."""
    s = rng.integers(0, N_STATES, b)
    out = np.empty((b, t), np.int64)
    for i in range(t):
        out[:, i] = STATES[s]
        nxt = PERM[s].copy()
        flip = rng.random(b) < NOISE
        nxt[flip] = rng.integers(0, N_STATES, int(flip.sum()))
        s = nxt
    return out


def make_batch(rng, b, t_gen):
    """x (b, T-1), y (b, T-1) next-token labels (-1 = ignore on the prompt)."""
    seq = np.concatenate(
        [np.tile(np.asarray(PROMPT, np.int64), (b, 1)), sample_process(rng, b, t_gen)],
        axis=1,
    )
    x = seq[:, :-1]
    y = seq[:, 1:].copy()
    y[:, : len(PROMPT) - 1] = -1  # only the generation region trains
    return jnp.asarray(x, jnp.int32), jnp.asarray(y, jnp.int32)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=600)
    ap.add_argument("--tail", type=int, default=2, help="last-K blocks trained")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--gen_len", type=int, default=512)
    ap.add_argument("--lr", type=float, default=2e-4)
    ap.add_argument("--delta_out", default="/tmp/mv_structured_delta.npz")
    ap.add_argument("--cache_out", default="/tmp/mv_structured_int4.npz")
    ap.add_argument("--skip_train", action="store_true",
                    help="rebuild cache + smoke test from an existing delta")
    args = ap.parse_args()

    # spkemb_dropout trains the CFG uncond row exactly like a real finetune
    cfg = first_stage_config(spkemb_dropout=0.1)
    log(f"devices: {jax.devices()}; init 1.24B bf16 (PRNGKey(0), bench target) ...")
    t0 = time.time()
    params = tfm.init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
    spk = jax.random.normal(jax.random.PRNGKey(0), (1, cfg.speaker_emb_dim), jnp.bfloat16)
    log(f"init done in {time.time()-t0:.0f}s")

    if not args.skip_train:
        frozen, tail = ft.split_trainable(params, args.tail)
        # f32 masters + moments for the tail only; bf16 cast inside the loss
        tail = jax.tree.map(lambda x: x.astype(jnp.float32), tail)
        opt = optax.chain(
            optax.clip_by_global_norm(1.0),
            optax.adamw(
                optax.warmup_cosine_decay_schedule(
                    0.0, args.lr, 50, args.steps, args.lr * 0.05
                ),
                b1=0.9, b2=0.95, weight_decay=0.1,
                mask=ft.weight_decay_mask(tail),
            ),
        )
        opt_state = opt.init(tail)
        spk_b = jnp.broadcast_to(spk.astype(jnp.float32), (args.batch, spk.shape[-1]))

        @partial(jax.jit, donate_argnums=(0, 1))
        def step(tail, opt_state, x, y, key, frozen_arg):
            def loss_of(tr):
                merged = ft.merge_trainable(
                    frozen_arg, jax.tree.map(lambda v: v.astype(jnp.bfloat16), tr)
                )
                return ft.loss_fn(
                    merged, cfg, {"x": x, "y": y, "spk_emb": spk_b},
                    jnp.bfloat16, key,
                )

            loss, grads = jax.value_and_grad(loss_of)(tail)
            updates, opt_state = opt.update(grads, opt_state, tail)
            return optax.apply_updates(tail, updates), opt_state, loss

        rng = np.random.default_rng(0)
        t0 = time.time()
        for i in range(args.steps):
            x, y = make_batch(rng, args.batch, args.gen_len)
            tail, opt_state, loss = step(
                tail, opt_state, x, y, jax.random.PRNGKey(i), frozen
            )
            if i % 25 == 0 or i == args.steps - 1:
                ls = float(np.asarray(loss))
                log(f"step {i}: CE {ls:.4f} (process floor ~0.80) "
                    f"({time.time()-t0:.0f}s)")

        tail_bf16 = jax.tree.map(lambda x: x.astype(jnp.bfloat16), tail)
        flat = {}
        for k, v in tail_bf16["layers_tail"].items():
            flat[f"layers_tail/{k}"] = np.asarray(v).view(np.uint16)
        flat["ln_f_w"] = np.asarray(tail_bf16["ln_f_w"]).view(np.uint16)
        flat["__tail__"] = np.asarray([args.tail])
        np.savez(args.delta_out, **flat)
        log(f"delta saved: {args.delta_out}")
        frozen_merge = frozen
    else:
        data = np.load(args.delta_out)
        k_tail = int(data["__tail__"][0])
        frozen_merge, _ = ft.split_trainable(params, k_tail)
        tail_bf16 = {
            "layers_tail": {
                k.split("/", 1)[1]: jnp.asarray(
                    data[k].view(np.dtype("bfloat16"))
                )
                for k in data.files if k.startswith("layers_tail/")
            },
            "ln_f_w": jnp.asarray(data["ln_f_w"].view(np.dtype("bfloat16"))),
        }
        log(f"delta loaded (tail {k_tail})")

    params_s = ft.merge_trainable(frozen_merge, tail_bf16)

    # ---- int4 cache in load_target format --------------------------------
    log("quantizing structured target to int4 ...")
    t0 = time.time()
    qparams = qz.quantize_params_int4_i32(params_s)
    flat = {}

    def rec(d, pre):
        for k, v in d.items():
            if isinstance(v, dict):
                rec(v, pre + k + "/")
            elif isinstance(v, (list, tuple)):
                for i, x in enumerate(v):
                    flat[f"{pre}{k}/{i}"] = np.asarray(x)
            else:
                flat[pre + k] = np.asarray(v)

    rec(qparams, "")
    np.savez(args.cache_out, **{
        k: (a.view(np.uint16) if a.dtype.name == "bfloat16" else a)
        for k, a in flat.items()
    })
    log(f"int4 cache saved: {args.cache_out} in {time.time()-t0:.0f}s")

    # ---- smoke: does the quantized target actually follow the process? ---
    cfg_gen = first_stage_config()  # no dropout at inference
    in_subset, match, n_tr = 0, 0, 0
    for i in range(2):
        seq = fs.generate(
            qparams, cfg_gen, PROMPT, spk, key=jax.random.PRNGKey(500 + i),
            max_new_tokens=256, end_of_audio_token=10**6,
            temperature=1.0, top_p=0.95, guidance_scale=3.0,
        )
        gen = np.asarray(seq[len(PROMPT):])
        inv = {int(v): j for j, v in enumerate(STATES)}
        states = [inv.get(int(t), -1) for t in gen]
        in_subset += sum(s >= 0 for s in states)
        for a, b in zip(states[:-1], states[1:]):
            if a >= 0 and b >= 0:
                n_tr += 1
                match += int(PERM[a] == b)
    tot = 2 * 256
    log(f"SMOKE: in-subset {in_subset}/{tot} ({in_subset/tot:.2f}), "
        f"deterministic-transition match {match}/{n_tr} "
        f"({match/max(n_tr,1):.2f}; process rate ~0.90)")


if __name__ == "__main__":
    main()

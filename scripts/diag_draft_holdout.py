"""Attribute the distilled draft's train/eval acceptance gap + probe
early-exit drafts.

Two questions, one chip session:

1. HELD-OUT KL: the round-5 distilled draft reached train KL 0.144 yet eval
   acceptance 0.19 — if its KL on FRESH target generations is far above the
   train KL, the draft memorized the corpus trajectories instead of learning
   the teacher map (a random-weight teacher's conditional distribution has
   no low-dimensional structure to learn off-manifold).

2. EARLY-EXIT drafts: the target's own first N layers + its final norm +
   lm_head, sliced directly from the stacked quantized leaves. No training,
   therefore NO generalization gap by construction — measures how much of a
   random target's final distribution its own truncated stack predicts, and
   the realized speculative tok/s for each N.

Usage: python scripts/diag_draft_holdout.py [--draft /tmp/mv_draft2.npz]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, "/root/repo")
import jax

jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/mvtpu_jax"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

from distill_draft import (
    GUIDANCE, NEVER, TEMP, TOP_P, draft_loss, flat_load, load_target,
    teacher_probs,
)
from metavoice_tpu.core.config import first_stage_config
from metavoice_tpu.models import first_stage as fs
from metavoice_tpu.models import spec_decode as sd


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--draft", default="/tmp/mv_draft2.npz")
    ap.add_argument("--layers", type=int, default=6)
    ap.add_argument("--dim", type=int, default=1280)
    ap.add_argument("--heads", type=int, default=10)
    ap.add_argument("--corpus", default="/tmp/mv_draft_corpus.npy")
    ap.add_argument("--early_exit", default="2,4")
    ap.add_argument("--skip_holdout", action="store_true")
    args = ap.parse_args()

    params_t, cfg, spk = load_target()
    prompt = list(range(2100, 2164))

    # ---- 1. held-out KL --------------------------------------------------
    if not args.skip_holdout and os.path.exists(args.draft):
        cfg_d = first_stage_config(
            n_layer=args.layers, n_head=args.heads, dim=args.dim
        )
        params_d = jax.tree.map(
            lambda x: x.astype(jnp.float32), flat_load(args.draft)
        )
        corpus = np.load(args.corpus)
        full_len = corpus.shape[1]
        mask = jnp.asarray(np.arange(full_len) >= len(prompt) - 1, jnp.float32)

        loss_jit = jax.jit(draft_loss, static_argnames=("cfg_d",))

        def batch_kl(tokens):
            pt = teacher_probs(params_t, cfg, tokens, spk, full_len)
            ce = float(np.asarray(loss_jit(
                params_d, cfg_d, tokens, spk, pt, mask, jax.random.PRNGKey(0)
            )))
            w = mask[None, :]
            ent = float(np.asarray(
                jnp.sum(-jnp.sum(pt * jnp.log(pt + 1e-12), axis=-1) * w)
                / (jnp.sum(w) * tokens.shape[0])
            ))
            return ce - ent

        train_kls = [
            batch_kl(jnp.asarray(corpus[i : i + 4], jnp.int32)) for i in (0, 100)
        ]
        log(f"TRAIN KL (seen trajectories): {train_kls}")

        fresh = []
        for i in range(4):
            seq = fs.generate(
                params_t, cfg, prompt, spk, key=jax.random.PRNGKey(9000 + i),
                max_new_tokens=full_len - len(prompt),
                end_of_audio_token=NEVER, temperature=TEMP, top_p=TOP_P,
                guidance_scale=GUIDANCE,
            )
            fresh.append(np.asarray(seq[:full_len]))
        ho = batch_kl(jnp.asarray(np.stack(fresh), jnp.int32))
        log(f"HELD-OUT KL (fresh target generations): {ho:.3f}")
        del params_d

    # ---- 2. early-exit drafts -------------------------------------------
    n_tok = 256

    def run_base():
        return fs.generate(
            params_t, cfg, prompt, spk, key=jax.random.PRNGKey(3),
            max_new_tokens=n_tok, end_of_audio_token=NEVER,
            temperature=TEMP, top_p=TOP_P, guidance_scale=GUIDANCE,
        )

    run_base()
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        seq = run_base()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    base_tps = (len(seq) - len(prompt)) / best
    log(f"baseline: {base_tps:.1f} tok/s")

    for n_ee in [int(x) for x in args.early_exit.split(",")]:
        cfg_ee = first_stage_config(n_layer=n_ee)
        p_ee = dict(params_t)
        p_ee["layers"] = jax.tree.map(lambda x: x[:n_ee], params_t["layers"])

        def run_spec(gamma):
            return sd.generate_spec(
                params_t, cfg, p_ee, cfg_ee, prompt, spk,
                key=jax.random.PRNGKey(3), gamma=gamma, max_new_tokens=n_tok,
                end_of_audio_token=NEVER, temperature=TEMP, top_p=TOP_P,
                guidance_scale=GUIDANCE, return_stats=True,
                draft_use_cfg=True,  # shares the target's CFG structure
            )

        for gamma in (4,):
            run_spec(gamma)
            best, st = None, None
            for _ in range(3):
                t0 = time.perf_counter()
                _, st = run_spec(gamma)
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            emitted = st["emitted"] + 1
            alpha = st["accepted"] / max(st["proposed"], 1)
            log(
                f"early-exit N={n_ee} gamma={gamma}: {emitted/best:.1f} tok/s "
                f"(x{emitted/best/base_tps:.2f}) | acceptance {alpha:.3f} "
                f"({st['accepted']}/{st['proposed']}) | "
                f"yield {st['emitted']/max(st['rounds'],1):.2f} tok/round"
            )


if __name__ == "__main__":
    main()

"""Distill a small speculative-decoding draft against the bench target.

VERDICT r4 #1b: speculation only pays once a draft clears the break-even
per-token acceptance. This script trains one IN-REPO, with no external data
or weights: the teacher is the bench target itself (the deterministic
PRNGKey(0) 1.24B int4 model bench.py measures), the corpus is the target's
OWN generations, and the loss is cross-entropy against the target's FINAL
sampled distribution (CFG-merged + temperature + top-p — exactly the
distribution the rejection sampler compares, models/spec_decode.py), for
both the speaker-conditioned and unconditioned CFG rows. The recipe
transfers verbatim to real pretrained weights.

Phases (resumable via --skip_*):
  1. generate a corpus of target sequences (chip, ~1 min)
  2. train the draft with teacher-in-the-loop batches (chip)
  3. quantize the draft to int4, measure acceptance + realized tok/s with
     generate_spec vs the ordinary decode baseline

Usage:
  python scripts/distill_draft.py [--steps N] [--layers L] [--dim D]
      [--out /tmp/mv_draft.npz] [--eval_only PATH]
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
import ml_dtypes
import numpy as np
import optax
from functools import partial

from metavoice_tpu.core import sampling as S
from metavoice_tpu.core.config import first_stage_config
from metavoice_tpu.models import first_stage as fs
from metavoice_tpu.models import spec_decode as sd
from metavoice_tpu.models import transformer as tfm
from metavoice_tpu.ops import quantized as qz


def log(*a):
    print(*a, file=sys.stderr, flush=True)


TEMP, TOP_P, GUIDANCE = 1.0, 0.95, 3.0
NEVER = 10**6  # EOA id that never samples (full-length corpus sequences)


def flat_save(path, params):
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

    rec(params, "")
    out = {}
    for k, a in flat.items():
        if a.dtype.name == "bfloat16":
            a = a.view(np.uint16)
            k = "BF16:" + k
        out[k] = a
    np.savez(path, **out)


def flat_load(path):
    data = np.load(path)
    params = {}
    for k in data.files:
        a = data[k]
        kk = k
        if kk.startswith("BF16:"):
            a = a.view(ml_dtypes.bfloat16)
            kk = kk[5:]
        parts = kk.split("/")
        d = params
        for p in parts[:-1]:
            d = d.setdefault(p, {})
        d[parts[-1]] = jnp.asarray(a)
    # restore wtes/lm_heads lists (saved as name/<idx>)
    for lk in ("wtes", "lm_heads"):
        if lk in params and isinstance(params[lk], dict):
            params[lk] = [params[lk][str(i)] for i in range(len(params[lk]))]
    return params


def load_target(cache="/tmp/mv_int4_params.npz"):
    """The bench target: PRNGKey(0) 1.24B, int4-packed (bench.py:100-165).

    ``cache`` can point at an alternative int4 target in the same flat-npz
    format — e.g. the structured-teacher cache written by
    scripts/train_structured_teacher.py.
    """
    cfg = first_stage_config()
    if os.path.exists(cache):
        log("loading cached int4 target ...")
        data = np.load(cache)
        params = {}
        for k in data.files:
            a = data[k]
            if a.dtype == np.uint16:
                a = a.view(ml_dtypes.bfloat16)
            parts = k.split("/")
            d = params
            for p in parts[:-1]:
                d = d.setdefault(p, {})
            d[parts[-1]] = jnp.asarray(a)
        # stacked-leaf dicts under layers are fine; wtes saved flat as wtes/0
        if isinstance(params.get("wtes"), dict):
            params["wtes"] = [params["wtes"][str(i)] for i in range(len(params["wtes"]))]
    else:
        if cache != "/tmp/mv_int4_params.npz":
            raise FileNotFoundError(
                f"{cache}: alternative target caches must already exist "
                "(run scripts/train_structured_teacher.py first)"
            )
        log("init + quantize target (cold, ~4 min on chip) ...")
        params = qz.quantize_params_int4_i32(
            tfm.init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
        )
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

        rec(params, "")
        np.savez(cache, **{
            k: (a.view(np.uint16) if a.dtype.name == "bfloat16" else a)
            for k, a in flat.items()
        })
        log(f"target cache saved: {cache}")
    spk = jax.random.normal(jax.random.PRNGKey(0), (1, cfg.speaker_emb_dim), jnp.bfloat16)
    return params, cfg, spk


@partial(jax.jit, static_argnames=("cfg", "t"))
def teacher_probs(params, cfg, tokens, spk, t):
    """(B, T) PREFIXES -> the target's final sampled dist at each position.

    Returns (B, T, V) f32 probs of the CFG-merged + temperature + top-p
    distribution — the distribution spec_decode's rejection sampler uses.

    CONSISTENCY CONTRACT: ``tokens`` must be sequence prefixes starting at
    position 0. The first distilled run trained on random mid-sequence
    windows re-embedded at positions 0..T — with the model's learned
    absolute ``wpe`` and the truncated context, the training targets were
    systematically different distributions from the ones the teacher
    produces during generation (where the eval acceptance is measured).
    Measured cost of that skew: acceptance 0.225 at gamma=2 despite the
    train loss plateauing.
    """
    b = tokens.shape[0]
    idx2 = jnp.concatenate([tokens, tokens], axis=0)
    spk2 = jnp.broadcast_to(spk, (2 * b, spk.shape[-1]))
    mask2 = fs.make_spk_cond_mask(b, 2)
    positions = jnp.arange(t)
    x = tfm.embed_inputs(params, cfg, idx2, positions, spk2, mask2, jnp.bfloat16)
    am = tfm.causal_mask_for(positions, t)[None, None]
    out, _ = tfm.apply_blocks(params, cfg, x, am, None, None)
    logits = tfm.output_logits(params, cfg, out)[0]  # (2B, T, V)
    merged = S.cfg_merge(
        logits.reshape(2, b, t, -1), jnp.asarray(GUIDANCE, jnp.float32)
    )[0]
    return S.logits_to_probs(merged, temperature=TEMP, top_p=TOP_P)


def draft_loss(params_d, cfg_d, tokens, spk, probs_t, loss_mask, key):
    """Masked CE of BOTH draft CFG rows against the teacher's merged dist.

    ``loss_mask`` (T,) restricts the loss to the generation region (the
    last prompt position onward — the only positions the rejection sampler
    ever compares). The forward runs in bf16 (params cast from the f32
    masters; grads flow through the cast) — chip-measured ~3x faster than
    f32 matmuls at equal final KL.
    """
    params_c = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params_d)
    b, t = tokens.shape
    idx2 = jnp.concatenate([tokens, tokens], axis=0)
    spk2 = jnp.broadcast_to(spk.astype(jnp.bfloat16), (2 * b, spk.shape[-1]))
    mask2 = fs.make_spk_cond_mask(b, 2)
    positions = jnp.arange(t)
    x = tfm.embed_inputs(params_c, cfg_d, idx2, positions, spk2, mask2, jnp.bfloat16)
    am = tfm.causal_mask_for(positions, t)[None, None]
    out, _ = tfm.apply_blocks(params_c, cfg_d, x, am, None, None)
    logits = tfm.output_logits(params_c, cfg_d, out)[0]  # (2B, T, V)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    p2 = jnp.concatenate([probs_t, probs_t], axis=0)
    ce = -jnp.sum(p2 * logp, axis=-1)  # (2B, T)
    w = loss_mask[None, :].astype(jnp.float32)
    return jnp.sum(ce * w) / (jnp.sum(w) * 2 * b)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=8000)
    ap.add_argument("--layers", type=int, default=6)
    ap.add_argument("--dim", type=int, default=1280)
    ap.add_argument("--heads", type=int, default=10)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--lr", type=float, default=4e-4)
    ap.add_argument("--corpus_seqs", type=int, default=256)
    ap.add_argument("--seq_len", type=int, default=512)
    ap.add_argument("--out", default="/tmp/mv_draft.npz")
    ap.add_argument("--corpus", default="/tmp/mv_draft_corpus.npy")
    ap.add_argument("--eval_only", default=None)
    ap.add_argument("--resume", default=None, help="continue training from a saved draft")
    ap.add_argument("--gammas", default="4,8")
    ap.add_argument("--draft_quant", default="int4", choices=["int4", "int8", "bf16"])
    ap.add_argument("--target_cache", default="/tmp/mv_int4_params.npz",
                    help="int4 target cache (e.g. the structured teacher)")
    ap.add_argument(
        "--draft_temps", default="1.0,0.8,0.6",
        help="proposal-sharpening sweep at the first gamma (exactness holds "
             "for any proposal; see spec_decode draft_temperature)",
    )
    args = ap.parse_args()

    params_t, cfg, spk = load_target(args.target_cache)
    log(f"devices: {jax.devices()}")
    cfg_d = first_stage_config(
        n_layer=args.layers, n_head=args.heads, dim=args.dim
    )
    prompt = list(range(2100, 2164))

    if args.eval_only:
        params_d = flat_load(args.eval_only)
        evaluate(params_t, cfg, params_d, cfg_d, prompt, spk, args)
        return

    # ---- phase 1: corpus = the target's own generations ---------------------
    if os.path.exists(args.corpus) and np.load(args.corpus).shape[0] >= args.corpus_seqs:
        corpus = np.load(args.corpus)[: args.corpus_seqs]
        log(f"corpus loaded: {corpus.shape}")
    else:
        t0 = time.time()
        seqs = []
        for i in range(args.corpus_seqs):
            seq = fs.generate(
                params_t, cfg, prompt, spk, key=jax.random.PRNGKey(100 + i),
                max_new_tokens=args.seq_len, end_of_audio_token=NEVER,
                temperature=TEMP, top_p=TOP_P, guidance_scale=GUIDANCE,
            )
            seqs.append(np.asarray(seq[: len(prompt) + args.seq_len]))
            if i == 0:
                log(f"first corpus seq in {time.time()-t0:.1f}s (len {len(seq)})")
        corpus = np.stack([s[: min(len(s) for s in seqs)] for s in seqs])
        np.save(args.corpus, corpus)
        log(f"corpus built: {corpus.shape} in {time.time()-t0:.1f}s")

    # ---- phase 2: teacher-in-the-loop distillation ---------------------------
    if args.resume:
        params_d = jax.tree.map(
            lambda x: x.astype(jnp.float32), flat_load(args.resume)
        )
        log(f"resumed draft from {args.resume}")
    else:
        params_d = tfm.init_params(jax.random.PRNGKey(7), cfg_d, dtype=jnp.float32)
    opt = optax.adamw(
        optax.warmup_cosine_decay_schedule(0.0, args.lr, 100, args.steps, args.lr * 0.1)
    )
    opt_state = opt.init(params_d)

    n_seq, full_len = corpus.shape
    # loss only where the rejection sampler ever compares: the last prompt
    # position (whose dist samples the first generated token) onward. The
    # prompt is shared across the whole corpus, so prefix batches are
    # position- and context-exact (see teacher_probs consistency contract).
    loss_mask = jnp.asarray(np.arange(full_len) >= len(prompt) - 1, jnp.float32)

    @partial(jax.jit, static_argnames=("t",), donate_argnames=("params_d", "opt_state"))
    def train_step(params_d, opt_state, tokens, probs_t, key, t):
        loss, grads = jax.value_and_grad(draft_loss)(
            params_d, cfg_d, tokens, spk, probs_t, loss_mask, key
        )
        updates, opt_state = opt.update(grads, opt_state, params_d)
        params_d = optax.apply_updates(params_d, updates)
        return params_d, opt_state, loss

    rng = np.random.default_rng(0)
    t0 = time.time()
    for step in range(args.steps):
        rows = rng.integers(0, n_seq, size=args.batch)
        tokens = jnp.asarray(corpus[rows], jnp.int32)  # full prefixes
        pt = teacher_probs(params_t, cfg, tokens, spk, full_len)
        params_d, opt_state, loss = train_step(
            params_d, opt_state, tokens, pt, jax.random.PRNGKey(step), full_len
        )
        if step % 100 == 0 or step == args.steps - 1:
            # KL(teacher || draft) = CE - teacher entropy (masked to the
            # generation region): the quantity that bounds acceptance
            w = loss_mask[None, :]
            ent = float(np.asarray(
                jnp.sum(-jnp.sum(pt * jnp.log(pt + 1e-12), axis=-1) * w)
                / (jnp.sum(w) * tokens.shape[0])
            ))
            ls = float(np.asarray(loss))
            log(f"step {step}: loss {ls:.4f} (teacher H {ent:.3f} -> "
                f"KL {ls - ent:.3f}) ({time.time()-t0:.0f}s)")

    flat_save(args.out, jax.tree.map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, params_d
    ))
    log(f"draft saved: {args.out}")
    evaluate(params_t, cfg, params_d, cfg_d, prompt, spk, args)


def evaluate(params_t, cfg, params_d, cfg_d, prompt, spk, args):
    """Acceptance + realized tok/s vs the ordinary decode baseline.

    ``--draft_quant`` picks the draft's serving precision. int4 weight
    noise can DOMINATE a well-distilled draft's proposal error (measured:
    KL 0.14 bf16 draft -> acceptance 0.22 int4-quantized), so acceptance
    must be compared across precisions before packaging.
    """
    params_bf16 = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params_d)
    if args.draft_quant == "int4":
        params_dq = qz.quantize_params_int4_i32(params_bf16)
    elif args.draft_quant == "int8":
        params_dq = qz.quantize_params_int8_i32(params_bf16)
    else:
        params_dq = params_bf16
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

    temps = [float(x) for x in args.draft_temps.split(",")]
    for gamma in [int(g) for g in args.gammas.split(",")]:
        for dtemp in temps:
            def run_spec():
                return sd.generate_spec(
                    params_t, cfg, params_dq, cfg_d, prompt, spk,
                    key=jax.random.PRNGKey(3), gamma=gamma, max_new_tokens=n_tok,
                    end_of_audio_token=NEVER, temperature=TEMP, top_p=TOP_P,
                    guidance_scale=GUIDANCE, return_stats=True,
                    # the draft's single row is trained on the guidance-
                    # MERGED teacher dist; skipping draft CFG halves its
                    # per-step cost. draft_temperature is a traced scalar —
                    # the temp sweep reuses one compiled program per gamma.
                    draft_use_cfg=False, draft_temperature=dtemp,
                )

            run_spec()
            best, st = None, None
            for _ in range(3):
                t0 = time.perf_counter()
                seq_s, st = run_spec()
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            emitted = st["emitted"] + 1
            alpha = st["accepted"] / max(st["proposed"], 1)
            log(
                f"gamma={gamma} dtemp={dtemp}: {emitted/best:.1f} tok/s "
                f"(x{emitted/best/base_tps:.2f} vs baseline) | acceptance "
                f"{alpha:.3f} ({st['accepted']}/{st['proposed']}) | "
                f"yield {st['emitted']/max(st['rounds'],1):.2f} tok/round"
            )


if __name__ == "__main__":
    main()

"""Speculative-decoding cost measurement on the real chip.

Random weights make draft ACCEPTANCE meaningless (the draft and target are
uncorrelated), but the COSTS are weight-independent: what one speculation
round costs (gamma draft steps + one T=gamma verify forward through the
quantized prefill kernels + accept/reject) vs what one ordinary int4
megakernel decode step costs. From those two numbers the break-even
acceptance rate — the draft quality at which speculation starts winning —
falls out:

    win  iff  E[emitted/round](alpha) > T_round / T_step,
    E = (1 - alpha^gamma) / (1 - alpha)   (capped at gamma)

Usage: python scripts/diag_spec_cost.py [gamma ...]   (default: 4 8)
Needs the cached int4 params (/tmp/mv_int4_params.npz, written by
diag_stack_ab.py).
"""
import os, sys, time
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/mvtpu_jax"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np
import ml_dtypes
from metavoice_tpu.core.config import first_stage_config
from metavoice_tpu.models import transformer as tfm
from metavoice_tpu.models import first_stage as fs
from metavoice_tpu.models import spec_decode as sd

def log(*a): print(*a, file=sys.stderr, flush=True)

CACHE = "/tmp/mv_int4_params.npz"
cfg = first_stage_config()
data = np.load(CACHE)
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

# realistic draft shape for a 24L/2048d target: 4L/1024d (~52M params).
# MVTPU_SPEC_DRAFT_Q=int4 quantizes the draft so its decode steps ride the
# whole-stack megakernel (weight reads drop to ~26 MB/step).
cfg_d = first_stage_config(n_layer=4, n_head=8, dim=1024)
params_d = tfm.init_params(jax.random.PRNGKey(1), cfg_d, dtype=jnp.bfloat16)
if os.environ.get("MVTPU_SPEC_DRAFT_Q") == "int4":
    from metavoice_tpu.ops import quantized as _qz

    params_d = _qz.quantize_params_int4_i32(params_d)
    log("draft quantized to int4 (megakernel path)")

key = jax.random.PRNGKey(0)
prompt = list(range(2100, 2164))
spk = np.asarray(jax.random.normal(key, (cfg.speaker_emb_dim,), jnp.bfloat16))
N_TOK = 256
never = 10**6  # EOA id that never samples: fixed-length runs

log(f"devices: {jax.devices()}")

def timed(fn, reps=3):
    best = None
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return best, out

# ---- baseline: ordinary int4 megakernel decode, N_TOK tokens
def run_base():
    return fs.generate(
        params, cfg, prompt, jnp.asarray(spk), key=jax.random.PRNGKey(3),
        max_new_tokens=N_TOK, end_of_audio_token=never,
    )

t0 = time.perf_counter()
run_base()
log(f"baseline warm/compile: {time.perf_counter()-t0:.1f}s")
base_s, seq = timed(run_base)
t_step_ms = base_s / (len(seq) - len(prompt)) * 1e3
log(f"baseline decode: {len(seq)-len(prompt)} tok in {base_s:.3f}s -> "
    f"{(len(seq)-len(prompt))/base_s:.1f} tok/s ({t_step_ms:.3f} ms/tok)")

for gamma in [int(g) for g in (sys.argv[1:] or ["4", "8"])]:
    def run_spec():
        return sd.generate_spec(
            params, cfg, params_d, cfg_d, prompt, jnp.asarray(spk),
            key=jax.random.PRNGKey(3), gamma=gamma,
            max_new_tokens=N_TOK, end_of_audio_token=never, return_stats=True,
        )
    t0 = time.perf_counter()
    run_spec()
    log(f"gamma={gamma} warm/compile: {time.perf_counter()-t0:.1f}s")
    spec_s, (seq_s, st) = timed(run_spec)
    emitted = st["emitted"] + 1  # prefill's first token
    t_round_ms = spec_s / st["rounds"] * 1e3
    ratio = t_round_ms / t_step_ms
    # break-even alpha: E(alpha) == ratio
    alphas = np.linspace(0.0, 0.999, 2000)
    eff = np.where(
        alphas < 1, (1 - alphas ** gamma) / (1 - alphas), float(gamma)
    )
    be = alphas[np.searchsorted(eff, ratio)] if ratio < gamma else float("nan")
    log(
        f"gamma={gamma}: {emitted} tok in {spec_s:.3f}s ({emitted/spec_s:.1f} tok/s) | "
        f"rounds={st['rounds']} T_round={t_round_ms:.3f} ms "
        f"(= {ratio:.2f}x T_step) | random-draft acceptance "
        f"{st['accepted']}/{st['proposed']} | yield {st['emitted']/st['rounds']:.2f} tok/round | "
        f"break-even per-token acceptance alpha >= {be:.2f} "
        f"(at alpha=0.8 projected {min((1-0.8**gamma)/0.2, gamma)/ (t_round_ms/1e3) * 1:.0f}"
        f"*rounds/s tok/s = {min((1-0.8**gamma)/0.2, gamma)/(t_round_ms/1e3):.0f} tok/s)"
    )

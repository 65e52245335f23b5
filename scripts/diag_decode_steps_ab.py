"""A/B: decode_steps (N while_loop-steps per iteration) on the real chip.

The measured 562 (argmax bound) -> ~680 tok/s (DMA roofline) residual is
XLA while-loop mechanics; running 2-4 decode steps per loop iteration
amortizes the per-iteration bookkeeping while emitting bit-identical tokens
(tests/test_decode_steps.py). This script times fs.decode single-stream for
MVTPU_DECODE_STEPS in {1, 2, 4} using the cached int4 params.

Usage: python scripts/diag_decode_steps_ab.py   (needs /tmp/mv_int4_params.npz)
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

def log(*a): print(*a, file=sys.stderr, flush=True)

cfg = first_stage_config()
data = np.load("/tmp/mv_int4_params.npz")
params = {}
for k in data.files:
    a = data[k]
    if a.dtype == np.uint16:
        a = a.view(ml_dtypes.bfloat16)
    parts = k.split("/"); d = params
    for p in parts[:-1]: d = d.setdefault(p, {})
    d[parts[-1]] = jnp.asarray(a)

key = jax.random.PRNGKey(0)
prompt_len = 64
prompt = jax.random.randint(key, (1, 128), 2049, cfg.vocab_size)
spk = jax.random.normal(key, (1, cfg.speaker_emb_dim), jnp.bfloat16)
t1 = jnp.asarray(1.0, jnp.float32)
tp = jnp.asarray(0.95, jnp.float32)
g = jnp.asarray(3.0, jnp.float32)
n_tokens = 256
never = 10**6

kv = tfm.KVCache.create(cfg, 2, cfg.block_size, dtype=jnp.bfloat16)
first, kv = fs.prefill(params, cfg, prompt, jnp.asarray(prompt_len, jnp.int32), spk, kv, key, t1, tp, g)
np.asarray(first)
log(f"devices: {jax.devices()}")

results = {}
for steps in (1, 2, 4):
    def run():
        buf, lens, _ = fs.decode(
            params, cfg, first, jnp.asarray(prompt_len, jnp.int32), spk, kv,
            jax.random.PRNGKey(1), t1, tp, g, jnp.asarray(n_tokens, jnp.int32),
            cfg.block_size, never, jnp.bfloat16, 2, 1.0, 0,
            decode_steps=steps,
        )
        return buf, np.asarray(lens)

    t0 = time.perf_counter(); _, lens0 = run()
    log(f"steps={steps} compile+first: {time.perf_counter()-t0:.1f}s")
    best = 1e9
    for i in range(4):
        t0 = time.perf_counter(); _, lens = run(); dt = time.perf_counter() - t0
        best = min(best, dt)
        log(f"steps={steps} run {i}: {dt:.3f}s -> {n_tokens/dt:.1f} tok/s")
    results[steps] = n_tokens / best
    log(f"BEST steps={steps}: {results[steps]:.1f} tok/s")

log("SUMMARY " + "  ".join(f"steps={k}: {v:.1f} tok/s" for k, v in results.items()))

"""End-to-end decode throughput with the int4-i32 serving config on real TPU."""
import os, sys, time
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/mvtpu_jax"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np
from metavoice_tpu.core.config import first_stage_config
from metavoice_tpu.models import first_stage as fs
from metavoice_tpu.models import transformer as tfm
from metavoice_tpu.ops import quantized as qz

def log(*a): print(*a, file=sys.stderr, flush=True)

cfg = first_stage_config()
key = jax.random.PRNGKey(0)
params_bf16 = tfm.init_params(key, cfg, dtype=jnp.bfloat16)
params = qz.quantize_params_int4_i32(params_bf16)
pbytes = sum(
    x.size * x.dtype.itemsize for x in jax.tree.leaves(params["layers"])
    if x.dtype in (jnp.int32, jnp.float32)
)
log(f"packed layer bytes: {pbytes/1e9:.3f} GB")
del params_bf16

kv = tfm.KVCache.create(cfg, 2, cfg.block_size, dtype=jnp.bfloat16)
prompt = jax.random.randint(key, (1, 128), 2049, cfg.vocab_size)
spk = jax.random.normal(key, (1, cfg.speaker_emb_dim), jnp.bfloat16)
t1 = jnp.asarray(1.0, jnp.float32)
tp = jnp.asarray(0.95, jnp.float32)
g = jnp.asarray(3.0, jnp.float32)

t0 = time.perf_counter()
tok, kv = fs.prefill(params, cfg, prompt, jnp.asarray(64, jnp.int32), spk, kv, key, t1, tp, g)
np.asarray(tok)
log(f"prefill compile+run: {time.perf_counter()-t0:.1f}s")

n_tokens = 256
def run():
    buf, lens, _ = fs.decode(
        params, cfg, tok, jnp.asarray(64, jnp.int32), spk, kv,
        jax.random.PRNGKey(1), t1, tp, g,
        jnp.asarray(n_tokens, jnp.int32), cfg.block_size, 10**6, jnp.bfloat16)
    return buf, np.asarray(lens)

t0 = time.perf_counter()
run()
log(f"decode compile+first run: {time.perf_counter()-t0:.1f}s")
times = []
for i in range(3):
    t0 = time.perf_counter()
    buf, lens = run()
    dt = time.perf_counter() - t0
    times.append(dt)
    log(f"run {i}: {dt:.3f}s -> {n_tokens/dt:.1f} tok/s")
best = min(times)
log(f"int4-i32 decode: {n_tokens/best:.1f} tok/s ({pbytes*(n_tokens/best)/1e9:.0f} GB/s packed)")

"""Upper bound: full decode with sampling replaced by argmax (no top-p)."""
import os, sys, time
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/mvtpu_jax"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np
import ml_dtypes
from metavoice_tpu.core import sampling as S

def argmax_cfg(key, logits, guidance_scale, temperature=1.0, top_p=None, top_k=None):
    return jnp.argmax(S.cfg_merge(logits, guidance_scale), axis=-1).astype(jnp.int32)

S.sample_cfg = argmax_cfg  # before first_stage traces it

from metavoice_tpu.core.config import first_stage_config
from metavoice_tpu.models import transformer as tfm
from metavoice_tpu.models import first_stage as fs

def log(*a): print(*a, file=sys.stderr, flush=True)
CACHE = "/tmp/mv_int4_params.npz"
cfg = first_stage_config()
data = np.load(CACHE)
params = {}
for k in data.files:
    a = data[k]
    if a.dtype == np.uint16:
        a = a.view(ml_dtypes.bfloat16)
    parts = k.split("/"); d = params
    for p in parts[:-1]: d = d.setdefault(p, {})
    d[parts[-1]] = jnp.asarray(a)
key = jax.random.PRNGKey(0)
prompt = jax.random.randint(key, (1, 128), 2049, cfg.vocab_size)
spk = jax.random.normal(key, (1, cfg.speaker_emb_dim), jnp.bfloat16)
t1 = jnp.asarray(1.0, jnp.float32); tp = jnp.asarray(0.95, jnp.float32); g = jnp.asarray(3.0, jnp.float32)
kv = tfm.KVCache.create(cfg, 2, cfg.block_size, dtype=jnp.bfloat16)
first, kv = fs.prefill(params, cfg, prompt, jnp.asarray(64, jnp.int32), spk, kv, key, t1, tp, g)
np.asarray(first)
def run():
    buf, lens, _ = fs.decode(params, cfg, first, jnp.asarray(64, jnp.int32), spk, kv,
        jax.random.PRNGKey(1), t1, tp, g, jnp.asarray(256, jnp.int32), cfg.block_size, 10**6, jnp.bfloat16)
    return np.asarray(lens)
t0=time.perf_counter(); run(); log(f"compile: {time.perf_counter()-t0:.1f}s")
best=1e9
for i in range(3):
    t0=time.perf_counter(); run(); dt=time.perf_counter()-t0; best=min(best,dt)
    log(f"run {i}: {dt:.3f}s -> {256/dt:.1f} tok/s")
log(f"BEST argmax-only: {256/best:.1f} tok/s")

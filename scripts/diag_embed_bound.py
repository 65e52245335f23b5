"""Bound: full decode with embed_inputs replaced by zeros (and separately
with the speaker-conditioning matmul hoisted) — how much of the per-step
gap is the embedding path?"""
import os, sys, time
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/mvtpu_jax"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np
import ml_dtypes
from metavoice_tpu.models import transformer as tfm

MODE = os.environ.get("EMBED_MODE", "zeros")
if MODE == "zeros":
    def no_embed(params, cfg, idx, positions, spk_emb, spk_cond_mask=None, compute_dtype=jnp.bfloat16):
        if idx.ndim == 2:
            idx = idx[:, None, :]
        return jnp.zeros((idx.shape[0], idx.shape[2], cfg.dim), compute_dtype)
    tfm.embed_inputs = no_embed
elif MODE == "nocond":
    _orig = tfm.embed_inputs
    def no_cond(params, cfg, idx, positions, spk_emb, spk_cond_mask=None, compute_dtype=jnp.bfloat16):
        return _orig(params, cfg, idx, positions, None, None, compute_dtype)
    tfm.embed_inputs = no_cond

from metavoice_tpu.core.config import first_stage_config
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
t0=time.perf_counter(); run(); log(f"[{MODE}] compile: {time.perf_counter()-t0:.1f}s")
best=1e9
for i in range(3):
    t0=time.perf_counter(); run(); dt=time.perf_counter()-t0; best=min(best,dt)
    log(f"run {i}: {dt:.3f}s -> {256/dt:.1f} tok/s")
log(f"BEST {MODE}: {256/best:.1f} tok/s")

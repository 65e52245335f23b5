"""Decode rate at long context: cache reads start to rival int4 weights."""
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
params = qz.quantize_params_int4_i32(tfm.init_params(key, cfg, dtype=jnp.bfloat16))
kv = tfm.KVCache.create(cfg, 2, cfg.block_size, dtype=jnp.bfloat16)
prompt = jax.random.randint(key, (1, 128), 2049, cfg.vocab_size)
spk = jax.random.normal(key, (1, cfg.speaker_emb_dim), jnp.bfloat16)
t1 = jnp.asarray(1.0, jnp.float32); tp = jnp.asarray(0.95, jnp.float32); g = jnp.asarray(3.0, jnp.float32)
tok, kv = fs.prefill(params, cfg, prompt, jnp.asarray(64, jnp.int32), spk, kv, key, t1, tp, g)
np.asarray(tok)

def run(n):
    buf, lens, _ = fs.decode(
        params, cfg, tok, jnp.asarray(64, jnp.int32), spk, kv,
        jax.random.PRNGKey(1), t1, tp, g,
        jnp.asarray(n, jnp.int32), cfg.block_size, 10**6, jnp.bfloat16)
    np.asarray(lens)

run(4)  # compile
# rate over [64, 64+n): timing difference isolates the tail segment
t0 = time.perf_counter(); run(704); ta = time.perf_counter() - t0
t0 = time.perf_counter(); run(960); tb = time.perf_counter() - t0
t0 = time.perf_counter(); run(1216); tc = time.perf_counter() - t0
t0 = time.perf_counter(); run(1472); td = time.perf_counter() - t0
log(f"tokens   64->768: {704/ta:.0f} tok/s avg")
log(f"segment 768->1024: {256/(tb-ta):.0f} tok/s")
log(f"segment 1024->1280: {256/(tc-tb):.0f} tok/s")
log(f"segment 1280->1536: {256/(td-tc):.0f} tok/s")
log(f"full 1472-token utterance (9.8 s audio): {td:.2f}s -> stage-1 RTF {td/(1472/150):.3f}")

"""Batch-8 long-context decode: int8 vs bf16 KV cache (int4 weights).

At 16 CFG rows the cache read dominates decode past ~500 positions
(24L x S x 16 x 16 x 128 x 2B reaches GBs/step); the int8 cache halves it.
"""
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

B = 8
cfg = first_stage_config()
key = jax.random.PRNGKey(0)
params = qz.quantize_params_int4_i32(tfm.init_params(key, cfg, dtype=jnp.bfloat16))
prompts = [
    list(np.random.default_rng(i).integers(2049, cfg.vocab_size, size=40 + 7 * i))
    for i in range(B)
]
spk_b = jax.random.normal(key, (B, cfg.speaker_emb_dim), jnp.bfloat16)
padded, pad_lens = fs.left_pad_prompts(prompts, bucket=128)
t1 = jnp.asarray(1.0, jnp.float32); tp = jnp.asarray(0.95, jnp.float32); g = jnp.asarray(3.0, jnp.float32)

for label, cdtype in (("int8-cache", jnp.int8), ("bf16-cache", jnp.bfloat16)):
    kv = tfm.KVCache.create(cfg, 2 * B, cfg.block_size, dtype=cdtype)
    first, kv = fs.prefill_batch(
        params, cfg, jnp.asarray(padded), jnp.asarray(pad_lens), spk_b, kv,
        key, t1, tp, g)
    np.asarray(first)
    pos0 = 128

    def run(n, pos, kvb):
        buf, lens, kvb = fs.decode_batch(
            params, cfg, first, jnp.asarray(pos, jnp.int32), jnp.asarray(pad_lens),
            spk_b, kvb, jax.random.PRNGKey(9), t1, tp, g,
            jnp.asarray(n, jnp.int32), cfg.block_size, 10**6, jnp.bfloat16)
        np.asarray(lens)
        return kvb

    t0 = time.perf_counter(); kv = run(4, pos0, kv)
    log(f"[{label}] batch decode compile+first: {time.perf_counter()-t0:.1f}s")
    t0 = time.perf_counter(); kv = run(128, pos0 + 4, kv); ta = time.perf_counter() - t0
    t0 = time.perf_counter(); kv = run(1024, pos0 + 132, kv); tb = time.perf_counter() - t0
    t0 = time.perf_counter(); kv = run(1280, pos0 + 132, kv); tc = time.perf_counter() - t0
    log(f"[{label}] early (pos 132->260): {B*128/ta:.0f} agg tok/s")
    log(f"[{label}] late segment (1156->1412): {B*256/(tc-tb):.0f} agg tok/s")
    log(f"[{label}] 1280-token batch: {tc:.2f}s -> {B*1280/tc:.0f} agg tok/s")

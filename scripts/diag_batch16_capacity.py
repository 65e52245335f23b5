"""Serving-capacity demo: batch-16 decode needs the int8 KV cache.

At B=16 utterances (32 CFG rows) the bf16 cache alone is
24L x 2048S x 32 x 16H x 128Dh x 2B x 2(k,v) = 12.9 GB — plus weights and
activations it does not fit a 16 GB v5e. The int8 cache (6.4 GB + 0.4 GB
scales) does. This is the capacity lever kv_cache_dtype="int8" exists for.
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

B = 16
cfg = first_stage_config()
key = jax.random.PRNGKey(0)
params = qz.quantize_params_int4_i32(tfm.init_params(key, cfg, dtype=jnp.bfloat16))
prompts = [
    list(np.random.default_rng(i).integers(2049, cfg.vocab_size, size=40 + 3 * i))
    for i in range(B)
]
spk_b = jax.random.normal(key, (B, cfg.speaker_emb_dim), jnp.bfloat16)
padded, pad_lens = fs.left_pad_prompts(prompts, bucket=128)
t1 = jnp.asarray(1.0, jnp.float32); tp = jnp.asarray(0.95, jnp.float32); g = jnp.asarray(3.0, jnp.float32)

for label, cdtype in (("int8-cache", jnp.int8), ("bf16-cache", jnp.bfloat16)):
    try:
        kv = tfm.KVCache.create(cfg, 2 * B, cfg.block_size, dtype=cdtype)
        cache_gb = sum(
            x.size * x.dtype.itemsize for x in (kv.k, kv.v)
        ) / 1e9
        sc_gb = (
            sum(x.size * x.dtype.itemsize for x in (kv.k_scale, kv.v_scale)) / 1e9
            if kv.quantized else 0.0
        )
        log(f"[{label}] cache {cache_gb:.1f} GB + scales {sc_gb:.1f} GB")
        first, kv = fs.prefill_batch(
            params, cfg, jnp.asarray(padded), jnp.asarray(pad_lens), spk_b, kv,
            key, t1, tp, g)
        np.asarray(first)

        def run(n, pos, kvb):
            buf, lens, kvb = fs.decode_batch(
                params, cfg, first, jnp.asarray(pos, jnp.int32),
                jnp.asarray(pad_lens), spk_b, kvb, jax.random.PRNGKey(9),
                t1, tp, g, jnp.asarray(n, jnp.int32), cfg.block_size,
                10**6, jnp.bfloat16)
            np.asarray(lens)
            return kvb

        t0 = time.perf_counter(); kv = run(4, 128, kv)
        log(f"[{label}] decode compile+first: {time.perf_counter()-t0:.1f}s")
        t0 = time.perf_counter(); kv = run(256, 132, kv); ta = time.perf_counter() - t0
        log(f"[{label}] 256-token batch-{B} segment: {B*256/ta:.0f} agg tok/s")
        del kv, first
    except Exception as e:
        log(f"[{label}] FAILED: {type(e).__name__}: {str(e)[:300]}")

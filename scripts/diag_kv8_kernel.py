"""Kernel-level micro-bench: int8-cache convert strategies vs bf16 cache.

Times ONLY decode_attention_block_int4 (batch-8 shape, pos=1280) inside one
jit (50-iteration fori_loop -> per-call host dispatch amortized away).
"""
import os, sys, time
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/mvtpu_jax"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np
from metavoice_tpu.ops import attention as A
from metavoice_tpu.ops import quantized as qz
from metavoice_tpu.models import transformer as tfm

def log(*a): print(*a, file=sys.stderr, flush=True)

rng = np.random.default_rng(0)
b, h, dh, s, L = 16, 16, 128, 2048, 2
d = h * dh
bh = b * h
POS = 1280
N = 50
xa = jnp.asarray(rng.normal(size=(b, d)).astype(np.float32) * 0.1, jnp.bfloat16)
wqkv = jnp.asarray(rng.normal(size=(L, d, 3 * d)).astype(np.float32) * 0.02)
wo = jnp.asarray(rng.normal(size=(L, d, d)).astype(np.float32) * 0.02)
qp = qz.quantize_params_int4_i32({"layers": {"wqkv": wqkv, "wo": wo}})["layers"]
kf = rng.normal(size=(L, s, b, h, dh)).astype(np.float32)
k_q, k_s = tfm.quantize_kv_rows(jnp.asarray(kf))
k_bf = (k_q.astype(jnp.float32) * k_s).astype(jnp.bfloat16)
sc = np.zeros((L, s, 1, tfm.kv_scale_width(bh)), np.float32)
sc[..., :bh] = np.asarray(k_s).reshape(L, s, 1, bh)
sc = jnp.asarray(sc)
li = jnp.asarray(1, jnp.int32)
pos = jnp.asarray(POS, jnp.int32)

def make_run(mode, kv8, ch):
    int8 = mode != "bf16"

    @jax.jit
    def run(xa, qp, k0, sc):
        def step(i, carry):
            acc, k, v, ks, vs = carry
            if int8:
                y, k, v, ks, vs = A.decode_attention_block_int4(
                    xa, qp["wqkv"]["pw"], qp["wqkv"]["sc"], qp["wo"]["pw"], qp["wo"]["sc"],
                    k, v, li, pos, n_head=h, k_scale=ks, v_scale=vs,
                    kv8_mode=kv8, chunk=ch)
            else:
                y, k, v, _, _ = A.decode_attention_block_int4(
                    xa, qp["wqkv"]["pw"], qp["wqkv"]["sc"], qp["wo"]["pw"], qp["wo"]["sc"],
                    k, v, li, pos, n_head=h, chunk=ch)
            return (acc + y.astype(jnp.float32).sum(), k, v, ks, vs)

        init = (jnp.zeros(()), k0, k0, sc, sc)
        return jax.lax.fori_loop(0, N, step, init)[0]

    k0 = k_q if int8 else k_bf
    return lambda: run(xa, qp, k0, sc)

for mode, kv8, ch in (
    ("int8", "f32", 64),
    ("int8", "f32", 128),
    ("int8", "bf16", 64),
    ("bf16", None, 64),
):
    label = f"{mode}:{kv8}:c{ch or 'auto'}"
    try:
        run = make_run(mode, kv8, ch)
        t0 = time.perf_counter(); np.asarray(run())
        log(f"[{label}] compile+first: {time.perf_counter()-t0:.1f}s")
        ts = []
        for _ in range(3):
            t0 = time.perf_counter(); np.asarray(run()); ts.append(time.perf_counter() - t0)
        per = min(ts) / N * 1e6
        int8_flag = mode != "bf16"
        kvb = POS * bh * dh * (1 if int8_flag else 2) * 2  # k and v
        scb = (POS * tfm.kv_scale_width(bh) * 4 * 2) if int8_flag else 0
        wb = d * 3 * d // 2 + d * d // 2  # int4 weights
        gbs = (kvb + scb + wb) / per / 1e3
        log(f"[{label}] {per:.0f} us/call -> ~{gbs:.0f} GB/s effective")
    except Exception as e:
        log(f"[{label}] FAILED: {str(e)[:200]}")

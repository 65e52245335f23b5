"""Decode bottleneck diagnostic: weight-stream floor vs full step time."""
import os, sys, time
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/mvtpu_jax"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np
from metavoice_tpu.core.config import first_stage_config
from metavoice_tpu.models import transformer as tfm
from metavoice_tpu.ops import quantized as qz

def log(*a): print(*a, file=sys.stderr, flush=True)

cfg = first_stage_config()
key = jax.random.PRNGKey(0)
params = qz.quantize_params_int8(tfm.init_params(key, cfg, dtype=jnp.bfloat16))
L = params["layers"]
x = jax.random.normal(key, (2, cfg.dim), jnp.bfloat16)

def timeit(f, *args, n=20, name=""):
    out = f(*args); np.asarray(jax.tree.leaves(out)[0])  # compile + sync
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(*args)
    np.asarray(jax.tree.leaves(out)[0])
    dt = (time.perf_counter() - t0) / n
    log(f"{name}: {dt*1000:.3f} ms")
    return dt

# (a) matmuls-only: scan over 24 layers doing all 5 weight-streaming matmuls
@jax.jit
def matmuls_only(x, layers):
    def body(carry, layer):
        h = carry
        qkv = qz.matmul_int8(h, layer["wqkv"]["q"], layer["wqkv"]["scales"])
        att = qz.matmul_int8(qkv[:, :2048], layer["wo"]["q"], layer["wo"]["scales"])
        h = h + att
        f = qz.ffn_int8(
            h,
            layer["w1"]["q"], layer["w1"]["scales"],
            layer["w3"]["q"], layer["w3"]["scales"],
            layer["w2"]["q"], layer["w2"]["scales"],
        )
        return (h + f).astype(jnp.bfloat16), None
    out, _ = jax.lax.scan(body, x, layers)
    return out

wbytes = sum(v["q"].size for k, v in L.items() if isinstance(v, dict) and "q" in v)
log(f"layer weight bytes total: {wbytes/1e9:.3f} GB")
dt = timeit(matmuls_only, x, L, name="matmuls-only 24-layer scan")
log(f"  -> implied bandwidth {wbytes/dt/1e9:.0f} GB/s")

# (b) separate matmuls (no fused ffn)
@jax.jit
def matmuls_separate(x, layers):
    def body(carry, layer):
        h = carry
        qkv = qz.matmul_int8(h, layer["wqkv"]["q"], layer["wqkv"]["scales"])
        att = qz.matmul_int8(qkv[:, :2048], layer["wo"]["q"], layer["wo"]["scales"])
        h = h + att
        a = qz.matmul_int8(h, layer["w1"]["q"], layer["w1"]["scales"])
        b = qz.matmul_int8(h, layer["w3"]["q"], layer["w3"]["scales"])
        f = qz.matmul_int8((jax.nn.silu(a) * b).astype(jnp.bfloat16), layer["w2"]["q"], layer["w2"]["scales"])
        return (h + f).astype(jnp.bfloat16), None
    out, _ = jax.lax.scan(body, x, layers)
    return out

dt2 = timeit(matmuls_separate, x, L, name="separate matmuls 24-layer scan")
log(f"  -> implied bandwidth {wbytes/dt2/1e9:.0f} GB/s")

# (c) single giant int8 matmul (pure kernel bandwidth ceiling)
big_q = jax.random.randint(key, (2048, 8192), -127, 127, jnp.int8)
big_s = jnp.ones((8192,), jnp.float32)

@jax.jit
def big_mm(x):
    def body(c, _):
        return qz.matmul_int8(c, big_q, big_s)[:, :2048].astype(jnp.bfloat16), None
    out, _ = jax.lax.scan(body, x, None, length=24)
    return out

bb = big_q.size * 24
dtc = timeit(big_mm, x, name="24x (2048x8192) int8 matmul")
log(f"  -> implied bandwidth {bb/dtc/1e9:.0f} GB/s (NOTE: same weight; may cache)")

# (d) full real decode step for comparison
from metavoice_tpu.models import first_stage as fs
kv = tfm.KVCache.create(cfg, 2, cfg.block_size, dtype=jnp.bfloat16)
t1 = jnp.asarray(1.0, jnp.float32); tp = jnp.asarray(0.95, jnp.float32); g = jnp.asarray(3.0, jnp.float32)
tok, kv = fs.prefill(params, cfg, jax.random.randint(key, (1,128), 2049, 2562),
                     jnp.asarray(64, jnp.int32), jax.random.normal(key, (1,256), jnp.bfloat16),
                     kv, key, t1, tp, g)
def run_decode(n):
    buf, lens, _ = fs.decode(params, cfg, tok, jnp.asarray(64, jnp.int32),
        jax.random.normal(key, (1,256), jnp.bfloat16), kv, key, t1, tp, g,
        jnp.asarray(n, jnp.int32), cfg.block_size, 10**6, jnp.bfloat16)
    np.asarray(lens)
run_decode(4)
t0=time.perf_counter(); run_decode(8); ta=time.perf_counter()-t0
t0=time.perf_counter(); run_decode(208); tb=time.perf_counter()-t0
per_tok = (tb-ta)/200
log(f"full decode: {per_tok*1000:.3f} ms/token ({1/per_tok:.0f} tok/s)")
log(f"gap vs matmuls-only: {(per_tok-dt)*1000:.3f} ms = attention+norm+sample+glue")

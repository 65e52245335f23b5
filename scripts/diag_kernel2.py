"""Contrast: repo matmul_int8 vs local pallas in the same scan harness."""
import os, sys, time
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/mvtpu_jax"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np
from metavoice_tpu.ops import quantized as qz

def log(*a): print(*a, file=sys.stderr, flush=True)
key = jax.random.PRNGKey(0)
K, N, NREP = 2048, 8192, 24
W = jax.random.randint(key, (NREP, K, N), -127, 127, jnp.int8)
S = jnp.ones((NREP, N), jnp.float32)
x2 = jax.random.normal(key, (2, K), jnp.bfloat16)
BYTES = W.size

def timeit(f, *args, n=10, name=""):
    out = f(*args); np.asarray(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(*args)
    np.asarray(out)
    dt = (time.perf_counter() - t0) / n
    log(f"{name}: {dt*1000:.3f} ms -> {BYTES/dt/1e9:.0f} GB/s")
    return dt

@jax.jit
def repo_chain(x, Ws, Ss):
    def body(c, ws):
        w, s = ws
        o = qz.matmul_int8(c, w, s)
        return o[:, :K].astype(jnp.bfloat16), o[0, 0]
    _, outs = jax.lax.scan(body, x, (Ws, Ss))
    return outs

timeit(repo_chain, x2, W, S, name="repo matmul_int8 chained carry")

@jax.jit
def repo_nodep(x, Ws, Ss):
    def body(c, ws):
        w, s = ws
        o = qz.matmul_int8(x, w, s)
        return c, o[0, 0]
    _, outs = jax.lax.scan(body, 0.0, (Ws, Ss))
    return outs

timeit(repo_nodep, x2, W, S, name="repo matmul_int8 no-dep (like diag_kernel)")

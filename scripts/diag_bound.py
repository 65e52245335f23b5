"""What limits the int8 stream: DMA bandwidth or the int8->bf16 cast?"""
import os, sys, time
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/mvtpu_jax"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

def log(*a): print(*a, file=sys.stderr, flush=True)

D = 2048
NTOT = 25088
LAYERS = 24
B = 8
key = jax.random.PRNGKey(0)
w8 = jax.random.randint(key, (LAYERS, D, NTOT), -127, 127, jnp.int8)
wb = jax.random.normal(key, (LAYERS, D, NTOT), jnp.bfloat16)
x = jax.random.normal(jax.random.PRNGKey(1), (B, D), jnp.bfloat16)
x8 = jnp.clip(jnp.round(x * 16), -127, 127).astype(jnp.int8)

def timeit(f, *args, n=20, name="", bytes_=None):
    out = f(*args); np.asarray(jax.tree.leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(*args)
    np.asarray(jax.tree.leaves(out)[0])
    dt = (time.perf_counter() - t0) / n
    bw = f" -> {bytes_/dt/1e9:.0f} GB/s" if bytes_ else ""
    log(f"{name}: {dt*1000:.3f} ms{bw}")
    return dt

# (a) bf16 weights, no cast: pure DMA-bound reference
@jax.jit
def mm_bf16(x, w):
    def body(h, wl):
        y = jnp.dot(h, wl[:, :128], preferred_element_type=jnp.float32)
        return jnp.concatenate([y.astype(jnp.bfloat16)] * (D // 128), axis=-1), None
    h, _ = jax.lax.scan(body, x, w)
    return h

timeit(mm_bf16, x, wb, name="bf16 dot (2x bytes)", bytes_=wb.size * 2)

# (b) int8 weights cast to bf16 (current path)
@jax.jit
def mm_cast(x, w):
    def body(h, wl):
        y = jnp.dot(h, wl.astype(jnp.bfloat16)[:, :128], preferred_element_type=jnp.float32)
        return jnp.concatenate([y.astype(jnp.bfloat16)] * (D // 128), axis=-1), None
    h, _ = jax.lax.scan(body, x, w)
    return h

timeit(mm_cast, x, w8, name="int8->bf16 cast dot", bytes_=w8.size)

# (c) native int8 x int8 MXU dot, no weight cast at all
@jax.jit
def mm_i8(x8, w):
    def body(h, wl):
        y = jax.lax.dot_general(
            h, wl[:, :128], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        return h, None
    h, _ = jax.lax.scan(body, x8, w)
    return h

timeit(mm_i8, x8, w8, name="int8 x int8 MXU dot", bytes_=w8.size)

# (d) pure reduce (read-only, minimal compute): true DMA roof for int8 blob
@jax.jit
def reduce_only(w):
    def body(acc, wl):
        return acc + wl[:, :128].astype(jnp.float32).sum(axis=0), None
    a, _ = jax.lax.scan(body, jnp.zeros((128,), jnp.float32), w)
    return a

timeit(reduce_only, w8, name="int8 blob reduce-only", bytes_=w8.size)

@jax.jit
def reduce_bf16(w):
    def body(acc, wl):
        return acc + wl[:, :128].astype(jnp.float32).sum(axis=0), None
    a, _ = jax.lax.scan(body, jnp.zeros((128,), jnp.float32), w)
    return a

timeit(reduce_bf16, wb, name="bf16 blob reduce-only", bytes_=wb.size * 2)

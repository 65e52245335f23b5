"""int8 matmul kernel variants: find the bandwidth ceiling."""
import os, sys, time
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/mvtpu_jax"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np
from functools import partial
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def log(*a): print(*a, file=sys.stderr, flush=True)

key = jax.random.PRNGKey(0)
K, N = 2048, 8192
NREP = 24
# DISTINCT weights per rep so nothing caches in VMEM: (24, K, N) int8 = 402MB
W = jax.random.randint(key, (NREP, K, N), -127, 127, jnp.int8)
S = jnp.ones((NREP, N), jnp.float32)
x2 = jax.random.normal(key, (2, K), jnp.bfloat16)
x8 = jax.random.normal(key, (8, K), jnp.bfloat16)
xq = jnp.clip(jax.random.normal(key, (8, K)) * 30, -127, 127).astype(jnp.int8)
BYTES = W.size

def timeit(f, *args, n=10, name=""):
    out = f(*args); np.asarray(out)
    # delta method: time n calls minus 1 call to cancel dispatch overhead
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(*args)
    np.asarray(out)
    dt = (time.perf_counter() - t0) / n
    log(f"{name}: {dt*1000:.3f} ms -> {BYTES/dt/1e9:.0f} GB/s")
    return dt

def make(kern, tile_n, xin, extra=()):
    @jax.jit
    def run(x, Ws, Ss):
        def body(c, ws):
            w, s = ws
            o = pl.pallas_call(
                kern,
                out_shape=jax.ShapeDtypeStruct((x.shape[0], N), jnp.bfloat16),
                grid_spec=pl.GridSpec(
                    grid=(N // tile_n,),
                    in_specs=[
                        pl.BlockSpec((x.shape[0], K), lambda j: (0, 0), memory_space=pltpu.VMEM),
                        pl.BlockSpec((K, tile_n), lambda j: (0, j), memory_space=pltpu.VMEM),
                        pl.BlockSpec((1, tile_n), lambda j: (0, j), memory_space=pltpu.VMEM),
                    ],
                    out_specs=pl.BlockSpec((x.shape[0], tile_n), lambda j: (0, j), memory_space=pltpu.VMEM),
                ),
            )(x, w, s.reshape(1, -1))
            return c, o[0, 0]
        _, outs = jax.lax.scan(body, 0.0, (Ws, Ss))
        return outs
    return lambda: np.asarray(run(xin, W, S))

def k_bf16(x_ref, q_ref, s_ref, o_ref):
    w = q_ref[:].astype(jnp.bfloat16)
    acc = jnp.dot(x_ref[:].astype(jnp.bfloat16), w, preferred_element_type=jnp.float32)
    o_ref[:] = (acc * s_ref[0, :].astype(jnp.float32)).astype(o_ref.dtype)

def k_f32(x_ref, q_ref, s_ref, o_ref):
    w = q_ref[:].astype(jnp.float32)
    acc = jnp.dot(x_ref[:].astype(jnp.float32), w, preferred_element_type=jnp.float32)
    o_ref[:] = (acc * s_ref[0, :].astype(jnp.float32)).astype(o_ref.dtype)

def k_direct(x_ref, q_ref, s_ref, o_ref):
    # no explicit cast: let Mosaic handle mixed dot (may fuse the convert)
    acc = jax.lax.dot_general(
        x_ref[:], q_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[:] = (acc * s_ref[0, :].astype(jnp.float32)).astype(o_ref.dtype)

for tile in (512, 1024, 2048):
    timeit(make(k_bf16, tile, x2), name=f"bf16-cast tile_n={tile} M=2")
timeit(make(k_bf16, 512, x8), name="bf16-cast tile_n=512 M=8")
timeit(make(k_f32, 512, x2), name="f32-cast  tile_n=512 M=2")
try:
    timeit(make(k_direct, 512, x2), name="direct mixed dot tile_n=512 M=2")
except Exception as e:
    log(f"direct mixed dot failed: {str(e)[:200]}")

# int8 x int8 -> int32 MXU (w8a8)
def k_i8i8(x_ref, q_ref, s_ref, o_ref):
    acc = jax.lax.dot_general(
        x_ref[:], q_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    o_ref[:] = (acc.astype(jnp.float32) * s_ref[0, :].astype(jnp.float32)).astype(o_ref.dtype)

try:
    timeit(make(k_i8i8, 512, xq), name="i8xi8->i32 tile_n=512 M=8")
except Exception as e:
    log(f"i8xi8 failed: {str(e)[:200]}")

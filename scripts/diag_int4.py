"""int4-packed kernel throughput over a 24-layer blob, inside one jit.

Target: 0.617 GB packed reads/step < 2 ms -> >500 tok/s potential.
Also measures dequant-cost variants to find the best kernel shape.
"""
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
from metavoice_tpu.ops import quantized as qz

def log(*a): print(*a, file=sys.stderr, flush=True)

D = 2048
NTOT = 25088
LAYERS = 24
B = 8
G = 128
key = jax.random.PRNGKey(0)
packed = jax.random.randint(key, (LAYERS, D // 2, NTOT), 0, 255, jnp.uint8)
scales = jax.random.normal(key, (LAYERS, D // G, NTOT), jnp.float32) * 0.01
zeros = jax.random.normal(key, (LAYERS, D // G, NTOT), jnp.float32) * 0.01
x = jax.random.normal(jax.random.PRNGKey(1), (B, D), jnp.bfloat16)
pbytes = packed.size

def timeit(f, *args, n=20, name="", bytes_=None):
    out = f(*args); np.asarray(jax.tree.leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(*args)
    np.asarray(jax.tree.leaves(out)[0])
    dt = (time.perf_counter() - t0) / n
    bw = f" -> {bytes_/dt/1e9:.0f} GB/s packed" if bytes_ else ""
    log(f"{name}: {dt*1000:.3f} ms{bw}")
    return dt

# (a) existing matmul_int4_packed via scan
@jax.jit
def cur(x, p, s, z):
    def body(h, layer):
        pl_, s_, z_ = layer
        y = qz.matmul_int4_packed(h, pl_, s_, z_, groupsize=G, tile_n=512)
        return y[:, :D].astype(jnp.bfloat16), None
    h, _ = jax.lax.scan(body, x, (packed, scales, zeros))
    return h

pass  # moved to end

# (b) dequant-cost probe: unpack + f32 dequant + reduce only (no scales DMA)
def make_deq(tile, mode):
    n_tiles = NTOT // tile
    def kern(x_ref, p_ref, o_ref):
        j = pl.program_id(0)
        p32 = p_ref[:].astype(jnp.int32)
        if mode == "f32":
            lo = ((p32 & 0xF).astype(jnp.float32) - 7.5)
            hi = ((p32 >> 4).astype(jnp.float32) - 7.5)
            w = jnp.concatenate([lo, hi], axis=0).astype(jnp.bfloat16)
        elif mode == "bf16":
            lo = ((p32 & 0xF) - 8).astype(jnp.bfloat16)
            hi = ((p32 >> 4) - 8).astype(jnp.bfloat16)
            w = jnp.concatenate([lo, hi], axis=0)
        acc = jnp.dot(x_ref[:], w[:, :128], preferred_element_type=jnp.float32)
        @pl.when(j == 0)
        def _():
            o_ref[:] = jnp.zeros_like(o_ref)
        o_ref[:] += acc

    call = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((B, 128), jnp.float32),
        grid_spec=pl.GridSpec(
            grid=(n_tiles,),
            in_specs=[pl.BlockSpec((B, D), lambda j: (0, 0), memory_space=pltpu.VMEM),
                      pl.BlockSpec((D // 2, tile), lambda j: (0, j), memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((B, 128), lambda j: (0, 0), memory_space=pltpu.VMEM),
        ),
    )

    @jax.jit
    def run(x, p):
        def body(h, pl_):
            y = call(h, pl_).astype(jnp.bfloat16)
            return jnp.concatenate([y] * (D // 128), axis=-1), None
        h, _ = jax.lax.scan(body, x, p)
        return h
    return run

for tile in (512, 1024, 2048):
    timeit(make_deq(tile, "f32"), x, packed, name=f"unpack f32 dot tile={tile}", bytes_=pbytes)
timeit(make_deq(1024, "bf16"), x, packed, name="unpack bf16 dot tile=1024", bytes_=pbytes)

# (c) pure packed read (reduce only, no unpack): int4 DMA roof
@jax.jit
def roof(p):
    def body(acc, pl_):
        return acc + pl_[:, :128].astype(jnp.float32).sum(axis=0), None
    a, _ = jax.lax.scan(body, jnp.zeros((128,), jnp.float32), p)
    return a

timeit(roof, packed, name="packed blob reduce-only", bytes_=pbytes)
timeit(cur, x, packed, scales, zeros, name="matmul_int4_packed x24 (tile 512)", bytes_=pbytes)

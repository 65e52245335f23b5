"""Raw streaming roofline measured INSIDE one jit (scan over 24 layers).

Host dispatch on the tunneled axon backend costs ~0.7 ms per jit call, so all
timing loops live inside a single program.
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

def log(*a): print(*a, file=sys.stderr, flush=True)

D = 2048
NTOT = 25088  # all 5 layer matmuls stacked: 6144+2048+5632*3 columns
LAYERS = 24
B = 8

w = jax.random.randint(jax.random.PRNGKey(0), (LAYERS, D, NTOT), -127, 127, jnp.int8)
x = jax.random.normal(jax.random.PRNGKey(1), (B, D), jnp.bfloat16)
wbytes = w.size

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

# ---- (a) manual double-buffered DMA stream over all 24 layers ---------------
def make_stream(tile):
    n_tiles = NTOT // tile
    def kern(x_ref, w_hbm, o_ref, w_buf, acc, sems):
        def dma(slot, j):
            return pltpu.make_async_copy(
                w_hbm.at[:, pl.ds(j * tile, tile)], w_buf.at[slot], sems.at[slot])
        dma(0, 0).start()
        acc[:] = jnp.zeros_like(acc)
        xv = x_ref[:]
        def body(j, _):
            slot = jax.lax.rem(j, 2)
            @pl.when(j + 1 < n_tiles)
            def _():
                dma(jax.lax.rem(j + 1, 2), j + 1).start()
            dma(slot, j).wait()
            wv = w_buf[slot].astype(jnp.bfloat16)
            acc[:] += jnp.dot(xv, wv[:, :128], preferred_element_type=jnp.float32)
            return _
        jax.lax.fori_loop(0, n_tiles, body, None)
        o_ref[:] = acc[:].astype(o_ref.dtype)

    call = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((B, 128), jnp.bfloat16),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((2, D, tile), jnp.int8),
                        pltpu.VMEM((B, 128), jnp.float32),
                        pltpu.SemaphoreType.DMA((2,))],
    )

    @jax.jit
    def run(x, w):
        def body(h, wl):
            y = call(h, wl)
            return jnp.concatenate([y] * (D // 128), axis=-1), None
        h, _ = jax.lax.scan(body, x, w)
        return h
    return run

for tile in (512, 1024, 2048, 3584):
    if NTOT % tile == 0 or tile == 3584:
        tt = tile if NTOT % tile == 0 else 3584
        if NTOT % tt != 0:
            continue
    dt = timeit(make_stream(tile), x, w, name=f"manual stream 24L tile={tile}", bytes_=wbytes)

# ---- (b) grid-pipelined over 24 layers --------------------------------------
def make_grid(tile):
    def kern(x_ref, w_ref, o_ref):
        j = pl.program_id(0)
        @pl.when(j == 0)
        def _():
            o_ref[:] = jnp.zeros_like(o_ref)
        o_ref[:] += jnp.dot(x_ref[:], w_ref[:].astype(jnp.bfloat16)[:, :128],
                            preferred_element_type=jnp.float32)

    call = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((B, 128), jnp.float32),
        grid_spec=pl.GridSpec(
            grid=(NTOT // tile,),
            in_specs=[pl.BlockSpec((B, D), lambda j: (0, 0), memory_space=pltpu.VMEM),
                      pl.BlockSpec((D, tile), lambda j: (0, j), memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((B, 128), lambda j: (0, 0), memory_space=pltpu.VMEM),
        ),
    )

    @jax.jit
    def run(x, w):
        def body(h, wl):
            y = call(h, wl).astype(jnp.bfloat16)
            return jnp.concatenate([y] * (D // 128), axis=-1), None
        h, _ = jax.lax.scan(body, x, w)
        return h
    return run

for tile in (512, 1024, 2048):
    dt = timeit(make_grid(tile), x, w, name=f"grid stream 24L tile={tile}", bytes_=wbytes)

# ---- (c) XLA itself: plain bf16-cast matmul over the blob -------------------
@jax.jit
def xla_mm(x, w):
    def body(h, wl):
        y = jnp.dot(h, wl.astype(jnp.bfloat16)[:, :128], preferred_element_type=jnp.float32)
        return jnp.concatenate([y.astype(jnp.bfloat16)] * (D // 128), axis=-1), None
    h, _ = jax.lax.scan(body, x, w)
    return h

timeit(xla_mm, x, w, name="XLA dot over 24L int8 blob", bytes_=wbytes)

"""DMA bandwidth: column-sliced weight tiles vs tile-contiguous repack.

The stack kernel DMAs (K/8, 1024)-column slices of (L, K/8, N) arrays —
each row contributes a 4 KB contiguous run. A tile-major (L, T, K/8, 1024)
repack makes every tile one contiguous ~1 MB block. Measures both."""
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

L, K8, N, TILE = 24, 256, 6144, 1024
NT = N // TILE
REPS = 40

def _kernel_sliced(l_const, x_ref, w_hbm, o_ref, w_buf, sems):
    def dma(slot, li, j):
        return pltpu.make_async_copy(
            w_hbm.at[li, :, pl.ds(j * TILE, TILE)], w_buf.at[slot], sems.at[slot]
        )
    dma(0, 0, 0).start()
    def body(i, acc):
        li, j = i // NT, jax.lax.rem(i, NT)
        slot = jax.lax.rem(i, 2)
        nxt = i + 1
        @pl.when(nxt < l_const * NT)
        def _():
            dma(jax.lax.rem(nxt, 2), nxt // NT, jax.lax.rem(nxt, NT)).start()
        dma(slot, li, j).wait()
        return acc + w_buf[slot][0, 0]
    acc = jax.lax.fori_loop(0, l_const * NT, body, jnp.int32(0))
    o_ref[:] = x_ref[:] + acc

def _kernel_tiled(l_const, x_ref, w_hbm, o_ref, w_buf, sems):
    def dma(slot, i):
        return pltpu.make_async_copy(w_hbm.at[i], w_buf.at[slot], sems.at[slot])
    dma(0, 0).start()
    def body(i, acc):
        slot = jax.lax.rem(i, 2)
        @pl.when(i + 1 < l_const * NT)
        def _():
            dma(jax.lax.rem(i + 1, 2), i + 1).start()
        dma(slot, i).wait()
        return acc + w_buf[slot][0, 0]
    acc = jax.lax.fori_loop(0, l_const * NT, body, jnp.int32(0))
    o_ref[:] = x_ref[:] + acc

def run(kernel, w, name):
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0, grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((2, K8, TILE), jnp.int32),
                        pltpu.SemaphoreType.DMA((2,))],
    )
    f = pl.pallas_call(partial(kernel, L), out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
                       grid_spec=grid_spec,
                       compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64*1024*1024))
    x = jnp.zeros((8, 128), jnp.int32)
    @jax.jit
    def many(x, w):
        def step(c, _):
            return f(c, w), None
        c, _ = jax.lax.scan(step, x, None, length=REPS)
        return c
    np.asarray(many(x, w))
    t0 = time.perf_counter(); np.asarray(many(x, w)); dt = (time.perf_counter() - t0) / REPS
    gb = L * K8 * N * 4 / 1e9
    log(f"{name}: {dt*1e3:.3f} ms -> {gb/dt:.0f} GB/s")

w_sliced = jnp.arange(L * K8 * N, dtype=jnp.int32).reshape(L, K8, N)
run(_kernel_sliced, w_sliced, "column-sliced (L, K8, N)")
w_tiled = jnp.arange(L * NT * K8 * TILE, dtype=jnp.int32).reshape(L * NT, K8, TILE)
run(_kernel_tiled, w_tiled, "tile-contiguous (L*T, K8, TILE)")

"""Micro-profile the decode head: norm+lm_head, CFG merge, top-p, sampling."""
import os, sys, time
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/mvtpu_jax"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np
from metavoice_tpu.core import sampling as S

def log(*a): print(*a, file=sys.stderr, flush=True)
ITERS = 128
key = jax.random.PRNGKey(0)
V, D = 2562, 2048
wte = jax.random.normal(key, (V, D), jnp.bfloat16)
x = jax.random.normal(key, (2, 1, D), jnp.bfloat16)
logits0 = jax.random.normal(key, (2, V), jnp.float32)

def timeit(f, *args, name=""):
    out = f(*args); np.asarray(jax.tree.leaves(out)[0])
    t0 = time.perf_counter(); out = f(*args); np.asarray(jax.tree.leaves(out)[0])
    dt = (time.perf_counter() - t0) / ITERS
    log(f"{name}: {dt*1e6:.1f} us")
    return dt

def scan(fn):
    @jax.jit
    def run(a, b):
        def step(carry, _):
            return fn(carry, b), None
        c, _ = jax.lax.scan(step, a, None, length=ITERS)
        return c
    return run

# 1. lm_head einsum only
head = scan(lambda x, w: (jnp.einsum("...d,vd->...v", x, w.astype(x.dtype), preferred_element_type=jnp.float32)[:, :, :D] * 1e-6).astype(jnp.bfloat16) + x)
timeit(head, x, wte, name="lm_head einsum (2,2048)x(2562,2048)")

# 2. argsort only
srt = scan(lambda l, _: jnp.argsort(-l, axis=-1).astype(jnp.float32) * 1e-9 + l)
timeit(srt, logits0, 0, name="argsort (2,2562)")

# 3. top_p_mask full
tp = scan(lambda l, _: S.top_p_mask(l, 0.95) * 1e-9 + l)
timeit(tp, logits0, 0, name="top_p_mask")

# 4. categorical only
def cat(l, k):
    s = jax.random.categorical(jax.random.PRNGKey(0), l, axis=-1)
    return l + s[:, None].astype(l.dtype) * 1e-9
timeit(scan(cat), logits0, 0, name="categorical")

# 5. full sample_cfg
def sc(l, _):
    t = S.sample_cfg(jax.random.PRNGKey(0), l, 3.0, temperature=1.0, top_p=0.95)
    return l + t[:, None].astype(l.dtype) * 1e-9
timeit(scan(sc), logits0, 0, name="sample_cfg full")

# 6. top_k for comparison
tk = scan(lambda l, _: jax.lax.top_k(l, 256)[0].sum() * 1e-9 + l)
timeit(tk, logits0, 0, name="top_k(256)")

# 7. cumsum+softmax only
cs = scan(lambda l, _: jnp.cumsum(jax.nn.softmax(l, axis=-1), axis=-1) * 1e-9 + l)
timeit(cs, logits0, 0, name="softmax+cumsum")

"""Per-kernel decode timing: fused attention block vs ffn_int8, 24-layer scans."""
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
from metavoice_tpu.ops.attention import decode_attention_block_int8

def log(*a): print(*a, file=sys.stderr, flush=True)

cfg = first_stage_config()
key = jax.random.PRNGKey(0)
params = qz.quantize_params_int8(tfm.init_params(key, cfg, dtype=jnp.bfloat16))
L = params["layers"]
B = 2
x = jax.random.normal(key, (B, cfg.dim), jnp.bfloat16)
kv = tfm.KVCache.create(cfg, B, cfg.block_size, dtype=jnp.bfloat16)

def timeit(f, *args, n=30, name=""):
    out = f(*args); np.asarray(jax.tree.leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(*args)
    np.asarray(jax.tree.leaves(out)[0])
    dt = (time.perf_counter() - t0) / n
    log(f"{name}: {dt*1000:.3f} ms")
    return dt

# (a) attention megakernel only, 24 layers
@jax.jit
def attn_only(x, layers, k, v):
    def body(carry, lp):
        h, kf, vf, li = carry
        y, kf, vf = decode_attention_block_int8(
            h, lp["wqkv"]["q"], lp["wqkv"]["scales"], lp["wo"]["q"], lp["wo"]["scales"],
            kf, vf, li, jnp.asarray(512, jnp.int32), cfg.n_head)
        return (y.astype(jnp.bfloat16), kf, vf, li + 1), None
    (h, kf, vf, _), _ = jax.lax.scan(body, (x, k, v, jnp.asarray(0, jnp.int32)), layers)
    return h, kf, vf

attn_bytes = 24 * (L["wqkv"]["q"][0].size + L["wo"]["q"][0].size)
dta = timeit(attn_only, x, L, kv.k, kv.v, name="attn megakernel x24")
log(f"  weight bytes {attn_bytes/1e6:.0f} MB -> {attn_bytes/dta/1e9:.0f} GB/s (+cache reads)")

# (b) ffn_int8 only, 24 layers
@jax.jit
def ffn_only(x, layers):
    def body(h, lp):
        y = qz.ffn_int8(h, lp["w1"]["q"], lp["w1"]["scales"], lp["w3"]["q"], lp["w3"]["scales"],
                        lp["w2"]["q"], lp["w2"]["scales"])
        return y.astype(jnp.bfloat16), None
    h, _ = jax.lax.scan(body, x, layers)
    return h

ffn_bytes = 24 * (L["w1"]["q"][0].size + L["w3"]["q"][0].size + L["w2"]["q"][0].size)
dtf = timeit(ffn_only, x, L, name="ffn_int8 x24")
log(f"  weight bytes {ffn_bytes/1e6:.0f} MB -> {ffn_bytes/dtf/1e9:.0f} GB/s")

# (c) single matmul_int8 wqkv x24 for comparison
@jax.jit
def qkv_only(x, layers):
    def body(h, lp):
        y = qz.matmul_int8(h, lp["wqkv"]["q"], lp["wqkv"]["scales"])
        return y[:, :cfg.dim].astype(jnp.bfloat16), None
    h, _ = jax.lax.scan(body, x, layers)
    return h

qkv_bytes = 24 * L["wqkv"]["q"][0].size
dtq = timeit(qkv_only, x, L, name="matmul_int8 wqkv x24")
log(f"  weight bytes {qkv_bytes/1e6:.0f} MB -> {qkv_bytes/dtq/1e9:.0f} GB/s")

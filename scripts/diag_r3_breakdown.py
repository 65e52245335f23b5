"""Round-3 decode-time breakdown: where do 2.18 ms/token go?

Times each component of the int4 decode step inside ONE jit (fori_loop of
ITERS steps, CLAUDE.md: per-call dispatch ~0.7 ms on the tunneled backend):

  step    embed + 24-layer scan (attn megakernel + ffn kernel) + head + sample
  blocks  the 24-layer scan alone
  attn24  attention megakernels alone (24 layers)
  ffn24   ffn kernels alone (24 layers)
  head    final norm + lm_head (tied wte, bf16) + CFG top-p sample
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
from metavoice_tpu.core.config import first_stage_config
from metavoice_tpu.core import sampling as S
from metavoice_tpu.models import transformer as tfm
from metavoice_tpu.models import first_stage as fs
from metavoice_tpu.ops import quantized as qz
from metavoice_tpu.ops.attention import decode_attention_block_int4

def log(*a): print(*a, file=sys.stderr, flush=True)

ITERS = 64
POS = 192  # representative mid-decode position
cfg = first_stage_config()
key = jax.random.PRNGKey(0)
log("init + quantize ...")
params = qz.quantize_params_int4_i32(tfm.init_params(key, cfg, dtype=jnp.bfloat16))
params = jax.tree.map(lambda a: a.block_until_ready() if hasattr(a, "block_until_ready") else a, params)
L = params["layers"]
B = 2  # CFG pair
x0 = jax.random.normal(key, (B, 1, cfg.dim), jnp.bfloat16)
kv = tfm.KVCache.create(cfg, B, cfg.block_size, dtype=jnp.bfloat16)
spk = jax.random.normal(key, (1, 256))
big = {k: L[k] for k in ("wqkv", "wo", "w1", "w3", "w2")}
small = {k: v for k, v in L.items() if k not in big}

def timeit(f, *args, name=""):
    out = f(params, *args)
    np.asarray(jax.tree.leaves(out)[0])
    t0 = time.perf_counter()
    out = f(params, *args)
    np.asarray(jax.tree.leaves(out)[0])
    dt = (time.perf_counter() - t0) / ITERS
    log(f"{name}: {dt*1e6:.1f} us/step")
    return dt

mask2 = fs.make_spk_cond_mask(1, 2)
spk2 = fs._cfg_rows(spk, 2)

def full_step(params, carry, _):
    big = {k: params["layers"][k] for k in ("wqkv", "wo", "w1", "w3", "w2")}
    tok, k_full, v_full, kkey = carry
    kkey, sub = jax.random.split(kkey)
    idx2 = tok[:, None]
    positions = jnp.asarray([POS])
    x = tfm.embed_inputs(params, cfg, idx2, positions, spk2, mask2, jnp.bfloat16)
    kvv = tfm.KVCache(k=k_full, v=v_full, k_scale=None, v_scale=None)
    x, new_kv = tfm.apply_blocks(params, cfg, x, None, kvv, jnp.asarray(POS))
    logits = tfm.output_logits(params, cfg, x)[0][:, 0, :]
    sampled = S.sample_cfg(sub, logits, 3.0, temperature=1.0, top_p=0.95)
    tok = jnp.concatenate([sampled, sampled]).astype(jnp.int32)
    return (tok, new_kv.k, new_kv.v, kkey), None

@jax.jit
def run_full(params, tok, k_full, v_full, kkey):
    (tok, k_full, v_full, kkey), _ = jax.lax.scan(
        partial(full_step, params), (tok, k_full, v_full, kkey), None, length=ITERS)
    return tok, k_full

def blocks_only_step(params, carry, _):
    x, k_full, v_full = carry
    kvv = tfm.KVCache(k=k_full, v=v_full, k_scale=None, v_scale=None)
    x, new_kv = tfm.apply_blocks(params, cfg, x, None, kvv, jnp.asarray(POS))
    return (x.astype(jnp.bfloat16), new_kv.k, new_kv.v), None

@jax.jit
def run_blocks(params, x, k_full, v_full):
    (x, k_full, v_full), _ = jax.lax.scan(
        partial(blocks_only_step, params), (x, k_full, v_full), None, length=ITERS)
    return x

def attn_layer_scan(params, x, k_full, v_full):
    L = params["layers"]
    big = {k: L[k] for k in ("wqkv", "wo", "w1", "w3", "w2")}
    small = {k: v for k, v in L.items() if k not in big}
    def body(carry, lp):
        x, kf, vf, li = carry
        xa = tfm._norm(x, lp["attn_norm_w"], None, cfg.norm_type, cfg.norm_eps)
        y2, kf, vf, _, _ = decode_attention_block_int4(
            xa[:, 0, :],
            big["wqkv"]["pw"], big["wqkv"]["sc"],
            big["wo"]["pw"], big["wo"]["sc"],
            kf, vf, li, jnp.asarray(POS, jnp.int32), cfg.n_head,
        )
        return (x + y2[:, None, :].astype(x.dtype), kf, vf, li + 1), None
    (x, k_full, v_full, _), _ = jax.lax.scan(
        body, (x, k_full, v_full, jnp.asarray(0, jnp.int32)), small)
    return x, k_full, v_full

@jax.jit
def run_attn(params, x, k_full, v_full):
    def step(carry, _):
        x, kf, vf = carry
        x, kf, vf = attn_layer_scan(params, x, kf, vf)
        return (x.astype(jnp.bfloat16), kf, vf), None
    (x, k_full, v_full), _ = jax.lax.scan(step, (x, k_full, v_full), None, length=ITERS)
    return x

def ffn_layer_scan(params, x):
    L = params["layers"]
    big = {k: L[k] for k in ("wqkv", "wo", "w1", "w3", "w2")}
    small = {k: v for k, v in L.items() if k not in big}
    def body(carry, lp):
        x, li = carry
        hn = tfm._norm(x, lp["ffn_norm_w"], None, cfg.norm_type, cfg.norm_eps)
        f = qz.decode_ffn_int4(
            hn[:, 0, :],
            big["w1"]["pw"], big["w1"]["sc"],
            big["w3"]["pw"], big["w3"]["sc"],
            big["w2"]["pw"], big["w2"]["sc"],
            li,
        )
        return (x + f[:, None, :].astype(x.dtype), li + 1), None
    (x, _), _ = jax.lax.scan(body, (x, jnp.asarray(0, jnp.int32)), small)
    return x

@jax.jit
def run_ffn(params, x):
    x, _ = jax.lax.scan(lambda c, _: (ffn_layer_scan(params, c).astype(jnp.bfloat16), None), x, None, length=ITERS)
    return x

@jax.jit
def run_head(params, x, kkey):
    def step(carry, _):
        x, kkey = carry
        kkey, sub = jax.random.split(kkey)
        xn = tfm._norm(x, params["ln_f_w"], None, cfg.norm_type, cfg.norm_eps)
        logits = tfm.output_logits(params, cfg, xn)[0][:, 0, :]
        sampled = S.sample_cfg(sub, logits, 3.0, temperature=1.0, top_p=0.95)
        x = x + 1e-6 * sampled[0].astype(x.dtype)
        return (x, kkey), None
    (x, kkey), _ = jax.lax.scan(step, (x, kkey), None, length=ITERS)
    return x

log(f"devices: {jax.devices()}")
tok0 = jnp.zeros((2,), jnp.int32)
t_full = timeit(run_full, tok0, kv.k, kv.v, key, name="full step")
t_blocks = timeit(run_blocks, x0, kv.k, kv.v, name="blocks(24)")
t_attn = timeit(run_attn, x0, kv.k, kv.v, name="attn24")
t_ffn = timeit(run_ffn, x0, name="ffn24")
t_head = timeit(run_head, x0, key, name="head+sample")
log(f"attn+ffn = {(t_attn+t_ffn)*1e6:.1f} us; blocks - (attn+ffn) = {(t_blocks-t_attn-t_ffn)*1e6:.1f} us")
log(f"full - blocks - head = {(t_full-t_blocks-t_head)*1e6:.1f} us (embed + loop overhead)")
log(f"tok/s at full-step rate: {1.0/t_full:.1f}")

"""A/B: whole-stack megakernel vs two-kernel-per-layer decode, on chip.

Caches the packed int4 params in /tmp so reruns skip the on-chip quantize.
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
from metavoice_tpu.ops import quantized as qz
from metavoice_tpu.ops.attention import decode_attention_block_int4
from metavoice_tpu.ops.decode_stack import decode_stack_int4

def log(*a): print(*a, file=sys.stderr, flush=True)

ITERS = 64
POS = 192
CACHE = "/tmp/mv_int4_params.npz"
cfg = first_stage_config()
key = jax.random.PRNGKey(0)

if os.path.exists(CACHE):
    log("loading cached packed params ...")
    import ml_dtypes
    data = np.load(CACHE)
    def undot(prefix):
        out = {}
        for k in data.files:
            if k.startswith(prefix):
                a = data[k]
                if a.dtype == np.uint16:
                    a = a.view(ml_dtypes.bfloat16)
                out[k[len(prefix):]] = jnp.asarray(a)
        return out
    flat = undot("")
    params = {}
    for k, v in flat.items():
        parts = k.split("/")
        d = params
        for p in parts[:-1]:
            d = d.setdefault(p, {})
        d[parts[-1]] = v
else:
    log("init + quantize (cold) ...")
    params = qz.quantize_params_int4_i32(tfm.init_params(key, cfg, dtype=jnp.bfloat16))
    flat = {}
    def rec(d, pre):
        for k, v in d.items():
            if isinstance(v, dict):
                rec(v, pre + k + "/")
            else:
                a = np.asarray(v)
                if a.dtype.name == "bfloat16":
                    a = a.view(np.uint16)
                flat[pre + k] = a
    rec(params, "")
    np.savez(CACHE, **flat)
    log("cached to", CACHE)

L = params["layers"]
big = {k: L[k] for k in ("wqkv", "wo", "w1", "w3", "w2")}
small = {k: v for k, v in L.items() if k not in big}
B = 2
x0 = jax.random.normal(key, (B, cfg.dim), jnp.bfloat16) * 0.3
kv = tfm.KVCache.create(cfg, B, cfg.block_size, dtype=jnp.bfloat16)

def timeit(f, *args, name=""):
    out = f(*args)
    np.asarray(jax.tree.leaves(out)[0])
    t0 = time.perf_counter()
    out = f(*args)
    np.asarray(jax.tree.leaves(out)[0])
    dt = (time.perf_counter() - t0) / ITERS
    log(f"{name}: {dt*1e6:.1f} us/step -> {1e3/ (dt*1e3):.0f} steps/s")
    return dt

def two_kernel_pass(params, x, kf, vf):
    Lp = params["layers"]
    bigp = {k: Lp[k] for k in ("wqkv", "wo", "w1", "w3", "w2")}
    smallp = {k: v for k, v in Lp.items() if k not in bigp}
    def body(carry, lp):
        x, kf, vf, li = carry
        xa = tfm._norm(x, lp["attn_norm_w"], None, cfg.norm_type, cfg.norm_eps)
        y2, kf, vf, _, _ = decode_attention_block_int4(
            xa, bigp["wqkv"]["pw"], bigp["wqkv"]["sc"],
            bigp["wo"]["pw"], bigp["wo"]["sc"],
            kf, vf, li, jnp.asarray(POS, jnp.int32), cfg.n_head,
        )
        h = x + y2.astype(x.dtype)
        hn = tfm._norm(h, lp["ffn_norm_w"], None, cfg.norm_type, cfg.norm_eps)
        f = qz.decode_ffn_int4(
            hn, bigp["w1"]["pw"], bigp["w1"]["sc"],
            bigp["w3"]["pw"], bigp["w3"]["sc"],
            bigp["w2"]["pw"], bigp["w2"]["sc"], li,
        )
        return (h + f.astype(x.dtype), kf, vf, li + 1), None
    (x, kf, vf, _), _ = jax.lax.scan(
        body, (x, kf, vf, jnp.asarray(0, jnp.int32)), smallp)
    return x, kf, vf

def stack_pass(params, x, kf, vf):
    Lp = params["layers"]
    bigp = {k: Lp[k] for k in ("wqkv", "wo", "w1", "w3", "w2")}
    return decode_stack_int4(
        x, Lp["attn_norm_w"], Lp["ffn_norm_w"],
        bigp["wqkv"]["pw"], bigp["wqkv"]["sc"],
        bigp["wo"]["pw"], bigp["wo"]["sc"],
        bigp["w1"]["pw"], bigp["w1"]["sc"],
        bigp["w3"]["pw"], bigp["w3"]["sc"],
        bigp["w2"]["pw"], bigp["w2"]["sc"],
        kf, vf, jnp.asarray(POS, jnp.int32), cfg.n_head,
        norm_eps=cfg.norm_eps,
    )

@jax.jit
def parity(params, x, kf, vf):
    a, ka, va = two_kernel_pass(params, x, kf, vf)
    b, kb, vb = stack_pass(params, x, kf, vf)
    return a, b

@jax.jit
def run_two(params, x, kf, vf):
    def step(carry, _):
        x, kf, vf = carry
        x, kf, vf = two_kernel_pass(params, x, kf, vf)
        return (x.astype(jnp.bfloat16), kf, vf), None
    (x, kf, vf), _ = jax.lax.scan(step, (x, kf, vf), None, length=ITERS)
    return x

@jax.jit
def run_stack(params, x, kf, vf):
    def step(carry, _):
        x, kf, vf = carry
        x, kf, vf = stack_pass(params, x, kf, vf)
        return (x.astype(jnp.bfloat16), kf, vf), None
    (x, kf, vf), _ = jax.lax.scan(step, (x, kf, vf), None, length=ITERS)
    return x

@jax.jit
def run_head(params, x, kkey):
    def step(carry, _):
        x, kkey = carry
        kkey, sub = jax.random.split(kkey)
        xn = tfm._norm(x[:, None, :], params["ln_f_w"], None, cfg.norm_type, cfg.norm_eps)
        logits = tfm.output_logits(params, cfg, xn)[0][:, 0, :]
        sampled = S.sample_cfg(sub, logits, 3.0, temperature=1.0, top_p=0.95)
        x = x + 1e-6 * sampled[0].astype(x.dtype)
        return (x, kkey), None
    (x, kkey), _ = jax.lax.scan(step, (x, kkey), None, length=ITERS)
    return x

log(f"devices: {jax.devices()}")
a, b = parity(params, x0, kv.k, kv.v)
a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
err = np.abs(a - b).max() / (np.abs(a).max() + 1e-6)
log(f"parity stack vs two-kernel on chip: rel max err {err:.2e}")
assert err < 8e-2, (a[:, :5], b[:, :5])
t2 = timeit(run_two, params, x0, kv.k, kv.v, name="two-kernel 24L")
t1 = timeit(run_stack, params, x0, kv.k, kv.v, name="stack 24L")
th = timeit(run_head, params, x0, key, name="head+sample (new top_p)")
log(f"stack speedup over two-kernel: {t2/t1:.3f}x")
wbytes = sum(np.asarray(v).nbytes for k in ("wqkv", "wo", "w1", "w3", "w2") for v in big[k].values())
log(f"weight bytes/layer-pass: {wbytes/1e6:.1f} MB -> stack achieves {wbytes/t1/1e9:.0f} GB/s weight stream")

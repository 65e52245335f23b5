"""Ground-truth decode throughput: full fs.decode (while_loop + sampling),
stack kernel ON vs OFF. Uses the cached packed params from diag_stack_ab."""
import os, sys, time
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/mvtpu_jax"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np
import ml_dtypes
from metavoice_tpu.core.config import first_stage_config
from metavoice_tpu.models import transformer as tfm
from metavoice_tpu.models import first_stage as fs

def log(*a): print(*a, file=sys.stderr, flush=True)

CACHE = "/tmp/mv_int4_params.npz"
cfg = first_stage_config()
data = np.load(CACHE)
params = {}
for k in data.files:
    a = data[k]
    if a.dtype == np.uint16:
        a = a.view(ml_dtypes.bfloat16)
    parts = k.split("/")
    d = params
    for p in parts[:-1]:
        d = d.setdefault(p, {})
    d[parts[-1]] = jnp.asarray(a)

if "lm_head_q" not in params:
    # cache predates the packed tied head: build it from the bf16 wte
    from metavoice_tpu.ops import quantized as qz

    wte = jnp.asarray(params["wtes"][0])
    vp = -(-wte.shape[0] // 1024) * 1024
    wt = jnp.concatenate(
        [wte.T, jnp.zeros((wte.shape[1], vp - wte.shape[0]), wte.dtype)], axis=1
    )
    hpw, hsc = qz.quantize_int4_i32(wt)
    col = jnp.arange(vp) < wte.shape[0]
    params["lm_head_q"] = {"pw": hpw, "sc": jnp.where(col[None, :], hsc, 0.0)}
    log("packed lm head built from cached wte")

key = jax.random.PRNGKey(0)
prompt_len = 64
prompt = jax.random.randint(key, (1, 128), 2049, cfg.vocab_size)
spk = jax.random.normal(key, (1, cfg.speaker_emb_dim), jnp.bfloat16)
t1 = jnp.asarray(1.0, jnp.float32)
tp = jnp.asarray(0.95, jnp.float32)
g = jnp.asarray(3.0, jnp.float32)
n_tokens = 256
never = 10**6

log(f"devices: {jax.devices()}  MVTPU_STACK_KERNEL={os.environ.get('MVTPU_STACK_KERNEL','1')}")
kv = tfm.KVCache.create(cfg, 2, cfg.block_size, dtype=jnp.bfloat16)
first, kv = fs.prefill(params, cfg, prompt, jnp.asarray(prompt_len, jnp.int32), spk, kv, key, t1, tp, g)
np.asarray(first)

def run():
    buf, lens, _ = fs.decode(
        params, cfg, first, jnp.asarray(prompt_len, jnp.int32), spk, kv,
        jax.random.PRNGKey(1), t1, tp, g, jnp.asarray(n_tokens, jnp.int32),
        cfg.block_size, never, jnp.bfloat16,
    )
    return buf, np.asarray(lens)

t0 = time.perf_counter(); run(); log(f"decode compile+first: {time.perf_counter()-t0:.1f}s")
best = 1e9
for i in range(4):
    t0 = time.perf_counter(); _, lens = run(); dt = time.perf_counter() - t0
    best = min(best, dt)
    log(f"run {i}: {dt:.3f}s -> {n_tokens/dt:.1f} tok/s (decoded {lens})")
log(f"BEST: {n_tokens/best:.1f} tok/s")

"""Warm the persistent compile cache for the full 1.2B finetune train step.

The axon remote compile helper takes ~1h for this program; run this script in
the background early so later real-step verification hits the cache.
Single-chip, real TPU, synthetic batch.
"""
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
from metavoice_tpu.training import finetune as ft

def log(*a):
    print(*a, file=sys.stderr, flush=True)

cfg = first_stage_config()
log(f"devices: {jax.devices()}")
t0 = time.time()
params = tfm.init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
frozen, train_params = ft.split_trainable(params, 1)
ft_cfg = ft.FinetuneConfig(batch_size=2, max_iters=1)
state, opt = ft.init_train_state(train_params, ft_cfg)
step_fn = ft.make_finetune_step(cfg, ft_cfg, opt, frozen)
log(f"init done in {time.time()-t0:.1f}s; compiling train step ...")

rng = np.random.default_rng(0)
S = cfg.block_size
batch = {
    "x": jnp.asarray(rng.integers(0, 2048, (2, S)), jnp.int32),
    "y": jnp.asarray(rng.integers(0, 2048, (2, S)), jnp.int32),
    "spk_emb": jnp.asarray(rng.normal(size=(2, cfg.speaker_emb_dim)), jnp.float32),
}
t0 = time.time()
state, metrics = step_fn(state, batch)
loss = float(np.asarray(metrics["loss"]))
log(f"compile+first step: {time.time()-t0:.1f}s, loss={loss:.4f}")
t0 = time.time()
state, metrics = step_fn(state, batch)
loss = float(np.asarray(metrics["loss"]))
log(f"second step: {time.time()-t0:.2f}s, loss={loss:.4f}")
print("FULL_FINETUNE_COMPILE_OK", loss)

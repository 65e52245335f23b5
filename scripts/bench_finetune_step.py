"""One real-scale finetune step on the chip -> ONE JSON line on stdout.

Measures the reference's unmeasured number: its MFU field is never computed
(fam/llm/finetune.py:228,351-362). Config mirrors the reference finetune
defaults: last-1-block, bf16, batch 2, full 2048 context.

Run standalone or from bench.py (subprocess-isolated: a crashed oversized
compile can wedge the remote compile helper — the parent bench must survive
that).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax

jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/mvtpu_jax"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    from metavoice_tpu.core.config import first_stage_config
    from metavoice_tpu.models import transformer as tfm
    from metavoice_tpu.training import finetune as ft

    cfg = first_stage_config()
    B, T = 2, cfg.block_size
    log(f"devices: {jax.devices()}; init {cfg.n_layer}L/{cfg.dim}d bf16 ...")
    params = tfm.init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
    n_params = sum(x.size for x in jax.tree.leaves(params))

    ft_cfg = ft.FinetuneConfig(batch_size=B, last_n_blocks_to_finetune=1)
    frozen, train_params = ft.split_trainable(params, 1)
    state, opt = ft.init_train_state(train_params, ft_cfg)
    step_fn = ft.make_finetune_step(cfg, ft_cfg, opt, frozen)

    rng = np.random.default_rng(0)
    batch = {
        "x": jnp.asarray(rng.integers(0, cfg.vocab_sizes[0], (B, T)), jnp.int32),
        "y": jnp.asarray(rng.integers(0, cfg.vocab_sizes[0], (B, T)), jnp.int32),
        "spk_emb": jnp.asarray(rng.normal(size=(B, cfg.speaker_emb_dim)), jnp.float32),
    }

    t0 = time.perf_counter()
    state, metrics = step_fn(state, batch)
    loss0 = float(np.asarray(metrics["loss"]))
    log(f"compile+first step: {time.perf_counter()-t0:.1f}s (loss {loss0:.3f})")

    times = []
    for i in range(4):
        t0 = time.perf_counter()
        state, metrics = step_fn(state, batch)
        loss = float(np.asarray(metrics["loss"]))  # forced host transfer
        dt = time.perf_counter() - t0
        times.append(dt)
        log(f"step {i}: {dt:.3f}s (loss {loss:.3f})")
    step_s = min(times)

    # FLOPs: dense fwd 2*N*B*T; activation grads 2*N*B*T; weight grads only
    # for the trainable tail (last block + ln_f) 2*N_tail*B*T; attention
    # (fwd 4*L*B*T^2*d for QK^T+PV, bwd 2x that).
    n_tail = sum(x.size for x in jax.tree.leaves(state.params))
    dense = (4 * n_params + 2 * n_tail) * B * T
    attn = 12 * cfg.n_layer * B * T * T * cfg.dim
    flops = dense + attn
    peak = 197e12  # v5e bf16 peak
    mfu = flops / step_s / peak
    print(json.dumps({
        "finetune_step_s": round(step_s, 3),
        "finetune_mfu": round(mfu, 4),
        "finetune_tflops_per_s": round(flops / step_s / 1e12, 1),
        "finetune_config": f"last-1-block bf16 bs={B} ctx={T}, {n_params/1e9:.2f}B params "
                           f"({n_tail/1e6:.0f}M trainable)",
        "finetune_loss_finite": bool(np.isfinite(loss0)),
    }), flush=True)


if __name__ == "__main__":
    main()

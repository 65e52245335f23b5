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

    def measure_depth(depth):
        """One measured finetune step at this unfreeze depth, or the error."""
        ft_cfg = ft.FinetuneConfig(batch_size=B, last_n_blocks_to_finetune=depth)
        frozen, train_params = ft.split_trainable(params, depth)
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
        log(f"depth {depth}: compile+first step {time.perf_counter()-t0:.1f}s "
            f"(loss {loss0:.3f})")

        times = []
        for i in range(4):
            t0 = time.perf_counter()
            state, metrics = step_fn(state, batch)
            loss = float(np.asarray(metrics["loss"]))  # forced host transfer
            dt = time.perf_counter() - t0
            times.append(dt)
            log(f"depth {depth} step {i}: {dt:.3f}s (loss {loss:.3f})")
        step_s = min(times)

        # FLOPs: dense fwd 2*N*B*T; activation grads 2*N*B*T; weight grads
        # only for the trainable tail 2*N_tail*B*T; attention (fwd
        # 4*L*B*T^2*d for QK^T+PV, bwd 2x). The per-layer remat in
        # apply_blocks recomputes the forward on the backward pass: count it
        # (+2*N*B*T dense, +4*L*B*T^2*d attention) in the TFLOPs-executed
        # figure but NOT in MFU (model FLOPs utilization is defined on model
        # FLOPs).
        n_tail = sum(x.size for x in jax.tree.leaves(state.params))
        dense = (4 * n_params + 2 * n_tail) * B * T
        attn = 12 * cfg.n_layer * B * T * T * cfg.dim
        flops = dense + attn
        peak = 197e12  # v5e bf16 peak
        # per-depth HBM budget (the arithmetic that bounds the envelope):
        # frozen bf16 params + f32 trainable + 2 f32 Adam moments + f32 grads
        mem_gb = (2 * n_params + 16 * n_tail) / 1e9
        del state, step_fn, frozen, train_params
        return {
            "step_s": round(step_s, 3),
            "mfu": round(flops / step_s / peak, 4),
            "trainable_m": round(n_tail / 1e6, 1),
            "state_gb": round(mem_gb, 1),
            "loss_finite": bool(np.isfinite(loss0)),
        }

    # envelope (VERDICT r4 #6): how deep can the unfreeze go on one 16 GB
    # chip. The reference finetunes last-N on one GPU
    # (fam/llm/finetune.py:236-244); full-model (depth 24 + embeddings
    # frozen) needs 2*1.24 + 16*1.21 = 21.9 GB of parameter/optimizer state
    # alone — over HBM before activations, so depths beyond the largest
    # passing one report the failure instead.
    envelope = {}
    for depth in (1, 4, 8, cfg.n_layer):
        label = f"last{depth}" if depth < cfg.n_layer else "all_blocks"
        try:
            envelope[label] = measure_depth(depth)
        except Exception as e:
            msg = str(e).split("\n")[0][:200]
            log(f"depth {depth} failed: {msg}")
            envelope[label] = {"error": msg}
            break

    head = envelope.get("last1", {})
    n_tail1 = head.get("trainable_m", 0) * 1e6
    print(json.dumps({
        "finetune_step_s": head.get("step_s"),
        "finetune_mfu": head.get("mfu"),
        "finetune_config": f"last-1-block bf16 bs={B} ctx={T}, {n_params/1e9:.2f}B params "
                           f"({n_tail1/1e6:.0f}M trainable)",
        "finetune_loss_finite": head.get("loss_finite"),
        "finetune_envelope": envelope,
    }), flush=True)


if __name__ == "__main__":
    main()

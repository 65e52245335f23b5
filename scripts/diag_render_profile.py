"""Piecewise on-chip timing of the RENDER path (stage 2 + EnCodec vocoder).

The engine profile (diag_phase_profile.py) attributed 43% of serving wall to
tts.vocoder (383 ms per ~300-frame render) and 27% to tts.stage2 (242 ms).
This script breaks both down: rvq embed, conv_in, LSTM scan, each upsample
block, conv_out for the vocoder; forward vs top-k sampling for stage 2 —
each piece jitted separately and timed with a forced host transfer.
"""
import os
import sys
import time
from functools import partial

sys.path.insert(0, "/root/repo")
import jax

jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/mvtpu_jax"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from metavoice_tpu.core.config import second_stage_config
from metavoice_tpu.models import encodec as ec
from metavoice_tpu.models import second_stage as ss
from metavoice_tpu.models import transformer as tfm


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def timeit(name, fn, *args, runs=5):
    fn(*args)  # compile
    best = 1e9
    for _ in range(runs):
        t0 = time.perf_counter()
        out = fn(*args)
        np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
        np.asarray(jax.tree.leaves(out)[0])  # full fetch like production
        best = min(best, time.perf_counter() - t0)
    log(f"{name:<28} {best*1000:8.2f} ms")
    return best


def timeit_light(name, fn, *args, runs=5):
    """Same but with a 1-element sync (isolates compute from transfer)."""
    fn(*args)
    best = 1e9
    for _ in range(runs):
        t0 = time.perf_counter()
        out = fn(*args)
        np.asarray(jax.tree.leaves(out)[0].ravel()[:1])
        best = min(best, time.perf_counter() - t0)
    log(f"{name:<28} {best*1000:8.2f} ms   (1-elem sync)")
    return best


def main():
    log(f"devices: {jax.devices()}")
    ecfg = ec.EncodecConfig()
    eparams = ec.init_params(jax.random.PRNGKey(3), ecfg)
    T = 300  # the bench render bucket (256 frames -> 300)
    codes = jnp.asarray(np.random.default_rng(0).integers(0, 1024, (8, T)), jnp.int32)

    log("=== vocoder (EnCodec decode, T=300 frames -> 96000 samples) ===")
    timeit("decode_codes (full)", jax.jit(partial(ec.decode_codes, eparams, ecfg)), codes)

    latent = ec.rvq_decode(eparams["codebooks"], codes[None])
    timeit_light("rvq_decode", jax.jit(partial(ec.rvq_decode, eparams["codebooks"])), codes[None])

    dec = eparams["decoder"]

    @jax.jit
    def conv_in(lat):
        return ec._conv1d(lat, dec["conv_in_w"], dec.get("conv_in_b"), causal=ecfg.causal)

    x0 = conv_in(latent)
    timeit_light("conv_in (300x128->512)", conv_in, latent)

    @jax.jit
    def lstm(x):
        return ec._lstm_stack(x, dec["lstm"])

    x1 = lstm(x0)
    timeit_light("lstm 2x300 steps @512", lstm, x0)

    x = x1
    for i in range(len(ecfg.ratios)):
        blk = dec["blocks"][i]

        @jax.jit
        def upblk(x, blk=blk, i=i):
            y = ec._conv_transpose1d(x, blk["convtr_w"], blk.get("convtr_b"), ecfg.ratios[i], ecfg.causal)
            return ec._residual_unit(jax.nn.elu(y), blk["res"], ecfg)

        nxt = upblk(x)
        timeit_light(f"up block {i} (r={ecfg.ratios[i]}, T={x.shape[1]}->{nxt.shape[1]})", upblk, x)
        x = nxt

    @jax.jit
    def conv_out(x):
        return ec._conv1d(jax.nn.elu(x), dec["conv_out_w"], dec.get("conv_out_b"), causal=ecfg.causal)

    timeit_light(f"conv_out (T={x.shape[1]})", conv_out, x)

    log("=== stage 2 (non-causal, ctx 1024, 4L/512d) ===")
    cfg2 = second_stage_config()
    params2 = tfm.init_params(jax.random.PRNGKey(2), cfg2, dtype=jnp.bfloat16)
    idx = jnp.asarray(np.random.default_rng(1).integers(0, 1024, (1, 2, cfg2.block_size)), jnp.int32)
    spk = jax.random.normal(jax.random.PRNGKey(4), (1, cfg2.speaker_emb_dim))
    key = jax.random.PRNGKey(5)
    t1 = jnp.asarray(1.0, jnp.float32)

    @jax.jit
    def fwd_only(idx, spk):
        logits_list, _ = tfm.forward(params2, cfg2, idx, spk_emb=spk, compute_dtype=jnp.bfloat16)
        return jnp.stack(logits_list, axis=1)

    logits = fwd_only(idx, spk)
    timeit_light("stage2 forward only", fwd_only, idx, spk)

    from metavoice_tpu.core import sampling as S

    @jax.jit
    def sample_only(logits, key):
        return S.sample_from_logits(key, logits, temperature=t1, top_k=200)

    timeit_light("stage2 top-k sample only", sample_only, logits, key)

    timeit(
        "non_causal_sample (full)",
        lambda: ss.non_causal_sample(params2, cfg2, idx, spk, key, t1, top_k=200),
    )


if __name__ == "__main__":
    main()

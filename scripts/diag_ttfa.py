"""TTFA breakdown: time each phase of the streaming first segment.

Replicates what TTS.synthesise_streaming does up to the first yielded
waveform, at real model scale (int4 serving config, random weights), with
per-phase host syncs so each duration is attributable.
"""
import os, sys, time
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/mvtpu_jax"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np
from metavoice_tpu.core import tokens as T
from metavoice_tpu.core.config import first_stage_config, second_stage_config
from metavoice_tpu.models import encodec as ecm
from metavoice_tpu.models import first_stage as fs
from metavoice_tpu.models import second_stage as ss
from metavoice_tpu.models import transformer as tfm
from metavoice_tpu.ops import quantized as qz
from metavoice_tpu.tokenizer import TrainedBPETokeniser

def log(*a): print(*a, file=sys.stderr, flush=True)

cfg = first_stage_config()
cfg2 = second_stage_config()
ecfg = ecm.EncodecConfig()
key = jax.random.PRNGKey(0)
params = qz.quantize_params_int4_i32(tfm.init_params(key, cfg, dtype=jnp.bfloat16))
params2 = tfm.init_params(jax.random.PRNGKey(2), cfg2, dtype=jnp.bfloat16)
eparams = ecm.init_params(jax.random.PRNGKey(3), ecfg)
tok = TrainedBPETokeniser()
text = "The quick brown fox jumps over the lazy dog while the band plays on."
prompt = tok.encode(text)
spk = jax.random.normal(key, (1, cfg.speaker_emb_dim), jnp.bfloat16)
t1 = jnp.asarray(1.0, jnp.float32); tp = jnp.asarray(0.95, jnp.float32); g = jnp.asarray(3.0, jnp.float32)
FIRST_SEG = 40

padded, t_true = fs.pad_to_bucket(prompt, 128, max_len=cfg.block_size)
log(f"prompt {len(prompt)} tokens -> bucket {len(padded)}")

def one_pass(label):
    kv = tfm.KVCache.create(cfg, 2, cfg.block_size, dtype=jnp.bfloat16)
    t0 = time.perf_counter()
    cur, kv = fs.prefill(
        params, cfg, jnp.asarray(padded)[None, :], jnp.asarray(t_true, jnp.int32),
        spk, kv, jax.random.PRNGKey(1), t1, tp, g)
    first_tok = int(np.asarray(cur)[0])
    t_prefill = time.perf_counter() - t0

    t0 = time.perf_counter()
    buf, lens, kv = fs.decode(
        params, cfg, cur, jnp.asarray(t_true, jnp.int32), spk, kv,
        jax.random.PRNGKey(2), t1, tp, g,
        jnp.asarray(FIRST_SEG - 1, jnp.int32), cfg.block_size, 10**6, jnp.bfloat16)
    toks = np.asarray(buf)[0, : FIRST_SEG - 1]
    t_decode = time.perf_counter() - t0

    stream = np.concatenate([[first_tok], toks]).astype(np.int32)
    t0 = time.perf_counter()
    _txt, coarse = T.split_flattened_interleaved(stream, T.HIERARCHY_EOA)
    full_codes = ss.complete_hierarchies(
        params2, cfg2, prompt, coarse, spk, key=jax.random.PRNGKey(3),
        temperature=1.0, top_k=200, compute_dtype=jnp.bfloat16)
    full_codes = np.asarray(full_codes)
    t_stage2 = time.perf_counter() - t0

    t0 = time.perf_counter()
    t_audio = full_codes.shape[1]
    bucket = max(75, -(-t_audio // 75) * 75)
    if bucket != t_audio:
        full_codes = np.pad(full_codes, ((0, 0), (0, bucket - t_audio)))
    wav = np.asarray(ecm.decode_codes(eparams, ecfg, jnp.asarray(full_codes)))
    t_voc = time.perf_counter() - t0

    t0 = time.perf_counter()
    from metavoice_tpu.models.enhancer import get_enhancer
    enh = get_enhancer("spectral_gate")
    wav_e = enh(wav.reshape(-1), ecfg.sample_rate)
    t_enh = time.perf_counter() - t0

    total = t_prefill + t_decode + t_stage2 + t_voc + t_enh
    log(f"[{label}] prefill {t_prefill*1e3:.0f} ms | decode39 {t_decode*1e3:.0f} ms | "
        f"stage2 {t_stage2*1e3:.0f} ms ({t_audio} frames) | vocoder {t_voc*1e3:.0f} ms "
        f"(bucket {bucket}) | enhancer {t_enh*1e3:.0f} ms | TOTAL {total*1e3:.0f} ms")

one_pass("cold")
for i in range(3):
    one_pass(f"warm{i}")

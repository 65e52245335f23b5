"""Streaming TTFA through the real public path after the 25-frame vocoder
bucket change (compare bench's ttfa_s)."""
import os, sys, time
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/mvtpu_jax"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np
from metavoice_tpu.core.config import first_stage_config, second_stage_config
from metavoice_tpu.models import encodec as ecm
from metavoice_tpu.models import speaker_encoder as sem
from metavoice_tpu.models import transformer as tfm
from metavoice_tpu.models.enhancer import get_enhancer
from metavoice_tpu.ops import quantized as qz
from metavoice_tpu.runtime.tts import TTS, TTSComponents
from metavoice_tpu.tokenizer import TrainedBPETokeniser
from metavoice_tpu.utils import audio_io as aio

def log(*a): print(*a, file=sys.stderr, flush=True)

cfg = first_stage_config()
cfg2 = second_stage_config()
ecfg = ecm.EncodecConfig()
key = jax.random.PRNGKey(0)
params = qz.quantize_params_int4_i32(tfm.init_params(key, cfg, dtype=jnp.bfloat16))
comps = TTSComponents(
    first_stage_params=params,
    first_stage_cfg=cfg,
    second_stage_params=tfm.init_params(jax.random.PRNGKey(2), cfg2, dtype=jnp.bfloat16),
    second_stage_cfg=cfg2,
    spk_params=sem.init_params(jax.random.PRNGKey(5)),
    encodec_params=ecm.init_params(jax.random.PRNGKey(3), ecfg),
    encodec_cfg=ecfg,
    tokenizer=TrainedBPETokeniser(),
    enhancer=get_enhancer("spectral_gate"),
)
tts = TTS(comps, output_dir="/tmp/mvtpu_ttfa", enforce_min_ref_duration=False)
ref = "/tmp/mvtpu_ttfa_ref.wav"
sr = 16000
t = np.arange(31 * sr) / sr
aio.write_wav(ref, (0.2 * np.sin(2 * np.pi * 220 * t)).astype(np.float32), sr)
text = "The quick brown fox jumps over the lazy dog while the band plays on."

t0 = time.perf_counter()
for _ in tts.synthesise_streaming(text, ref):
    pass
log(f"warmup pass: {time.perf_counter()-t0:.1f}s")

ttfas = []
for i in range(7):
    t0 = time.perf_counter()
    gen = tts.synthesise_streaming(text, ref)
    seg = next(gen)
    np.asarray(seg)
    dt = time.perf_counter() - t0
    gen.close()
    ttfas.append(dt)
    log(f"TTFA run {i}: {dt*1000:.0f} ms ({len(seg)} samples)")
log(f"TTFA p50: {float(np.median(ttfas))*1000:.0f} ms")

"""Per-phase wall-clock profile of the ORCHESTRATION layer on the real chip.

Round-3 verdict: the engine delivers ~317 effective agg tok/s where raw
batch-8 decode does ~2889, and chunked long-text synthesis runs at
token-norm RTF ~1.0 vs 0.32 single-chunk — without any attribution of where
the time goes. This script produces that attribution using
metavoice_tpu/utils/phases.py timers wired through runtime/tts.py,
runtime/engine.py and models/first_stage.generate.

Usage:  python scripts/diag_phase_profile.py [chunked] [engine]
(no args = both). Uses the cached int4 params at /tmp/mv_int4_params.npz
(writes it on first run: ~4 min on-chip init+quantize).
"""
import os
import sys
import time

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
from metavoice_tpu.utils import phases

CACHE = "/tmp/mv_int4_params.npz"


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def load_or_make_params(cfg):
    import ml_dtypes

    if os.path.exists(CACHE):
        log("loading cached packed params ...")
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
        return params
    log("init + quantize int4 (cold, ~4 min on chip) ...")
    params = qz.quantize_params_int4_i32(
        tfm.init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
    )
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
    return params


def build_tts():
    cfg = first_stage_config()
    params = load_or_make_params(cfg)
    cfg2 = second_stage_config()
    comps = TTSComponents(
        first_stage_params=params,
        first_stage_cfg=cfg,
        second_stage_params=tfm.init_params(jax.random.PRNGKey(2), cfg2, dtype=jnp.bfloat16),
        second_stage_cfg=cfg2,
        spk_params=sem.init_params(jax.random.PRNGKey(5)),
        encodec_params=ecm.init_params(jax.random.PRNGKey(3), ecm.EncodecConfig()),
        encodec_cfg=ecm.EncodecConfig(),
        tokenizer=TrainedBPETokeniser(),
        enhancer=get_enhancer("spectral_gate"),
    )
    kv = os.environ.get("MVTPU_PROFILE_KV") or None  # e.g. int8_packed
    tts = TTS(
        comps, output_dir="/tmp/mvtpu_profile",
        enforce_min_ref_duration=False, enforce_min_output_duration=False,
        kv_cache_dtype=kv,
    )
    if kv:
        log(f"kv_cache_dtype={kv}")
    return tts


def make_ref(path="/tmp/mvtpu_profile_ref.wav"):
    sr = 16000
    tt = np.arange(31 * sr) / sr
    aio.write_wav(path, (0.2 * np.sin(2 * np.pi * 220 * tt)).astype(np.float32), sr)
    return path


LONG_TEXT = (
    "The quick brown fox jumps over the lazy dog while the band plays on. "
    "Meanwhile the river keeps moving under the old stone bridge, carrying "
    "leaves and late afternoon light toward the quiet harbor. "
    "Every sentence in this paragraph becomes its own synthesis chunk, "
    "so the chunked pipeline and the concatenation path are measured end to end."
)
TEXT = "The quick brown fox jumps over the lazy dog while the band plays on."


def profile_chunked(tts, ref):
    log("=== chunked synthesise profile ===")
    t0 = time.perf_counter()
    tts.warmup()
    log(f"warmup: {time.perf_counter()-t0:.1f}s")
    # cold-ish first call (compiles any leftover buckets)
    t0 = time.perf_counter()
    tts.synthesise(LONG_TEXT, ref, max_new_tokens=256)
    log(f"chunked call 1 (post-warmup): {time.perf_counter()-t0:.2f}s")
    for i in range(2):
        phases.reset()
        phases.enable()
        t0 = time.perf_counter()
        tts.synthesise(LONG_TEXT, ref, max_new_tokens=256)
        wall = time.perf_counter() - t0
        phases.enable(False)
        log(f"--- chunked run {i} ({wall:.2f}s wall) ---")
        log(phases.format_report(wall))


def profile_engine(tts, ref):
    from metavoice_tpu.runtime.engine import ContinuousBatchingEngine

    log("=== engine Poisson profile ===")
    eng = ContinuousBatchingEngine(tts, slots=8, segment_tokens=64)
    req_tokens = 512
    t0 = time.perf_counter()
    eng.warmup()
    log(f"engine warmup: {time.perf_counter()-t0:.1f}s")

    for k in eng.stats:
        eng.stats[k] = 0
    phases.reset()
    phases.enable()
    rng_l = np.random.default_rng(0)
    n_req = 12
    futs, submit_t, lats, paths = [], [], [], []
    t_start = time.perf_counter()
    for i in range(n_req):
        futs.append(eng.submit(TEXT, ref, max_new_tokens=req_tokens))
        submit_t.append(time.perf_counter())
        time.sleep(float(rng_l.exponential(0.25)))
    for f, ts in zip(futs, submit_t):
        try:
            paths.append(f.result(timeout=1200))
            lats.append(time.perf_counter() - ts)
        except RuntimeError as e:
            # random weights can sample end-of-audio as the very first
            # token -> legitimately empty request; keep profiling
            log(f"request failed (degenerate random-weight output): {e}")
    wall = time.perf_counter() - t_start
    phases.enable(False)
    audio = sum(aio.duration_s(p) for p in paths)
    toks = n_req * req_tokens
    occ = eng.stats["row_tokens"] / max(
        eng.stats["segments"] * eng.n_slots * eng.segment_tokens, 1
    )
    log(
        f"--- engine run: {toks} tokens in {wall:.2f}s wall -> "
        f"{toks/wall:.0f} effective agg tok/s; p50 {np.percentile(lats,50):.2f}s "
        f"p95 {np.percentile(lats,95):.2f}s; serving RTF {wall/max(audio,1e-6):.3f} ---"
    )
    log(f"engine stats: {eng.stats}  (slot occupancy {occ:.2f})")
    log(phases.format_report(wall))
    eng.shutdown()


def main():
    which = set(sys.argv[1:]) or {"chunked", "engine"}
    log(f"devices: {jax.devices()}")
    tts = build_tts()
    ref = make_ref()
    if "chunked" in which:
        profile_chunked(tts, ref)
    if "engine" in which:
        profile_engine(tts, ref)


if __name__ == "__main__":
    main()

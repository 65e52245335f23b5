"""Serving-scenario bench child: chunked long-text RTF + engine mixed Poisson.

bench.py runs these two scenarios in THIS dedicated subprocess because a
long-lived dispatch-heavy process measurably degrades on the tunneled
backend: the identical engine workload measured 316 effective agg tok/s /
p50 16.5 s at the END of a ~25-minute bench process vs 631 / 4.25 s in a
fresh process minutes later (round-4 session measurements; the chunked
metric inflated 1.07 s -> 1.69 s the same way). A production server IS a
fresh process that only serves, so the isolated measurement is also the
honest one. The before/after RTT probes quantify process health in every
run so a degraded measurement is visible in the log rather than silently
recorded.

Methodology (texts, seeds, buckets, stream fraction, rebase margin) is
identical to the round-3 in-process sections so numbers stay comparable
round over round. Emits ONE JSON line on stdout; bench.py merges it.

Usage: python scripts/bench_serving.py <first_stage_int4.npz>
"""
import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/mvtpu_jax"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np


def log(*args):
    print(*args, file=sys.stderr, flush=True)


def rtt_probe_ms(n=10):
    """Median dispatch-with-fetch round trip for a tiny jitted op."""
    x = jnp.ones((8, 128), jnp.float32)
    f = jax.jit(lambda a: a + 1.0)
    np.asarray(f(x))  # compile outside the timed loop
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        np.asarray(f(x))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts) * 1000.0)


def main():
    from metavoice_tpu.core.config import first_stage_config, second_stage_config
    from metavoice_tpu.models import encodec as ecm
    from metavoice_tpu.models import speaker_encoder as sem
    from metavoice_tpu.models import transformer as tfm
    from metavoice_tpu.models.enhancer import get_enhancer
    from metavoice_tpu.runtime.tts import TTS, TTSComponents
    from metavoice_tpu.tokenizer import TrainedBPETokeniser
    from metavoice_tpu.utils import audio_io as aio
    from metavoice_tpu.utils import checkpoint as ck

    params_path = sys.argv[1]
    cfg = first_stage_config()
    log(f"devices: {jax.devices()}; loading int4 params from {params_path} ...")
    t0 = time.perf_counter()
    params, _meta = ck.load_npz(params_path)
    params = jax.tree.map(jnp.asarray, params)
    jax.tree.map(lambda x: x.block_until_ready(), params)
    log(f"params loaded+resident in {time.perf_counter()-t0:.1f}s")

    # identical component seeds to bench.py's in-process TTS
    cfg2 = second_stage_config()
    params2 = tfm.init_params(jax.random.PRNGKey(2), cfg2, dtype=jnp.bfloat16)
    ecfg = ecm.EncodecConfig()
    eparams = ecm.init_params(jax.random.PRNGKey(3), ecfg)
    comps = TTSComponents(
        first_stage_params=params,
        first_stage_cfg=cfg,
        second_stage_params=params2,
        second_stage_cfg=cfg2,
        spk_params=sem.init_params(jax.random.PRNGKey(5)),
        encodec_params=eparams,
        encodec_cfg=ecfg,
        tokenizer=TrainedBPETokeniser(),
        enhancer=get_enhancer("spectral_gate"),
    )
    tts = TTS(comps, output_dir="/tmp/mvtpu_bench", enforce_min_ref_duration=False)

    ref_path = "/tmp/mvtpu_bench_ref.wav"
    sr = 16000
    tt = np.arange(31 * sr) / sr
    aio.write_wav(ref_path, (0.2 * np.sin(2 * np.pi * 220 * tt)).astype(np.float32), sr)
    text = "The quick brown fox jumps over the lazy dog while the band plays on."

    rtt0 = rtt_probe_ms()
    log(f"RTT probe (start): {rtt0:.1f} ms")
    out = {}
    # Host CPU contention invalidates the engine latency numbers: a full
    # pytest suite running concurrently inflated mixed-Poisson p50 from
    # 6.9 s to 16.5 s with IDENTICAL engine stats (round 4). Record the
    # 1-minute load average so a polluted run is self-identifying.
    load1 = os.getloadavg()[0]
    ncpu = os.cpu_count() or 1
    out["host_load_per_cpu"] = round(load1 / ncpu, 2)
    # threshold ncpu + 0.5: our own startup accounts for up to ~1 core of
    # the 1-minute average; anything beyond that is a competing process
    if load1 > ncpu + 0.5:
        log(
            f"WARNING: host load {load1:.1f} on {ncpu} CPUs — engine "
            "latency numbers below are unreliable under contention"
        )

    # ---- long-text chunked RTF (BASELINE config 2): multi-chunk synthesise
    try:
        long_text = (
            "The quick brown fox jumps over the lazy dog while the band plays on. "
            "Meanwhile the river keeps moving under the old stone bridge, carrying "
            "leaves and late afternoon light toward the quiet harbor. "
            "Every sentence in this paragraph becomes its own synthesis chunk, "
            "so the chunked pipeline and the concatenation path are measured end to end."
        )
        # first call compiles any unseen vocoder/prompt buckets; the metric
        # is the steady-state second call (serving == warm process). Cap the
        # per-chunk budget at 256 tokens: random weights rarely sample
        # end-of-audio, so an uncapped chunk decodes to the ~1920-token
        # block limit while the second stage truncates the audio — the
        # wall/audio ratio then measures the truncation, not the pipeline.
        tts.synthesise(long_text, ref_path, max_new_tokens=256)
        t0 = time.perf_counter()
        out_path = tts.synthesise(long_text, ref_path, max_new_tokens=256)
        wall = time.perf_counter() - t0
        dur = aio.duration_s(out_path)
        # chunk count mirrors the synthesise call exactly (normalize + the
        # runtime's MAX_CHARS_PER_CHUNK) so the two cannot silently diverge
        from metavoice_tpu.core.text import chunk_text as _ct
        from metavoice_tpu.core.text import normalize_text as _nt
        from metavoice_tpu.runtime.tts import MAX_CHARS_PER_CHUNK as _mc

        chunked_n = len(_ct(_nt(long_text), _mc) or [""])
        out["chunked_rtf"] = round(wall / max(dur, 1e-6), 3)
        out["chunked_wall_s"] = round(wall, 2)
        out["chunked_rtf_token_norm"] = round(wall / (chunked_n * 256 / 150.0), 3)
        out["chunked_n"] = chunked_n
        log(
            f"chunked long-text (warm, {chunked_n} chunks x 256 tok): "
            f"{wall:.2f}s wall for {dur:.2f}s audio -> raw RTF "
            f"{out['chunked_rtf']:.3f}, token-normalized RTF "
            f"{out['chunked_rtf_token_norm']:.3f}"
        )
    except Exception as e:
        log(f"chunked RTF measurement skipped: {e}")

    # ---- continuous-batching serving latency under MIXED Poisson arrivals
    # (BASELINE config 5): two prompt buckets, 25% streaming, rebase-forcing
    # margin. Latency = submit -> wav written (streams: final segment;
    # streams additionally report time-to-first-audio under load).
    long_prompt_text = (
        "This request carries a deliberately long prompt so that it "
        "lands in the two-hundred-and-fifty-six token prompt bucket "
        "instead of the short one. " * 4
    )

    def _consume_stream(handle, sink):
        n = 0
        for _seg in handle:
            if n == 0:
                # time-to-first-audio while riding the busy batch — the
                # number a real stream=true user feels (VERDICT r4 #4);
                # solo TTFA hides the queueing + segment scheduling
                sink["first_t"] = time.perf_counter()
            n += 1
        sink["done_t"] = time.perf_counter()
        sink["segments"] = n

    def run_engine_scenario(eng_tts, slots, n_req, mean_gap, prefix=""):
        """One mixed-Poisson scenario; returns {prefix+metric: value}."""
        from metavoice_tpu.runtime.engine import ContinuousBatchingEngine

        res = {}
        eng = ContinuousBatchingEngine(
            eng_tts, slots=slots, segment_tokens=64, rebase_margin=1024
        )
        req_tokens = 512  # ~3.4 s of audio per request
        t0 = time.perf_counter()
        eng.warmup()
        warmup_s = time.perf_counter() - t0
        res[prefix + "engine_warmup_s"] = round(warmup_s, 1)
        log(f"{prefix or 'engine '}warmup: {warmup_s:.1f}s ({slots} slots, "
            f"cache {eng_tts._cache_dtype or 'bf16'})")
        for k in eng.stats:
            eng.stats[k] = 0

        from metavoice_tpu.utils import phases

        if os.environ.get("MVTPU_PHASE_TIMERS"):
            phases.reset()
            phases.enable()
        rng_l = np.random.default_rng(0)
        futs, submit_t, stream_outs = [], [], []
        t_start = time.perf_counter()
        # bisect knobs (diagnosis only; the recorded metric uses neither)
        no_long = bool(os.environ.get("MVTPU_BENCH_NO_LONGPROMPT"))
        no_streams = bool(os.environ.get("MVTPU_BENCH_NO_STREAMS"))
        for i in range(n_req):
            txt = long_prompt_text if (i % 3 == 2 and not no_long) else text
            if i % 4 == 3 and not no_streams:  # 25% streaming
                h = eng.submit(txt, ref_path, stream=True, max_new_tokens=req_tokens)
                sink = {}
                th = threading.Thread(target=_consume_stream, args=(h, sink))
                th.start()
                stream_outs.append((sink, th, time.perf_counter()))
                futs.append(None)
            else:
                futs.append(eng.submit(txt, ref_path, max_new_tokens=req_tokens))
            submit_t.append(time.perf_counter())
            time.sleep(float(rng_l.exponential(mean_gap)))
        lats, paths, ttfas = [], [], []
        for f, ts in zip(futs, submit_t):
            if f is None:
                continue
            try:
                paths.append(f.result(timeout=1200))
                lats.append(time.perf_counter() - ts)
            except Exception as e:
                log(f"engine request failed: {e}")
        for sink, th, ts in stream_outs:
            th.join(timeout=1200)
            if "done_t" in sink:
                lats.append(sink["done_t"] - ts)
            if "first_t" in sink:
                ttfas.append(sink["first_t"] - ts)
        if lats:
            wall_all = time.perf_counter() - t_start
            audio_all = sum(aio.duration_s(p) for p in paths)
            occupancy = eng.stats["row_tokens"] / max(
                eng.stats["segments"] * eng.n_slots * eng.segment_tokens, 1
            )
            res[prefix + "engine_poisson_p50_s"] = round(
                float(np.percentile(lats, 50)), 2
            )
            res[prefix + "engine_poisson_p95_s"] = round(
                float(np.percentile(lats, 95)), 2
            )
            res[prefix + "engine_aggregate_serving_rtf"] = round(
                wall_all / max(audio_all, 1e-6), 3
            )
            res[prefix + "engine_effective_agg_tok_s"] = round(
                eng.stats["row_tokens"] / wall_all, 1
            )
            res[prefix + "engine_stats"] = dict(
                eng.stats, occupancy=round(occupancy, 3)
            )
            if ttfas:
                # stream TTFA under load (VERDICT r4 #4): p50 + worst over
                # the streaming quartile of the mixed workload
                res[prefix + "stream_ttfa_p50_s"] = round(
                    float(np.percentile(ttfas, 50)), 2
                )
                res[prefix + "stream_ttfa_max_s"] = round(float(max(ttfas)), 2)
            log(
                f"{prefix or 'engine '}mixed Poisson({n_req} req x {req_tokens} "
                f"tok, {slots} slots, 2 prompt buckets, "
                f"{len(stream_outs)} streams, mean gap {mean_gap*1000:.0f} ms): "
                f"p50 {res[prefix + 'engine_poisson_p50_s']}s "
                f"p95 {res[prefix + 'engine_poisson_p95_s']}s, "
                f"{audio_all:.1f}s audio in {wall_all:.1f}s wall -> serving RTF "
                f"{res[prefix + 'engine_aggregate_serving_rtf']}, effective "
                f"{res[prefix + 'engine_effective_agg_tok_s']} agg tok/s "
                f"({len(lats)} ok); stream TTFA "
                f"{res.get(prefix + 'stream_ttfa_p50_s')}s; "
                f"stats {res[prefix + 'engine_stats']}"
            )
        if os.environ.get("MVTPU_PHASE_TIMERS"):
            phases.enable(False)
            log(phases.format_report(time.perf_counter() - t_start))
        eng.shutdown()
        return res

    try:
        out.update(run_engine_scenario(tts, slots=8, n_req=12, mean_gap=0.25))
    except Exception as e:
        log(f"engine latency measurement skipped: {e}")

    # ---- 16-slot int8-KV capacity mode under the SAME mixed workload
    # (VERDICT r4 #5): the planner's batch-16 choice (bench.py proves its
    # ~3000+ agg tok/s in a pure decode loop) must survive joins/rebases/
    # streams + per-join int8 quantization. Doubled request count + arrival
    # rate so the extra slots actually fill.
    if not os.environ.get("MVTPU_BENCH_NO_ENGINE16"):
        try:
            tts16 = TTS(
                comps, output_dir="/tmp/mvtpu_bench",
                enforce_min_ref_duration=False, kv_cache_dtype="int8",
            )
            out.update(
                run_engine_scenario(
                    tts16, slots=16, n_req=24, mean_gap=0.125, prefix="engine16_"
                )
            )
        except Exception as e:
            log(f"engine16 latency measurement skipped: {e}")

    rtt1 = rtt_probe_ms()
    log(f"RTT probe (end): {rtt1:.1f} ms")
    out["serving_rtt_probe_ms"] = [round(rtt0, 1), round(rtt1, 1)]
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()

"""Benchmark: first-stage decode throughput on the real TPU chip.

Prints ONE JSON line to stdout:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...extras}

Headline metric: steady-state first-stage decode tokens/sec for the full
metavoice-1B configuration (24L/16H/2048d, CFG batch pair), fastest serving
quantisation (int4-i32 packed; int8 also reported),
run as a single XLA while_loop with on-device top-p sampling — the
counterpart of the reference's tokens/sec print at
fam/llm/fast_inference_utils.py:437-443.

Baseline derivation: the north star is RTF < 0.5 at batch 1 on one v5e chip
(BASELINE.json). The first stage emits 2 interleaved tokens per 75 Hz
EnCodec frame => 150 tokens per second of audio, so stage-1 RTF = 150/tps
and the north star needs >= 300 tok/s. vs_baseline = tps / 300 (>1 = better
than the north-star requirement).

All progress goes to stderr; stdout carries exactly the one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax

# persistent compile cache: full-model prefill/decode compiles take minutes
# on this backend; cache them across bench runs
jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/mvtpu_jax"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp


def log(*args):
    print(*args, file=sys.stderr, flush=True)


def _probe_backend(timeout_s: float = 900.0):
    """Fail fast (one JSON error line) if the device backend is unreachable.

    The tunneled backend can die mid-session (see CLAUDE.md tunnel facts:
    the local relay process crashing leaves every JAX init/round-trip
    HANGING, not erroring). Without this guard a dead relay turns the bench
    into an infinite hang and the round records nothing. A tiny matmul
    round-trip takes seconds healthy and <=10-12 min on a degraded tunnel,
    so 15 min separates "slow" from "dead" safely. Runs in a SUBPROCESS so
    a hung probe can be abandoned cleanly (a hung in-process thread cannot
    be cancelled and crashes interpreter teardown)."""
    import subprocess

    code = (
        "import jax, jax.numpy as jnp, numpy as np;"
        "x = jnp.ones((128, 128), jnp.bfloat16);"
        "np.asarray(jax.jit(lambda a: a @ a)(x));"
        "print('probe-ok')"
    )
    reason = None
    try:
        r = subprocess.run(
            [sys.executable, "-c", code], capture_output=True, text=True,
            timeout=timeout_s,
        )
        if r.returncode != 0 or "probe-ok" not in r.stdout:
            tail = (r.stderr or r.stdout).strip().splitlines()
            reason = f"probe rc={r.returncode}: {tail[-1] if tail else ''}"
    except subprocess.TimeoutExpired:
        reason = f"no response in {timeout_s:.0f}s"
    if reason is not None:
        print(json.dumps({
            "metric": "first_stage_decode_tokens_per_sec",  # == success path
            "value": 0.0,
            "unit": "tokens/s",
            "vs_baseline": 0.0,
            "error": f"device backend unreachable: {reason}",
        }), flush=True)
        os._exit(1)


def main():
    import numpy as np

    _probe_backend()

    from metavoice_tpu.core.config import first_stage_config
    from metavoice_tpu.models import first_stage as fs
    from metavoice_tpu.models import transformer as tfm

    cfg = first_stage_config()
    log(f"devices: {jax.devices()}")
    log(f"building metavoice-1B ({cfg.n_layer}L/{cfg.n_head}H/{cfg.dim}d) bf16 ...")

    from metavoice_tpu.ops import quantized as qz

    key = jax.random.PRNGKey(0)
    params_bf16 = tfm.init_params(key, cfg, dtype=jnp.bfloat16)
    n_params = sum(x.size for x in jax.tree.leaves(params_bf16))

    prompt_len = 64
    prompt = jax.random.randint(key, (1, 128), 2049, cfg.vocab_size)
    spk = jax.random.normal(key, (1, cfg.speaker_emb_dim), jnp.bfloat16)
    temperature = jnp.asarray(1.0, jnp.float32)
    top_p = jnp.asarray(0.95, jnp.float32)
    guidance = jnp.asarray(3.0, jnp.float32)

    n_tokens = 256
    never_eoa = 10**6  # disable early stop so every run decodes n_tokens

    def measure_decode(qparams, label, runs=5):
        """Prefill + ``runs`` timed 256-token decodes; returns best tok/s.

        Identical invocations spread ~5% on the tunneled backend (host/
        tunnel noise, not program variance — scripts/diag_e2e_decode.py
        shows the same spread), so the headline config takes more draws."""
        kv = tfm.KVCache.create(cfg, 2, cfg.block_size, dtype=jnp.bfloat16)
        t0 = time.perf_counter()
        first_token, kv = fs.prefill(
            qparams, cfg, prompt, jnp.asarray(prompt_len, jnp.int32), spk, kv,
            key, temperature, top_p, guidance,
        )
        np.asarray(first_token)
        log(f"[{label}] prefill compile+run: {time.perf_counter()-t0:.1f}s")

        def run():
            buf, lens, _ = fs.decode(
                qparams, cfg, first_token, jnp.asarray(prompt_len, jnp.int32), spk,
                kv, jax.random.PRNGKey(1), temperature, top_p, guidance,
                jnp.asarray(n_tokens, jnp.int32), cfg.block_size, never_eoa,
                jnp.bfloat16,
            )
            # NOTE: force a host transfer — on the experimental axon backend
            # block_until_ready returns before execution completes.
            return buf, np.asarray(lens)

        t0 = time.perf_counter()
        run()
        log(f"[{label}] decode compile+first run: {time.perf_counter()-t0:.1f}s")
        times = []
        for i in range(runs):
            t0 = time.perf_counter()
            buf, lens = run()
            dt = time.perf_counter() - t0
            times.append(dt)
            log(f"[{label}] run {i}: {dt:.3f}s -> {n_tokens/dt:.1f} tok/s (decoded {lens})")
        return n_tokens / min(times)

    # int8 weight-only: the quality serving configuration. Packed four
    # biased bytes per i32 word (quantize_params_int8_i32) so the weight
    # stream reads at the ~490 GB/s wide-dtype ceiling instead of the
    # ~390 GB/s 1-byte ceiling that caps plain int8 at ~305 tok/s.
    params_i8 = qz.quantize_params_int8_i32(params_bf16)
    i8_bytes = sum(x.size * x.dtype.itemsize for x in jax.tree.leaves(params_i8))
    log(f"params: {n_params/1e9:.3f}B ({i8_bytes/1e9:.2f} GB packed int8)")
    tps_int8 = measure_decode(params_i8, "int8-packed")
    del params_i8

    # int4-in-int32 packed: the FAST serving configuration (reference's own
    # claimed 2x lever, README.md:92; here it holds quality-bearing sampling
    # semantics while reading 4-bit weights through the decode megakernels)
    params = qz.quantize_params_int4_i32(params_bf16)
    param_bytes = sum(x.size * x.dtype.itemsize for x in jax.tree.leaves(params))
    log(f"int4-i32 packed params: {param_bytes/1e9:.2f} GB")

    # GQA variant derived from the same weights (keep 2 of 16 KV heads):
    # byte REDUCTION is the only lever left at the batch-8 HBM roof
    # (docs/PERFORMANCE.md), and the reference model is explicitly
    # GQA-capable (fam/llm/fast_model.py:208-221). Sliced out of the MHA
    # [q|k|v] column blocks so no second 1.24B init is paid.
    params_gqa = None
    cfg_gqa = None
    try:
        h_kv = 2
        cfg_gqa = first_stage_config(n_local_heads=h_kv)
        dh, nh = cfg.head_dim, cfg.n_head
        lay = dict(params_bf16["layers"])
        w = lay["wqkv"]
        lay["wqkv"] = jnp.concatenate(
            [
                w[..., : nh * dh],
                w[..., nh * dh : (nh + h_kv) * dh],
                w[..., 2 * nh * dh : (2 * nh + h_kv) * dh],
            ],
            axis=-1,
        )
        gq = dict(params_bf16)
        gq["layers"] = lay
        params_gqa = qz.quantize_params_int4_i32(gq)
        del gq, lay, w
    except Exception as e:
        log(f"GQA derivation skipped: {e}")
    del params_bf16
    tps = measure_decode(params, "int4", runs=8)
    headline_config = (
        "metavoice-1B 24L/16H/2048d, int4-i32 packed weights through fused "
        "decode megakernels (attention block + FFN), CFG pair, block 2048"
    )
    if tps < tps_int8:  # headline = fastest serving config
        log("int4 slower than int8 on this run; reporting int8 as headline")
        tps = tps_int8
        params = qz.quantize_params_int8(tfm.init_params(key, cfg, dtype=jnp.bfloat16))
        param_bytes = sum(
            x.size * x.dtype.itemsize for x in jax.tree.leaves(params)
        )
        headline_config = (
            "metavoice-1B 24L/16H/2048d, int8 weight-only fused megakernels, "
            "CFG pair, block 2048"
        )

    stage1_rtf = 150.0 / tps
    bandwidth_gbs = param_bytes * tps / 1e9

    # ---- full-pipeline RTF: stage 2 + EnCodec decode at real scale -------------
    from metavoice_tpu.core.config import second_stage_config
    from metavoice_tpu.models import encodec as ecm
    from metavoice_tpu.models import second_stage as ss2

    n_frames = n_tokens // 2  # 2 interleaved tokens per EnCodec frame
    audio_s = n_frames / 75.0
    cfg2 = second_stage_config()
    params2 = tfm.init_params(jax.random.PRNGKey(2), cfg2, dtype=jnp.bfloat16)
    ecfg = ecm.EncodecConfig()
    eparams = ecm.init_params(jax.random.PRNGKey(3), ecfg)
    idx2 = jax.random.randint(key, (1, 2, cfg2.block_size), 0, 1024)
    spk2 = jax.random.normal(key, (1, cfg2.speaker_emb_dim))
    codes = jax.random.randint(key, (8, n_frames), 0, 1024)

    def stage2():
        out = ss2.non_causal_sample(
            params2, cfg2, idx2, spk2, jax.random.PRNGKey(4),
            jnp.asarray(1.0, jnp.float32), top_k=200,
        )
        return np.asarray(out)

    def vocode():
        return np.asarray(ecm.decode_codes(eparams, ecfg, codes))

    stage2()  # compile
    vocode()
    t0 = time.perf_counter(); stage2(); t_stage2 = time.perf_counter() - t0
    t0 = time.perf_counter(); vocode(); t_vocoder = time.perf_counter() - t0
    t_stage1 = n_tokens / tps
    full_time = t_stage1 + t_stage2 + t_vocoder
    full_rtf = full_time / audio_s
    log(
        f"full pipeline for {audio_s:.2f}s audio: stage1 {t_stage1:.3f}s + "
        f"stage2 {t_stage2:.3f}s + vocoder {t_vocoder:.3f}s = {full_time:.3f}s "
        f"(RTF {full_rtf:.3f})"
    )

    # ---- batched serving throughput (BASELINE config 5) ------------------------
    batch_tps = batch8_deep_tps = None
    try:
        import gc

        b = 8
        prompts_b = [
            list(np.random.default_rng(i).integers(2049, cfg.vocab_size, size=40 + 7 * i))
            for i in range(b)
        ]
        spk_b = jax.random.normal(key, (b, cfg.speaker_emb_dim), jnp.bfloat16)
        padded_b, pad_lens = fs.left_pad_prompts(prompts_b, bucket=128)
        kv_b = tfm.KVCache.create(cfg, 2 * b, cfg.block_size, dtype=jnp.bfloat16)
        first_b, kv_b = fs.prefill_batch(
            params, cfg, jnp.asarray(padded_b), jnp.asarray(pad_lens), spk_b, kv_b,
            key, temperature, top_p, guidance,
        )
        pos0 = 128

        def run_b(n, pos, kvb):
            buf, lens, kvb = fs.decode_batch(
                params, cfg, first_b, jnp.asarray(pos, jnp.int32), jnp.asarray(pad_lens),
                spk_b, kvb, jax.random.PRNGKey(9), temperature, top_p, guidance,
                jnp.asarray(n, jnp.int32), cfg.block_size, never_eoa, jnp.bfloat16,
            )
            np.asarray(lens)
            return kvb

        kv_b = run_b(4, pos0, kv_b)  # compile
        t0 = time.perf_counter()
        kv_b = run_b(8, pos0 + 4, kv_b)
        ta = time.perf_counter() - t0
        t0 = time.perf_counter()
        kv_b = run_b(104, pos0 + 12, kv_b)
        tb = time.perf_counter() - t0
        batch_tps = b * 96 / (tb - ta)
        log(f"batch-{b} continuous decode: {batch_tps:.0f} aggregate tok/s")
        # deep-position window (pos 1200+): the attention-DMA-dominated
        # regime real serving runs in (engine requests reach pos ~1300) and
        # where GQA's cache-byte cut pays. Same two-run overhead-cancelling
        # timing; the position jump reuses the compiled program.
        kv_b = run_b(8, 1200, kv_b)
        t0 = time.perf_counter()
        kv_b = run_b(8, 1208, kv_b)
        ta2 = time.perf_counter() - t0
        t0 = time.perf_counter()
        kv_b = run_b(104, 1216, kv_b)
        tb2 = time.perf_counter() - t0
        batch8_deep_tps = b * 96 / (tb2 - ta2)
        log(f"batch-{b} deep decode (pos 1200+): {batch8_deep_tps:.0f} aggregate tok/s")
        del kv_b, first_b
        gc.collect()
    except Exception as e:  # batched path must not break the headline metric
        log(f"batched measurement skipped: {e}")

    # ---- batch-16 capacity (int8 KV cache) -------------------------------------
    # 32 CFG rows only fit one v5e with the quantized cache (the bf16 cache
    # alone is 12.9 GB); this is the serving-capacity lever kv_cache_dtype
    # exists for. See scripts/diag_batch16_capacity.py for the full diag.
    batch16_tps = None
    try:
        import gc

        b16 = 16
        prompts16 = [
            list(np.random.default_rng(i).integers(2049, cfg.vocab_size, size=40 + 3 * i))
            for i in range(b16)
        ]
        spk16 = jax.random.normal(key, (b16, cfg.speaker_emb_dim), jnp.bfloat16)
        padded16, lens16 = fs.left_pad_prompts(prompts16, bucket=128)
        kv16 = tfm.KVCache.create(cfg, 2 * b16, cfg.block_size, dtype=jnp.int8)
        first16, kv16 = fs.prefill_batch(
            params, cfg, jnp.asarray(padded16), jnp.asarray(lens16), spk16, kv16,
            key, temperature, top_p, guidance,
        )

        def run16(n, pos, kvb):
            buf, lens, kvb = fs.decode_batch(
                params, cfg, first16, jnp.asarray(pos, jnp.int32), jnp.asarray(lens16),
                spk16, kvb, jax.random.PRNGKey(7), temperature, top_p, guidance,
                jnp.asarray(n, jnp.int32), cfg.block_size, never_eoa, jnp.bfloat16,
            )
            np.asarray(lens)
            return kvb

        kv16 = run16(4, 128, kv16)  # compile
        t0 = time.perf_counter()
        kv16 = run16(8, 132, kv16)
        ta16 = time.perf_counter() - t0
        t0 = time.perf_counter()
        kv16 = run16(104, 140, kv16)
        tb16 = time.perf_counter() - t0
        batch16_tps = b16 * 96 / (tb16 - ta16)
        log(f"batch-16 decode (int8 KV cache): {batch16_tps:.0f} aggregate tok/s")
        del kv16, first16
        gc.collect()
    except Exception as e:
        log(f"batch-16 measurement skipped: {e}")

    # ---- GQA batch-8 (VERDICT r4 #2): n_local_heads=2 through the fused
    # int4 serving kernels. Cache bytes and attention DMA shrink 8x vs MHA —
    # the only remaining throughput lever at the measured batch-8 HBM roof.
    gqa_tps = gqa_deep_tps = None
    try:
        import gc

        if params_gqa is None:
            raise RuntimeError("GQA params unavailable")
        bg = 8
        prompts_g = [
            list(np.random.default_rng(i).integers(2049, cfg_gqa.vocab_size, size=40 + 7 * i))
            for i in range(bg)
        ]
        spk_g = jax.random.normal(key, (bg, cfg_gqa.speaker_emb_dim), jnp.bfloat16)
        padded_g, pads_g = fs.left_pad_prompts(prompts_g, bucket=128)
        kv_g = tfm.KVCache.create(cfg_gqa, 2 * bg, cfg_gqa.block_size, dtype=jnp.bfloat16)
        first_g, kv_g = fs.prefill_batch(
            params_gqa, cfg_gqa, jnp.asarray(padded_g), jnp.asarray(pads_g), spk_g,
            kv_g, key, temperature, top_p, guidance,
        )

        def run_g(n, pos, kvb):
            buf, lens, kvb = fs.decode_batch(
                params_gqa, cfg_gqa, first_g, jnp.asarray(pos, jnp.int32),
                jnp.asarray(pads_g), spk_g, kvb, jax.random.PRNGKey(9), temperature,
                top_p, guidance, jnp.asarray(n, jnp.int32), cfg_gqa.block_size,
                never_eoa, jnp.bfloat16,
            )
            np.asarray(lens)
            return kvb

        kv_g = run_g(4, 128, kv_g)  # compile
        t0 = time.perf_counter()
        kv_g = run_g(8, 132, kv_g)
        tga = time.perf_counter() - t0
        t0 = time.perf_counter()
        kv_g = run_g(104, 140, kv_g)
        tgb = time.perf_counter() - t0
        gqa_tps = bg * 96 / (tgb - tga)
        log(f"GQA(h_kv=2) batch-8 decode: {gqa_tps:.0f} aggregate tok/s")
        kv_g = run_g(8, 1200, kv_g)
        t0 = time.perf_counter()
        kv_g = run_g(8, 1208, kv_g)
        tga = time.perf_counter() - t0
        t0 = time.perf_counter()
        kv_g = run_g(104, 1216, kv_g)
        tgb = time.perf_counter() - t0
        gqa_deep_tps = bg * 96 / (tgb - tga)
        log(f"GQA(h_kv=2) batch-8 deep decode (pos 1200+): {gqa_deep_tps:.0f} aggregate tok/s")
        del kv_g, first_g, params_gqa
        gc.collect()
    except Exception as e:
        log(f"GQA measurement skipped: {e}")

    # ---- realized speculative decoding (VERDICT r4 #1): single-stream
    # tok/s with the in-repo distilled draft (scripts/distill_draft.py,
    # checkpoints/bench_draft_int4.npz — distilled against THIS bench
    # target's own guidance-merged distribution, so acceptance is real).
    # CFG-free int4 draft + the T=gamma multi-token verify kernel. Beats
    # the reference's one-compiled-step-per-token loop
    # (fam/llm/fast_inference_utils.py:148-174) twice over.
    spec_extras = {}
    try:
        draft_path = os.path.join(
            os.path.dirname(os.path.abspath(__file__)),
            "checkpoints", "bench_draft_int4.npz",
        )
        if not os.path.exists(draft_path):
            raise FileNotFoundError(draft_path)
        from metavoice_tpu.models import spec_decode as sd
        from metavoice_tpu.utils import checkpoint as ckpt

        dp, dcfg, _, dq = ckpt.load_first_stage_npz(draft_path)
        dp = jax.tree.map(
            jnp.asarray, dp, is_leaf=lambda x: not isinstance(x, (dict, list))
        )
        prompt_spec = list(range(2100, 2164))

        def run_base_spec():
            return fs.generate(
                params, cfg, prompt_spec, spk, key=jax.random.PRNGKey(3),
                max_new_tokens=n_tokens, end_of_audio_token=never_eoa,
                temperature=1.0, top_p=0.95, guidance_scale=3.0,
            )

        seq0 = run_base_spec()  # compile (prefill shapes already cached)
        tb_best = None
        for _ in range(3):
            t0 = time.perf_counter()
            seq0 = run_base_spec()
            dt = time.perf_counter() - t0
            tb_best = dt if tb_best is None else min(tb_best, dt)
        base_spec_tps = (len(seq0) - len(prompt_spec)) / tb_best
        log(f"spec baseline (fs.generate): {base_spec_tps:.1f} tok/s")

        gamma = int(os.environ.get("MVTPU_BENCH_SPEC_GAMMA", "8"))

        def run_spec():
            return sd.generate_spec(
                params, cfg, dp, dcfg, prompt_spec, spk,
                key=jax.random.PRNGKey(3), gamma=gamma,
                max_new_tokens=n_tokens, end_of_audio_token=never_eoa,
                temperature=1.0, top_p=0.95, guidance_scale=3.0,
                return_stats=True, draft_use_cfg=False,
            )

        t0 = time.perf_counter()
        run_spec()
        log(f"spec compile+first run: {time.perf_counter()-t0:.1f}s")
        ts_best, st = None, None
        for _ in range(3):
            t0 = time.perf_counter()
            seq_s, st = run_spec()
            dt = time.perf_counter() - t0
            ts_best = dt if ts_best is None else min(ts_best, dt)
        emitted = len(seq_s) - len(prompt_spec)
        spec_tps = emitted / ts_best
        alpha = st["accepted"] / max(st["proposed"], 1)
        spec_extras = {
            "spec_tokens_per_sec": round(spec_tps, 1),
            "spec_acceptance": round(alpha, 3),
            "spec_gamma": gamma,
            "spec_baseline_tokens_per_sec": round(base_spec_tps, 1),
            "spec_speedup": round(spec_tps / base_spec_tps, 3),
            "spec_tokens_per_round": round(
                st["emitted"] / max(st["rounds"], 1), 2
            ),
            "spec_note": (
                "single-stream fs.generate vs generate_spec (CFG-free int4 "
                "draft distilled in-repo against this target, T=gamma "
                "multi-token verify kernel); identical sampling semantics "
                "(exact rejection sampling)"
            ),
        }
        log(f"spec decode: {spec_tps:.1f} tok/s (x{spec_tps/base_spec_tps:.2f}), "
            f"acceptance {alpha:.3f}, {st['emitted']}/{st['rounds']} tok/round")
    except Exception as e:
        log(f"speculative measurement skipped: {e}")

    # ---- streaming TTFA: time to the FIRST audible segment out of the real
    # public streaming path (north star: p50 < 500 ms). Speaker embedding is
    # md5-cached as in real serving (the reference caches it the same way,
    # fam/llm/inference.py:419-435); warmup precompiles every program first.
    ttfa_p50 = None
    try:
        import gc

        gc.collect()

        from metavoice_tpu.runtime.tts import TTS, TTSComponents
        from metavoice_tpu.models import speaker_encoder as sem
        from metavoice_tpu.tokenizer import TrainedBPETokeniser
        from metavoice_tpu.models.enhancer import get_enhancer
        from metavoice_tpu.utils import audio_io as aio

        comps = TTSComponents(
            first_stage_params=params,  # the already-quantized int8 model
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

        # warmup: one full streaming pass compiles prefill/decode/stage2/vocoder
        t0 = time.perf_counter()
        for _ in tts.synthesise_streaming(text, ref_path):
            pass
        log(f"streaming warmup pass: {time.perf_counter()-t0:.1f}s")

        ttfas = []
        for i in range(5):
            t0 = time.perf_counter()
            gen = tts.synthesise_streaming(text, ref_path)
            seg = next(gen)
            np.asarray(seg)  # host transfer = audible bytes in hand
            dt = time.perf_counter() - t0
            gen.close()
            ttfas.append(dt)
            log(f"streaming TTFA run {i}: {dt*1000:.0f} ms ({len(seg)} samples)")
        ttfa_p50 = float(np.median(ttfas))
        log(f"streaming TTFA p50: {ttfa_p50*1000:.0f} ms (north star < 500 ms)")
    except Exception as e:  # TTFA must not break the headline metric
        log(f"streaming TTFA measurement skipped: {e}")

    # ---- cold-start TTFA: first request with NO cached speaker embedding
    # (the reference's first-request path runs the speaker encoder + prefill,
    # fam/llm/fast_inference.py:111-165). Distinct ref clips defeat the md5
    # cache; programs stay warm — this isolates the per-new-voice cost.
    ttfa_cold = None
    try:
        colds = []
        for i in range(3):
            refc = f"/tmp/mvtpu_bench_cold_{i}.wav"
            ttc = np.arange(31 * sr) / sr
            aio.write_wav(
                refc,
                (0.2 * np.sin(2 * np.pi * (250 + 17 * i) * ttc)).astype(np.float32),
                sr,
            )
            tts._emb_cache.clear()
            t0 = time.perf_counter()
            gen = tts.synthesise_streaming(text, refc)
            seg = next(gen)
            np.asarray(seg)
            dt = time.perf_counter() - t0
            gen.close()
            colds.append(dt)
            log(f"cold-start TTFA run {i}: {dt*1000:.0f} ms")
        ttfa_cold = float(np.median(colds))
        log(f"cold-start TTFA p50: {ttfa_cold*1000:.0f} ms")
    except Exception as e:
        log(f"cold TTFA measurement skipped: {e}")

    # ---- serving scenarios (chunked long-text + engine mixed Poisson):
    # measured in a FRESH subprocess (scripts/bench_serving.py). A long-
    # lived dispatch-heavy process measurably degrades on the tunneled
    # backend: at the END of a ~25-min bench process the identical engine
    # workload measured 316 effective agg tok/s / p50 16.5 s vs 631 / 4.25 s
    # in a fresh process minutes later (round-4 measurements; chunked
    # inflated 1.07 -> 1.69 s the same way). A production server IS a fresh
    # process that only serves, so the isolated number is the honest one;
    # the child logs before/after RTT probes so a degraded run is visible.
    serving_extras = {}

    def _serving_anomalies(extras: dict) -> list[str]:
        """Signals that a serving run hit a transient tunnel/host episode
        (the documented p50 6.88 -> 32.7 -> 5.76 s spread on identical
        config) rather than the code's real behavior."""
        reasons = []
        rtt = extras.get("serving_rtt_probe_ms") or []
        if rtt and max(rtt) > 90:  # healthy dispatch-with-fetch is ~25-30 ms
            reasons.append(f"rtt_probe_ms={rtt}")
        if (extras.get("host_load_per_cpu") or 0) > 1.5:
            reasons.append(f"host_load_per_cpu={extras['host_load_per_cpu']}")
        if (extras.get("engine_warmup_s") or 0) > 400:  # cached norm ~140 s
            reasons.append(f"engine_warmup_s={extras['engine_warmup_s']}")
        if (extras.get("engine_poisson_p50_s") or 0) > 15:  # norm 4-7 s
            reasons.append(f"engine_poisson_p50_s={extras['engine_poisson_p50_s']}")
        return reasons

    try:
        import subprocess

        from metavoice_tpu.utils import checkpoint as _ck

        params_npz = "/tmp/mvtpu_bench_fs_int4.npz"
        t0 = time.perf_counter()
        _ck.save_npz(params_npz, jax.tree.map(np.asarray, params))
        log(f"saved int4 params for serving child in {time.perf_counter()-t0:.1f}s")

        def _run_child(env_extra=None):
            env = dict(os.environ, **(env_extra or {}))
            r = subprocess.run(
                [sys.executable,
                 os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              "scripts", "bench_serving.py"),
                 params_npz],
                capture_output=True, text=True, timeout=4500, env=env,
            )
            for line in (r.stderr or "").splitlines():
                if "cpu_aot" in line or "Platform" in line:
                    continue
                log(f"[serving] {line}")
            if r.returncode == 0 and r.stdout.strip():
                return json.loads(r.stdout.strip().splitlines()[-1])
            log(f"serving child failed rc={r.returncode}")
            return {}

        serving_extras = _run_child()
        # self-validation (VERDICT r4 #3): if the run shows a transient
        # anomaly, re-run ONCE in a fresh subprocess and report the clean
        # run; both runs stay visible in the JSON.
        anomalies = _serving_anomalies(serving_extras)
        if anomalies and serving_extras:
            log(f"serving anomaly detected ({anomalies}); re-running once "
                "in a fresh subprocess")
            first_run = serving_extras
            second = _run_child()
            second_anoms = _serving_anomalies(second)
            chosen = second if second and len(second_anoms) <= len(anomalies) else first_run
            chosen = dict(chosen)
            chosen["serving_anomaly_first_run"] = {
                "reasons": anomalies,
                "engine_poisson_p50_s": first_run.get("engine_poisson_p50_s"),
                "engine_aggregate_serving_rtf": first_run.get(
                    "engine_aggregate_serving_rtf"
                ),
            }
            if second_anoms:
                chosen["serving_anomaly_second_run"] = second_anoms
            serving_extras = chosen
    except Exception as e:
        log(f"serving sections skipped: {e}")
    chunked_rtf = serving_extras.get("chunked_rtf")
    chunked_wall = serving_extras.get("chunked_wall_s")
    chunked_rtf_tok = serving_extras.get("chunked_rtf_token_norm")
    chunked_n = serving_extras.get("chunked_n")
    eng_p50 = serving_extras.get("engine_poisson_p50_s")
    eng_p95 = serving_extras.get("engine_poisson_p95_s")
    eng_agg_rtf = serving_extras.get("engine_aggregate_serving_rtf")
    eng_eff_tps = serving_extras.get("engine_effective_agg_tok_s")
    eng_stats = serving_extras.get("engine_stats") or {}
    serving_rtt = serving_extras.get("serving_rtt_probe_ms")

    # ---- on-chip finetune step (VERDICT r3 missing #2): one real-scale
    # last-1-block bf16 train step. Subprocess-isolated: a crashed oversized
    # compile can wedge the remote compile helper, and the bench must
    # survive that. (Reference never computes its MFU field,
    # fam/llm/finetune.py:228,351-362.)
    finetune_extras = {}
    try:
        import subprocess

        r = subprocess.run(
            [sys.executable, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                          "scripts", "bench_finetune_step.py")],
            capture_output=True, text=True, timeout=2400,
        )
        log(r.stderr[-2000:] if r.stderr else "")
        if r.returncode == 0 and r.stdout.strip():
            finetune_extras = json.loads(r.stdout.strip().splitlines()[-1])
            log(f"finetune step: {finetune_extras}")
        else:
            log(f"finetune step bench failed rc={r.returncode}")
    except Exception as e:
        log(f"finetune step bench skipped: {e}")

    result = {
        "metric": "first_stage_decode_tokens_per_sec",
        "value": round(tps, 2),
        "unit": "tokens/s",
        "vs_baseline": round(tps / 300.0, 3),
        "stage1_rtf": round(stage1_rtf, 3),
        "full_pipeline_rtf": round(full_rtf, 3),
        "full_latency_s": round(full_time, 3),
        "ttfa_s": round(ttfa_p50, 3) if ttfa_p50 else None,
        "ttfa_note": "p50 of 5 runs, time to first synthesise_streaming segment (40-token first segment), cached speaker emb",
        "ttfa_cold_s": round(ttfa_cold, 3) if ttfa_cold else None,
        "chunked_rtf": round(chunked_rtf, 3) if chunked_rtf else None,
        "chunked_wall_s": round(chunked_wall, 2) if chunked_wall else None,
        "chunked_rtf_token_norm": round(chunked_rtf_tok, 3) if chunked_rtf_tok else None,
        "chunked_note": (
            f"{chunked_n} chunks x 256 tok; raw RTF divides by the degenerate "
            "random-weight audio duration — token_norm divides by the decoded "
            "token budget at 150 tok/s of audio (trained-weights equivalent)"
            if chunked_rtf_tok else None
        ),
        # >1.5 on this 1-core host means a competing process contaminated the
        # serving latencies (measured: a concurrent pytest suite inflated
        # p50 6.9 -> 16.5 s with identical engine stats)
        "serving_host_load_per_cpu": serving_extras.get("host_load_per_cpu"),
        "engine_poisson_p50_s": round(eng_p50, 2) if eng_p50 else None,
        "engine_poisson_p95_s": round(eng_p95, 2) if eng_p95 else None,
        "engine_aggregate_serving_rtf": round(eng_agg_rtf, 3) if eng_agg_rtf else None,
        "engine_effective_agg_tok_s": round(eng_eff_tps, 1) if eng_eff_tps else None,
        "engine_stats": eng_stats or None,
        "engine_note": (
            "12 mixed Poisson arrivals of ~3.4s utterances on 8 slots: 2 "
            "prompt buckets (128/256), 25% streaming, rebase-forcing margin; "
            "latency = submit -> wav written (streams: final segment); "
            "measured in a fresh subprocess (scripts/bench_serving.py)"
        ),
        "serving_rtt_probe_ms": serving_rtt,
        "engine_warmup_s": serving_extras.get("engine_warmup_s"),
        # stream TTFA under load (VERDICT r4 #4): first audio segment of the
        # streaming quartile while riding the busy batch
        "stream_ttfa_p50_s": serving_extras.get("stream_ttfa_p50_s"),
        "stream_ttfa_max_s": serving_extras.get("stream_ttfa_max_s"),
        # 16-slot int8-KV capacity mode under the same mixed workload
        # (VERDICT r4 #5): 24 requests at doubled arrival rate
        "engine16_poisson_p50_s": serving_extras.get("engine16_engine_poisson_p50_s"),
        "engine16_poisson_p95_s": serving_extras.get("engine16_engine_poisson_p95_s"),
        "engine16_aggregate_serving_rtf": serving_extras.get(
            "engine16_engine_aggregate_serving_rtf"
        ),
        "engine16_effective_agg_tok_s": serving_extras.get(
            "engine16_engine_effective_agg_tok_s"
        ),
        "engine16_stream_ttfa_p50_s": serving_extras.get("engine16_stream_ttfa_p50_s"),
        "engine16_warmup_s": serving_extras.get("engine16_engine_warmup_s"),
        "engine16_stats": serving_extras.get("engine16_engine_stats"),
        "serving_anomaly_first_run": serving_extras.get("serving_anomaly_first_run"),
        "serving_anomaly_second_run": serving_extras.get("serving_anomaly_second_run"),
        "vs_baseline_note": "denominator 300 tok/s is BASELINE.json's north-star target; the reference publishes no GPU decode figure (BASELINE.json.published is empty)",
        "batch8_aggregate_tokens_per_sec": round(batch_tps, 1) if batch_tps else None,
        "batch8_deep_aggregate_tokens_per_sec": (
            round(batch8_deep_tps, 1) if batch8_deep_tps else None
        ),
        "batch16_int8kv_aggregate_tokens_per_sec": (
            round(batch16_tps, 1) if batch16_tps else None
        ),
        "gqa_batch8_aggregate_tokens_per_sec": round(gqa_tps, 1) if gqa_tps else None,
        "gqa_batch8_deep_aggregate_tokens_per_sec": (
            round(gqa_deep_tps, 1) if gqa_deep_tps else None
        ),
        "gqa_note": (
            "n_local_heads=2 (8x fewer KV heads) through the same fused int4 "
            "decode kernels, same-weight slice of the MHA model; deep window "
            "= pos 1200+ where attention DMA dominates" if gqa_tps else None
        ),
        **spec_extras,
        "achieved_bandwidth_gb_s": round(bandwidth_gbs, 1),
        "params_b": round(n_params / 1e9, 3),
        "tokens_per_sec_int8_packed": round(tps_int8, 2),
        "int8_note": "int8-in-int32 packed quality mode (2-byte-ceiling reads); plain int8 arrays measure ~305 tok/s at the 1-byte DMA ceiling",
        "config": headline_config,
        **finetune_extras,
    }
    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()

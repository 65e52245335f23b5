"""Command-line interfaces.

``python -m metavoice_tpu.cli synth`` — batch synthesis, parity with the
reference CLI (fam/llm/inference.py SamplingControllerConfig :590-652 and
fam/llm/fast_inference.py's tyro entry): texts + one speaker ref -> wav
files, with the reference's sampling defaults.

``python -m metavoice_tpu.cli serve`` — start the HTTP server
(runtime/server.py).

``python -m metavoice_tpu.cli finetune`` — training/trainer.py's CLI.
"""

from __future__ import annotations

import argparse
import sys


def _add_model_args(ap: argparse.ArgumentParser) -> None:
    ap.add_argument("--first_stage_path", help="first-stage ckpt (.pt)")
    ap.add_argument("--second_stage_path", help="second-stage ckpt (.pt)")
    ap.add_argument("--speaker_encoder_path", help="speaker encoder ckpt (.pt)")
    ap.add_argument(
        "--encodec_path",
        help="pretrained EnCodec 24 kHz vocoder ckpt (encodec-package .pt or "
        "native .npz); without it the vocoder is random-weight",
    )
    ap.add_argument("--random_weights", action="store_true", help="dev mode: random init")
    ap.add_argument("--small", action="store_true", help="small dev models")
    ap.add_argument(
        "--quantisation_mode",
        choices=["int4", "int8", "int8_packed", "int8_plain"],
        help="weight-only quantisation of the first stage (int8 = "
        "int8-in-int32 packed, the fast int8 path; int8_plain = plain "
        "arrays at the 1-byte DMA ceiling)",
    )
    ap.add_argument(
        "--kv_cache_dtype",
        choices=["int8", "int8_packed"],
        help="quantize the first-stage KV cache: halves cache memory "
        "(capacity lever for large serving batches). 'int8_packed' stores "
        "the same values four-per-int32-word: cache reads ride the 4-byte "
        "DMA ceiling with shift-based unpack instead of the relayout-bound "
        "i8 converts that make plain 'int8' ~20%% slower than bf16",
    )
    ap.add_argument(
        "--draft_checkpoint",
        help="small first-stage-format ckpt (.pt/.npz) enabling speculative "
        "decoding for single-stream synthesis (models/spec_decode.py)",
    )
    ap.add_argument(
        "--speculative_gamma", type=int, default=4,
        help="tokens proposed per speculation round (with --draft_checkpoint)",
    )
    ap.add_argument(
        "--draft_no_cfg", action="store_true",
        help="run the draft without classifier-free guidance (halves draft "
        "cost; use with drafts distilled on the guidance-merged target "
        "distribution, scripts/distill_draft.py)",
    )
    ap.add_argument("--seed", type=int, default=1337)
    ap.add_argument("--output_dir", default="outputs")
    ap.add_argument(
        "--tensor_parallel", type=int, default=1,
        help="shard the first stage Megatron-style over this many devices "
        "(shard_map TP decode, parallel/tp_decode.py); needs a dense .pt "
        "checkpoint (per-shard requantization), not a pre-quantized .npz",
    )


def _build_tts(args):
    import jax

    from metavoice_tpu.runtime.tts import TTS

    if args.random_weights or not args.first_stage_path:
        return TTS.from_random(
            jax.random.PRNGKey(args.seed),
            small=args.small,
            output_dir=args.output_dir,
            quantisation_mode=args.quantisation_mode,
            kv_cache_dtype=args.kv_cache_dtype,
            tensor_parallel=args.tensor_parallel,
        )
    return TTS.from_checkpoints(
        args.first_stage_path,
        args.second_stage_path,
        args.speaker_encoder_path,
        encodec_path=args.encodec_path,
        draft_checkpoint=getattr(args, "draft_checkpoint", None),
        speculative_gamma=getattr(args, "speculative_gamma", 4),
        draft_use_cfg=not getattr(args, "draft_no_cfg", False),
        output_dir=args.output_dir,
        quantisation_mode=args.quantisation_mode,
        kv_cache_dtype=args.kv_cache_dtype,
        tensor_parallel=args.tensor_parallel,
    )


def cmd_synth(argv: list[str]) -> int:
    ap = argparse.ArgumentParser(prog="metavoice_tpu synth")
    _add_model_args(ap)
    ap.add_argument("--text", action="append", required=True, help="repeatable")
    ap.add_argument("--spk_cond_path", required=True, help="speaker reference audio")
    ap.add_argument("--top_p", type=float, default=0.95)
    ap.add_argument(
        "--guidance_scale",
        type=float,
        nargs="+",
        default=[3.0],
        metavar="SCALE",
        help="one value: speaker CFG. Two values: (speaker, prompt) double "
        "guidance — the reference's tuple default (3.0, 1.0) "
        "(fam/llm/inference.py:646); prompt > 1 triples the CFG batch",
    )
    ap.add_argument("--temperature", type=float, default=1.0)
    args = ap.parse_args(argv)

    if len(args.guidance_scale) > 2:
        ap.error("--guidance_scale takes one or two values")
    guidance = (
        args.guidance_scale[0]
        if len(args.guidance_scale) == 1
        else tuple(args.guidance_scale)
    )

    tts = _build_tts(args)
    for text in args.text:
        path = tts.synthesise(
            text,
            args.spk_cond_path,
            top_p=args.top_p,
            guidance_scale=guidance,
            temperature=args.temperature,
        )
        print(path)
    return 0


def cmd_serve(argv: list[str]) -> int:
    ap = argparse.ArgumentParser(prog="metavoice_tpu serve")
    _add_model_args(ap)
    ap.add_argument("--host", default="0.0.0.0")
    ap.add_argument("--port", type=int, default=58003)
    ap.add_argument(
        "--batching",
        type=str,
        default="0",
        metavar="MAX_BATCH",
        help="enable continuous batching with this max batch size; 'auto' "
        "sizes the slot pool from the exact HBM capacity plan "
        "(utils/capacity.py) for the loaded quantisation + KV cache config",
    )
    ap.add_argument("--no_warmup", action="store_true", help="skip precompilation")
    ap.add_argument(
        "--replicas",
        type=int,
        default=1,
        help="data-parallel replicas: one full model + batching engine per "
        "device, requests routed least-loaded (runtime/replicas.py) — the "
        "multi-chip throughput-serving shape; implies batching",
    )
    args = ap.parse_args(argv)
    if args.batching != "auto":
        try:
            args.batching = int(args.batching)
        except ValueError:
            ap.error("--batching must be an integer or 'auto'")

    from http.server import ThreadingHTTPServer

    from metavoice_tpu.runtime.server import ServingConfig, make_handler

    if args.replicas > 1:
        from metavoice_tpu.runtime.replicas import ReplicaPool

        print(f"building {args.replicas} data-parallel replicas...")
        _slots = (
            "auto" if args.batching == "auto"
            else args.batching if args.batching > 0 else 8
        )
        engine = ReplicaPool(
            lambda i: _build_tts(args),
            n_replicas=args.replicas,
            warmup=not args.no_warmup,
            slots=_slots,
        )
        tts = engine.engines[0].tts
    else:
        tts = _build_tts(args)
        if not args.no_warmup:
            print("warming up (precompiling hot programs)...")
            tts.warmup()
        engine = None
        if args.batching == "auto":
            from metavoice_tpu.runtime.engine import ContinuousBatchingEngine

            engine = ContinuousBatchingEngine(tts, slots="auto")
            print(f"auto-sized batching engine: {engine.n_slots} slots")
        elif args.batching > 0:
            from metavoice_tpu.runtime.engine import BatchingEngine

            engine = BatchingEngine(tts, max_batch=args.batching)
        if engine is not None and not args.no_warmup:
            # the engine has its own program envelope (group prefill, segment
            # decode, join, rebase) — without this the first batched request
            # compiles for minutes on the TPU
            print("warming up batching engine programs...")
            engine.warmup(warm_tts=False)  # tts.warmup() already ran above
    cfg = ServingConfig(host=args.host, port=args.port)
    httpd = ThreadingHTTPServer((cfg.host, cfg.port), make_handler(tts, cfg, engine))
    print(f"serving on {cfg.host}:{cfg.port}")
    # graceful shutdown: SIGTERM/SIGINT stop accepting, drain the batching
    # engine (in-flight futures resolve), then exit
    import signal

    def _stop(signum, frame):
        import threading

        threading.Thread(target=httpd.shutdown, daemon=True).start()

    signal.signal(signal.SIGTERM, _stop)
    signal.signal(signal.SIGINT, _stop)
    try:
        httpd.serve_forever()
    finally:
        if engine is not None:
            engine.shutdown()
        httpd.server_close()
        print("server stopped")
    return 0


def cmd_quantize(argv: list[str]) -> int:
    """Quantize a first-stage checkpoint offline into a serving .npz.

    The packed arrays load directly at serve time (TTS.from_checkpoints with
    the .npz path), skipping the torch read + load-time quantization; int4
    shrinks the ~5 GB f32 .pt to ~0.7 GB on disk.
    """
    ap = argparse.ArgumentParser(prog="metavoice_tpu quantize")
    ap.add_argument("--first_stage_path", required=True, help="first-stage .pt")
    ap.add_argument(
        "--mode",
        choices=["int4", "int8", "int8_packed", "int8_plain"],
        default="int4",
    )
    ap.add_argument("--out", required=True, help="output .npz path")
    args = ap.parse_args(argv)

    import jax.numpy as jnp
    import jax

    from metavoice_tpu.ops import quantized as qz
    from metavoice_tpu.utils import checkpoint as ck

    # np.savez silently appends ".npz" to extension-less paths; normalize up
    # front so the size report below stats the file that was actually written
    if not args.out.endswith(".npz"):
        args.out += ".npz"
    params, cfg, tok_info = ck.load_first_stage_pt(args.first_stage_path)
    params = jax.tree.map(lambda a: jnp.asarray(a, jnp.bfloat16), params)
    if args.mode == "int8_packed":
        args.mode = "int8"  # alias: both select the packed i32 format
    if args.mode == "int8":
        # int8-in-int32 packed: same per-channel quantisation error as plain
        # int8, but weight reads run at the 2-byte DMA ceiling (~400 vs
        # ~305 tok/s on v5e); "int8_plain" keeps the plain-array layout
        qparams = qz.quantize_params_int8_i32(params)
    elif args.mode == "int8_plain":
        qparams = qz.quantize_params_int8(params)
    else:
        qparams = qz.quantize_params_int4_i32(params)
    ck.save_first_stage_quantized(args.out, qparams, cfg, tok_info, args.mode)
    import os

    print(f"{args.out}: {os.path.getsize(args.out) / 1e9:.2f} GB ({args.mode})")
    return 0


def cmd_capacity(argv: list[str]) -> int:
    """Plan HBM capacity for a serving configuration (no device needed).

    Exact weights+cache byte math via jax.eval_shape (utils/capacity.py);
    prints the plan and the max engine slot count that fits.
    """
    ap = argparse.ArgumentParser(prog="metavoice_tpu capacity")
    ap.add_argument(
        "--quantisation_mode", choices=["int4", "int8", "int8_packed", "int8_plain"],
        default="int4",
    )
    ap.add_argument("--kv_cache_dtype", choices=["int8", "int8_packed"], default=None)
    ap.add_argument("--slots", type=int, default=8, help="engine slot count")
    ap.add_argument("--block_size", type=int, default=None)
    ap.add_argument(
        "--cfg_rows", type=int, default=2, choices=[2, 3],
        help="cache rows per slot (3 with prompt guidance)",
    )
    ap.add_argument(
        "--hbm_gib", type=float, default=16.0, help="per-chip HBM (GiB)"
    )
    args = ap.parse_args(argv)

    from metavoice_tpu.core.config import first_stage_config
    from metavoice_tpu.utils import capacity as cap

    cfg = first_stage_config()
    kwargs = dict(
        quantisation_mode=args.quantisation_mode,
        kv_cache_dtype=args.kv_cache_dtype,
        block_size=args.block_size,
        cfg_rows=args.cfg_rows,
        hbm_bytes=int(args.hbm_gib * 1024**3),
    )
    plan = cap.memory_plan(cfg, slots=args.slots, **kwargs)
    print(plan.describe())
    print(f"max slots at this config: {cap.max_slots(cfg, **kwargs)}")
    return 0


def cmd_finetune(argv: list[str]) -> int:
    sys.argv = ["finetune"] + argv
    from metavoice_tpu.training.trainer import main as ft_main

    ft_main()
    return 0


def main() -> int:
    commands = {
        "synth": cmd_synth,
        "serve": cmd_serve,
        "finetune": cmd_finetune,
        "quantize": cmd_quantize,
        "capacity": cmd_capacity,
    }
    if len(sys.argv) < 2 or sys.argv[1] not in commands:
        print(f"usage: python -m metavoice_tpu.cli {{{'|'.join(commands)}}} [args]")
        return 2
    return commands[sys.argv[1]](sys.argv[2:])


if __name__ == "__main__":
    raise SystemExit(main())

"""End-to-end TTS orchestration — the user-facing ``TTS`` class.

API parity with the reference ``TTS`` (fam/llm/fast_inference.py:38-195):
``TTS(...).synthesise(text, spk_ref_path, top_p, guidance_scale, temperature)
-> path to .wav``, with the same sampling defaults. The five synthesis stages
(SURVEY.md section 0) run as:

  1. speaker encoder (models/speaker_encoder) — cached per reference file,
  2. first-stage LLM (models/first_stage): one XLA while_loop decode,
  3. token split (core/tokens.split_flattened_interleaved),
  4. second-stage non-causal completion (models/second_stage),
  5. vocoder: EnCodec decoder (models/encodec). The reference's quality
     chain (MBD diffusion + DeepFilterNet) layers on top via
     ``vocoder="mbd"`` once those stages land; EnCodec's own decoder is the
     documented fallback (reference README.md:165 notes MBD is a quality
     choice over it).

Also ships what the reference left unshipped (README.md:150-153): arbitrary
length text via sentence chunking with one speaker embedding reused across
chunks (core/text.chunk_text).

Weights load from converted checkpoints (utils/checkpoint) or random-init
for development/benchmarking (``from_random``).
"""

from __future__ import annotations

import collections
import dataclasses
import hashlib
import threading
import os
import time
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from metavoice_tpu.core import tokens as T
from metavoice_tpu.core.config import (
    RuntimeConfig,
    TransformerConfig,
    first_stage_config,
    second_stage_config,
)
from metavoice_tpu.core.text import chunk_text, normalize_text
from metavoice_tpu.models import encodec as ec
from metavoice_tpu.models import first_stage as fs
from metavoice_tpu.models import second_stage as ss
from metavoice_tpu.models import speaker_encoder as se
from metavoice_tpu.models import transformer as tfm
from metavoice_tpu.tokenizer import TrainedBPETokeniser
from metavoice_tpu.utils import audio_io as aio
from metavoice_tpu.utils import phases

MAX_CHARS_PER_CHUNK = 220  # reference truncation point (fam/llm/inference.py:537)


@dataclass
class TTSComponents:
    first_stage_params: tfm.Params
    first_stage_cfg: TransformerConfig
    second_stage_params: tfm.Params
    second_stage_cfg: TransformerConfig
    spk_params: se.SpeakerEncoderParams
    encodec_params: dict
    encodec_cfg: ec.EncodecConfig
    tokenizer: TrainedBPETokeniser
    enhancer: object | None = None
    # vocoder selection: "encodec" (SEANet decoder) or "mbd" (multi-band
    # diffusion, the reference's quality choice, fam/llm/decoders.py:13)
    vocoder: str = "encodec"
    mbd_params: dict | None = None
    mbd_cfg: object | None = None


from functools import partial as _partial


@_partial(
    jax.jit,
    static_argnames=("cfg2", "ecfg", "bucket", "top_k", "compute_dtype"),
)
def _stage2_vocode_jit(
    params2,
    eparams,
    cfg2,
    ecfg,
    idx,  # (1, 2, ctx) second-stage input (text+h0 / pad+h1)
    spk,  # (1, spk_dim)
    key,
    n_text,  # traced scalar: text prefix length
    n_audio,  # traced scalar: valid audio frames
    coarse_pad,  # (2, bucket) int32, the true coarse rows
    *,
    bucket: int,
    top_k: int = 200,
    compute_dtype=jnp.bfloat16,
):
    """Stage 2 + EnCodec vocoder as one XLA program (streaming fast path).

    Replicates second_stage.complete_hierarchies' host post-processing
    on-device: stack [inputs; sampled], slice the audio region at the text
    offset, restore the true coarse rows, zero past n_audio, clip to the
    codebook, decode. One dispatch round-trip instead of two.
    """
    sampled = ss.non_causal_sample(
        params2, cfg2, idx, spk, key, jnp.asarray(1.0, jnp.float32),
        top_k=top_k, compute_dtype=compute_dtype,
    )  # (1, C_out, ctx)
    full = jnp.concatenate([idx[0], sampled[0]], axis=0)  # (8, ctx)
    full = jnp.pad(full, ((0, 0), (0, bucket)))  # keep the slice un-clamped
    region = jax.lax.dynamic_slice(
        full, (jnp.asarray(0, n_text.dtype), n_text), (full.shape[0], bucket)
    )
    region = region.at[0:2].set(coarse_pad)
    mask = jnp.arange(bucket) < n_audio
    region = jnp.where(mask[None, :], region, 0)
    region = jnp.clip(region, 0, T.CODEBOOK_SIZE - 1)
    return ec.decode_codes(eparams, ecfg, region)


class TTS:
    """Text-to-speech with zero-shot voice cloning.

    Mirrors reference fam/llm/fast_inference.py:38 (class TTS).
    """

    END_OF_AUDIO_TOKEN = T.HIERARCHY_EOA  # 1024, per-hierarchy space

    def __init__(
        self,
        components: TTSComponents,
        *,
        seed: int = 1337,
        output_dir: str = "outputs",
        runtime: RuntimeConfig | None = None,
        enforce_min_ref_duration: bool = True,
        enforce_min_output_duration: bool = True,
        quantisation_mode: str | None = None,
        kv_cache_dtype: str | None = None,
        tensor_parallel: int = 1,
        telemetry_origin: str | None = None,
        telemetry_client=None,
        draft_params=None,
        draft_cfg=None,
        speculative_gamma: int = 4,
        draft_use_cfg: bool = True,
    ):
        self.c = components
        if components.vocoder not in ("encodec", "mbd"):
            raise ValueError(
                f"Unknown vocoder {components.vocoder!r}; expected 'encodec' or 'mbd'"
            )
        if components.vocoder == "mbd" and components.mbd_params is None:
            raise ValueError("vocoder='mbd' requires mbd_params/mbd_cfg")
        self.runtime = runtime or RuntimeConfig(
            seed=seed,
            output_dir=output_dir,
            quantisation_mode=quantisation_mode,
            kv_cache_dtype=kv_cache_dtype,
        )
        if kv_cache_dtype and self.runtime.kv_cache_dtype != kv_cache_dtype:
            self.runtime = dataclasses.replace(
                self.runtime, kv_cache_dtype=kv_cache_dtype
            )
        if self.runtime.kv_cache_dtype not in (None, "int8", "int8_packed"):
            raise ValueError(
                f"Invalid kv_cache_dtype {self.runtime.kv_cache_dtype!r}; "
                "expected None, 'int8' or 'int8_packed'"
            )
        # weight-only quantisation of the first stage (reference
        # fam/llm/fast_inference.py:41 `quantisation_mode`); int8 is FASTER
        # than bf16 here (Pallas weight-streaming kernels)
        mode = quantisation_mode or self.runtime.quantisation_mode
        self._tensor_parallel = int(tensor_parallel or 1)
        self._blocks_fn = None
        self._tp_mesh = None
        if self._tensor_parallel > 1:
            # Megatron TP over a pure-tensor mesh (parallel/tp_decode.py):
            # the block stack runs under shard_map with per-shard kernels
            # and per-layer psums; the single-utterance synthesise path
            # flows through the same generate loop via blocks_fn.
            from metavoice_tpu.parallel import mesh as pmesh
            from metavoice_tpu.parallel import tp_decode as tpd

            _layers = self.c.first_stage_params.get("layers", {})
            if any(isinstance(v, dict) for v in _layers.values()):
                raise ValueError(
                    "tensor_parallel requires a DENSE first-stage checkpoint:"
                    " row-parallel shards must be requantized per device "
                    "(parallel/tp_decode.py) — pass the .pt checkpoint with "
                    "quantisation_mode instead of a pre-quantized .npz"
                )
            tp_mode = {
                None: None, "int4": "int4", "int8": "int8",
                "int8_packed": "int8",
            }
            if mode not in tp_mode:
                raise ValueError(
                    f"quantisation_mode {mode!r} is not supported with "
                    "tensor_parallel (use None, 'int4' or 'int8')"
                )
            self._tp_mesh = pmesh.make_mesh(
                self._tensor_parallel, tensor_parallel=self._tensor_parallel
            )
            self.c.first_stage_params = tpd.prepare_tp_params(
                self.c.first_stage_params, self.c.first_stage_cfg,
                self._tp_mesh, tp_mode[mode],
            )
            self._blocks_fn = tpd.make_tp_blocks_fn(
                self.c.first_stage_cfg, self._tp_mesh
            )
        elif mode == "int8_plain":
            from metavoice_tpu.ops import quantized as qz

            # plain int8 arrays: capped by the ~390 GB/s 1-byte DMA ceiling
            # (~305 tok/s); kept for experiments — "int8" (below) is the
            # same quantisation error at 2-byte-ceiling reads (~400 tok/s)
            self.c.first_stage_params = qz.quantize_params_int8(self.c.first_stage_params)
        elif mode == "int4":
            from metavoice_tpu.ops import quantized as qz

            # int4-in-int32 serving format: 4-bit HBM weight reads through
            # the decode megakernels (the reference's claimed 2x lever,
            # README.md:92 / fast_quantize.py:70-148)
            self.c.first_stage_params = qz.quantize_params_int4_i32(
                self.c.first_stage_params
            )
        elif mode in ("int8", "int8_packed"):
            from metavoice_tpu.ops import quantized as qz

            # the reference's "int8" mode (fast_inference.py quantisation
            # _mode), implemented as int8-in-int32 packing: same per-channel
            # quantisation error, but the weight stream reads at the
            # 2-byte-ceiling ~490 GB/s instead of the 1-byte ~390 GB/s that
            # caps plain int8 arrays (ops/quantized.py; "int8_packed" kept
            # as an alias, "int8_plain" selects the plain arrays)
            self.c.first_stage_params = qz.quantize_params_int8_i32(
                self.c.first_stage_params
            )
        elif mode is not None:
            raise ValueError(
                f"Invalid quantisation mode {mode}! Must be either 'int4', "
                "'int8', 'int8_packed' or 'int8_plain'!"
            )
        # speculative decoding (models/spec_decode.py): a small draft model
        # proposes `speculative_gamma` tokens per round and the first stage
        # verifies them in ONE multi-token forward; the emitted distribution
        # is exactly the ordinary sampling distribution (oracle-tested).
        # B=1 single-stream only; the draft stays dense (it is small) and
        # the spec path uses bf16 KV caches regardless of kv_cache_dtype.
        if draft_params is not None and draft_cfg is None:
            raise ValueError("draft_params requires draft_cfg")
        if draft_params is not None and self._tensor_parallel > 1:
            raise ValueError(
                "speculative decoding is not supported with tensor_parallel"
            )
        self._draft_params = draft_params
        self._draft_cfg = draft_cfg
        self._spec_gamma = int(speculative_gamma)
        # CFG-free draft (models/spec_decode.generate_spec draft_use_cfg):
        # exactness holds for any proposal distribution; halves draft cost.
        # Default True — only distilled drafts trained on the guidance-
        # MERGED teacher distribution should turn it off.
        self._draft_use_cfg = bool(draft_use_cfg)
        # cumulative acceptance ledger, exposed for observability:
        # accepted/proposed = draft acceptance rate, emitted/rounds = tokens
        # gained per target forward (ordinary decoding's rate is 1.0)
        self.spec_stats = {"accepted": 0, "proposed": 0, "rounds": 0, "emitted": 0}
        self.output_dir = output_dir
        os.makedirs(output_dir, exist_ok=True)
        # anonymous usage telemetry (reference fast_inference.py:62,173-193);
        # offline-safe JSONL spool, opt-out via ANONYMIZED_TELEMETRY=False
        from metavoice_tpu import telemetry as tele

        self._telemetry = telemetry_client or tele.default_client
        self._telemetry_origin = telemetry_origin
        self._key = jax.random.PRNGKey(seed)
        # the continuous-batching engine renders from a worker thread AND a
        # small render pool concurrently; the PRNG chain must not lose
        # updates (two calls observing the same key -> correlated draws)
        self._key_lock = threading.Lock()
        # LRU-bounded: a long-lived server seeing many distinct reference
        # clips must not grow this without limit (~1 KB/entry, but the md5
        # keys also pin the dict itself)
        self._emb_cache: "collections.OrderedDict[str, np.ndarray]" = (
            collections.OrderedDict()
        )
        self._emb_cache_max = 256
        self._enforce_min_ref = enforce_min_ref_duration
        # reference fam/llm/decoders.py:88-91: an MBD-decoded wav under
        # 400 ms signals degenerate token output and is rejected outright
        self._min_output_s = 0.4 if enforce_min_output_duration else 0.0
        self._compute_dtype = (
            jnp.bfloat16 if self.runtime.dtype == "bfloat16" else jnp.float32
        )
        # persistent KV cache buffer (2 CFG rows), reused across calls.
        # kv_cache_dtype="int8" halves cache MEMORY (per-(position, head)
        # absmax scales) — a capacity lever for large serving batches, not a
        # speed win: measured ~20% slower than bf16 on v5e decode (Mosaic
        # i8->float converts are VPU-relayout-bound; see KVCache docstring).
        # "int8_packed" stores the same int8 values four-per-int32-word:
        # 4-byte-ceiling cache reads + shift-based unpack (no i8 relayout).
        self._cache_dtype = {
            "int8": jnp.int8, "int8_packed": "int8_packed"
        }.get(self.runtime.kv_cache_dtype)
        # "int4" may arrive either via quantisation_mode or as a pre-quantized
        # .npz (from_checkpoints resets the mode to None after loading packed
        # arrays) — probe the params for packed {"pw", "sc"} leaves so the
        # warning below doesn't misfire on pre-quantized checkpoints.
        _layer_p = self.c.first_stage_params.get("layers", {})
        _has_int4 = mode == "int4" or any(
            isinstance(v, dict) and "pw" in v for v in _layer_p.values()
        )
        if (
            self._cache_dtype is not None
            and not _has_int4
            and jax.default_backend() == "tpu"
        ):
            import warnings

            warnings.warn(
                f"kv_cache_dtype={self.runtime.kv_cache_dtype!r} without "
                "quantisation_mode='int4' has no fused decode kernel on TPU: "
                "every step dequantizes the full cache in XLA (order-of-"
                "magnitude slower). Pair it with quantisation_mode='int4' "
                "for the supported fast path."
            )
        if (
            self._tensor_parallel > 1
            and self._cache_dtype is not None
            and jax.default_backend() == "tpu"
        ):
            import warnings

            warnings.warn(
                "quantized KV caches under tensor_parallel decode through "
                "the XLA dequant path (the fused quantized-cache kernels "
                "are single-device) — expect a large per-step slowdown; "
                "use the bf16 cache for TP latency serving"
            )
        self._kv_cache = self._create_kv_cache(2)
        # lazily-created 3-row buffer for double (speaker+prompt) guidance —
        # without it every tuple-guidance synthesise would allocate and drop
        # a fresh ~1.8 GB cache
        self._kv_cache3: tfm.KVCache | None = None

    def _next_key(self) -> jax.Array:
        """Thread-safe draw from the instance PRNG chain."""
        with self._key_lock:
            self._key, sub = jax.random.split(self._key)
        return sub

    def _persistent_kv_cache(self, guidance_scale) -> tfm.KVCache:
        """The reusable cache matching the CFG row count of this request."""
        rows = fs._normalize_guidance(guidance_scale)[2]
        if rows == 2:
            return self._kv_cache
        if self._kv_cache3 is None:
            self._kv_cache3 = self._create_kv_cache(rows)
        return self._kv_cache3

    def _create_kv_cache(self, rows: int) -> tfm.KVCache:
        """Persistent-cache constructor: TP-sharded when tensor_parallel."""
        if self._tensor_parallel > 1:
            from metavoice_tpu.parallel import tp_decode as tpd

            return tpd.make_tp_cache(
                self.c.first_stage_cfg, self._tp_mesh, rows,
                self.c.first_stage_cfg.block_size, data_sharded=False,
                dtype=self._cache_dtype or self._compute_dtype,
            )
        return tfm.KVCache.create(
            self.c.first_stage_cfg, rows, self.c.first_stage_cfg.block_size,
            dtype=self._cache_dtype or self._compute_dtype,
        )

    # ------------------------------------------------------------------ constructors
    @classmethod
    def from_random(
        cls,
        key: jax.Array | None = None,
        *,
        small: bool = False,
        vocoder: str = "encodec",
        first_stage_overrides: dict | None = None,
        **kwargs,
    ) -> "TTS":
        """Random-weight instance for development and benchmarking.

        ``first_stage_overrides``: extra first_stage_config kwargs (e.g.
        ``{"n_local_heads": 2}`` for a GQA first stage)."""
        key = key if key is not None else jax.random.PRNGKey(0)
        k1, k2, k3, k4, k5 = jax.random.split(key, 5)
        fs_kw = dict(first_stage_overrides or {})
        if small:
            fs_kw = dict(n_layer=2, n_head=4, dim=128, block_size=512) | fs_kw
        cfg1 = first_stage_config(**fs_kw)
        cfg2 = second_stage_config() if not small else second_stage_config(
            n_layer=2, n_head=2, dim=64, block_size=256
        )
        ecfg = ec.EncodecConfig() if not small else ec.EncodecConfig(
            n_filters=8, dimension=32, codebook_size=1024
        )
        from metavoice_tpu.models.enhancer import get_enhancer

        mbd_params = mbd_cfg = None
        if vocoder == "mbd":
            from metavoice_tpu.models import mbd as mbd_mod

            mbd_cfg = mbd_mod.MBDConfig() if not small else mbd_mod.MBDConfig(
                n_processes=2,
                unet=mbd_mod.UNetConfig(
                    hidden=4, depth=2, num_steps=16, codec_dim=ecfg.dimension
                ),
                step_list=(15, 7, 0),
                processor_bands=4,
                eq_bands=8,
            )
            mbd_params = mbd_mod.init_params(k5, mbd_cfg)
        comps = TTSComponents(
            first_stage_params=tfm.init_params(k1, cfg1, dtype=jnp.bfloat16),
            first_stage_cfg=cfg1,
            second_stage_params=tfm.init_params(k2, cfg2, dtype=jnp.bfloat16),
            second_stage_cfg=cfg2,
            spk_params=se.init_params(k3),
            encodec_params=ec.init_params(k4, ecfg),
            encodec_cfg=ecfg,
            tokenizer=TrainedBPETokeniser(),
            enhancer=get_enhancer("spectral_gate"),
            vocoder=vocoder,
            mbd_params=mbd_params,
            mbd_cfg=mbd_cfg,
        )
        kwargs.setdefault("enforce_min_ref_duration", False)
        # random weights routinely produce sub-400 ms streams; the output
        # reject guard is for real checkpoints, not smoke tests
        kwargs.setdefault("enforce_min_output_duration", False)
        return cls(comps, **kwargs)

    @classmethod
    def from_checkpoints(
        cls,
        first_stage_path: str,
        second_stage_path: str,
        speaker_encoder_path: str,
        encodec_path: str | None = None,
        encodec_cfg: "ec.EncodecConfig | None" = None,
        draft_checkpoint: str | None = None,
        **kwargs,
    ) -> "TTS":
        """Build from converted reference checkpoints (utils/checkpoint).

        ``encodec_path`` accepts an encodec-package ``.pt`` (converted via
        utils/convert_external, the reference's pretrained 24 kHz decoder,
        fam/llm/fast_inference.py:88-92 via audiocraft) or a native ``.npz``;
        without it the vocoder is RANDOM-weight EnCodec — fine for smoke
        tests, silence-adjacent noise for real use.

        ``draft_checkpoint`` (first-stage-format ``.pt``/``.npz``, e.g. a
        small model trained with the in-repo trainer) enables speculative
        decoding for single-stream synthesis (models/spec_decode.py); tune
        the window with ``speculative_gamma``.
        """
        from metavoice_tpu.utils import checkpoint as ck

        if draft_checkpoint:
            if draft_checkpoint.endswith(".npz"):
                dp, dcfg, _, d_quant = ck.load_first_stage_npz(draft_checkpoint)
                if d_quant not in (None, "int4"):
                    raise ValueError(
                        "draft_checkpoint must be dense or int4-quantized "
                        f"(got quantisation_mode={d_quant!r})"
                    )
            else:
                dp, dcfg, _ = ck.load_first_stage_pt(draft_checkpoint)
                d_quant = None
            if d_quant:
                # pre-quantized int4 draft: decode steps ride the whole-
                # stack megakernel (chip-measured faster than the bf16
                # draft; scripts/diag_spec_cost.py MVTPU_SPEC_DRAFT_Q)
                kwargs["draft_params"] = jax.tree.map(
                    jnp.asarray, dp,
                    is_leaf=lambda x: not isinstance(x, (dict, list)),
                )
            else:
                kwargs["draft_params"] = jax.tree.map(
                    lambda a: jnp.asarray(a, jnp.bfloat16), dp
                )
            kwargs["draft_cfg"] = dcfg

        pre_quantised = None
        if first_stage_path.endswith(".npz"):
            # native checkpoint, possibly pre-quantized offline via the
            # `quantize` CLI (utils/checkpoint.save_first_stage_quantized):
            # packed int8/int4 arrays load directly, skipping the torch read
            # and the load-time quantization pass
            p1, cfg1, tok_info, pre_quantised = ck.load_first_stage_npz(
                first_stage_path
            )
            runtime_arg = kwargs.get("runtime")
            requested = kwargs.get("quantisation_mode") or (
                runtime_arg.quantisation_mode if runtime_arg else None
            )
            # "int8_packed" is an alias of "int8" (both select the packed
            # int8-in-int32 format) — normalize before the conflict check
            _alias = {"int8_packed": "int8"}
            requested = _alias.get(requested, requested)
            pre_quantised = _alias.get(pre_quantised, pre_quantised)
            if pre_quantised and requested not in (None, pre_quantised):
                raise ValueError(
                    f"checkpoint is pre-quantized as {pre_quantised!r}; "
                    f"conflicting quantisation_mode={requested!r}"
                )
            if pre_quantised:
                # __init__ must not re-quantize the already-packed arrays
                kwargs["quantisation_mode"] = None
                if runtime_arg and runtime_arg.quantisation_mode:
                    kwargs["runtime"] = dataclasses.replace(
                        runtime_arg, quantisation_mode=None
                    )
        else:
            p1, cfg1, tok_info = ck.load_first_stage_pt(first_stage_path)
        if second_stage_path.endswith(".npz"):
            # native checkpoint (training/second_stage.save_second_stage)
            p2, cfg2, tok_info2 = ck.load_second_stage_npz(second_stage_path)
        else:
            p2, cfg2, tok_info2 = ck.load_second_stage_pt(second_stage_path)
        spk = ck.load_speaker_encoder_pt(speaker_encoder_path)
        tok_info = tok_info or tok_info2
        tokenizer = TrainedBPETokeniser(**tok_info) if tok_info else TrainedBPETokeniser()
        ecfg = encodec_cfg or ec.EncodecConfig()
        from metavoice_tpu.models.enhancer import get_enhancer

        if encodec_path and encodec_path.endswith(".npz"):
            eparams, _meta = ck.load_npz(encodec_path)
        elif encodec_path:
            from metavoice_tpu.utils.convert_external import load_encodec_pt

            eparams = load_encodec_pt(encodec_path, ecfg)
        else:
            import warnings

            warnings.warn(
                "No encodec_path given: synthesising through a RANDOM-weight "
                "EnCodec decoder (output will be noise). Pass a converted "
                "24 kHz EnCodec checkpoint for real audio."
            )
            eparams = ec.init_params(jax.random.PRNGKey(0), ecfg)
        if pre_quantised:
            # packed integer arrays + scale tables: preserve dtypes exactly
            p1_dev = jax.tree.map(jnp.asarray, p1)
        else:
            p1_dev = jax.tree.map(lambda a: jnp.asarray(a, jnp.bfloat16), p1)
        comps = TTSComponents(
            first_stage_params=p1_dev,
            first_stage_cfg=cfg1,
            second_stage_params=jax.tree.map(lambda a: jnp.asarray(a, jnp.bfloat16), p2),
            second_stage_cfg=cfg2,
            spk_params=spk,
            encodec_params=eparams,
            encodec_cfg=ecfg,
            tokenizer=tokenizer,
            enhancer=get_enhancer("spectral_gate"),
        )
        return cls(comps, **kwargs)

    # ------------------------------------------------------------------ warmup
    def warmup(
        self,
        prompt_buckets: tuple[int, ...] = (128, 256),
        vocoder_frame_buckets: tuple[int, ...] = (25, 50, 75, 150, 225, 300),
        guidance_variants: tuple = (3.0, (2.0, 1.5)),
    ) -> None:
        """Precompile the FULL serving envelope so no real request compiles.

        The reference pays a lazy 30-90 s torch.compile warmup inside
        build_model (fam/llm/fast_inference_utils.py:354-390). Here warmup is
        explicit and, combined with the persistent XLA compile cache, a warm
        process start compiles nothing. Coverage (round 3 widened this from
        the 2-bucket prefill + 75-frame vocoder of round 2, which still let
        1-2 s chunks and 3-row-CFG requests compile at request time):

          * first-stage prefill + decode per prompt bucket AND per CFG row
            count (``guidance_variants``: plain speaker CFG and the
            (spk, prompt) double-guidance triple);
          * the second stage (one shape: it always pads to its context);
          * the vocoder at every non-streaming chunk bucket up to
            ``vocoder_frame_buckets[-1]`` frames (the _tokens_to_wav
            bucketing: 1/3 s granularity under 1 s, 1 s above);
          * the streaming fused stage2+vocoder programs.

        tests/test_warmup_coverage.py pins "zero new compiles after warmup"
        via the jax backend_compile monitoring event.
        """
        key = jax.random.PRNGKey(0)
        spk = jnp.zeros((1, self.c.first_stage_cfg.speaker_emb_dim))
        eot = self.c.tokenizer.eot_token
        for bucket in prompt_buckets:
            bucket = min(bucket, self.c.first_stage_cfg.block_size // 2)
            prompt = list(range(T.TEXT_OFFSET, T.TEXT_OFFSET + min(bucket, 16)))
            padded = prompt + [0] * (bucket - len(prompt))
            for g in guidance_variants:
                # default end_of_audio_token: static args must match serving
                # or the decode program recompiles on the first real request
                seq = fs.generate(
                    self.c.first_stage_params,
                    self.c.first_stage_cfg,
                    padded,
                    spk,
                    key=key,
                    max_new_tokens=4,
                    guidance_scale=g,
                    end_of_text_token=eot,
                    prompt_pad_multiple=bucket,
                    kv_cache=self._persistent_kv_cache(g),
                    compute_dtype=self._compute_dtype,
                    cache_dtype=self._cache_dtype,
                    blocks_fn=self._blocks_fn,
                )
                del seq
                if self._draft_params is not None:
                    # speculative path: one spec program per (gamma,
                    # cfg_rows) — the draft scan + the T=gamma verify over
                    # the full static cache prefix — plus the draft's
                    # prefill at this prompt bucket
                    from metavoice_tpu.models import spec_decode as sd_mod

                    sd_mod.generate_spec(
                        self.c.first_stage_params,
                        self.c.first_stage_cfg,
                        self._draft_params,
                        self._draft_cfg,
                        padded,
                        spk,
                        key=key,
                        gamma=self._spec_gamma,
                        max_new_tokens=self._spec_gamma + 1,
                        guidance_scale=g,
                        end_of_text_token=eot,
                        prompt_pad_multiple=bucket,
                        compute_dtype=self._compute_dtype,
                        draft_use_cfg=self._draft_use_cfg,
                    )
        # second stage (single shape — it pads to its full context)
        coarse = [[1, 2, 3, 4], [5, 6, 7, 8]]
        codes = ss.complete_hierarchies(
            self.c.second_stage_params,
            self.c.second_stage_cfg,
            prompt,
            coarse,
            spk[0],
            key=key,
            compute_dtype=self._compute_dtype,
        )
        # vocoder at every non-streaming bucket in the envelope
        codes = np.asarray(codes)
        for bucket in vocoder_frame_buckets:
            if codes.shape[1] > bucket:
                continue
            padded_codes = np.pad(codes, ((0, 0), (0, bucket - codes.shape[1])))
            np.asarray(
                ec.decode_codes(
                    self.c.encodec_params, self.c.encodec_cfg,
                    jnp.asarray(padded_codes),
                )
            )
        # and the streaming fused stage2+vocoder programs
        if self.c.vocoder == "encodec":
            for n_audio in (4, 30, 75):
                np.asarray(
                    self._stage2_vocode_fused(
                        prompt, [list(range(n_audio)), list(range(n_audio))],
                        np.asarray(spk[0]), key,
                    )
                )

    # ------------------------------------------------------------------ speaker embedding
    def _get_speaker_embedding(self, spk_ref_path: str) -> np.ndarray:
        """md5-cached speaker embedding (reference fam/llm/inference.py:419-435)."""
        with open(spk_ref_path, "rb") as f:
            cache_key = hashlib.md5(f.read(1 << 20)).hexdigest() + f":{os.path.getsize(spk_ref_path)}"
        if cache_key in self._emb_cache:
            self._emb_cache.move_to_end(cache_key)
            return self._emb_cache[cache_key]
        wav, _ = aio.load_audio(spk_ref_path, target_sr=se.SAMPLING_RATE)
        wav = se.trim_silence(wav, top_db=20.0)
        emb = se.embed_utterance(self.c.spk_params, wav)
        self._emb_cache[cache_key] = emb
        while len(self._emb_cache) > self._emb_cache_max:
            self._emb_cache.popitem(last=False)
        return emb

    # ------------------------------------------------------------------ token utilities
    def get_tokens(self, audio_path: str) -> list[list[int]]:
        """EnCodec-tokenize an audio file (reference fam/llm/decoders.py:49-64).

        Useful for reconstruction experiments: limited-codebook decoding or
        sampling from the second stage only. Returns the (n_q, T) code grid
        as nested lists, codebook-major — the reference's ``get_tokens``.
        """
        wav, _ = aio.load_audio(
            audio_path, target_sr=self.c.encodec_cfg.sample_rate
        )
        hop = self.c.encodec_cfg.hop_length
        if len(wav) >= hop:  # trim to a whole number of frames
            wav = wav[: len(wav) // hop * hop]
        codes = ec.encode_codes(
            self.c.encodec_params, self.c.encodec_cfg, jnp.asarray(wav)[None]
        )
        return np.asarray(codes)[0].tolist()

    # ------------------------------------------------------------------ synthesis
    def _tokens_to_wav(
        self,
        text: str,
        prompt_tokens: list,
        token_stream,
        spk_emb: np.ndarray,
        key: jax.Array,
        fused: bool = False,
        streaming_segment: bool = False,
    ) -> np.ndarray:
        """First-stage token stream -> waveform (stages 3-5: split, second
        stage, vocoder, enhancer).

        ``fused=True`` (the streaming path) runs stage 2 + the EnCodec
        vocoder as ONE jitted program — one host round-trip instead of two,
        which is the dominant cost of short segments on the tunneled
        backend. Only taken for short buckets (<= 75 frames) with the
        encodec vocoder; everything else falls through to the two-call path.
        """
        _text_ids, coarse = T.split_flattened_interleaved(
            token_stream, self.END_OF_AUDIO_TOKEN
        )
        if len(coarse[0]) == 0:
            raise RuntimeError(f"first stage produced no audio tokens for: {text!r}")

        if fused and self.c.vocoder == "encodec":
            with phases.phase("tts.stage2_vocode_fused"):
                wav = self._stage2_vocode_fused(prompt_tokens, coarse, spk_emb, key)
            if wav is not None:
                if self.c.enhancer is not None:
                    with phases.phase("tts.enhancer"):
                        wav = self.c.enhancer(wav, self.c.encodec_cfg.sample_rate)
                return wav.astype(np.float32)

        with phases.phase("tts.stage2"):
            full_codes = ss.complete_hierarchies(
                self.c.second_stage_params,
                self.c.second_stage_cfg,
                prompt_tokens,
                coarse,
                jnp.asarray(spk_emb),
                key=key,
                temperature=1.0,
                top_k=200,
                compute_dtype=self._compute_dtype,
            )  # (8, T_audio)

        # bucket the code length so the vocoder compiles once per bucket,
        # not once per utterance length: 1/3 s granularity under 1 s (the
        # streaming FIRST segment is ~0.27 s — decoding a full 75-frame
        # bucket for it measured 139 ms of a 385 ms TTFA), 1 s above
        t_audio = full_codes.shape[1]
        if t_audio <= 75:
            bucket = max(25, -(-t_audio // 25) * 25)
        else:
            bucket = -(-t_audio // 75) * 75
        if bucket != t_audio:
            full_codes = np.pad(full_codes, ((0, 0), (0, bucket - t_audio)))
        if self.c.vocoder == "mbd" and self.c.mbd_params is not None:
            from metavoice_tpu.models import mbd as mbd_mod

            kv_key = self._next_key()
            with phases.phase("tts.vocoder_mbd"):
                wav = np.asarray(
                    mbd_mod.tokens_to_wav(
                        self.c.mbd_params, self.c.mbd_cfg, self.c.encodec_params,
                        jnp.asarray(full_codes), kv_key,
                        encodec_cfg=self.c.encodec_cfg,
                    )
                )[0]
            # reference decoders.py:88-91 rejects MBD output < 9600 samples
            # (400 ms @ 24 kHz) as degenerate, pre-trim — mirror that here.
            # Streaming SEGMENTS are legitimately short (a first segment is
            # ~0.27 s by design); the guard is about whole utterances.
            if not streaming_segment and wav.shape[-1] < (
                self._min_output_s * self.c.encodec_cfg.sample_rate
            ):
                raise RuntimeError("wav predicted is shorter than 400ms!")
        else:
            with phases.phase("tts.vocoder"):
                wav = np.asarray(
                    ec.decode_codes(self.c.encodec_params, self.c.encodec_cfg, full_codes)
                )[0]
        wav = wav[: t_audio * self.c.encodec_cfg.hop_length]
        if self.c.enhancer is not None:
            with phases.phase("tts.enhancer"):
                wav = self.c.enhancer(wav, self.c.encodec_cfg.sample_rate)
        return wav.astype(np.float32)

    def _stage2_vocode_fused(
        self, prompt_tokens: list, coarse: list, spk_emb: np.ndarray, key: jax.Array
    ) -> np.ndarray | None:
        """Stage 2 + EnCodec decode in one jit; None if out of fused range."""
        ctx = self.c.second_stage_cfg.block_size
        n_text = len(prompt_tokens)
        n_audio = min(len(coarse[0]), ctx - n_text)
        if n_audio <= 0 or n_audio > 75:
            return None
        bucket = 25 if n_audio <= 25 else (50 if n_audio <= 50 else 75)
        x = T.build_second_stage_input(prompt_tokens, coarse, ctx)
        coarse_pad = np.zeros((2, bucket), np.int32)
        coarse_pad[0, :n_audio] = np.asarray(coarse[0][:n_audio])
        coarse_pad[1, :n_audio] = np.asarray(coarse[1][:n_audio])
        wav = _stage2_vocode_jit(
            self.c.second_stage_params,
            self.c.encodec_params,
            self.c.second_stage_cfg,
            self.c.encodec_cfg,
            jnp.asarray(x, jnp.int32)[None],
            jnp.asarray(spk_emb).reshape(1, -1),
            key,
            jnp.asarray(n_text, jnp.int32),
            jnp.asarray(n_audio, jnp.int32),
            jnp.asarray(coarse_pad),
            bucket=bucket,
            compute_dtype=self._compute_dtype,
        )
        wav = np.asarray(wav).reshape(-1)
        return wav[: n_audio * self.c.encodec_cfg.hop_length]

    def render_tokens(
        self, text: str, prompt_tokens: list, generated, spk_emb: np.ndarray
    ) -> str:
        """Render a generated first-stage stream to a wav file on disk."""
        sub = self._next_key()
        wav = self._tokens_to_wav(text, prompt_tokens, generated, spk_emb, sub)
        return self.write_wav_output(text, wav)

    def write_wav_output(self, text: str, wav: np.ndarray) -> str:
        """Loudness-normalized write to a unique path in output_dir."""
        digest = hashlib.md5(f"{text}{time.time()}".encode()).hexdigest()[:12]
        out_path = os.path.join(self.output_dir, f"synth_{digest}.wav")
        aio.write_wav_loudness_normalized(out_path, wav, self.c.encodec_cfg.sample_rate)
        return out_path

    def _synthesise_chunk(
        self,
        text: str,
        spk_emb: np.ndarray,
        top_p: float,
        guidance_scale: float,
        temperature: float,
        key: jax.Array,
        max_new_tokens: int | None = None,
    ) -> np.ndarray:
        """One <=220-char chunk -> 24 kHz waveform (float32)."""
        k1, k2 = jax.random.split(key)
        with phases.phase("tts.tokenize"):
            prompt = self.c.tokenizer.encode(text)

        if self._draft_params is not None:
            from metavoice_tpu.models import spec_decode as sd

            seq, st = sd.generate_spec(
                self.c.first_stage_params,
                self.c.first_stage_cfg,
                self._draft_params,
                self._draft_cfg,
                prompt,
                jnp.asarray(spk_emb),
                key=k1,
                gamma=self._spec_gamma,
                temperature=temperature,
                top_p=top_p,
                guidance_scale=guidance_scale,
                max_new_tokens=max_new_tokens,
                end_of_text_token=self.c.tokenizer.eot_token,
                prompt_pad_multiple=self.runtime.prompt_pad_multiple,
                compute_dtype=self._compute_dtype,
                return_stats=True,
                draft_use_cfg=self._draft_use_cfg,
            )
            for k, v in st.items():
                self.spec_stats[k] += v
        else:
            seq = fs.generate(
                self.c.first_stage_params,
                self.c.first_stage_cfg,
                prompt,
                jnp.asarray(spk_emb),
                key=k1,
                temperature=temperature,
                top_p=top_p,
                guidance_scale=guidance_scale,
                max_new_tokens=max_new_tokens,
                end_of_text_token=self.c.tokenizer.eot_token,
                prompt_pad_multiple=self.runtime.prompt_pad_multiple,
                kv_cache=self._persistent_kv_cache(guidance_scale),
                compute_dtype=self._compute_dtype,
                cache_dtype=self._cache_dtype,
                blocks_fn=self._blocks_fn,
            )
        return self._tokens_to_wav(text, prompt, seq, spk_emb, k2)

    def synthesise_streaming(
        self,
        text: str,
        spk_ref_path: str,
        top_p: float = 0.95,
        guidance_scale: float | tuple[float, float] = 3.0,
        temperature: float = 1.0,
        segment_tokens: int = 150,
        first_segment_tokens: int = 40,
    ):
        """Yield 24 kHz waveform chunks as they are synthesised.

        Time-to-first-audio becomes one FIRST-segment latency instead of the
        full utterance's: the first stage pauses at even segment boundaries
        (models/first_stage.generate_segments) and each segment runs through
        the second stage + vocoder + enhancer immediately. The first segment
        is deliberately short (default 40 tokens ~ 1/4 s of audio) to get
        sound out fast; later segments ramp to ``segment_tokens``. The
        reference has no streaming path (its non-streaming TTFA is the full
        synthesis).
        """
        text = normalize_text(text)
        if self._enforce_min_ref:
            aio.check_audio_file(spk_ref_path)
        spk_emb = self._get_speaker_embedding(spk_ref_path)

        for chunk in chunk_text(text, MAX_CHARS_PER_CHUNK) or [""]:
            k1 = self._next_key()
            prompt = self.c.tokenizer.encode(chunk)
            for segment in fs.generate_segments(
                self.c.first_stage_params,
                self.c.first_stage_cfg,
                prompt,
                jnp.asarray(spk_emb),
                key=k1,
                segment_tokens=segment_tokens,
                first_segment_tokens=min(first_segment_tokens, segment_tokens),
                temperature=temperature,
                top_p=top_p,
                guidance_scale=guidance_scale,
                end_of_text_token=self.c.tokenizer.eot_token,
                prompt_pad_multiple=self.runtime.prompt_pad_multiple,
                cache_dtype=self._cache_dtype,
                compute_dtype=self._compute_dtype,
                blocks_fn=self._blocks_fn,
                kv_cache=(
                    self._persistent_kv_cache(guidance_scale)
                    if self._tensor_parallel > 1 else None
                ),
            ):
                k2 = self._next_key()
                try:
                    wav = self._tokens_to_wav(
                        chunk, prompt, segment, spk_emb, k2, fused=True,
                        streaming_segment=True,
                    )
                except RuntimeError:
                    continue  # segment held only the end-of-audio token
                yield wav

    def synthesise(
        self,
        text: str,
        spk_ref_path: str,
        top_p: float = 0.95,
        guidance_scale: float | tuple[float, float] = 3.0,
        temperature: float = 1.0,
        max_new_tokens: int | None = None,
    ) -> str:
        """Synthesise ``text`` in the voice of ``spk_ref_path``.

        Signature and defaults match reference fam/llm/fast_inference.py:111;
        ``max_new_tokens`` caps the per-chunk first-stage budget (the
        reference's inference.py:610 knob, default 864*2 there — None here
        decodes to end-of-audio or the context limit).
        Returns the path to a loudness-normalized 24 kHz wav.
        """
        start = time.time()
        text = normalize_text(text)
        spk_ref_path = aio.get_cached_file(spk_ref_path)
        if self._enforce_min_ref:
            aio.check_audio_file(spk_ref_path)
        with phases.phase("tts.spk_emb"):
            spk_emb = self._get_speaker_embedding(spk_ref_path)

        chunks = chunk_text(text, MAX_CHARS_PER_CHUNK) or [""]
        wavs = []
        for chunk in chunks:
            sub = self._next_key()
            with phases.phase("tts.chunk"):
                wavs.append(
                    self._synthesise_chunk(
                        chunk, spk_emb, top_p, guidance_scale, temperature, sub,
                        max_new_tokens=max_new_tokens,
                    )
                )
        gap = np.zeros(int(0.1 * self.c.encodec_cfg.sample_rate), np.float32)
        wav = wavs[0] if len(wavs) == 1 else np.concatenate(
            [w for pair in zip(wavs, [gap] * len(wavs)) for w in pair][:-1]
        )

        digest = hashlib.md5(f"{text}{spk_ref_path}{time.time()}".encode()).hexdigest()[:12]
        out_path = os.path.join(self.output_dir, f"synth_{digest}.wav")
        with phases.phase("tts.write_wav"):
            aio.write_wav_loudness_normalized(out_path, wav, self.c.encodec_cfg.sample_rate)

        elapsed = time.time() - start
        duration = len(wav) / self.c.encodec_cfg.sample_rate
        rtf = elapsed / max(duration, 1e-6)
        print(f"Total time to synth (s): {elapsed:.2f}")
        print(f"Real-time factor: {rtf:.2f}")

        # user_ran_tts event, reference fast_inference.py:173-193
        from metavoice_tpu.telemetry import TelemetryEvent

        self._telemetry.capture(
            TelemetryEvent(
                name="user_ran_tts",
                properties={
                    "model_name": "metavoice-1B-tpu",
                    "text": text,
                    "temperature": temperature,
                    "guidance_scale": guidance_scale,
                    "top_p": top_p,
                    "spk_ref_path": spk_ref_path,
                    "speech_duration_s": duration,
                    "time_to_synth_s": elapsed,
                    "real_time_factor": round(rtf, 2),
                    "quantisation_mode": self.runtime.quantisation_mode,
                    "seed": self.runtime.seed,
                    "device": str(jax.devices()[0]),
                    "telemetry_origin": self._telemetry_origin,
                },
            )
        )
        return out_path

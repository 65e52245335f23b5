"""Continuous-batching synthesis engine: mid-flight joins, per-slot streaming.

The reference serves one request at a time through a global lock
(serving.py:46-51). Round 2 shipped a batch-collect engine (a 30 ms window,
then the whole group decoded to completion) — a request arriving 50 ms late
waited a full group decode (~0.5-2 s head-of-line blocking). This rebuild is
TRUE continuous batching, targeted at BASELINE config 5 (8-16 concurrent
zero-shot-cloning requests with continuous decode):

  * a fixed SLOT POOL decodes in lockstep through one shared KV cache, in
    short SEGMENTS (default 64 tokens ≈ 0.43 s of audio);
  * between segments the worker admits queued requests into free slots —
    joining mid-flight via `first_stage.merge_slot_cache`: the new prompt is
    prefilled into a 2-row temp cache and its rows are copied into the big
    cache so the prompt ends at the group's current physical position. Rows
    keep their own logical timelines (wpe positions are `pos - pad_len` per
    row), so a join is numerically identical to a fresh decode;
  * rows that hit end-of-audio free their slot at the next boundary and
    their render (stage 2 + vocoder + write) runs on a side thread while the
    group keeps decoding;
  * STREAMING requests ride the same batch: their new tokens fan out to the
    fused stage2+vocoder each segment and stream out as wav chunks, instead
    of bypassing the batcher entirely (round 2 serialized streams on a lock);
  * an empty queue costs nothing: the worker blocks on the queue when idle —
    no batching-window tax on solo requests.

Sampling params stay per-row traced vectors, so mixed-settings groups share
one compiled program.
"""

from __future__ import annotations

import queue
import threading
import time
from collections import deque
from concurrent.futures import Future, ThreadPoolExecutor
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from metavoice_tpu.core import tokens as T
from metavoice_tpu.models import first_stage as fs
from metavoice_tpu.models import transformer as tfm
from metavoice_tpu.utils import phases


@jax.jit
def _set_at(cur, idx, val):
    """cur.at[idx].set(val) with a TRACED index: one compiled program for
    every slot, instead of one eager .at[i].set program per Python int."""
    return cur.at[idx].set(val)


class StreamHandle:
    """Iterator over wav segments of a streaming request.

    Yields float32 24 kHz arrays as decode progresses; raises the request's
    error (if any) from __next__. Obtained from ``submit(..., stream=True)``.
    """

    def __init__(self):
        self._q: "queue.Queue[np.ndarray | None | Exception]" = queue.Queue()
        self._closed = False

    def close(self):
        """Abandon the stream (e.g. client disconnected): the engine frees
        the slot at the next segment boundary and stops rendering."""
        self._closed = True

    def __iter__(self):
        return self

    def __next__(self) -> np.ndarray:
        item = self._q.get()
        if item is None:
            raise StopIteration
        if isinstance(item, Exception):
            raise item
        return item

    # engine-side
    def _push(self, wav: np.ndarray):
        self._q.put(wav)

    def _finish(self, error: Exception | None = None):
        if error is not None:
            self._q.put(error)
        self._q.put(None)


@dataclass
class SynthesisRequest:
    text: str
    prompt_tokens: list
    spk_emb: np.ndarray
    top_p: float = 0.95
    guidance_scale: float = 3.0
    temperature: float = 1.0
    max_new_tokens: int | None = None  # per-request budget (truncates at a
    # segment boundary; reference inference.py:610 max_new_tokens)
    stream: bool = False
    future: Future = field(default_factory=Future)
    handle: StreamHandle | None = None


@dataclass
class _Slot:
    req: SynthesisRequest | None = None
    tokens: list = field(default_factory=list)  # generated audio tokens (no EOA)
    rendered: int = 0  # tokens already sent through the streaming vocoder
    # streaming renders are CHAINED per request on the render pool so
    # segments stay ordered while the worker thread keeps decoding; chunks
    # queue in `pending` and each chain task drains ALL of it in one render,
    # so a backlog coalesces into fewer, larger renders (self-pacing under
    # more streams than the pool keeps up with) instead of growing unboundedly
    render_chain: Future | None = None
    pending: deque = field(default_factory=deque)
    lock: threading.Lock = field(default_factory=threading.Lock)

    @property
    def free(self) -> bool:
        return self.req is None


class ContinuousBatchingEngine:
    """Slot-pool continuous-batching engine around a TTS instance.

    ``submit`` returns a Future resolving to the output wav path, or (with
    ``stream=True``) a StreamHandle yielding wav segments. Requests join the
    running batch at the next segment boundary (~``segment_tokens`` decode
    steps away at most) instead of waiting for the previous batch to finish.
    """

    def __init__(
        self,
        tts,
        slots: int | str = 8,
        segment_tokens: int = 64,
        pad_multiple: int = 128,
        min_decode_budget: int = 64,
        rebase_margin: int | None = None,
    ):
        if slots == "auto":
            slots = self._auto_slots(tts)
        if segment_tokens % 2 != 0:
            raise ValueError("segment_tokens must be even (whole frames)")
        if getattr(tts, "_tensor_parallel", 1) > 1:
            # the engine's batched ragged decode (generate_batch/join/rebase)
            # is single-device; TP serving scales throughput via DP replicas
            # (one engine per replica) and latency via tensor_parallel on
            # the direct synthesise path
            raise ValueError(
                "the batching engine does not support tensor_parallel TTS "
                "instances; use tensor_parallel for the direct synthesise "
                "path and data-parallel replicas for batched serving"
            )
        if tts._cache_dtype == "int8_packed" and pad_multiple % 4 != 0:
            # join buckets size the temp packed cache; reject at construction
            # rather than failing the whole group at the first join
            raise ValueError(
                "pad_multiple must be a multiple of 4 with the packed int8 "
                f"KV cache (got {pad_multiple})"
            )
        self.tts = tts
        self.n_slots = slots
        # rebase when within this many positions of block_size (None: 1/4 of
        # the block — 512 at the production block of 2048)
        self.rebase_margin = (
            rebase_margin
            if rebase_margin is not None
            else tts.c.first_stage_cfg.block_size // 4
        )
        self.segment_tokens = segment_tokens
        self.pad_multiple = pad_multiple
        self.min_decode_budget = min_decode_budget
        c = tts.c
        self._cfg = c.first_stage_cfg
        self._block = self._cfg.block_size
        self._cache_dtype = tts._cache_dtype or tts._compute_dtype
        self._kv = tfm.KVCache.create(
            self._cfg, 2 * slots, self._block, dtype=self._cache_dtype
        )
        self._pos = 0
        self._group_active = False
        # per-slot host state
        self._slots = [_Slot() for _ in range(slots)]
        self._cur = np.full((slots,), T.END_OF_AUDIO_TOKEN, np.int32)
        self._pad = np.zeros((slots,), np.int32)
        self._spk = np.zeros((slots, self._cfg.speaker_emb_dim), np.float32)
        self._t = np.ones((slots, 1), np.float32)
        self._p = np.full((slots, 1), 0.95, np.float32)
        self._g = np.full((slots, 1), 3.0, np.float32)
        self._key = jax.random.PRNGKey(tts.runtime.seed + 1)
        # joins stash their first sampled token as a DEVICE array here; it is
        # composed into `cur` on device and fetched WITH the next segment's
        # fetch. A synchronous int(np.asarray(first)) at join time drains the
        # whole serialized device queue (in-flight renders + decode) inside
        # the worker loop — measured 1.1 s per join, 65% of the mixed-Poisson
        # wall (round 4, scripts/bench_serving.py phase report).
        self._pending_first: dict[int, jax.Array] = {}
        self._queue: "queue.Queue[SynthesisRequest | None]" = queue.Queue()
        self._deferred: list[SynthesisRequest] = []
        # scheduling observability (read by /metrics and the serving bench):
        # segments/row_tokens expose slot occupancy (row_tokens / (segments *
        # n_slots * segment_tokens) = fraction of decoded rows doing real work)
        self.stats = {
            "rebases": 0, "reclaimed_positions": 0, "truncations": 0,
            "segments": 0, "row_tokens": 0, "joins": 0,
        }
        self._render_pool = ThreadPoolExecutor(max_workers=2)
        self._running = True
        self._thread = threading.Thread(target=self._worker, daemon=True)
        self._thread.start()

    @staticmethod
    def _auto_slots(tts, cap_at: int = 32) -> int:
        """Size the slot pool from the exact HBM plan (utils/capacity.py).

        Detects the weight quantisation from the loaded param leaves and the
        cache dtype from the TTS runtime, then takes the largest slot count
        whose weights+cache plan fits the chip — capped at ``cap_at`` (2x the
        measured batch-16 sweet spot; beyond it the chunk loop's per-row
        overhead, not memory, is the binding constraint).
        """
        from metavoice_tpu.utils import capacity as cap

        qmode = None
        for v in tts.c.first_stage_params.get("layers", {}).values():
            if isinstance(v, dict):
                if "pw" in v:
                    qmode = "int4"
                elif "p8" in v:
                    qmode = "int8"
                elif "q" in v and "zeros" not in v:
                    qmode = "int8_plain"
                break
        kvd = tts._cache_dtype
        kvd = "int8" if kvd == jnp.int8 else kvd  # "int8_packed" | None pass through
        n = cap.max_slots(
            tts.c.first_stage_cfg, quantisation_mode=qmode, kv_cache_dtype=kvd,
            limit=cap_at,
        )
        return max(1, n)

    # ------------------------------------------------------------------ API
    @property
    def load(self) -> int:
        """Queued + in-flight request count (replica-pool dispatch signal).

        Racy by design — a point-in-time scheduling hint, not an invariant.
        """
        busy = sum(1 for s in self._slots if not s.free)
        return self._queue.qsize() + len(self._deferred) + busy

    def submit(self, text: str, spk_ref_path: str, *, stream: bool = False, **sampling):
        from metavoice_tpu.core.text import normalize_text
        from metavoice_tpu.utils.audio_io import get_cached_file

        text = normalize_text(text)
        spk_ref_path = get_cached_file(spk_ref_path)
        spk_emb = self.tts._get_speaker_embedding(spk_ref_path)
        req = SynthesisRequest(
            text=text,
            prompt_tokens=self.tts.c.tokenizer.encode(text),
            spk_emb=np.asarray(spk_emb).reshape(-1),
            stream=stream,
            **sampling,
        )
        if stream:
            req.handle = StreamHandle()
        self._queue.put(req)
        return req.handle if stream else req.future

    def warmup(self, prompt_buckets: tuple[int, ...] = (128, 256), warm_tts: bool = True):
        """Precompile the engine's FULL program envelope before serving.

        TTS.warmup() covers only the single-request path; the engine runs its
        own programs — n_slots-row group prefill per prompt bucket, the
        segment decode, the mid-flight join (1-row temp prefill + cache
        landing), and the rebase shifts. Without this, a production
        ``serve --batching`` boot compiles on the first real request
        (minutes on this TPU). Counterpart of the lazy warmup the reference
        pays inside build_model (fam/llm/fast_inference_utils.py:374-390).

        Must run BEFORE serving traffic: it drives the shared KV cache
        through the real (donating) programs and then resets the group state.
        ``warm_tts`` also runs TTS.warmup() for the render-path programs
        (stage 2, vocoder buckets, fused streaming renders).
        """
        if self._actives():
            raise RuntimeError("engine warmup must run before serving traffic")
        if warm_tts:
            self.tts.warmup()
        c, cfg = self.tts.c, self._cfg
        key = jax.random.PRNGKey(0)
        cdt = self.tts._compute_dtype
        prompt = [T.TEXT_OFFSET, T.TEXT_OFFSET + 1]
        t, p, g = jnp.asarray(self._t), jnp.asarray(self._p), jnp.asarray(self._g)
        spk = jnp.asarray(self._spk)
        for b in dict.fromkeys(self._bucket(x) for x in prompt_buckets):
            # group prefill: the n_slots-row program at this bucket
            padded, lens = fs.left_pad_prompts([prompt] * self.n_slots, b)
            first, self._kv = fs.prefill_batch(
                c.first_stage_params, cfg, jnp.asarray(padded), jnp.asarray(lens),
                spk, self._kv, key, t, p, g, compute_dtype=cdt,
            )
            np.asarray(first)
            self._pos = b
            # mid-flight join: 1-row temp prefill + the cache-landing merges
            temp = tfm.KVCache.create(cfg, 2, b, dtype=self._cache_dtype)
            padded1, lens1 = fs.left_pad_prompts([prompt], b)
            f1, temp = fs.prefill_batch(
                c.first_stage_params, cfg, jnp.asarray(padded1), jnp.asarray(lens1),
                jnp.asarray(self._spk[0])[None, :],  # exact _join expression
                temp, key, t[:1], p[:1], g[:1], compute_dtype=cdt,
            )
            np.asarray(f1)
            phys = jnp.asarray(0, jnp.int32)
            rc = jnp.asarray(0, jnp.int32)
            ru = jnp.asarray(self.n_slots, jnp.int32)
            if self._kv.packed:
                k, v = fs.merge_slot_cache_packed(
                    self._kv.k, self._kv.v, temp.k, temp.v, phys, rc, ru
                )
                ks, vs = fs.merge_slot_scales_packed(
                    self._kv.k_scale, self._kv.v_scale,
                    temp.k_scale, temp.v_scale, phys, rc, ru, cfg.n_local_heads,
                )
            else:
                k, v = fs.merge_slot_cache(
                    self._kv.k, self._kv.v, temp.k, temp.v, phys, rc, ru
                )
                if self._kv.quantized:
                    ks, vs = fs.merge_slot_scales(
                        self._kv.k_scale, self._kv.v_scale,
                        temp.k_scale, temp.v_scale, phys, rc, ru, cfg.n_local_heads,
                    )
                else:
                    ks = vs = None
            self._kv = tfm.KVCache(k=k, v=v, k_scale=ks, v_scale=vs)
        # segment decode (one program: seg is a traced operand), fetched with
        # the exact _step_segment expression so its eager concat/reshape ops
        # are warmed too — including the join first-token compose (_set_at)
        cur_w = _set_at(
            jnp.asarray(self._cur), 0, jnp.asarray(f1).reshape(-1)[0]
        )
        _buf, lens_d, self._kv = fs.decode_batch(
            c.first_stage_params, cfg, cur_w,
            jnp.asarray(self._pos, jnp.int32), jnp.asarray(self._pad), spk,
            self._kv, key, t, p, g, jnp.asarray(2, jnp.int32),
            self.segment_tokens, T.END_OF_AUDIO_TOKEN, cdt,
        )
        np.asarray(
            jnp.concatenate(
                [
                    cur_w.reshape(-1, 1).astype(jnp.int32),
                    lens_d.reshape(-1, 1).astype(jnp.int32),
                    _buf.astype(jnp.int32),
                ],
                axis=1,
            )
        )
        # rebase shifts (value-independent programs)
        sj = jnp.asarray(fs.REBASE_ALIGN, jnp.int32)
        pj = jnp.asarray(self._pos, jnp.int32)
        if self._kv.packed:
            k, v = fs.shift_cache_left_packed(self._kv.k, self._kv.v, sj, pj)
            ks, vs = fs.shift_scales_left_packed(
                self._kv.k_scale, self._kv.v_scale, sj, pj
            )
        elif self._kv.quantized:
            k, v = fs.shift_cache_left(self._kv.k, self._kv.v, sj, pj)
            ks, vs = fs.shift_scales_left(self._kv.k_scale, self._kv.v_scale, sj, pj)
        else:
            k, v = fs.shift_cache_left(self._kv.k, self._kv.v, sj, pj)
            ks = vs = None
        self._kv = tfm.KVCache(k=k, v=v, k_scale=ks, v_scale=vs)
        np.asarray(k.ravel()[:1])  # flush before state reset
        # reset group state: the next real group prefills from position 0
        self._pos = 0
        self._cur[:] = T.END_OF_AUDIO_TOKEN
        self._pad[:] = 0

    def shutdown(self):
        self._running = False
        self._queue.put(None)
        self._thread.join(timeout=10)
        # fail anything still in flight or queued so no caller blocks forever
        err = RuntimeError("engine shut down")
        for i, s in enumerate(self._slots):
            if not s.free:
                self._fail(i, err)
        for req in self._deferred:
            self._fail_request(req, err)
        self._deferred = []
        while True:
            try:
                req = self._queue.get_nowait()
            except queue.Empty:
                break
            if req is not None:
                self._fail_request(req, err)
        self._render_pool.shutdown(wait=False)

    # ------------------------------------------------------------------ worker
    def _actives(self) -> list[int]:
        return [i for i, s in enumerate(self._slots) if not s.free]

    def _worker(self):
        while self._running:
            try:
                if not self._actives():
                    if self._deferred:
                        # requests deferred from the last group (e.g. a
                        # prompt too long to join mid-flight) must not wait
                        # for an unrelated submit to wake the worker
                        self._start_group(self._drain_queue())
                    else:
                        # idle: block on the queue (no polling, no window tax)
                        req = self._queue.get()
                        if req is None:
                            if not self._running:
                                return
                            continue
                        self._start_group(self._drain_queue(first=req))
                else:
                    self._admit_joins()
                    self._step_segment()
            except Exception as e:
                # failure anywhere (prefill, join, decode): fail every
                # in-flight request and rebuild the cache — prefill/decode
                # DONATE it, so after an aborted call the old buffers must
                # not be reused. The worker thread itself must survive.
                self._pending_first.clear()
                for i in self._actives():
                    self._fail(i, e)
                # rebuild ON THE SAME DEVICE: replica engines hold a
                # device_put-committed cache (runtime/replicas.py) and an
                # uncommitted rebuild would drift to device 0. Read the
                # device via .sharding — .devices() raises on a cache the
                # failed call already DONATED (deleted buffers), which
                # would kill this worker inside its own recovery handler.
                # Create under default_device(dev) so the zeros never
                # transit device 0 (a transient full-cache double
                # allocation there could OOM the healthy replica).
                dev = next(iter(self._kv.k.sharding.device_set))
                with jax.default_device(dev):
                    fresh = tfm.KVCache.create(
                        self._cfg, 2 * self.n_slots, self._block,
                        dtype=self._cache_dtype,
                    )
                self._kv = jax.device_put(fresh, dev)
                self._pos = 0
            if not self._running:
                return

    def _drain_queue(self, first=None) -> list[SynthesisRequest]:
        out = ([first] if first is not None else []) + self._deferred
        self._deferred = []
        while len(out) < self.n_slots:
            try:
                nxt = self._queue.get_nowait()
            except queue.Empty:
                break
            if nxt is None:
                self._queue.put(None)
                break
            out.append(nxt)
        return out

    # ------------------------------------------------------------------ group start
    def _bucket(self, n: int) -> int:
        b = max(self.pad_multiple, -(-n // self.pad_multiple) * self.pad_multiple)
        # cap so a group always keeps decode budget (over-long prompts are
        # left-truncated to the bucket, reference inference.py:534-541 spirit)
        cap = max(
            self.pad_multiple,
            (self._block - self.min_decode_budget) // self.pad_multiple * self.pad_multiple,
        )
        return min(b, cap)

    def _start_group(self, reqs: list[SynthesisRequest]):
        """Fresh group at physical position 0: one batched ragged prefill."""
        c = self.tts.c
        overflow = reqs[self.n_slots :]
        reqs = reqs[: self.n_slots]
        self._deferred.extend(overflow)
        bucket = self._bucket(max(len(r.prompt_tokens) for r in reqs))
        prompts = []
        for i in range(self.n_slots):
            if i < len(reqs):
                r = reqs[i]
                self._slots[i] = _Slot(req=r)
                self._spk[i] = r.spk_emb
                self._t[i, 0] = r.temperature
                self._p[i, 0] = r.top_p
                self._g[i, 0] = r.guidance_scale
                prompts.append(r.prompt_tokens[-bucket:])
            else:
                self._slots[i] = _Slot()
                prompts.append([0])
        padded, pad_lens = fs.left_pad_prompts(prompts, bucket)
        self._key, kp = jax.random.split(self._key)
        with phases.phase("eng.group_prefill"):
            first, self._kv = fs.prefill_batch(
                c.first_stage_params, self._cfg,
                jnp.asarray(padded), jnp.asarray(pad_lens),
                jnp.asarray(self._spk), self._kv, kp,
                jnp.asarray(self._t), jnp.asarray(self._p), jnp.asarray(self._g),
                compute_dtype=self.tts._compute_dtype,
            )
            first = np.asarray(first)
        self._pos = bucket
        self._pad = np.asarray(pad_lens, np.int32).copy()
        for i in range(self.n_slots):
            if i < len(reqs):
                self._cur[i] = first[i]
                self._note_tokens(i, [int(first[i])])
            else:
                self._cur[i] = T.END_OF_AUDIO_TOKEN

    # ------------------------------------------------------------------ rebase
    def _maybe_rebase(self):
        """Reclaim the dead cache prefix when the timeline nears block_size.

        Every active row's valid window is [pad, pos); once the oldest
        active window start s = min(pad) is far from the origin (rows that
        started the group have retired), slide the whole cache left by s:
        admissions reopen and late joiners regain decode budget instead of
        being truncated at min_decode_budget tokens. A rebased decode is
        bit-identical to an unrebased one (window contents, logical
        positions pos-pad, and the key sequence are invariant) — pinned by
        tests/test_engine.py::test_rebase_matches_unrebased_decode.
        """
        if self._pos < self._block - self.rebase_margin:
            return
        actives = self._actives()
        if not actives:
            return
        s = int(min(self._pad[i] for i in actives))
        s = (s // fs.REBASE_ALIGN) * fs.REBASE_ALIGN  # shift must be aligned
        if s <= 0:
            return  # nothing meaningful to reclaim
        sj = jnp.asarray(s, jnp.int32)
        pj = jnp.asarray(self._pos, jnp.int32)
        _t0 = time.perf_counter() if phases.enabled() else 0.0
        if self._kv.packed:
            # REBASE_ALIGN (128) is a multiple of 4, so the shift moves whole
            # words and every byte lane stays in place (bit-exact, like the
            # unpacked shift)
            k, v = fs.shift_cache_left_packed(self._kv.k, self._kv.v, sj, pj)
            ks, vs = fs.shift_scales_left_packed(
                self._kv.k_scale, self._kv.v_scale, sj, pj
            )
        elif self._kv.quantized:
            k, v = fs.shift_cache_left(self._kv.k, self._kv.v, sj, pj)
            ks, vs = fs.shift_scales_left(
                self._kv.k_scale, self._kv.v_scale, sj, pj
            )
        else:
            k, v = fs.shift_cache_left(self._kv.k, self._kv.v, sj, pj)
            ks = vs = None
        self._kv = tfm.KVCache(k=k, v=v, k_scale=ks, v_scale=vs)
        if phases.enabled():
            phases.sync(self._kv.k)
            phases.add("eng.rebase", time.perf_counter() - _t0)
        self._pos -= s
        self._pad = np.maximum(self._pad - s, 0)
        self.stats["rebases"] += 1
        self.stats["reclaimed_positions"] += s

    # ------------------------------------------------------------------ joining
    def _admit_joins(self):
        self._maybe_rebase()
        if self._pos >= self._block - self.min_decode_budget:
            return  # group near the block limit: no more admissions
        free = [i for i, s in enumerate(self._slots) if s.free]
        if not free:
            return
        for req in self._drain_queue():
            if not free:
                self._deferred.append(req)
                continue
            bucket = self._bucket(len(req.prompt_tokens))
            if bucket > self._pos:
                # prompt longer than the elapsed physical timeline: it cannot
                # be left-aligned into this group yet — defer (admitted a few
                # segments later, or into the next fresh group)
                self._deferred.append(req)
                continue
            self._join(free.pop(0), req, bucket)

    def _join(self, slot: int, req: SynthesisRequest, bucket: int):
        """Prefill into a temp cache, then land the rows at [P-bucket, P)."""
        with phases.phase("eng.join"):
            self._join_inner(slot, req, bucket)
        self.stats["joins"] += 1

    def _join_inner(self, slot: int, req: SynthesisRequest, bucket: int):
        c = self.tts.c
        quantized = self._kv.quantized
        # the slot's sampling params must be the JOINER's before its first
        # token is sampled in prefill (a previous occupant's temperature /
        # guidance must not leak into the new request's first sample)
        self._t[slot, 0] = req.temperature
        self._p[slot, 0] = req.top_p
        self._g[slot, 0] = req.guidance_scale
        temp = tfm.KVCache.create(self._cfg, 2, bucket, dtype=self._cache_dtype)
        padded, pad_lens = fs.left_pad_prompts([req.prompt_tokens[-bucket:]], bucket)
        self._key, kp = jax.random.split(self._key)
        first, temp = fs.prefill_batch(
            c.first_stage_params, self._cfg,
            jnp.asarray(padded), jnp.asarray(pad_lens),
            jnp.asarray(req.spk_emb)[None, :], temp, kp,
            jnp.asarray(self._t[slot : slot + 1]),
            jnp.asarray(self._p[slot : slot + 1]),
            jnp.asarray(self._g[slot : slot + 1]),
            compute_dtype=self.tts._compute_dtype,
        )
        phys_start = jnp.asarray(self._pos - bucket, jnp.int32)
        row_c = jnp.asarray(slot, jnp.int32)
        row_u = jnp.asarray(self.n_slots + slot, jnp.int32)
        if self._kv.packed:
            # packed int8 cache: byte-granular landing (any alignment)
            k, v = fs.merge_slot_cache_packed(
                self._kv.k, self._kv.v, temp.k, temp.v, phys_start, row_c, row_u
            )
            ks, vs = fs.merge_slot_scales_packed(
                self._kv.k_scale, self._kv.v_scale,
                temp.k_scale, temp.v_scale,
                phys_start, row_c, row_u, self._cfg.n_local_heads,
            )
        else:
            k, v = fs.merge_slot_cache(
                self._kv.k, self._kv.v, temp.k, temp.v, phys_start, row_c, row_u
            )
            if quantized:
                ks, vs = fs.merge_slot_scales(
                    self._kv.k_scale, self._kv.v_scale,
                    temp.k_scale, temp.v_scale,
                    phys_start, row_c, row_u, self._cfg.n_local_heads,
                )
            else:
                ks = vs = None
        self._kv = tfm.KVCache(k=k, v=v, k_scale=ks, v_scale=vs)
        phases.sync(self._kv.k)  # attribute the merge's device time here
        self._slots[slot] = _Slot(req=req)
        self._spk[slot] = req.spk_emb
        # window start = P - len(prompt): logical positions continue the
        # prompt's own timeline (decode embeds wpe[pos - pad])
        self._pad[slot] = self._pos - min(len(req.prompt_tokens), bucket)
        # NO host fetch here: stash the device array; _step_segment composes
        # it into `cur` on device and notes the token after its own fetch
        self._pending_first[slot] = first.reshape(-1)

    # ------------------------------------------------------------------ decode segment
    def _step_segment(self):
        c = self.tts.c
        if self._pos >= self._block:
            # physical timeline exhausted: truncate whatever is still active
            # (rare with rebase — requires an active row spanning the whole
            # block; counted so serving traces surface it)
            for i in self._actives():
                self.stats["truncations"] += 1
                self._complete(i)
            return
        self._key, kd = jax.random.split(self._key)
        seg = min(self.segment_tokens, self._block - self._pos)
        # compose joiners' stashed first tokens into cur ON DEVICE (tiny
        # dispatches, no fetch) and ride them through the segment's one fetch
        cur = jnp.asarray(self._cur)
        for slot, fd in self._pending_first.items():
            cur = _set_at(cur, slot, fd[0])
        with phases.phase("eng.decode"):
            buf, lens, self._kv = fs.decode_batch(
                c.first_stage_params, self._cfg,
                cur, jnp.asarray(self._pos, jnp.int32),
                jnp.asarray(self._pad), jnp.asarray(self._spk), self._kv, kd,
                jnp.asarray(self._t), jnp.asarray(self._p), jnp.asarray(self._g),
                jnp.asarray(seg, jnp.int32), self.segment_tokens,
                T.END_OF_AUDIO_TOKEN, self.tts._compute_dtype,
            )
            fetch = np.asarray(
                jnp.concatenate(
                    [
                        cur.reshape(-1, 1).astype(jnp.int32),
                        lens.reshape(-1, 1).astype(jnp.int32),
                        buf.astype(jnp.int32),
                    ],
                    axis=1,
                )
            )
        cur_h, lens_h = fetch[:, 0], fetch[:, 1]
        # resolve deferred joins: note each first token BEFORE this segment's
        # tokens for that slot (stream/EOA/budget semantics see them in order)
        pend, self._pending_first = self._pending_first, {}
        for slot in sorted(pend):
            if self._slots[slot].free:
                continue
            self._cur[slot] = cur_h[slot]
            self._note_tokens(slot, [int(cur_h[slot])])
        steps = int(lens_h.max()) if len(lens_h) else 0
        self.stats["segments"] += 1
        self.stats["row_tokens"] += int(lens_h.sum())
        if steps == 0:
            # no row advanced (all done or at block limit): finish actives
            for i in self._actives():
                self._complete(i)
            return
        self._pos += steps
        with phases.phase("eng.note"):
            for i in self._actives():
                n = int(lens_h[i])
                if n == 0:
                    continue
                toks = fetch[i, 2 : 2 + n].tolist()
                self._cur[i] = toks[-1]
                self._note_tokens(i, toks)

    # ------------------------------------------------------------------ per-slot plumbing
    def _note_tokens(self, slot: int, toks: list):
        """Record newly decoded tokens; stream/complete as they land."""
        s = self._slots[slot]
        if s.req is not None and s.req.stream and s.req.handle._closed:
            # client abandoned the stream: free the slot, stop decoding it
            self._slots[slot] = _Slot()
            self._cur[slot] = T.END_OF_AUDIO_TOKEN
            self._pad[slot] = self._pos  # empty window: lets min(starts) rise
            s.req.handle._finish()
            return
        finished = False
        for t in toks:
            if t == T.END_OF_AUDIO_TOKEN:
                finished = True
                break
            s.tokens.append(int(t))
        if (
            s.req is not None
            and s.req.max_new_tokens is not None
            and len(s.tokens) >= s.req.max_new_tokens
        ):
            s.tokens = s.tokens[: s.req.max_new_tokens]
            finished = True
        if s.req is not None and s.req.stream and not finished:
            self._stream_render(slot)
        if finished:
            self._complete(slot)

    def _chain_render(self, s: _Slot, fn):
        """Queue ``fn`` on the render pool strictly AFTER this slot's
        previously queued render, so a request's segments arrive in order —
        without blocking the worker thread (the round-3 design rendered
        stream segments INSIDE the worker loop, serializing ~0.3 s of
        stage2+vocoder against every decode segment: with 25% streaming
        traffic that alone blew engine p50 from ~4 s to ~17 s) and without
        occupying a pool worker while waiting (chained via done-callback,
        not an in-pool join, so two queued renders of the same request can
        never deadlock the 2-worker pool)."""
        done = Future()

        def run():
            try:
                fn()
            finally:
                done.set_result(None)

        prev, s.render_chain = s.render_chain, done
        if prev is None:
            try:
                self._render_pool.submit(run)
            except RuntimeError:  # pool shut down: run inline so a stream's
                run()  # finalize still closes its handle (no hung consumer)
        else:

            def _go(_):
                try:
                    self._render_pool.submit(run)
                except RuntimeError:  # pool shut down mid-chain
                    run()

            prev.add_done_callback(_go)

    def _stream_render(self, slot: int):
        """Queue this slot's un-rendered whole frames for stage2+vocoder.

        Runs asynchronously on the render pool (chained per request); the
        worker thread only snapshots the chunk into ``pending`` and advances
        ``rendered``. Each chain task drains EVERYTHING pending in one
        render, so if renders fall behind decode the backlog coalesces into
        fewer, larger renders; a render that raises RuntimeError (no whole
        audio frame in the span yet) pushes its tokens back to the front of
        ``pending`` so nothing is lost.
        """
        s = self._slots[slot]
        req = s.req
        avail = len(s.tokens) - s.rendered
        if avail < self.segment_tokens:
            return  # accumulate a full segment before rendering
        n = (avail // 2) * 2
        if n <= 0:
            return
        chunk = np.asarray(s.tokens[s.rendered : s.rendered + n], np.int32)
        s.rendered += n
        with s.lock:
            s.pending.append(chunk)
        self._key, kr = jax.random.split(self._key)

        def task():
            with s.lock:
                if not s.pending:
                    return  # drained by an earlier coalesced render
                parts = list(s.pending)
                s.pending.clear()
            toks = parts[0] if len(parts) == 1 else np.concatenate(parts)
            try:
                with phases.phase("eng.stream_render"):
                    wav = self.tts._tokens_to_wav(
                        req.text, req.prompt_tokens, toks, req.spk_emb, kr,
                        fused=True, streaming_segment=True,
                    )
                req.handle._push(wav)
            except RuntimeError:
                # no complete audio frame yet: retry with the next chunk
                with s.lock:
                    s.pending.appendleft(toks)
            except Exception as e:  # surface unexpected render errors to the
                req.handle._finish(e)  # stream consumer (don't drop silently)

        self._chain_render(s, task)

    def _complete(self, slot: int):
        s = self._slots[slot]
        req = s.req
        self._slots[slot] = _Slot()  # free immediately; render off-thread
        self._cur[slot] = T.END_OF_AUDIO_TOKEN
        # a freed row's window is empty: advance its start so the decode
        # kernels' min(starts) prefix skip reclaims the retired rows' cache
        # stream (and rebase can reclaim more positions)
        self._pad[slot] = self._pos
        if req is None:
            return
        if req.stream:
            # queue the final flush BEHIND any in-flight segment renders
            # (per-request chain keeps ordering), then close the stream
            self._finalize_stream(s, req)
            return
        tokens = list(s.tokens)
        self._key, kr = jax.random.split(self._key)
        self._render_pool.submit(self._render_full, req, tokens, kr)

    def _finalize_stream(self, s: _Slot, req: SynthesisRequest):
        avail = len(s.tokens) - s.rendered
        n = (avail // 2) * 2
        if n > 0:
            with s.lock:
                s.pending.append(
                    np.asarray(s.tokens[s.rendered : s.rendered + n], np.int32)
                )
            s.rendered += n
        self._key, kr = jax.random.split(self._key)

        def task():
            try:
                with s.lock:
                    parts = list(s.pending)
                    s.pending.clear()
                if parts:
                    toks = parts[0] if len(parts) == 1 else np.concatenate(parts)
                    try:
                        with phases.phase("eng.stream_render"):
                            wav = self.tts._tokens_to_wav(
                                req.text, req.prompt_tokens, toks, req.spk_emb,
                                kr, fused=True, streaming_segment=True,
                            )
                        req.handle._push(wav)
                    except RuntimeError:
                        pass  # leftover tokens held no whole audio frame
                req.handle._finish()
            except Exception as e:  # pragma: no cover
                req.handle._finish(e)

        self._chain_render(s, task)

    def _render_full(self, req: SynthesisRequest, tokens: list, key):
        try:
            if not tokens:
                raise RuntimeError(
                    f"first stage produced no audio tokens for: {req.text!r}"
                )
            # NOTE for profiling: this runs on a render-pool thread; its wall
            # time INCLUDES waiting for the serialized device tunnel while the
            # worker thread decodes — contention shows up here by design.
            with phases.phase("eng.render_full"):
                wav = self.tts._tokens_to_wav(
                    req.text, req.prompt_tokens, np.asarray(tokens, np.int32),
                    req.spk_emb, key,
                )
            with phases.phase("eng.write_wav"):
                req.future.set_result(self.tts.write_wav_output(req.text, wav))
        except Exception as e:
            req.future.set_exception(e)

    def _fail(self, slot: int, e: Exception):
        s = self._slots[slot]
        self._slots[slot] = _Slot()
        self._cur[slot] = T.END_OF_AUDIO_TOKEN
        self._pad[slot] = self._pos
        if s.req is not None:
            self._fail_request(s.req, e)

    @staticmethod
    def _fail_request(req: SynthesisRequest, e: Exception):
        if req.stream:
            req.handle._finish(e)
        elif not req.future.done():
            req.future.set_exception(e)


class BatchingEngine(ContinuousBatchingEngine):
    """Back-compat constructor shim over the continuous engine.

    ``max_batch`` maps to the slot count; ``batch_window_s`` is obsolete
    (the continuous engine admits at segment boundaries and never taxes a
    solo request with a collection window).
    """

    def __init__(self, tts, max_batch: int = 8, batch_window_s: float = 0.03):
        del batch_window_s
        super().__init__(tts, slots=max_batch)

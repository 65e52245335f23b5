"""Continuous-batching synthesis engine for concurrent serving.

The reference serves one request at a time through a global lock
(serving.py:46-51 — a single TTS object, requests serialized). This engine
is the TPU-native upgrade targeted at BASELINE config 5 (8-16 concurrent
zero-shot-cloning requests): a background worker drains a request queue,
groups up to ``max_batch`` requests inside a small batching window, and runs
them through one ragged-batch first-stage decode
(models/first_stage.generate_batch — left-padded prompts, per-row attention
windows and EOA latches), then fans out to the second stage + vocoder per
utterance. Callers block on futures; throughput scales with batch size while
the per-step weight read is amortized across rows.
"""

from __future__ import annotations

import queue
import threading
import time
from concurrent.futures import Future
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from metavoice_tpu.core import tokens as T
from metavoice_tpu.models import first_stage as fs


@dataclass
class SynthesisRequest:
    text: str
    prompt_tokens: list
    spk_emb: np.ndarray
    top_p: float = 0.95
    guidance_scale: float = 3.0
    temperature: float = 1.0
    future: Future = field(default_factory=Future)


class BatchingEngine:
    """Queue + batch collector around a TTS instance.

    ``submit`` returns a Future resolving to the output wav path. Requests
    arriving within ``batch_window_s`` of each other (up to ``max_batch``)
    share one first-stage decode.
    """

    def __init__(
        self,
        tts,
        max_batch: int = 8,
        batch_window_s: float = 0.03,
    ):
        self.tts = tts
        self.max_batch = max_batch
        self.batch_window_s = batch_window_s
        self._queue: queue.Queue[SynthesisRequest | None] = queue.Queue()
        self._key = jax.random.PRNGKey(tts.runtime.seed + 1)
        self._thread = threading.Thread(target=self._worker, daemon=True)
        self._running = True
        self._thread.start()

    def submit(self, text: str, spk_ref_path: str, **sampling) -> Future:
        from metavoice_tpu.core.text import normalize_text
        from metavoice_tpu.utils.audio_io import get_cached_file

        text = normalize_text(text)
        spk_ref_path = get_cached_file(spk_ref_path)
        spk_emb = self.tts._get_speaker_embedding(spk_ref_path)
        req = SynthesisRequest(
            text=text,
            prompt_tokens=self.tts.c.tokenizer.encode(text),
            spk_emb=spk_emb,
            **sampling,
        )
        self._queue.put(req)
        return req.future

    def shutdown(self):
        self._running = False
        self._queue.put(None)
        self._thread.join(timeout=5)

    # ------------------------------------------------------------------ internals
    def _collect_batch(self) -> list[SynthesisRequest]:
        first = self._queue.get()
        if first is None:
            return []
        batch = [first]
        deadline = time.time() + self.batch_window_s
        while len(batch) < self.max_batch:
            timeout = deadline - time.time()
            if timeout <= 0:
                break
            try:
                nxt = self._queue.get(timeout=timeout)
            except queue.Empty:
                break
            if nxt is None:
                self._queue.put(None)
                break
            batch.append(nxt)
        return batch

    def _worker(self):
        while self._running:
            batch = self._collect_batch()
            if not batch:
                if not self._running or self._queue.empty():
                    if not self._running:
                        return
                continue
            try:
                self._process(batch)
            except Exception as e:  # resolve all futures with the error
                for req in batch:
                    if not req.future.done():
                        req.future.set_exception(e)

    def _process(self, batch: list[SynthesisRequest]):
        c = self.tts.c
        self._key, sub = jax.random.split(self._key)

        # Per-request sampling params: traced (B, 1) vectors broadcast
        # through the temperature/top-p/CFG math, so mixed-settings batches
        # share one compiled program.
        spk = jnp.asarray(np.stack([r.spk_emb for r in batch]))
        outs = fs.generate_batch(
            c.first_stage_params,
            c.first_stage_cfg,
            [r.prompt_tokens for r in batch],
            spk,
            key=sub,
            temperature=[r.temperature for r in batch],
            top_p=[r.top_p for r in batch],
            guidance_scale=[r.guidance_scale for r in batch],
            prompt_pad_multiple=self.tts.runtime.prompt_pad_multiple,
            compute_dtype=self.tts._compute_dtype,
            cache_dtype=self.tts._cache_dtype,
        )

        # stages 3-4 batched: one second-stage forward + one vocoder call
        # for the whole group, then per-request enhancement + file write
        from metavoice_tpu.models import encodec as ec
        from metavoice_tpu.models import second_stage as ss

        items, live = [], []
        for req, seq in zip(batch, outs):
            _t, coarse = T.split_flattened_interleaved(seq, T.HIERARCHY_EOA)
            if len(coarse[0]) == 0:
                req.future.set_exception(
                    RuntimeError(f"first stage produced no audio tokens for: {req.text!r}")
                )
                continue
            items.append((req.prompt_tokens, coarse))
            live.append(req)
        if not live:
            return

        self._key, k2 = jax.random.split(self._key)
        codes_list = ss.complete_hierarchies_batch(
            c.second_stage_params,
            c.second_stage_cfg,
            items,
            jnp.asarray(np.stack([r.spk_emb for r in live])),
            key=k2,
            compute_dtype=self.tts._compute_dtype,
        )
        t_max = max(cd.shape[1] for cd in codes_list)
        padded = np.stack(
            [np.pad(cd, ((0, 0), (0, t_max - cd.shape[1]))) for cd in codes_list]
        )
        wavs = np.asarray(
            ec.decode_codes(c.encodec_params, c.encodec_cfg, jnp.asarray(padded))
        )
        hop = c.encodec_cfg.hop_length

        for req, cd, wav in zip(live, codes_list, wavs):
            try:
                w = wav[: cd.shape[1] * hop].astype(np.float32)
                if c.enhancer is not None:
                    w = c.enhancer(w, c.encodec_cfg.sample_rate)
                req.future.set_result(self.tts.write_wav_output(req.text, w))
            except Exception as e:
                req.future.set_exception(e)

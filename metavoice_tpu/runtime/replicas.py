"""Data-parallel replica serving: one engine per chip, least-loaded dispatch.

The 1B first stage fits ONE chip many times over (0.67 GiB int4 weights), so
multi-chip THROUGHPUT serving is data parallelism: every chip holds a full
model replica with its own continuous-batching slot pool, and requests go to
the least-loaded replica. This is the "8-16 concurrent requests on a v5e
slice" deployment shape (BASELINE.json config 5); tensor parallelism
(parallel/tp_decode.py) is the orthogonal per-request LATENCY lever.

The pool exposes the ContinuousBatchingEngine surface the HTTP server
consumes (``submit`` / ``stats`` / ``shutdown``), so ``make_handler`` takes
a pool wherever it takes an engine. Replicas are built under
``jax.default_device(device_i)`` so each instance's parameters, caches and
compiled programs live on its own chip; JAX releases the GIL during device
execution, so the per-replica worker threads genuinely overlap across chips.

Reference counterpart: none — serving.py holds one global model and
serializes requests (/root/reference/serving.py:46-51).
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax

from metavoice_tpu.runtime.engine import ContinuousBatchingEngine


def _commit_tts_to_device(tts, dev) -> None:
    """device_put-COMMIT a TTS instance's model state to one device.

    Committed inputs pin every jit execution that consumes them, regardless
    of which thread dispatches (the engine worker runs outside any
    ``jax.default_device`` scope).
    """

    def commit(tree):
        return jax.tree.map(
            lambda x: jax.device_put(x, dev) if isinstance(x, jax.Array) else x,
            tree,
        )

    c = tts.c
    c.first_stage_params = commit(c.first_stage_params)
    c.second_stage_params = commit(c.second_stage_params)
    c.spk_params = commit(c.spk_params)
    c.encodec_params = commit(c.encodec_params)
    if c.mbd_params is not None:
        c.mbd_params = commit(c.mbd_params)
    tts._kv_cache = commit(tts._kv_cache)
    if tts._kv_cache3 is not None:
        tts._kv_cache3 = commit(tts._kv_cache3)


class ReplicaPool:
    """N independent (TTS, engine) replicas behind one submit queue.

    ``build_tts(i)`` constructs replica i's TTS instance; it runs inside a
    ``jax.default_device`` scope pinning that replica to one device. Pass
    ``warmup=True`` to precompile each replica after construction — the
    persistent compile cache makes replicas 1..N-1 warm up almost for free.
    """

    def __init__(
        self,
        build_tts: Callable[[int], object],
        n_replicas: int | None = None,
        devices: Sequence | None = None,
        warmup: bool = False,
        **engine_kwargs,
    ):
        devices = list(devices if devices is not None else jax.local_devices())
        n = n_replicas or len(devices)
        if n < 1:
            raise ValueError(f"need >= 1 replica, got {n}")
        if n > len(devices):
            # silently stacking several full replicas (weights + cache) on
            # one chip OOMs at production sizes and scales nothing
            raise ValueError(
                f"{n} replicas > {len(devices)} devices — one full model + "
                "engine per device is the contract; raise device count or "
                "lower --replicas"
            )
        self.engines: list[ContinuousBatchingEngine] = []
        self.devices = []
        self._submitted = []
        for i in range(n):
            dev = devices[i]
            with jax.default_device(dev):
                tts = build_tts(i)
                # jax.default_device only scopes THIS thread's dispatches:
                # arrays it places are UNCOMMITTED, and the engine worker
                # thread runs outside the scope — without an explicit
                # device_put commit, every replica's decode migrates to
                # device 0 on first use (verified on the CPU mesh). Commit
                # all model state so jit executions follow it to `dev`.
                _commit_tts_to_device(tts, dev)
                eng = ContinuousBatchingEngine(tts, **engine_kwargs)
                eng._kv = jax.device_put(eng._kv, dev)
                if warmup:
                    # after the cache commit so the warmed programs run (and
                    # leave their donated outputs) on THIS replica's device;
                    # warms both the TTS render programs and the engine's
                    # group-prefill/decode/join/rebase envelope
                    eng.warmup()
            self.engines.append(eng)
            self.devices.append(dev)
            self._submitted.append(0)

    # --------------------------------------------------------------- engine API
    def _pick(self) -> int:
        # engine.load has a blind window (a request popped from the queue
        # but not yet slotted reads as 0), so a burst would pile onto one
        # replica; the submitted-count tiebreak round-robins equal loads
        return min(
            range(len(self.engines)),
            key=lambda i: (self.engines[i].load, self._submitted[i]),
        )

    def submit(self, text: str, spk_ref_path: str, *, stream: bool = False, **sampling):
        """Route to the least-loaded replica (same contract as the engine)."""
        i = self._pick()
        self._submitted[i] += 1
        return self.engines[i].submit(text, spk_ref_path, stream=stream, **sampling)

    @property
    def load(self) -> int:
        return sum(e.load for e in self.engines)

    @property
    def stats(self) -> dict:
        """Summed engine counters plus per-replica load (for /metrics)."""
        out: dict = {}
        for e in self.engines:
            for k, v in e.stats.items():
                out[k] = out.get(k, 0) + v
        for i, e in enumerate(self.engines):
            out[f"replica_{i}_load"] = e.load
            out[f"replica_{i}_submitted"] = self._submitted[i]
        return out

    def shutdown(self):
        for e in self.engines:
            e.shutdown()


__all__ = ["ReplicaPool"]

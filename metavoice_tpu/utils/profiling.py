"""Profiling and observability hooks.

The reference's tracing story is manual wall-clock prints: tokens/sec and
achieved GB/s (fam/llm/fast_inference_utils.py:413-443), RTF per synthesis
(fam/llm/fast_inference.py:165-171), per-iter train ms with an MFU
placeholder that is never computed (fam/llm/finetune.py:351-362). This module
provides the same user-facing numbers plus what the reference lacks:

  * ``trace`` — a jax.profiler trace context writing TensorBoard-readable
    traces (set ``MVTPU_TRACE_DIR`` or pass a path),
  * ``DecodeMetrics`` — tokens/sec, achieved weight bandwidth, stage RTF,
    and a real MFU estimate from the model's analytic FLOPs/token,
  * ``MetricsLogger`` — JSONL metrics spool (the offline stand-in for the
    reference's optional W&B logging, fam/llm/finetune.py:183-191).
"""

from __future__ import annotations

import contextlib
import json
import os
import time
from dataclasses import dataclass

import jax

from metavoice_tpu.core import tokens as T

# v5e (TPU v5 lite) per-chip peak numbers
V5E_PEAK_BF16_FLOPS = 197e12
V5E_HBM_BANDWIDTH = 819e9


@contextlib.contextmanager
def trace(trace_dir: str | None = None):
    """jax.profiler trace context; no-op when tracing is unsupported."""
    trace_dir = trace_dir or os.environ.get("MVTPU_TRACE_DIR")
    if not trace_dir:
        yield
        return
    try:
        with jax.profiler.trace(trace_dir):
            yield
    except Exception:
        yield  # experimental backends may not support profiling


@dataclass
class DecodeMetrics:
    """Throughput metrics for an autoregressive decode run."""

    tokens: int
    seconds: float
    param_bytes: int
    params: int
    cfg_batch: int = 2

    @property
    def tokens_per_sec(self) -> float:
        return self.tokens / max(self.seconds, 1e-9)

    @property
    def bandwidth_gb_s(self) -> float:
        """Achieved weight-read bandwidth (the reference's GB/s print,
        fast_inference_utils.py:441: model bytes x tokens/sec)."""
        return self.param_bytes * self.tokens_per_sec / 1e9

    @property
    def stage1_rtf(self) -> float:
        """First-stage real-time factor: 150 interleaved tokens per audio
        second (75 Hz EnCodec frames x 2 hierarchies)."""
        return (2 * T.ENCODEC_FRAME_RATE_HZ) / max(self.tokens_per_sec, 1e-9)

    @property
    def mfu(self) -> float:
        """Model FLOPs utilization: 2 * params * cfg_batch FLOPs per token
        over the v5e bf16 peak (the reference logs a placeholder -1.0,
        finetune.py:228)."""
        flops_per_token = 2.0 * self.params * self.cfg_batch
        return flops_per_token * self.tokens_per_sec / V5E_PEAK_BF16_FLOPS

    def summary(self) -> dict:
        return {
            "tokens_per_sec": round(self.tokens_per_sec, 2),
            "bandwidth_gb_s": round(self.bandwidth_gb_s, 1),
            "stage1_rtf": round(self.stage1_rtf, 3),
            "mfu": round(self.mfu, 4),
        }


class MetricsLogger:
    """Append-only JSONL metrics (offline W&B stand-in)."""

    def __init__(self, path: str):
        self.path = path
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)

    def log(self, metrics: dict, step: int | None = None) -> None:
        record = dict(metrics)
        record["_time"] = time.time()
        if step is not None:
            record["_step"] = step
        with open(self.path, "a") as f:
            f.write(json.dumps(record) + "\n")


class Stopwatch:
    """Wall-clock section timer collecting named laps."""

    def __init__(self):
        self.laps: dict[str, float] = {}
        self._t = time.perf_counter()

    def lap(self, name: str) -> float:
        now = time.perf_counter()
        dt = now - self._t
        self.laps[name] = self.laps.get(name, 0.0) + dt
        self._t = now
        return dt

"""Lightweight per-phase wall-clock timers for orchestration profiling.

The round-3 bench showed a large gap between raw decode throughput and what
the orchestration layers deliver (engine effective tok/s, chunked long-text
RTF) without saying WHERE the time goes. These timers attribute wall time to
named phases inside runtime/tts.py and runtime/engine.py. Counterpart of the
reference's ad-hoc time.time() prints around its pipeline stages
(fam/llm/fast_inference.py:140-160, fam/llm/inference.py:631-640).

Disabled by default (zero overhead beyond one truthiness check); enable via
``phases.enable()`` or MVTPU_PHASE_TIMERS=1. Wall time includes time blocked
on the serialized device tunnel — by design: cross-thread contention (e.g. a
render hogging the tunnel while the decode worker waits) must show up in the
phase that experienced the wait.

Usage:
    with phases.phase("eng.decode"):
        ...
    phases.report()   # {"eng.decode": {"total_s": ..., "count": ...}, ...}
"""

from __future__ import annotations

import os
import threading
import time
from contextlib import contextmanager

_enabled = os.environ.get("MVTPU_PHASE_TIMERS", "0") == "1"
_lock = threading.Lock()
_stats: dict[str, list] = {}  # name -> [total_s, count]


def enable(flag: bool = True) -> None:
    global _enabled
    _enabled = flag


def enabled() -> bool:
    return _enabled


def reset() -> None:
    with _lock:
        _stats.clear()


def add(name: str, dt: float) -> None:
    with _lock:
        s = _stats.setdefault(name, [0.0, 0])
        s[0] += dt
        s[1] += 1


@contextmanager
def phase(name: str):
    if not _enabled:
        yield
        return
    t0 = time.perf_counter()
    try:
        yield
    finally:
        add(name, time.perf_counter() - t0)


def sync(x):
    """Force a host transfer at a phase boundary — only when profiling.

    On the axon backend ``block_until_ready`` does not block (CLAUDE.md), so
    attribution syncs must be real transfers. Transfers a SINGLE element of
    the first leaf (a ravel+slice dispatch), so syncing a multi-GB KV cache
    costs one tiny round-trip, not a full fetch. Never active in production
    paths.
    """
    if _enabled and x is not None:
        import jax
        import numpy as np

        leaf = jax.tree.leaves(x)[0]
        np.asarray(leaf.ravel()[:1])
    return x


def report() -> dict:
    with _lock:
        return {
            k: {"total_s": round(v[0], 4), "count": v[1]}
            for k, v in sorted(_stats.items())
        }


def format_report(wall_s: float | None = None) -> str:
    rows = report()
    width = max((len(k) for k in rows), default=10)
    lines = []
    total = 0.0
    for k, v in sorted(rows.items(), key=lambda kv: -kv[1]["total_s"]):
        avg = v["total_s"] / max(v["count"], 1)
        frac = f"  {100*v['total_s']/wall_s:5.1f}%" if wall_s else ""
        lines.append(
            f"{k:<{width}}  {v['total_s']:8.3f}s  x{v['count']:<5d} "
            f"avg {avg*1000:8.2f} ms{frac}"
        )
        if not k.count("."):  # top-level phases only
            total += v["total_s"]
    if wall_s is not None:
        lines.append(f"{'WALL':<{width}}  {wall_s:8.3f}s")
    return "\n".join(lines)

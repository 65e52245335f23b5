"""Serving capacity planner: exact HBM memory math for a serving config.

The reference gives operators no way to size a deployment — its OOMs are
discovered at runtime (torch CUDA allocator). On TPU the dominant terms are
static (weights + KV cache, both fixed-shape XLA buffers), so capacity can
be planned EXACTLY before touching a chip: this module traces the real
parameter tree and the real :class:`~metavoice_tpu.models.transformer.KVCache`
through ``jax.eval_shape`` (no allocation, no device) and sums buffer bytes.

The numbers reproduce the measured serving facts (pinned in tests): at
batch 16 (32 CFG rows) the bf16 cache alone is 12.9 GB and cannot fit a
16 GB v5e next to the weights, while the int8/int8_packed cache (6.6 GB
including scale tables) fits — the capacity cliff bench.py demonstrates on
chip (scripts/diag_batch16_capacity.py).

Scope: the FIRST-STAGE weights + KV cache — the two terms that scale with
slot count. The second stage / vocoder add a fixed ~0.3-0.6 GiB bf16 that
the utilization margin (calibrated on full-stack OOM endpoints) absorbs.

Reference counterpart: none (fam/llm/fast_inference.py simply allocates and
hopes); the 2x-batch int8-KV lever itself is beyond the reference.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from metavoice_tpu.core.config import TransformerConfig

V5E_HBM_BYTES = 16 * 1024**3  # one v5e chip

# fraction of HBM the planner treats as usable by weights+cache. Calibrated
# against the two measured endpoints on a 16 GiB v5e (CLAUDE.md facts,
# scripts/diag_batch16_capacity.py): int4 weights + int8 cache at 16 slots
# (6.9 GiB static) RUNS, while int4 weights + bf16 cache at 16 slots
# (12.7 GiB static) OOMs — XLA's prefill activations, temp buffers and
# transient cache copies at jit boundaries consume the difference. 0.75
# (12 GiB usable) separates the two with margin on the failing side.
DEFAULT_UTILIZATION = 0.75


def _tree_bytes(tree: Any) -> int:
    return sum(
        x.size * x.dtype.itemsize for x in jax.tree.leaves(tree)
    )


def params_abstract(cfg: TransformerConfig, quantisation_mode: str | None):
    """Abstract (shape-only) first-stage parameter tree for a quant mode.

    Traces the REAL init + quantize functions under ``jax.eval_shape`` so
    the plan counts exactly the buffers the runtime will hold — scale
    tables, packed words, affine epilogue terms and all.
    """
    from metavoice_tpu.models import transformer as tfm
    from metavoice_tpu.ops import quantized as qz

    def build():
        p = tfm.init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
        if quantisation_mode == "int4":
            p = qz.quantize_params_int4_i32(p)
        elif quantisation_mode in ("int8", "int8_packed"):
            p = qz.quantize_params_int8_i32(p)
        elif quantisation_mode == "int8_plain":
            p = qz.quantize_params_int8(p)
        elif quantisation_mode is not None:
            raise ValueError(f"unknown quantisation_mode {quantisation_mode!r}")
        return p

    return jax.eval_shape(build)


def cache_abstract(
    cfg: TransformerConfig,
    rows: int,
    block_size: int | None,
    kv_cache_dtype: str | None,
):
    """Abstract KVCache for ``rows`` physical batch rows (CFG rows, 2x slots)."""
    from metavoice_tpu.models import transformer as tfm

    dtype = {None: jnp.bfloat16, "bf16": jnp.bfloat16}.get(
        kv_cache_dtype, kv_cache_dtype
    )
    return jax.eval_shape(
        lambda: tfm.KVCache.create(cfg, rows, block_size, dtype=dtype)
    )


@dataclasses.dataclass(frozen=True)
class MemoryPlan:
    """Byte budget of one serving configuration on one chip."""

    weights_bytes: int
    cache_bytes: int
    slots: int
    cfg_rows_per_slot: int
    block_size: int
    quantisation_mode: str | None
    kv_cache_dtype: str | None
    hbm_bytes: int
    utilization: float

    @property
    def total_bytes(self) -> int:
        return self.weights_bytes + self.cache_bytes

    @property
    def budget_bytes(self) -> int:
        return int(self.hbm_bytes * self.utilization)

    @property
    def fits(self) -> bool:
        return self.total_bytes <= self.budget_bytes

    @property
    def headroom_bytes(self) -> int:
        return self.budget_bytes - self.total_bytes

    def describe(self) -> str:
        gb = 1024**3
        lines = [
            "scope: FIRST-STAGE weights + KV cache (the two capacity-scale "
            "terms; the utilization margin absorbs XLA transients — the "
            "second stage / vocoder add ~0.3-0.6 GiB bf16 on top)",
            f"weights ({self.quantisation_mode or 'bf16'}): "
            f"{self.weights_bytes / gb:.2f} GiB",
            f"kv cache ({self.kv_cache_dtype or 'bf16'}, "
            f"{self.slots} slots x {self.cfg_rows_per_slot} CFG rows, "
            f"block {self.block_size}): {self.cache_bytes / gb:.2f} GiB",
            f"total {self.total_bytes / gb:.2f} GiB of "
            f"{self.budget_bytes / gb:.2f} GiB usable "
            f"({self.hbm_bytes / gb:.0f} GiB HBM x {self.utilization:.0%})",
            f"fits: {self.fits} (headroom {self.headroom_bytes / gb:+.2f} GiB)",
        ]
        return "\n".join(lines)


def memory_plan(
    cfg: TransformerConfig,
    *,
    quantisation_mode: str | None = "int4",
    kv_cache_dtype: str | None = None,
    slots: int = 8,
    block_size: int | None = None,
    cfg_rows: int = 2,
    hbm_bytes: int = V5E_HBM_BYTES,
    utilization: float = DEFAULT_UTILIZATION,
) -> MemoryPlan:
    """Exact weights+cache byte budget for a serving configuration.

    ``slots`` is the engine's concurrent-request count; each slot holds
    ``cfg_rows`` physical cache rows (2 for standard CFG, 3 with prompt
    guidance).
    """
    bs = block_size or cfg.block_size
    return MemoryPlan(
        weights_bytes=_tree_bytes(params_abstract(cfg, quantisation_mode)),
        cache_bytes=_tree_bytes(
            cache_abstract(cfg, cfg_rows * slots, bs, kv_cache_dtype)
        ),
        slots=slots,
        cfg_rows_per_slot=cfg_rows,
        block_size=bs,
        quantisation_mode=quantisation_mode,
        kv_cache_dtype=kv_cache_dtype,
        hbm_bytes=hbm_bytes,
        utilization=utilization,
    )


def max_slots(
    cfg: TransformerConfig,
    *,
    quantisation_mode: str | None = "int4",
    kv_cache_dtype: str | None = None,
    block_size: int | None = None,
    cfg_rows: int = 2,
    hbm_bytes: int = V5E_HBM_BYTES,
    utilization: float = DEFAULT_UTILIZATION,
    limit: int = 256,
) -> int:
    """Largest engine slot count whose plan fits (0 if even 1 doesn't).

    Cache bytes are linear in ``slots`` (the tables pad the lane dim to 128,
    a sub-percent step effect), so compute from the 1-slot plan and verify
    the candidate exactly.
    """
    one = memory_plan(
        cfg, quantisation_mode=quantisation_mode, kv_cache_dtype=kv_cache_dtype,
        slots=1, block_size=block_size, cfg_rows=cfg_rows,
        hbm_bytes=hbm_bytes, utilization=utilization,
    )
    if not one.fits:
        return 0

    def fits(n: int) -> bool:
        return memory_plan(
            cfg, quantisation_mode=quantisation_mode,
            kv_cache_dtype=kv_cache_dtype, slots=n,
            block_size=block_size, cfg_rows=cfg_rows,
            hbm_bytes=hbm_bytes, utilization=utilization,
        ).fits

    per_slot = max(one.cache_bytes, 1)
    guess = max(1, min(limit, 1 + one.headroom_bytes // per_slot))
    while guess > 1 and not fits(guess):
        guess -= 1
    while guess < limit and fits(guess + 1):
        guess += 1
    return guess

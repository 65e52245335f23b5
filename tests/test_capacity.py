"""Serving capacity planner (utils/capacity.py): exact eval_shape byte math
pinned against the hand-computable cache formula and the two MEASURED
serving endpoints from the real chip (CLAUDE.md / diag_batch16_capacity.py):
int4 weights + int8 KV at 16 slots fits a 16 GiB v5e, int4 + bf16 at 16
slots does not."""

import jax.numpy as jnp
import pytest

from metavoice_tpu.core.config import first_stage_config
from metavoice_tpu.utils import capacity as cap


@pytest.fixture(scope="module")
def cfg():
    return first_stage_config()


def test_bf16_cache_bytes_match_formula(cfg):
    plan = cap.memory_plan(cfg, quantisation_mode="int4", slots=16)
    want = (
        cfg.n_layer * cfg.block_size * 32 * cfg.n_local_heads * cfg.head_dim
        * 2  # bf16
        * 2  # k and v
    )
    assert plan.cache_bytes == want
    assert plan.cfg_rows_per_slot == 2 and plan.slots == 16


@pytest.mark.parametrize("kv", ["int8", "int8_packed"])
def test_quantized_cache_halves_values_adds_scales(cfg, kv):
    bf16 = cap.memory_plan(cfg, quantisation_mode="int4", slots=16)
    q = cap.memory_plan(cfg, quantisation_mode="int4", kv_cache_dtype=kv, slots=16)
    values = bf16.cache_bytes // 2  # int8 values = half the bf16 bytes
    scales = q.cache_bytes - values
    assert scales > 0
    # scale tables: one f32 per (position, head) x k/v, lane-padded to 128
    bh_pad = ((32 * cfg.n_local_heads + 127) // 128) * 128
    assert scales == cfg.n_layer * cfg.block_size * bh_pad * 4 * 2


def test_measured_capacity_endpoints(cfg):
    """The planner reproduces the on-chip result: int8 KV fits 16 slots,
    bf16 does not (the capacity cliff the int8 cache exists for)."""
    ok = cap.memory_plan(
        cfg, quantisation_mode="int4", kv_cache_dtype="int8", slots=16
    )
    oom = cap.memory_plan(cfg, quantisation_mode="int4", slots=16)
    assert ok.fits
    assert not oom.fits


def test_max_slots_consistent(cfg):
    n = cap.max_slots(cfg, quantisation_mode="int4", kv_cache_dtype="int8")
    assert n >= 16  # the measured-working config must be within the answer
    assert cap.memory_plan(
        cfg, quantisation_mode="int4", kv_cache_dtype="int8", slots=n
    ).fits
    assert not cap.memory_plan(
        cfg, quantisation_mode="int4", kv_cache_dtype="int8", slots=n + 1
    ).fits
    bf = cap.max_slots(cfg, quantisation_mode="int4")
    assert 8 <= bf < 16  # batch-8 measured working, batch-16 measured OOM


def test_quantized_weights_smaller(cfg):
    b = cap.memory_plan(cfg, quantisation_mode=None, slots=1).weights_bytes
    i8 = cap.memory_plan(cfg, quantisation_mode="int8", slots=1).weights_bytes
    i4 = cap.memory_plan(cfg, quantisation_mode="int4", slots=1).weights_bytes
    assert i4 < i8 < b
    assert i4 < 0.8 * 1024**3  # ~0.7 GiB measured serving npz


def test_tiny_hbm_yields_zero_slots(cfg):
    assert (
        cap.max_slots(cfg, quantisation_mode="int4", hbm_bytes=512 * 1024**2) == 0
    )


def test_cli_capacity_runs(capsys):
    from metavoice_tpu import cli

    rc = cli.cmd_capacity(
        ["--quantisation_mode", "int4", "--kv_cache_dtype", "int8",
         "--slots", "16"]
    )
    out = capsys.readouterr().out
    assert rc == 0
    assert "fits: True" in out and "max slots" in out


def test_engine_auto_slots(tmp_path):
    """slots='auto' sizes the pool from the capacity plan of the LOADED
    config (small dev model -> memory-unconstrained -> the 32-slot cap)."""
    import jax

    from metavoice_tpu.runtime.engine import ContinuousBatchingEngine
    from metavoice_tpu.runtime.tts import TTS

    tts = TTS.from_random(
        jax.random.PRNGKey(0), small=True, output_dir=str(tmp_path)
    )
    eng = ContinuousBatchingEngine(tts, slots="auto")
    try:
        assert eng.n_slots == 32  # tiny model: capped, not memory-bound
    finally:
        eng.shutdown()

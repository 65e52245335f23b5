"""Multi-device sharding tests on the virtual 8-device CPU mesh.

Validates: mesh construction, TP param placement, sharded forward == single
device forward, and a DP+TP train step compiling and executing.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding

from metavoice_tpu.core.config import first_stage_config
from metavoice_tpu.models import transformer as tfm
from metavoice_tpu.parallel import mesh as pmesh
from metavoice_tpu.parallel import sharding as psh
from metavoice_tpu.training import finetune as ft

TINY = first_stage_config(n_layer=2, n_head=4, dim=64, block_size=32, vocab_sizes=(64,))

pytestmark = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs 8 (virtual) devices"
)


@pytest.fixture(scope="module")
def params():
    return tfm.init_params(jax.random.PRNGKey(0), TINY)


def test_mesh_shapes():
    m = pmesh.make_mesh(8, tensor_parallel=2)
    assert m.shape == {"data": 4, "tensor": 2}
    with pytest.raises(ValueError):
        pmesh.make_mesh(8, tensor_parallel=3)


def test_param_placement(params):
    m = pmesh.make_mesh(8, tensor_parallel=4)
    sharded = psh.shard_params(params, TINY, m)
    wqkv = sharded["layers"]["wqkv"]
    assert isinstance(wqkv.sharding, NamedSharding)
    # column-parallel: last dim split over 4 devices
    assert wqkv.sharding.shard_shape(wqkv.shape)[-1] == wqkv.shape[-1] // 4


def test_sharded_forward_matches_single(params):
    m = pmesh.make_mesh(8, tensor_parallel=4)
    idx = jax.random.randint(jax.random.PRNGKey(1), (4, 8), 0, 64)
    spk = jnp.ones((4, 256))

    ref_logits, _ = tfm.forward(params, TINY, idx, spk_emb=spk, compute_dtype=jnp.float32)

    sharded = psh.shard_params(params, TINY, m)
    idx_s = jax.device_put(idx, NamedSharding(m, psh.batch_spec(2)))
    spk_s = jax.device_put(spk, NamedSharding(m, psh.batch_spec(2)))
    out_logits, _ = jax.jit(
        lambda p, i, s: tfm.forward(p, TINY, i, spk_emb=s, compute_dtype=jnp.float32)
    )(sharded, idx_s, spk_s)
    np.testing.assert_allclose(
        np.asarray(out_logits[0]), np.asarray(ref_logits[0]), atol=2e-3, rtol=2e-2
    )


def test_sharded_train_step(params):
    """DP=2 x TP=4 train step compiles, runs, and updates sharded params."""
    m = pmesh.make_mesh(8, tensor_parallel=4)
    cfg = ft.FinetuneConfig()
    sharded = psh.shard_params(params, TINY, m)
    state, opt = ft.init_train_state(sharded, cfg)
    step = ft.make_train_step(TINY, cfg, opt, compute_dtype=jnp.float32)

    rng = np.random.default_rng(0)
    batch = {
        "x": jax.device_put(
            jnp.asarray(rng.integers(0, 64, (4, 8))), NamedSharding(m, psh.batch_spec(2))
        ),
        "y": jax.device_put(
            jnp.asarray(rng.integers(0, 64, (4, 8))), NamedSharding(m, psh.batch_spec(2))
        ),
        "spk_emb": jax.device_put(
            jnp.asarray(rng.normal(size=(4, 256)).astype(np.float32)),
            NamedSharding(m, psh.batch_spec(2)),
        ),
    }
    new_state, metrics = step(state, batch)
    new_state, metrics = step(new_state, batch)  # warmup LR is 0 at step 0
    assert np.isfinite(float(metrics["loss"]))
    # params moved and retained their sharding
    w = new_state.params["layers"]["wqkv"]
    assert w.sharding.shard_shape(w.shape)[-1] == w.shape[-1] // 4
    assert not np.allclose(
        np.asarray(w), np.asarray(params["layers"]["wqkv"])
    )


def test_sharded_cached_decode_matches_single(params):
    """TP-sharded KV-cache decode == single-device decode (CPU fallback path).

    This validates the multi-chip serving claim: params column/row-sharded
    over the tensor axis, cache sharded over heads, one decode step per
    position producing identical logits.
    """
    m = pmesh.make_mesh(8, tensor_parallel=4)
    idx = jax.random.randint(jax.random.PRNGKey(7), (1, 6), 0, 64)
    spk = jnp.ones((1, 256))

    def run(p, kv_dtype=jnp.float32):
        kv = tfm.KVCache.create(TINY, 1, TINY.block_size, dtype=kv_dtype)
        logits_pre, kv = tfm.forward(
            p, TINY, idx[:, :3], spk_emb=spk, kv_cache=kv, cache_pos=0,
            compute_dtype=jnp.float32,
        )
        outs = [np.asarray(logits_pre[0][:, -1])]
        for pos in range(3, 6):
            lg, kv = tfm.forward(
                p, TINY, idx[:, pos : pos + 1], spk_emb=spk, kv_cache=kv,
                cache_pos=pos, compute_dtype=jnp.float32,
            )
            outs.append(np.asarray(lg[0][:, 0]))
        return np.stack(outs)

    ref = run(params)
    sharded = psh.shard_params(params, TINY, m)
    out = run(sharded)
    np.testing.assert_allclose(out, ref, atol=3e-3, rtol=2e-2)


# ---------------------------------------------------------------------------
# Round 3: full-scale sharded compile evidence + multi-host topology math
# ---------------------------------------------------------------------------

from metavoice_tpu.parallel import aot


def test_full_scale_sharded_decode_aot_compiles():
    """The REAL 24L/16H/2048d decode step compiles under DP x TP shardings
    (abstract params -> zero weight memory; compilation is the assertion)."""
    m = pmesh.make_mesh(8, tensor_parallel=2)
    ex = aot.compile_sharded_decode_step(m)
    assert ex is not None


def test_full_scale_sharded_train_aot_compiles():
    """The REAL-scale finetune train step (Adam state sharded like params)
    compiles under DP x TP."""
    m = pmesh.make_mesh(8, tensor_parallel=2)
    ex = aot.compile_sharded_train_step(m, batch=4, seq=2048)
    assert ex is not None


def test_multihost_mesh_topology_math():
    """Process-aware mesh construction (mocked process counts: real
    multi-host is untestable on this single-host image — see mesh.py)."""
    devs = jax.devices()[:8]
    # 2 hosts x 4 local devices: TP up to 4 legal, TP 8 must refuse (DCN)
    m = pmesh.make_multihost_mesh(
        4, devices=devs, process_count=2, local_device_count=4
    )
    assert m.shape == {"data": 2, "tensor": 4}
    with pytest.raises(ValueError, match="cross DCN"):
        pmesh.make_multihost_mesh(
            8, devices=devs, process_count=2, local_device_count=4
        )
    with pytest.raises(ValueError, match="cross DCN"):
        # 3 does not pack into 4 local devices: groups would straddle hosts
        pmesh.make_multihost_mesh(
            3, devices=devs, process_count=2, local_device_count=4
        )
    with pytest.raises(ValueError, match="cross DCN"):
        # review finding: local=6, tp=4 — tp <= local but 6 % 4 != 0, the
        # host-major reshape would put devices from two hosts in one group
        pmesh.make_multihost_mesh(
            4, devices=jax.devices()[:12] if len(jax.devices()) >= 12 else devs[:4] * 3,
            process_count=2, local_device_count=6,
        )


def test_process_batch_slice_math():
    assert pmesh.process_batch_slice(16, process_index=0, process_count=4) == (0, 4)
    assert pmesh.process_batch_slice(16, process_index=3, process_count=4) == (12, 16)
    with pytest.raises(ValueError, match="not divisible"):
        pmesh.process_batch_slice(10, process_index=0, process_count=4)


def test_local_batch_to_global_single_process():
    """Single-process path: device_put with the data sharding (the code path
    is identical from 1 host to N; N-host needs a real DCN backend)."""
    m = pmesh.make_mesh(8, tensor_parallel=2)
    rows = np.arange(8 * 3, dtype=np.float32).reshape(8, 3)
    arr = pmesh.local_batch_to_global(m, rows, rank=2)
    assert arr.shape == (8, 3)
    np.testing.assert_array_equal(np.asarray(arr), rows)
    assert arr.sharding.shard_shape(arr.shape)[0] == 2  # 8 rows / data=4

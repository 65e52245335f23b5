"""Tensor-parallel fast decode: Megatron TP through shard_map.

Round-2 TP decode relied on GSPMD auto-partitioning of the dense XLA path —
the Pallas serving kernels (flash decode-attention, int4/int8 quantized
matmuls) have no GSPMD partitioning rule, so under a tensor-sharded jit they
silently forced replication/the slow path. This module runs the block stack
under ``shard_map`` instead: every device sees LOCAL shards with ordinary
array shapes, so the shape-driven kernels run unmodified on their shard, and
the two Megatron reductions per layer (after the attention output projection
and the FFN down projection) are explicit ``psum``s over the tensor axis
(models/transformer.apply_blocks ``tp_axis``). Embedding, LM head and
sampling stay outside the shard_map under plain GSPMD (they are ~1% of
decode time; wte/wpe/ln_f/speaker_cond are replicated).

Reference counterpart: none — fam/ is strictly single-GPU (SURVEY.md §2.2
names Megatron TP over ICI as the TPU-native bar for the rebuild).

Layout contract (what ``prepare_tp_params`` produces):

* ``wqkv`` is stored COLUMN-PERMUTED: per-device blocks ``[q_i | k_i | v_i]``
  concatenated over devices, so a natural last-axis shard gives device ``i``
  its own attention heads for all three projections. (The naive natural
  split would hand device 0 "all of q and half of k".)
* ``w1``/``w3`` (and gelu ``w_fc``) are column-parallel: natural last-axis
  shards. For int4 each device's hidden slice is padded to the kernel's
  8*groupsize alignment PER SHARD (pad columns carry zeroed affine terms),
  so the global hidden layout is ``[shard0 real+pad | shard1 real+pad ...]``
  and matches w2's per-shard row padding exactly.
* ``wo``/``w2`` (and gelu ``w_proj``) are row-parallel and, when quantized,
  REQUANTIZED PER SHARD: the packed int4/int8 word formats interleave input
  rows across slabs (ops/quantized.pack_int4_i32), so slicing a
  single-device packed tensor does NOT yield a valid shard. Quantizing each
  contiguous K-shard independently is numerically identical (quantization
  groups are 128 input rows; the 1B model's shard boundaries are
  group-aligned for tp in {2, 4, 8}) and concatenating the per-shard
  pw/sc tables along the sharded axis makes a natural shard spec deliver
  exactly the per-shard quantization.
* The KV cache shards over the HEADS axis (heads are per-device-contiguous
  under the qkv permutation above); batch shards over the data axis.

This single-host repo can execute TP only on the virtual CPU mesh (the
tunnel exposes one real chip), so the Pallas-kernel routing under shard_map
is pinned by interpret-mode tests and the full-scale program by AOT
compilation (tests/test_tp_decode.py); on-chip multi-device timing requires
a real slice.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from metavoice_tpu.core.config import TransformerConfig
from metavoice_tpu.models import transformer as tfm
from metavoice_tpu.ops import quantized as qz
from metavoice_tpu.parallel.mesh import DATA_AXIS, TENSOR_AXIS

_COLUMN = ("wqkv", "w1", "w3", "w_fc")
_ROW = ("wo", "w2", "w_proj")


def local_view(cfg: TransformerConfig, tp: int) -> TransformerConfig:
    """Per-device view of the model: local head counts, full residual dim.

    ``head_dim_override`` pins head_dim to the global value (dim stays the
    full residual width, so dim // local_n_head would be wrong).
    """
    if cfg.n_head % tp or cfg.n_local_heads % tp:
        raise ValueError(
            f"n_head={cfg.n_head}/n_local_heads={cfg.n_local_heads} "
            f"not divisible by tp={tp}"
        )
    return dataclasses.replace(
        cfg,
        n_head=cfg.n_head // tp,
        n_local_heads=cfg.n_local_heads // tp,
        head_dim_override=cfg.head_dim,
    )


def permute_qkv_cols(w: jax.Array, cfg: TransformerConfig, tp: int) -> jax.Array:
    """(..., D, q+k+v) -> per-device column blocks [q_i | k_i | v_i]."""
    qd = cfg.n_head * cfg.head_dim
    kvd = cfg.n_local_heads * cfg.head_dim
    q, k, v = jnp.split(w, [qd, qd + kvd], axis=-1)
    qs = jnp.split(q, tp, axis=-1)
    ks = jnp.split(k, tp, axis=-1)
    vs = jnp.split(v, tp, axis=-1)
    return jnp.concatenate(
        [jnp.concatenate([qs[i], ks[i], vs[i]], axis=-1) for i in range(tp)],
        axis=-1,
    )


def _pad_cols(w: jax.Array, multiple: int) -> jax.Array:
    n = w.shape[-1]
    npad = -n % multiple
    if npad == 0:
        return w
    return jnp.concatenate(
        [w, jnp.zeros((*w.shape[:-1], npad), w.dtype)], axis=-1
    )


def _quantize_chunk_int4(chunk: jax.Array, pad_out: bool) -> dict:
    """vmap-over-L int4-in-int32 quantization of one (L, K, Nc) shard."""
    n_real = chunk.shape[-1]
    if pad_out:
        chunk = _pad_cols(chunk, 8 * qz.I32_GROUPSIZE)
    pw, sc = jax.vmap(qz.quantize_int4_i32)(chunk)
    if pad_out and sc.shape[-1] != n_real:
        # pad columns must dequantize to exactly zero (mirrors
        # quantize_params_int4_i32's hidden-dim padding rule)
        col = jnp.arange(sc.shape[-1]) < n_real
        sc = jnp.where(col[None, None, :], sc, 0.0)
    return {"pw": pw, "sc": sc}


def _quantize_chunk_int8(chunk: jax.Array, pad_out: bool) -> dict:
    del pad_out  # int8-in-int32 needs no hidden padding (K%4 only)
    p8, sc8 = jax.vmap(qz.quantize_int8_i32)(chunk)
    return {"p8": p8, "sc8": sc8}


_QUANTIZERS = {"int4": _quantize_chunk_int4, "int8": _quantize_chunk_int8}


def build_tp_layers(
    layers: dict, cfg: TransformerConfig, tp: int, quantisation_mode: str | None
) -> dict:
    """Dense stacked (L, in, out) layer params -> TP-global layout.

    Column-parallel weights are quantized whole (column slicing of a
    per-(group, column) quantization is exact); row-parallel weights are
    quantized per K-shard and the pw/sc tables concatenated along the
    sharded axis (see module docstring). ``quantisation_mode`` None keeps
    dense bf16 weights (only the qkv permutation applies).
    """
    if quantisation_mode not in (None, "int4", "int8"):
        raise ValueError(
            f"tp quantisation_mode must be None|'int4'|'int8', got "
            f"{quantisation_mode!r}"
        )
    out = dict(layers)
    out["wqkv"] = permute_qkv_cols(layers["wqkv"], cfg, tp)
    if "wqkv_b" in layers:
        out["wqkv_b"] = permute_qkv_cols(layers["wqkv_b"], cfg, tp)
    if quantisation_mode is None:
        return out
    quant = _QUANTIZERS[quantisation_mode]
    for key in _COLUMN:
        if key not in out:
            continue
        # hidden dim feeds the down-projection's per-shard padded K
        pad_out = key in ("w1", "w3", "w_fc")
        chunks = jnp.split(out[key], tp, axis=-1)
        qs = [quant(c, pad_out) for c in chunks]
        out[key] = {
            k: jnp.concatenate([q[k] for q in qs], axis=-1) for k in qs[0]
        }
    if quantisation_mode == "int4" and "w_fc_b" in out:
        # the column bias must match w_fc's PER-SHARD padded width (pad
        # hidden units are zero-activation, so a zero bias keeps them inert)
        bchunks = [
            _pad_cols(c, 8 * qz.I32_GROUPSIZE)
            for c in jnp.split(out["w_fc_b"], tp, axis=-1)
        ]
        out["w_fc_b"] = jnp.concatenate(bchunks, axis=-1)
    for key in _ROW:
        if key not in out:
            continue
        chunks = jnp.split(out[key], tp, axis=1)
        qs = [quant(c, False) for c in chunks]
        out[key] = {
            k: jnp.concatenate([q[k] for q in qs], axis=1) for k in qs[0]
        }
    return out


def layer_specs(layers: dict) -> dict:
    """PartitionSpec tree matching a build_tp_layers output."""
    t = TENSOR_AXIS
    specs: dict = {}
    for key, val in layers.items():
        if key in _COLUMN or key in ("wqkv_b", "w_fc_b"):
            # column-parallel weights and their biases (biases have one
            # fewer axis: (L, out))
            sp = P(None, t) if key in ("wqkv_b", "w_fc_b") else P(None, None, t)
            specs[key] = (
                {k: P(None, None, t) for k in val} if isinstance(val, dict) else sp
            )
        elif key in _ROW:
            specs[key] = (
                {k: P(None, t, None) for k in val}
                if isinstance(val, dict)
                else P(None, t, None)
            )
        else:  # norms + row-parallel biases: replicated
            specs[key] = P(*(None,) * val.ndim) if hasattr(val, "ndim") else P()
    return specs


def prepare_tp_params(
    params: dict,
    cfg: TransformerConfig,
    mesh: Mesh,
    quantisation_mode: str | None = None,
) -> dict:
    """Device-put a dense param tree in the TP layout onto the mesh.

    Non-layer leaves (wtes, wpe, speaker_cond, ln_f, lm_heads) replicate.
    """
    tp = mesh.shape[TENSOR_AXIS]
    layers = build_tp_layers(params["layers"], cfg, tp, quantisation_mode)
    specs = layer_specs(layers)
    rep = NamedSharding(mesh, P())
    out = {
        k: jax.tree.map(lambda x: jax.device_put(x, rep), v)
        for k, v in params.items()
        if k != "layers"
    }
    out["layers"] = jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        layers,
        specs,
        is_leaf=lambda x: not isinstance(x, (dict, list)),
    )
    return out


def make_tp_cache(
    cfg: TransformerConfig,
    mesh: Mesh,
    batch: int,
    max_seq_len: int | None = None,
    data_sharded: bool = True,
    dtype=jnp.bfloat16,
) -> tfm.KVCache:
    """KV cache sharded heads-over-tensor, batch-over-data.

    ``data_sharded=False`` replicates the batch axis instead — the
    single-utterance latency-TP layout (CFG rows don't divide a data axis).

    ``dtype`` follows KVCache.create ("int8" / "int8_packed" select the
    quantized capacity formats). Their scale tables fold batch*heads into
    one 128-lane-padded axis, so the TP-global table is the PER-SHARD-PADDED
    stack — width tp * pad128(batch_local * heads_local), NOT
    pad128(batch * heads) — and a natural last-axis shard hands each device
    exactly the local table KVCache.create(local_view) would build. Under
    TP the quantized cache keeps its capacity benefit but decodes through
    the XLA dequant path (the fused quantized-cache kernels stay
    single-device).
    """
    tp = mesh.shape[TENSOR_AXIS]
    lcfg = local_view(cfg, tp)
    batch_local = batch // mesh.shape[DATA_AXIS] if data_sharded else batch
    local = tfm.KVCache.create(lcfg, batch_local, max_seq_len, dtype=dtype)
    batch_ax = DATA_AXIS if data_sharded else None

    def _global_zeros(arr, kind):
        if kind == "kv":
            # heads axis back to the global count
            shape = list(arr.shape)
            shape[2] = batch
            shape[3] = cfg.n_local_heads
            sp = P(None, None, batch_ax, TENSOR_AXIS, None)
        else:
            # scale table: per-shard-padded widths stacked on the lane axis.
            # The lane axis folds batch*heads, so it shards over BOTH mesh
            # axes (data-major, matching the mesh axis order) when the batch
            # is data-sharded.
            shape = list(arr.shape)
            n_shards = tp * (mesh.shape[DATA_AXIS] if data_sharded else 1)
            shape[-1] = arr.shape[-1] * n_shards
            lane_ax = (DATA_AXIS, TENSOR_AXIS) if data_sharded else TENSOR_AXIS
            sp = P(*(None,) * (arr.ndim - 1), lane_ax)
        # allocate DIRECTLY sharded: an eager jnp.zeros would materialize
        # the full global cache on device 0 (12.9 GB at batch-16 bf16 — the
        # repo's measured capacity cliff) before resharding
        sh = NamedSharding(mesh, sp)
        return jax.jit(
            lambda: jnp.zeros(tuple(shape), arr.dtype), out_shardings=sh
        )()

    if local.k_scale is None:
        return tfm.KVCache(
            k=_global_zeros(local.k, "kv"), v=_global_zeros(local.v, "kv"),
            k_scale=None, v_scale=None,
        )
    return tfm.KVCache(
        k=_global_zeros(local.k, "kv"),
        v=_global_zeros(local.v, "kv"),
        k_scale=_global_zeros(local.k_scale, "scale"),
        v_scale=_global_zeros(local.v_scale, "scale"),
    )


def _blk_subtree(params):
    """The apply_blocks param subset + its shard_map specs."""
    blk = {"layers": params["layers"], "ln_f_w": params["ln_f_w"]}
    blk_specs = {"layers": layer_specs(params["layers"]), "ln_f_w": P(None)}
    if "ln_f_b" in params:
        blk["ln_f_b"] = params["ln_f_b"]
        blk_specs["ln_f_b"] = P(None)
    return blk, blk_specs


def _shard_map_blocks(mesh, lcfg, params, x, mask, kv, pos, data_sharded):
    """Run apply_blocks(tp_axis=...) under shard_map; handles bf16 and
    quantized (scale-table) caches. Returns (x, new KVCache)."""
    blk, blk_specs = _blk_subtree(params)
    batch_ax = DATA_AXIS if data_sharded else None
    x_sp = P(batch_ax, None, None)
    cache_sp = P(None, None, batch_ax, TENSOR_AXIS, None)
    mask_sp = P(None, None, None, None)
    pos = jnp.asarray(pos, jnp.int32)

    if kv.k_scale is None:

        def blocks(blk, x, k, v, mask, pos):
            xo, nkv = tfm.apply_blocks(
                blk, lcfg, x, mask, tfm.KVCache(k=k, v=v), pos,
                tp_axis=TENSOR_AXIS,
            )
            return xo, nkv.k, nkv.v

        xo, k_new, v_new = jax.shard_map(
            blocks,
            mesh=mesh,
            in_specs=(blk_specs, x_sp, cache_sp, cache_sp, mask_sp, P()),
            out_specs=(x_sp, cache_sp, cache_sp),
            check_vma=False,
        )(blk, x, kv.k, kv.v, mask, pos)
        return xo, tfm.KVCache(k=k_new, v=v_new)

    # quantized cache: scale-table lane axis folds batch*heads -> shards
    # over (data, tensor) together (see make_tp_cache)
    lane_ax = (DATA_AXIS, TENSOR_AXIS) if data_sharded else TENSOR_AXIS
    sc_sp = P(*(None,) * (kv.k_scale.ndim - 1), lane_ax)

    def blocks_q(blk, x, k, v, ks, vs, mask, pos):
        xo, nkv = tfm.apply_blocks(
            blk, lcfg, x, mask,
            tfm.KVCache(k=k, v=v, k_scale=ks, v_scale=vs), pos,
            tp_axis=TENSOR_AXIS,
        )
        return xo, nkv.k, nkv.v, nkv.k_scale, nkv.v_scale

    xo, k_new, v_new, ks_new, vs_new = jax.shard_map(
        blocks_q,
        mesh=mesh,
        in_specs=(
            blk_specs, x_sp, cache_sp, cache_sp, sc_sp, sc_sp, mask_sp, P()
        ),
        out_specs=(x_sp, cache_sp, cache_sp, sc_sp, sc_sp),
        check_vma=False,
    )(blk, x, kv.k, kv.v, kv.k_scale, kv.v_scale, mask, pos)
    return xo, tfm.KVCache(k=k_new, v=v_new, k_scale=ks_new, v_scale=vs_new)


def make_tp_forward_fn(cfg: TransformerConfig, mesh: Mesh):
    """Build the jitted TP forward: prefill (T>1) and decode (T=1) steps.

    Returns ``fn(params_tp, idx, spk_emb, spk_cond_mask, kv, cache_pos)
    -> (per-hierarchy logits list, new KVCache)``. Embed + LM head run under
    GSPMD outside the shard_map; the block stack runs inside it with
    ``tp_axis`` psums and per-shard kernels. The cache may be bf16 or a
    quantized capacity format from ``make_tp_cache``.
    """
    tp = mesh.shape[TENSOR_AXIS]
    lcfg = local_view(cfg, tp)

    def fwd(params, idx, spk_emb, spk_cond_mask, kv, cache_pos):
        t = idx.shape[-1]
        positions = jnp.arange(t) + cache_pos
        x = tfm.embed_inputs(
            params, cfg, idx, positions, spk_emb, spk_cond_mask, jnp.bfloat16
        )
        mask = tfm.causal_mask_for(positions, kv.max_seq_len)[None, None]
        x, new_kv = _shard_map_blocks(
            mesh, lcfg, params, x, mask, kv, cache_pos, data_sharded=True
        )
        logits = tfm.output_logits(params, cfg, x)
        return logits, new_kv

    return jax.jit(fwd, static_argnames=())


def make_tp_forward_nocache_fn(cfg: TransformerConfig, mesh: Mesh):
    """Non-cached TP forward: the non-causal second stage's block shape.

    Returns ``fn(params_tp, idx, spk_emb) -> logits list`` running
    the uncached block stack (the all-timesteps path, cfg.causal=False)
    under shard_map with local heads and per-layer psums, batch over the
    data axis. The ~10M second stage does not NEED TP for speed; this
    exists so every pipeline stage is shardable under the same layout
    contract (multi-hierarchy wtes and lm_heads stay replicated).
    """
    tp = mesh.shape[TENSOR_AXIS]
    lcfg = local_view(cfg, tp)

    def blocks(blk, x, mask):
        xo, _ = tfm.apply_blocks(
            blk, lcfg, x, mask, None, None, tp_axis=TENSOR_AXIS
        )
        return xo

    def fwd(params, idx, spk_emb):
        t = idx.shape[-1]
        positions = jnp.arange(t)
        x = tfm.embed_inputs(
            params, cfg, idx, positions, spk_emb, None, jnp.bfloat16
        )
        mask = (
            None
            if not cfg.causal
            else tfm.causal_mask_for(positions, t)[None, None]
        )
        blk, blk_specs = _blk_subtree(params)
        in_specs = (blk_specs, P(DATA_AXIS, None, None))
        args = (blk, x)
        if mask is not None:
            in_specs = in_specs + (P(None, None, None, None),)
            args = args + (mask,)
            body = blocks
        else:
            def body(blk, x):  # shard_map rejects None operands
                return blocks(blk, x, None)
        x = jax.shard_map(
            body,
            mesh=mesh,
            in_specs=in_specs,
            out_specs=P(DATA_AXIS, None, None),
            check_vma=False,
        )(*args)
        return tfm.output_logits(params, cfg, x)

    return jax.jit(fwd)


def make_tp_blocks_fn(cfg: TransformerConfig, mesh: Mesh):
    """Block-stack hook for models/first_stage.prefill/decode (blocks_fn=).

    Signature ``(params, x, mask, kv, pos) -> (x, kv, head_done=False)``:
    runs the layer scan under shard_map with per-shard kernels and per-layer
    psums, replicating the batch axis (single-utterance latency TP — the 2-3
    CFG rows don't divide a data axis; use make_tp_forward_fn for
    batch-over-data serving shapes). Plugging this into the existing
    generate loop keeps prefill bucketing, the one-compilation while_loop,
    EOA latching and CFG sampling unchanged.
    """
    tp = mesh.shape[TENSOR_AXIS]
    lcfg = local_view(cfg, tp)

    def blocks_fn(params, x, mask, kv, pos):
        xo, new_kv = _shard_map_blocks(
            mesh, lcfg, params, x, mask, kv, pos, data_sharded=False
        )
        return xo, new_kv, False

    return blocks_fn


def tp_generate(
    params_tp: dict,
    cfg: TransformerConfig,
    mesh: Mesh,
    prompt_tokens,
    spk_emb: jax.Array,
    *,
    key: jax.Array,
    blocks_fn=None,
    **generate_kwargs,
):
    """Tensor-parallel single-utterance generation.

    Thin wrapper over models/first_stage.generate: same sampling semantics
    and return contract, with the block stack executing via the shard_map TP
    path on ``mesh`` and a heads-sharded KV cache. ``params_tp`` must come
    from :func:`prepare_tp_params`. Reuse ``blocks_fn`` (one
    make_tp_blocks_fn result) across calls to avoid recompilation — the hook
    is a static jit argument.
    """
    from metavoice_tpu.models import first_stage as fs

    gs = generate_kwargs.get("guidance_scale", 3.0)
    _, _, cfg_rows = fs._normalize_guidance(gs)
    kv = generate_kwargs.pop("kv_cache", None)
    cache_dtype = generate_kwargs.pop("cache_dtype", None)
    if kv is None:
        kv = make_tp_cache(
            cfg, mesh, cfg_rows, data_sharded=False,
            dtype=cache_dtype or jnp.bfloat16,
        )
    if blocks_fn is None:
        blocks_fn = make_tp_blocks_fn(cfg, mesh)
    return fs.generate(
        params_tp, cfg, prompt_tokens, spk_emb, key=key, kv_cache=kv,
        blocks_fn=blocks_fn, **generate_kwargs,
    )


__all__ = [
    "local_view",
    "make_tp_forward_nocache_fn",
    "permute_qkv_cols",
    "build_tp_layers",
    "layer_specs",
    "prepare_tp_params",
    "make_tp_cache",
    "make_tp_forward_fn",
    "make_tp_blocks_fn",
    "tp_generate",
]

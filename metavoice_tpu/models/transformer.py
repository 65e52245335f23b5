"""The shared functional transformer core for both TTS stages.

One parameterized pure function replaces the reference's duplicated model
pair (fam/llm/model.py ``GPT`` for train/slow-infer and fam/llm/fast_model.py
``Transformer`` for compiled decode). TPU-first design:

  * Layer parameters are **stacked** along a leading L axis and the block
    stack runs as one ``jax.lax.scan`` — O(1) XLA graph size in depth, fast
    compiles, and a natural home for pipeline-parallel sharding later.
  * The KV cache is a pair of (L, B, H_kv, S, Dh) arrays threaded through the
    scan as explicit function state — no module buffers, no mutation; decode
    updates it with ``lax.dynamic_update_slice`` at a traced position.
  * Norms run in f32 regardless of compute dtype (the reference does the
    same: fam/llm/fast_model.py:256-261), matmuls in bf16 on the MXU.
  * Multi-hierarchy token embeddings are summed (fam/llm/model.py:232-235)
    and per-hierarchy output heads are separate matmuls
    (fam/llm/model.py:285-311); the single-vocab first stage is the
    degenerate 1-hierarchy case.

Weight layout convention: all linear weights are stored **(in, out)** so the
forward pass is ``x @ w`` with no transposes (torch stores (out, in); the
checkpoint converter — utils/checkpoint.py — transposes once at load time).
"""

from __future__ import annotations

import os
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from metavoice_tpu.core.config import TransformerConfig

Params = dict[str, Any]


class KVCache(NamedTuple):
    """Static-shape per-layer KV cache, layout (L, S, B, H_kv, Dh).

    Sequence-major layout: a decode step writes one contiguous
    (1, 1, B, H, Dh) block per layer (B*H*Dh*2 bytes in one run) instead of
    B*H strided Dh-sized chunks that a (L, B, H, S, Dh) layout would force.

    ``dtype=jnp.int8`` enables the quantized cache: values are stored int8
    with a per-(position, head) f32 absmax scale in ``k_scale``/``v_scale``,
    layout (L, S, 1, B*H) — sequence-major like the cache itself, so Pallas
    chunk DMAs slice the S axis (third-from-last: legal at ANY offset, no
    128-alignment requirement) and the decode kernel folds dequantization
    into the (chunk, B*H) score/probability matrices instead of per-element
    cache dequant. The singleton axis keeps S off the two tiled dims; DMAs
    index it away so the VMEM chunk buffers are plain (chunk, B*H). The
    B*H lane axis is zero-padded to a multiple of 128 (Mosaic requires
    128-aligned slice widths on the tiled lane dim); see kv_scale_width.

    This is a MEMORY-capacity feature: it halves cache HBM footprint
    (6.4 GB -> 3.2 GB for a batch-8 group at block 2048), roughly doubling
    the serving batch that fits one v5e. It is NOT a decode-speed win on
    this hardware generation: measured on chip, the int8 chunk loop is
    ~20-25% slower than bf16 despite half the DMA bytes, because Mosaic's
    i8->float conversions are relayout-bound on the VPU (see
    scripts/diag_kv8_kernel.py; chunk size 32/64/128 made no difference).
    ``k_scale is None`` means the plain bf16 cache (the speed default).

    ``dtype="int8_packed"`` stores the SAME int8 values packed four
    consecutive sequence positions per int32 word: k/v are
    (L, S/4, B, H, Dh) int32 (word w byte j = position 4w+j, little-endian)
    and the scale tables are residue-split (L, 4, S/4, 1, B*H_pad128) so a
    chunk read is one strided DMA. Packing moves the cache stream off the
    1-byte ~390 GB/s DMA ceiling onto the 4-byte ~490 GB/s one AND replaces
    Mosaic's relayout-bound i8->float converts with native i32 shift+cast
    unpacking — the same trick ops/quantized.py uses for int4/int8 weights.
    Decode steps read-modify-write one word row; shifts/rebases must be
    multiples of 4 positions (REBASE_ALIGN=128 satisfies this).
    """

    k: jax.Array
    v: jax.Array
    k_scale: jax.Array | None = None
    v_scale: jax.Array | None = None

    @classmethod
    def create(
        cls,
        cfg: TransformerConfig,
        batch_size: int,
        max_seq_len: int | None = None,
        dtype=jnp.bfloat16,
    ) -> "KVCache":
        s = max_seq_len or cfg.block_size
        shape = (cfg.n_layer, s, batch_size, cfg.n_local_heads, cfg.head_dim)
        if isinstance(dtype, str):
            # strings are MODE selectors, not raw dtypes: "int8" must build
            # the scale-table cache, never a scale-less raw-int8 one (which
            # would truncate bf16 K/V rows to {-1, 0, 1} without any error)
            if dtype == "int8":
                dtype = jnp.int8
            elif dtype != "int8_packed":
                raise ValueError(
                    f"unknown KV cache dtype string {dtype!r}; expected "
                    "'int8', 'int8_packed', or an array dtype"
                )
        if dtype == jnp.int8:
            sshape = (
                cfg.n_layer, s, 1,
                kv_scale_width(batch_size * cfg.n_local_heads),
            )
            return cls(
                k=jnp.zeros(shape, jnp.int8),
                v=jnp.zeros(shape, jnp.int8),
                k_scale=jnp.zeros(sshape, jnp.float32),
                v_scale=jnp.zeros(sshape, jnp.float32),
            )
        if dtype == "int8_packed":
            if s % KV_PACK != 0:
                raise ValueError(
                    f"packed int8 cache needs seq len % {KV_PACK} == 0, got {s}"
                )
            wshape = (
                cfg.n_layer, s // KV_PACK, batch_size, cfg.n_local_heads, cfg.head_dim
            )
            sshape = (
                cfg.n_layer, KV_PACK, s // KV_PACK, 1,
                kv_scale_width(batch_size * cfg.n_local_heads),
            )
            return cls(
                k=jnp.zeros(wshape, jnp.int32),
                v=jnp.zeros(wshape, jnp.int32),
                k_scale=jnp.zeros(sshape, jnp.float32),
                v_scale=jnp.zeros(sshape, jnp.float32),
            )
        return cls(k=jnp.zeros(shape, dtype), v=jnp.zeros(shape, dtype))

    @property
    def max_seq_len(self) -> int:
        return self.k.shape[1] * (KV_PACK if self.packed else 1)

    @property
    def batch_size(self) -> int:
        return self.k.shape[2]

    @property
    def quantized(self) -> bool:
        return self.k_scale is not None

    @property
    def packed(self) -> bool:
        """int8-in-int32 packed cache (4 positions per word along S)."""
        return self.k_scale is not None and self.k.dtype == jnp.int32


KV_PACK = 4  # sequence positions per int32 word in the packed int8 cache


def kv_scale_width(bh: int) -> int:
    """Lane width of the int8-cache scale tables: B*H rounded up to 128."""
    return ((bh + 127) // 128) * 128


def pack_kv_s(q8: jax.Array) -> jax.Array:
    """(T, ...) int8 rows (T % 4 == 0) -> (T/4, ...) int32 words.

    Word w holds positions 4w..4w+3 in bytes 0..3 (little-endian); the
    inverse of unpack_kv_s."""
    t = q8.shape[0]
    assert t % KV_PACK == 0, t
    b = q8.astype(jnp.int32) & 0xFF
    b = b.reshape(t // KV_PACK, KV_PACK, *q8.shape[1:])
    return b[:, 0] | (b[:, 1] << 8) | (b[:, 2] << 16) | (b[:, 3] << 24)


def unpack_kv_s(words: jax.Array) -> jax.Array:
    """(Sw, ...) int32 words -> (4*Sw, ...) int32 sign-extended int8 values."""
    parts = [(words << (24 - 8 * j)) >> 24 for j in range(KV_PACK)]
    st = jnp.stack(parts, axis=1)  # (Sw, 4, ...)
    return st.reshape(st.shape[0] * KV_PACK, *words.shape[1:])


def packed_kv_update(
    words_full: jax.Array, q8_rows: jax.Array, li: jax.Array, pos: jax.Array
) -> jax.Array:
    """Write T int8 rows into the packed (L, Sw, B, H, Dh) i32 cache at
    positions [pos, pos+T) of layer ``li`` — a read-modify-write on the
    touched words, correct at ANY alignment of ``pos``."""
    t = q8_rows.shape[0]
    sw = words_full.shape[1]
    nw = min((t + KV_PACK - 1) // KV_PACK + 1, sw)
    wbase = jnp.clip(pos // KV_PACK, 0, sw - nw)
    old = jax.lax.dynamic_slice(
        words_full, (li, wbase, 0, 0, 0), (1, nw) + words_full.shape[2:]
    )[0]  # (NW, B, H, Dh)
    p = (wbase + jnp.arange(nw))[:, None] * KV_PACK + jnp.arange(KV_PACK)[None, :]
    rel = p - pos  # (NW, 4)
    valid = (rel >= 0) & (rel < t)
    take = jnp.take(
        q8_rows.astype(jnp.int32) & 0xFF, jnp.clip(rel, 0, t - 1), axis=0
    )  # (NW, 4, B, H, Dh)
    vmask = valid[(...,) + (None,) * (take.ndim - 2)]
    new_word = jnp.zeros_like(old)
    for j in range(KV_PACK):
        oldb = (old >> (8 * j)) & 0xFF
        sel = jnp.where(vmask[:, j], take[:, j], oldb)
        new_word = new_word | (sel << (8 * j))
    return jax.lax.dynamic_update_slice(
        words_full, new_word[None], (li, wbase, 0, 0, 0)
    )


def packed_scale_update(
    table: jax.Array, s_rows: jax.Array, li: jax.Array, pos: jax.Array
) -> jax.Array:
    """Residue-split scale table (L, 4, Sw, 1, BHpad): write the (T, BH) f32
    scales for positions [pos, pos+T) of layer ``li`` (any alignment)."""
    t, bh = s_rows.shape
    sw, bhp = table.shape[2], table.shape[4]
    nw = min((t + KV_PACK - 1) // KV_PACK + 1, sw)
    wbase = jnp.clip(pos // KV_PACK, 0, sw - nw)
    old = jax.lax.dynamic_slice(
        table, (li, 0, wbase, 0, 0), (1, KV_PACK, nw, 1, bhp)
    )[0, :, :, 0]  # (4, NW, BHpad)
    p = (wbase + jnp.arange(nw))[None, :] * KV_PACK + jnp.arange(KV_PACK)[:, None]
    rel = p - pos  # (4, NW)
    valid = (rel >= 0) & (rel < t)
    s_pad = jnp.zeros((t, bhp), jnp.float32).at[:, :bh].set(
        s_rows.astype(jnp.float32)
    )
    take = jnp.take(s_pad, jnp.clip(rel, 0, t - 1), axis=0)  # (4, NW, BHpad)
    new = jnp.where(valid[..., None], take, old)
    return jax.lax.dynamic_update_slice(
        table, new[None, :, :, None, :], (li, 0, wbase, 0, 0)
    )


def packed_kv_dequant(
    words_full: jax.Array, table: jax.Array, li: jax.Array, dtype=jnp.float32
) -> jax.Array:
    """Dequantize layer ``li`` of the packed cache to (S, B, H, Dh)."""
    l, sw, b, h, dh = words_full.shape
    words = jax.lax.dynamic_index_in_dim(words_full, li, 0, keepdims=False)
    vals = unpack_kv_s(words).astype(jnp.float32)  # (S, B, H, Dh)
    sc = jax.lax.dynamic_index_in_dim(table, li, 0, keepdims=False)  # (4, Sw, 1, BHpad)
    sc = sc[:, :, 0, : b * h]  # (4, Sw, BH)
    sc = sc.transpose(1, 0, 2).reshape(sw * KV_PACK, b, h, 1)
    return (vals * sc).astype(dtype)


def quantize_kv_rows(w: jax.Array) -> tuple[jax.Array, jax.Array]:
    """(..., Dh) f32/bf16 -> (int8 values, (..., 1) f32 absmax scales)."""
    a = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=-1, keepdims=True)
    s = jnp.maximum(a, 1e-8) / 127.0
    q = jnp.clip(jnp.round(w.astype(jnp.float32) / s), -127, 127).astype(jnp.int8)
    return q, s


# --------------------------------------------------------------------------------------
# Initialization
# --------------------------------------------------------------------------------------


def init_params(
    key: jax.Array, cfg: TransformerConfig, dtype=jnp.float32
) -> Params:
    """Random-normal(0.02) init, matching the reference (fam/llm/model.py:170-176)."""

    def normal(key, shape, std=0.02):
        return (jax.random.normal(key, shape, jnp.float32) * std).astype(dtype)

    n_keys = 16
    keys = iter(jax.random.split(key, n_keys))
    d, i_sz = cfg.dim, cfg.intermediate_size
    l = cfg.n_layer
    qkv_out = (cfg.n_head + 2 * cfg.n_local_heads) * cfg.head_dim

    params: Params = {
        "wtes": [normal(k, (v, d)) for k, v in zip(jax.random.split(next(keys), cfg.num_hierarchies), cfg.vocab_sizes)],
        "wpe": normal(next(keys), (cfg.block_size, d)),
        "layers": {
            "attn_norm_w": jnp.ones((l, d), dtype),
            "wqkv": normal(next(keys), (l, d, qkv_out)),
            "wo": normal(next(keys), (l, d, d), std=0.02 / (2 * l) ** 0.5),
            "ffn_norm_w": jnp.ones((l, d), dtype),
        },
        "ln_f_w": jnp.ones((d,), dtype),
    }

    if cfg.nonlinearity_type == "swiglu":
        params["layers"]["w1"] = normal(next(keys), (l, d, i_sz))
        params["layers"]["w3"] = normal(next(keys), (l, d, i_sz))
        params["layers"]["w2"] = normal(next(keys), (l, i_sz, d), std=0.02 / (2 * l) ** 0.5)
    elif cfg.nonlinearity_type == "gelu":
        params["layers"]["w_fc"] = normal(next(keys), (l, d, 4 * d))
        params["layers"]["w_proj"] = normal(next(keys), (l, 4 * d, d), std=0.02 / (2 * l) ** 0.5)
    else:
        raise ValueError(f"unknown nonlinearity {cfg.nonlinearity_type}")

    if cfg.bias:
        params["layers"]["attn_norm_b"] = jnp.zeros((l, d), dtype)
        params["layers"]["ffn_norm_b"] = jnp.zeros((l, d), dtype)
        params["layers"]["wqkv_b"] = jnp.zeros((l, qkv_out), dtype)
        params["layers"]["wo_b"] = jnp.zeros((l, d), dtype)
        if cfg.nonlinearity_type == "gelu":
            params["layers"]["w_fc_b"] = jnp.zeros((l, 4 * d), dtype)
            params["layers"]["w_proj_b"] = jnp.zeros((l, d), dtype)
        params["ln_f_b"] = jnp.zeros((d,), dtype)

    if cfg.speaker_emb_dim:
        params["speaker_cond"] = normal(next(keys), (cfg.speaker_emb_dim, d))

    if cfg.target_vocab_sizes is not None:
        params["lm_heads"] = [
            normal(k, (d, v))
            for k, v in zip(
                jax.random.split(next(keys), len(cfg.target_vocab_sizes)),
                cfg.target_vocab_sizes,
            )
        ]
    # else: heads are weight-tied to wtes (fam/llm/model.py:139-143); the
    # forward pass reuses params["wtes"] transposed.
    return params


def param_count(params: Params) -> int:
    return sum(x.size for x in jax.tree.leaves(params))


# --------------------------------------------------------------------------------------
# Building blocks
# --------------------------------------------------------------------------------------


def _norm(x: jax.Array, w: jax.Array, b: jax.Array | None, norm_type: str, eps: float) -> jax.Array:
    """RMSNorm / LayerNorm in f32, result cast back to x.dtype."""
    xf = x.astype(jnp.float32)
    if norm_type == "rmsnorm":
        xf = xf * jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + eps)
    elif norm_type == "layernorm":
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.var(xf, axis=-1, keepdims=True)
        xf = (xf - mean) * jax.lax.rsqrt(var + 1e-5)
    else:
        raise ValueError(norm_type)
    out = xf.astype(x.dtype) * w.astype(x.dtype)
    if b is not None:
        out = out + b.astype(x.dtype)
    return out


def _linear(x: jax.Array, w, b: jax.Array | None = None) -> jax.Array:
    """Dense or weight-only-quantized linear.

    ``w`` is either a dense (in, out) array or a quantized dict from
    ops/quantized: {"q", "scales"} (int8 per-channel) or
    {"q", "scales", "zeros"} (int4 groupwise). On TPU the quantized path
    runs the Pallas kernels that keep the weight HBM reads at 1/2 / 1/4 of
    bf16 — the decode loop is weight-bandwidth-bound, so this is the main
    --quantisation_mode speed lever (reference analogue:
    fam/llm/fast_quantize.py + aten._weight_int4pack_mm).
    """
    if isinstance(w, dict):
        from metavoice_tpu.ops import quantized as qz

        lead = x.shape[:-1]
        x2 = x.reshape(-1, x.shape[-1])
        on_tpu = jax.default_backend() == "tpu"
        # matmul_int8 tiles over M; the int4 kernels hold the whole (M, K)
        # activation block in VMEM, so large M (prefill) falls back to XLA
        # dense dequant for those
        int4_large_m = "zeros" in w and x2.shape[0] > 256
        if int4_large_m:
            on_tpu = False
        if "p8" in w:  # int8-in-int32 packed serving format
            n = w["p8"].shape[-1]
            # Pallas path keeps the weight read int8 (word-streamed at the
            # wide-dtype DMA ceiling); serves prefill and TP per-shard
            # decode — single-device decode routes to the megakernel before
            # reaching here
            if on_tpu and n % 128 == 0:
                kp8 = w["p8"].shape[-2] * 4
                if x2.shape[-1] < kp8:  # packer padded K; pad rows are inert
                    x2 = jnp.pad(x2, ((0, 0), (0, kp8 - x2.shape[-1])))
                y2 = qz.matmul_int8_i32(x2, w["p8"], w["sc8"])
            else:
                y2 = qz.matmul_int8_i32_reference(x2, w["p8"], w["sc8"])
            y = y2.reshape(*lead, n).astype(x.dtype)
            if b is not None:
                y = y + b.astype(x.dtype)
            return y
        if "pw" in w:  # int4-in-int32 serving format (ops/quantized.py)
            # prefill path: the M-tiled Pallas kernel keeps the weight read
            # 4-bit (round 2 fell back to XLA dense dequant here, which
            # rematerialized the bf16 weights per prompt bucket). The hot
            # decode loop never lands here — apply_blocks routes
            # single-token steps to the fused megakernels instead.
            n = w["pw"].shape[-1]
            if on_tpu and n % 128 == 0:
                # the packer pads K to a multiple of 8*groupsize (1024); for
                # dims off that grid (e.g. a 1280-dim distilled draft) the
                # activations must be zero-padded to the packed K — pad rows
                # are numerically inert (their quant groups carry s = c = 0)
                kp = w["pw"].shape[0] * 8
                if x2.shape[-1] < kp:
                    x2 = jnp.pad(x2, ((0, 0), (0, kp - x2.shape[-1])))
                y2 = qz.matmul_int4_i32(x2, w["pw"], w["sc"])
            else:
                y2 = qz.matmul_int4_i32_reference(x2, w["pw"], w["sc"])
            y = y2.reshape(*lead, n).astype(x.dtype)
            if b is not None:
                y = y + b.astype(x.dtype)
            return y
        if "p" in w:  # nibble-packed int4: 4-bit HBM weight reads
            n = w["p"].shape[-1]
            tile_n = 512 if n % 512 == 0 else 256 if n % 256 == 0 else n
            groupsize = (2 * w["p"].shape[0]) // w["scales"].shape[0]
            if on_tpu:
                y2 = qz.matmul_int4_packed(
                    x2, w["p"], w["scales"], w["zeros"], groupsize=groupsize, tile_n=tile_n
                )
            else:
                y2 = qz.matmul_int4_reference(
                    x2, qz.unpack_int4(w["p"]), w["scales"], w["zeros"], groupsize=groupsize
                )
            y = y2.reshape(*lead, n).astype(x.dtype)
            if b is not None:
                y = y + b.astype(x.dtype)
            return y
        n = w["q"].shape[-1]
        tile_n = 512 if n % 512 == 0 else 256 if n % 256 == 0 else n
        if "zeros" in w:
            groupsize = w["q"].shape[0] // w["scales"].shape[0]
            if on_tpu:
                y2 = qz.matmul_int4(
                    x2, w["q"], w["scales"], w["zeros"], groupsize=groupsize, tile_n=tile_n
                )
            else:
                y2 = qz.matmul_int4_reference(
                    x2, w["q"], w["scales"], w["zeros"], groupsize=groupsize
                )
        else:
            if on_tpu:
                y2 = qz.matmul_int8(x2, w["q"], w["scales"], tile_n=tile_n)
            else:
                y2 = qz.matmul_int8_reference(x2, w["q"], w["scales"])
        y = y2.reshape(*lead, n).astype(x.dtype)
    else:
        y = jnp.einsum(
            "...d,df->...f", x, w.astype(x.dtype), preferred_element_type=x.dtype
        )
    if b is not None:
        y = y + b.astype(x.dtype)
    return y


def _mlp(
    x: jax.Array, lp: Params, cfg: TransformerConfig, tp_axis: str | None = None
) -> jax.Array:
    """FFN block. ``tp_axis`` (inside shard_map only) marks Megatron tensor
    parallelism: w1/w3 (or w_fc) are column shards and w2 (w_proj) row
    shards, so the down-projection yields a PARTIAL sum that is psum'd over
    the axis before the (replicated) bias is added."""
    if cfg.nonlinearity_type == "swiglu":
        w1, w3, w2 = lp["w1"], lp["w3"], lp["w2"]
        all_int8 = all(
            isinstance(w, dict) and "q" in w and "zeros" not in w for w in (w1, w3, w2)
        )
        if all_int8 and jax.default_backend() == "tpu" and x.shape[-2] == 1:
            # fused single-kernel SwiGLU FFN: one Pallas launch instead of
            # three, hidden activation never leaves VMEM. Shape-driven, so
            # local TP shards run it unmodified (partial sum out).
            from metavoice_tpu.ops import quantized as qz

            lead = x.shape[:-1]
            y = qz.ffn_int8(
                x.reshape(-1, x.shape[-1]),
                w1["q"], w1["scales"], w3["q"], w3["scales"], w2["q"], w2["scales"],
            )
            y = y.reshape(*lead, w2["q"].shape[-1]).astype(x.dtype)
        else:
            y = _linear(jax.nn.silu(_linear(x, w1)) * _linear(x, w3), w2)
        if tp_axis is not None:
            y = jax.lax.psum(y, tp_axis)
        return y
    y = _linear(
        jax.nn.gelu(_linear(x, lp["w_fc"], lp.get("w_fc_b")), approximate=False),
        lp["w_proj"],
    )
    if tp_axis is not None:
        y = jax.lax.psum(y, tp_axis)
    b = lp.get("w_proj_b")
    if b is not None:
        y = y + b.astype(y.dtype)
    return y


def _qkv_proj(
    x: jax.Array, lp: Params, cfg: TransformerConfig
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """x (B, T, D) -> q (B, H, T, Dh), k/v (B, H_kv, T, Dh)."""
    b, t, _ = x.shape
    h, h_kv, dh = cfg.n_head, cfg.n_local_heads, cfg.head_dim
    qkv = _linear(x, lp["wqkv"], lp.get("wqkv_b"))
    q, k, v = jnp.split(qkv, [h * dh, h * dh + h_kv * dh], axis=-1)
    q = q.reshape(b, t, h, dh).transpose(0, 2, 1, 3)
    k = k.reshape(b, t, h_kv, dh).transpose(0, 2, 1, 3)
    v = v.reshape(b, t, h_kv, dh).transpose(0, 2, 1, 3)
    return q, k, v


def _attend(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    cfg: TransformerConfig,
    mask: jax.Array | None,
    out_dtype,
) -> jax.Array:
    """Scaled-dot-product attention: q (B, H, T, Dh) x k/v (B, H_kv, S, Dh)
    -> (B, T, D). f32 softmax."""
    b, h, t, dh = q.shape
    if cfg.n_local_heads != cfg.n_head:
        rep = cfg.n_head // cfg.n_local_heads
        k = jnp.repeat(k, rep, axis=1)
        v = jnp.repeat(v, rep, axis=1)
    scores = jnp.einsum("bhtd,bhsd->bhts", q, k, preferred_element_type=jnp.float32)
    scores = scores * (1.0 / dh**0.5)
    if mask is not None:
        scores = jnp.where(mask, scores, -1e30)
    probs = jax.nn.softmax(scores, axis=-1).astype(out_dtype)
    y = jnp.einsum("bhts,bhsd->bhtd", probs, v, preferred_element_type=out_dtype)
    return y.transpose(0, 2, 1, 3).reshape(b, t, h * dh)


def _attend_seq_major(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    cfg: TransformerConfig,
    mask: jax.Array | None,
    out_dtype,
) -> jax.Array:
    """Attention against a sequence-major cache slice: q (B, H, T, Dh) x
    k/v (S, B, H_kv, Dh) -> (B, T, D). f32 softmax."""
    b, h, t, dh = q.shape
    if cfg.n_local_heads != cfg.n_head:
        rep = cfg.n_head // cfg.n_local_heads
        k = jnp.repeat(k, rep, axis=2)
        v = jnp.repeat(v, rep, axis=2)
    scores = jnp.einsum("bhtd,sbhd->bhts", q, k, preferred_element_type=jnp.float32)
    scores = scores * (1.0 / dh**0.5)
    if mask is not None:
        scores = jnp.where(mask, scores, -1e30)
    probs = jax.nn.softmax(scores, axis=-1).astype(out_dtype)
    y = jnp.einsum("bhts,sbhd->bhtd", probs, v, preferred_element_type=out_dtype)
    return y.transpose(0, 2, 1, 3).reshape(b, t, h * dh)


def _attention(
    x: jax.Array,
    lp: Params,
    cfg: TransformerConfig,
    mask: jax.Array | None,
    layer_cache: tuple[jax.Array, jax.Array] | None,
    cache_pos: jax.Array | None,
    tp_axis: str | None = None,
) -> tuple[jax.Array, tuple[jax.Array, jax.Array] | None]:
    """Full attention for one layer (uncached forward path).

    ``tp_axis`` (inside shard_map only): wqkv is a column shard (local
    heads) and wo a row shard, so the output projection is a partial sum
    psum'd over the axis before the (replicated) bias."""
    assert layer_cache is None, "cached path lives in apply_blocks"
    q, k, v = _qkv_proj(x, lp, cfg)
    y = _attend(q, k, v, cfg, mask, x.dtype)
    out = _linear(y, lp["wo"])
    if tp_axis is not None:
        out = jax.lax.psum(out, tp_axis)
    b = lp.get("wo_b")
    if b is not None:
        out = out + b.astype(out.dtype)
    return out, None


# --------------------------------------------------------------------------------------
# Full forward
# --------------------------------------------------------------------------------------


def embed_inputs(
    params: Params,
    cfg: TransformerConfig,
    idx: jax.Array,
    positions: jax.Array,
    spk_emb: jax.Array | None,
    spk_cond_mask: jax.Array | None = None,
    compute_dtype=jnp.bfloat16,
) -> jax.Array:
    """Token + position + speaker-conditioning embeddings.

    idx: (B, T) single-vocab or (B, C, T) multi-hierarchy (summed, reference
    fam/llm/model.py:232-235). spk_emb: (B, S_spk_dim) or (B, T, S_spk_dim)
    for per-position conditioning. spk_cond_mask: (B, 1, 1) 0/1 rows for CFG
    (reference fam/llm/fast_model.py:132-134,156).
    """
    if idx.ndim == 2:
        idx = idx[:, None, :]
    tok = jnp.zeros((idx.shape[0], idx.shape[2], cfg.dim), compute_dtype)
    for i, wte in enumerate(params["wtes"]):
        tok = tok + jnp.take(wte.astype(compute_dtype), idx[:, i, :], axis=0)
    pos = jnp.take(params["wpe"].astype(compute_dtype), positions, axis=0)
    x = tok + pos
    if spk_emb is not None and "speaker_cond" in params:
        cond = _linear(spk_emb.astype(compute_dtype), params["speaker_cond"])
        if cond.ndim == 2:
            cond = cond[:, None, :]  # (B, 1, D), broadcast over time
        if spk_cond_mask is not None:
            cond = cond * spk_cond_mask.astype(compute_dtype)
        x = x + cond
    return x


def _dropout(x: jax.Array, rate: float, key: jax.Array) -> jax.Array:
    """Inverted dropout (torch nn.Dropout semantics: scale kept values by
    1/(1-p) at train time)."""
    keep = jax.random.bernoulli(key, 1.0 - rate, x.shape)
    return jnp.where(keep, x / (1.0 - rate), jnp.zeros_like(x)).astype(x.dtype)


def apply_blocks(
    params: Params,
    cfg: TransformerConfig,
    x: jax.Array,
    mask: jax.Array | None,
    kv_cache: KVCache | None = None,
    cache_pos: jax.Array | None = None,
    attn_starts: jax.Array | None = None,
    dropout_key: jax.Array | None = None,
    fused_head: bool = False,
    tp_axis: str | None = None,
) -> tuple[jax.Array, KVCache | None]:
    """Run the L-layer block stack as one ``lax.scan``.

    ``tp_axis``: set ONLY inside a shard_map whose params/cache are Megatron
    tensor-parallel LOCAL shards (parallel/tp_decode.py) and whose ``cfg`` is
    the local view (per-device head count, full dim, head_dim_override).
    Adds the two per-layer psums (after the attention output projection and
    the FFN down projection). The block-fused kernels (megakernel, int8/int4
    attention-block kernels) are disabled under TP — they fuse the residual
    stream across the reduction points — but the shape-driven per-matmul
    quantized kernels and the flash decode-attention cache kernel still run
    on the local shards, so TP decode keeps 4-bit weight reads and the
    single-DMA cache stream.

    ``fused_head=True`` (decode callers only) returns a THREE-tuple
    (x_or_logits, new_kv, head_done): when the whole-stack kernel runs with
    packed lm-head weights (params["lm_head_q"]), the final norm + tied
    head are fused into its last grid step and ``x_or_logits`` is the (B, V)
    f32 logits (head_done=True); otherwise x is the normed hidden state as
    usual (head_done=False) and the caller applies output_logits.

    Hot-loop note: the KV cache rides in the scan *carry*, updated with
    ``dynamic_update_slice`` at (layer, .., cache_pos) — XLA aliases loop
    carries in place. Passing the caches as scan xs/ys instead would restack
    the full (L, B, H, S, Dh) buffers (hundreds of MB for the 1.2B model)
    into fresh output arrays on every decode step.

    ``dropout_key`` (training path only) enables cfg.dropout on the
    attention and MLP residual branches (reference fam/llm/model.py
    resid/MLP nn.Dropout; the attention-probability dropout inside SDPA is
    intentionally not reproduced — with the finetune default p=0.1 its
    effect is subsumed by the residual dropouts, and it would break the
    fused attention path).
    """
    lp_stack = params["layers"]
    train_dropout = (
        dropout_key is not None and cfg.dropout > 0.0 and kv_cache is None
    )

    def block_compute(x, lp, layer_cache, drop_key=None):
        h_attn, new_cache = _attention(
            _norm(x, lp["attn_norm_w"], lp.get("attn_norm_b"), cfg.norm_type, cfg.norm_eps),
            lp,
            cfg,
            mask,
            layer_cache,
            cache_pos,
            tp_axis,
        )
        if drop_key is not None:
            k1, k2 = jax.random.split(drop_key)
            h_attn = _dropout(h_attn, cfg.dropout, k1)
        h = x + h_attn
        m = _mlp(_norm(h, lp["ffn_norm_w"], lp.get("ffn_norm_b"), cfg.norm_type, cfg.norm_eps), lp, cfg, tp_axis)
        if drop_key is not None:
            m = _dropout(m, cfg.dropout, k2)
        out = h + m
        return out, new_cache

    if kv_cache is not None:
        t = x.shape[1]
        # single-token decode on TPU takes the fused flash-decoding kernel:
        # one Pallas call replaces cache updates + masked attention AND only
        # streams the valid [0, pos] cache prefix from HBM. GQA
        # (n_local_heads < n_head) is supported by the plain kernel (it
        # routes through the kv-head-space multi kernel); the block-fused
        # int8/int4 kernels additionally require MHA (gated below).
        use_fused = (
            t == 1
            # Mosaic tiling constraints: head_dim must fill the 128 lanes
            # and the flattened B*H rows the 8 sublanes
            and cfg.head_dim % 128 == 0
            and (x.shape[0] * cfg.n_head) % 8 == 0
            and (x.shape[0] * cfg.n_local_heads) % 8 == 0
            and jax.default_backend() == "tpu"
        )
        # short multi-token cached forwards (the speculative T=gamma verify,
        # models/spec_decode.py) take the length-bounded multi-query kernel:
        # it streams only [min(starts), pos+T) instead of the FULL static
        # cache the XLA path reads — the dominant cost of the verify round.
        # Prefill never lands here (prompt buckets are >= 128 tokens).
        # Assumes contiguous query positions [cache_pos, cache_pos+T) with
        # causal masking — exactly what every cached caller passes.
        use_fused_multi = (
            1 < t <= 16
            and cfg.head_dim % 128 == 0
            and (x.shape[0] * cfg.n_local_heads) % 8 == 0
            and jax.default_backend() == "tpu"
        )

        quantized_cache = kv_cache.quantized

        def _is_int8(w):
            return isinstance(w, dict) and "q" in w and "zeros" not in w

        def _is_int4(w):
            return isinstance(w, dict) and "pw" in w

        def _is_int8_packed(w):
            return isinstance(w, dict) and "p8" in w

        _mega_ok = (
            use_fused
            and tp_axis is None  # block kernels fuse across the TP psums
            and cfg.nonlinearity_type == "swiglu"
            and cfg.dim % 1024 == 0
            and "wqkv_b" not in lp_stack
        )
        int4_mega = _mega_ok and all(
            _is_int4(lp_stack.get(k)) for k in ("wqkv", "wo", "w1", "w3", "w2")
        )
        int8_packed_mega = _mega_ok and all(
            _is_int8_packed(lp_stack.get(k)) for k in ("wqkv", "wo", "w1", "w3", "w2")
        )
        if int8_packed_mega and not quantized_cache and cfg.norm_type == "rmsnorm":
            # packed-int8 serving: the same whole-stack kernel with the
            # "i8" word format (2-byte-ceiling HBM reads; plain int8 arrays
            # cap at the ~390 GB/s 1-byte ceiling — ops/quantized.py notes)
            from metavoice_tpu.ops.decode_stack import decode_stack_int4

            big8 = {k: lp_stack[k] for k in ("wqkv", "wo", "w1", "w3", "w2")}
            xo, k_new, v_new = decode_stack_int4(
                x[:, 0, :],
                lp_stack["attn_norm_w"],
                lp_stack["ffn_norm_w"],
                big8["wqkv"]["p8"], big8["wqkv"]["sc8"],
                big8["wo"]["p8"], big8["wo"]["sc8"],
                big8["w1"]["p8"], big8["w1"]["sc8"],
                big8["w3"]["p8"], big8["w3"]["sc8"],
                big8["w2"]["p8"], big8["w2"]["sc8"],
                kv_cache.k, kv_cache.v,
                jnp.asarray(cache_pos, jnp.int32),
                cfg.n_head,
                n_kv_head=cfg.n_local_heads,
                starts=attn_starts,
                norm_eps=cfg.norm_eps,
                wfmt="i8",
            )
            x = xo[:, None, :].astype(x.dtype)
            x = _norm(x, params["ln_f_w"], params.get("ln_f_b"), cfg.norm_type, cfg.norm_eps)
            kv_out = KVCache(k=k_new, v=v_new, k_scale=None, v_scale=None)
            if fused_head:
                return x, kv_out, False
            return x, kv_out
        if int4_mega:
            big = {k: lp_stack[k] for k in ("wqkv", "wo", "w1", "w3", "w2")}
            small = {k: v for k, v in lp_stack.items() if k not in big}

            # whole-stack megakernel: ALL layers in ONE Pallas call
            # (grid=(L,)) with the weight stream pipelined ACROSS layers —
            # phase-boundary DMA stalls and 47 of the 48 per-token kernel
            # launches disappear (ops/decode_stack.py). Conditions beyond
            # int4_mega: bf16 cache (the int8-cache capacity path keeps the
            # two-kernel route), rmsnorm without biases, tile-aligned dims.
            ip = big["w1"]["pw"].shape[2]
            use_stack = (
                not quantized_cache
                and cfg.norm_type == "rmsnorm"
                and "attn_norm_b" not in lp_stack
                and cfg.dim % 1024 == 0
                and ip % 1024 == 0
                and os.environ.get("MVTPU_STACK_KERNEL", "1") != "0"
            )
            if use_stack:
                from metavoice_tpu.ops.decode_stack import decode_stack_int4

                head = params.get("lm_head_q") if fused_head else None
                do_head = head is not None and "ln_f_b" not in params
                head_kwargs = (
                    dict(
                        ln_f_w=params["ln_f_w"],
                        head_pw=head["pw"],
                        head_sc=head["sc"],
                    )
                    if do_head
                    else {}
                )
                outs = decode_stack_int4(
                    x[:, 0, :],
                    lp_stack["attn_norm_w"],
                    lp_stack["ffn_norm_w"],
                    big["wqkv"]["pw"], big["wqkv"]["sc"],
                    big["wo"]["pw"], big["wo"]["sc"],
                    big["w1"]["pw"], big["w1"]["sc"],
                    big["w3"]["pw"], big["w3"]["sc"],
                    big["w2"]["pw"], big["w2"]["sc"],
                    kv_cache.k, kv_cache.v,
                    jnp.asarray(cache_pos, jnp.int32),
                    cfg.n_head,
                    n_kv_head=cfg.n_local_heads,
                    starts=attn_starts,
                    norm_eps=cfg.norm_eps,
                    **head_kwargs,
                )
                new_kv = KVCache(k=outs[1], v=outs[2], k_scale=None, v_scale=None)
                if do_head:
                    # fused final norm + int4 tied head: slice off the vocab
                    # padding columns (their sc rows are zeroed -> logits 0)
                    logits = outs[3][:, : cfg.vocab_sizes[0]]
                    return logits, new_kv, True
                x = outs[0][:, None, :].astype(x.dtype)
                x = _norm(x, params["ln_f_w"], params.get("ln_f_b"), cfg.norm_type, cfg.norm_eps)
                if fused_head:
                    return x, new_kv, False
                return x, new_kv

            # int4 serving fallback: TWO Pallas calls per layer (attention
            # block + fused FFN), both DMA-slicing the STACKED packed
            # weights by layer index — 4-bit HBM weight reads end to end
            from metavoice_tpu.ops.attention import decode_attention_block_int4
            from metavoice_tpu.ops.quantized import decode_ffn_int4

            def body4(carry, lp):
                x, k_full, v_full, ks_full, vs_full, li = carry
                xa = _norm(x, lp["attn_norm_w"], lp.get("attn_norm_b"), cfg.norm_type, cfg.norm_eps)
                y2, k_full, v_full, ks_full, vs_full = decode_attention_block_int4(
                    xa[:, 0, :],
                    big["wqkv"]["pw"], big["wqkv"]["sc"],
                    big["wo"]["pw"], big["wo"]["sc"],
                    k_full, v_full, li,
                    jnp.asarray(cache_pos, jnp.int32),
                    cfg.n_head,
                    n_kv_head=cfg.n_local_heads,
                    starts=attn_starts,
                    k_scale=ks_full,
                    v_scale=vs_full,
                )
                h = x + y2[:, None, :].astype(x.dtype)
                hn = _norm(h, lp["ffn_norm_w"], lp.get("ffn_norm_b"), cfg.norm_type, cfg.norm_eps)
                f = decode_ffn_int4(
                    hn[:, 0, :],
                    big["w1"]["pw"], big["w1"]["sc"],
                    big["w3"]["pw"], big["w3"]["sc"],
                    big["w2"]["pw"], big["w2"]["sc"],
                    li,
                )
                out = h + f[:, None, :].astype(x.dtype)
                return (out, k_full, v_full, ks_full, vs_full, li + 1), None

            (x, k_new, v_new, ks_new, vs_new, _), _ = jax.lax.scan(
                body4,
                (x, kv_cache.k, kv_cache.v, kv_cache.k_scale, kv_cache.v_scale,
                 jnp.asarray(0, jnp.int32)),
                small,
            )
            x = _norm(x, params["ln_f_w"], params.get("ln_f_b"), cfg.norm_type, cfg.norm_eps)
            kv_out = KVCache(k=k_new, v=v_new, k_scale=ks_new, v_scale=vs_new)
            if fused_head:
                return x, kv_out, False
            return x, kv_out

        def body(carry, lp):
            x, k_full, v_full, ks_full, vs_full, li = carry
            xa = _norm(x, lp["attn_norm_w"], lp.get("attn_norm_b"), cfg.norm_type, cfg.norm_eps)
            if (
                use_fused
                and cfg.n_local_heads == cfg.n_head  # block kernel is MHA-only
                and tp_axis is None  # fuses wo + residual across the psum
                and not quantized_cache
                and _is_int8(lp["wqkv"])
                and _is_int8(lp["wo"])
                and "wqkv_b" not in lp
                and cfg.dim % 512 == 0
            ):
                # int8 megakernel: qkv projection + cache write + flash
                # attention + output projection in ONE Pallas call
                from metavoice_tpu.ops.attention import decode_attention_block_int8

                y2, k_full, v_full = decode_attention_block_int8(
                    xa[:, 0, :],
                    lp["wqkv"]["q"],
                    lp["wqkv"]["scales"],
                    lp["wo"]["q"],
                    lp["wo"]["scales"],
                    k_full,
                    v_full,
                    li,
                    jnp.asarray(cache_pos, jnp.int32),
                    cfg.n_head,
                    starts=attn_starts,
                )
                h = x + y2[:, None, :].astype(x.dtype)
                out = h + _mlp(
                    _norm(h, lp["ffn_norm_w"], lp.get("ffn_norm_b"), cfg.norm_type, cfg.norm_eps),
                    lp,
                    cfg,
                )
                return (out, k_full, v_full, ks_full, vs_full, li + 1), None
            q, k_new, v_new = _qkv_proj(xa, lp, cfg)
            if use_fused and not quantized_cache:
                from metavoice_tpu.ops.attention import decode_attention

                y3, k_full, v_full = decode_attention(
                    q[:, :, 0, :],  # (B, H, Dh)
                    k_new[:, :, 0, :],
                    v_new[:, :, 0, :],
                    k_full,
                    v_full,
                    li,
                    jnp.asarray(cache_pos, jnp.int32),
                    starts=attn_starts,
                )
                y = y3.reshape(x.shape[0], 1, cfg.n_head * cfg.head_dim).astype(x.dtype)
            elif use_fused_multi and not quantized_cache:
                from metavoice_tpu.ops.attention import decode_attention_multi

                y4, k_full, v_full = decode_attention_multi(
                    q,  # (B, H, T, Dh)
                    k_new,
                    v_new,
                    k_full,
                    v_full,
                    li,
                    jnp.asarray(cache_pos, jnp.int32),
                    starts=attn_starts,
                )
                y = (
                    y4.transpose(0, 2, 1, 3)
                    .reshape(x.shape[0], t, cfg.n_head * cfg.head_dim)
                    .astype(x.dtype)
                )
            else:
                # prefill / CPU path: windowed in-place update on the carry
                t_win = k_new.shape[2]
                b_rows = k_new.shape[0]
                k_win = k_new.transpose(2, 0, 1, 3)[None]  # (1, T, B, H, Dh)
                v_win = v_new.transpose(2, 0, 1, 3)[None]
                if quantized_cache and kv_cache.packed:
                    # packed int8 cache: quantize the window, read-modify-
                    # write the touched int32 words + residue-split scale
                    # rows, then dequantize the layer slice for attention.
                    bh_rows = b_rows * cfg.n_local_heads
                    k_q, k_s = quantize_kv_rows(k_win)
                    v_q, v_s = quantize_kv_rows(v_win)
                    pos_i = jnp.asarray(cache_pos, jnp.int32)
                    k_full = packed_kv_update(k_full, k_q[0], li, pos_i)
                    v_full = packed_kv_update(v_full, v_q[0], li, pos_i)
                    ks_full = packed_scale_update(
                        ks_full, k_s[0, :, :, :, 0].reshape(t_win, bh_rows), li, pos_i
                    )
                    vs_full = packed_scale_update(
                        vs_full, v_s[0, :, :, :, 0].reshape(t_win, bh_rows), li, pos_i
                    )
                    layer_k = packed_kv_dequant(k_full, ks_full, li, x.dtype)
                    layer_v = packed_kv_dequant(v_full, vs_full, li, x.dtype)
                elif quantized_cache:
                    # int8 cache: per-(position, head) absmax rows; the
                    # attention read dequantizes the layer slice. Scales are
                    # stored sequence-major (L, S, 1, B*H) — see KVCache.
                    bh_rows = b_rows * cfg.n_local_heads
                    k_q, k_s = quantize_kv_rows(k_win)
                    v_q, v_s = quantize_kv_rows(v_win)
                    k_full = jax.lax.dynamic_update_slice(
                        k_full, k_q, (li, cache_pos, 0, 0, 0)
                    )
                    v_full = jax.lax.dynamic_update_slice(
                        v_full, v_q, (li, cache_pos, 0, 0, 0)
                    )
                    ks_full = jax.lax.dynamic_update_slice(
                        ks_full,
                        k_s.reshape(1, t_win, 1, bh_rows),
                        (li, cache_pos, 0, 0),
                    )
                    vs_full = jax.lax.dynamic_update_slice(
                        vs_full,
                        v_s.reshape(1, t_win, 1, bh_rows),
                        (li, cache_pos, 0, 0),
                    )
                    s_len = k_full.shape[1]

                    def _deq(cache_full, scale_full):
                        vals = jax.lax.dynamic_index_in_dim(
                            cache_full, li, 0, keepdims=False
                        ).astype(jnp.float32)
                        sc = jax.lax.dynamic_index_in_dim(
                            scale_full, li, 0, keepdims=False
                        )[:, 0, :bh_rows]  # (S, BH) minus lane padding
                        sc = sc.reshape(s_len, b_rows, cfg.n_local_heads, 1)
                        return (vals * sc).astype(x.dtype)

                    layer_k = _deq(k_full, ks_full)
                    layer_v = _deq(v_full, vs_full)
                else:
                    k_full = jax.lax.dynamic_update_slice(
                        k_full, k_win.astype(k_full.dtype), (li, cache_pos, 0, 0, 0)
                    )
                    v_full = jax.lax.dynamic_update_slice(
                        v_full, v_win.astype(v_full.dtype), (li, cache_pos, 0, 0, 0)
                    )
                    layer_k = jax.lax.dynamic_index_in_dim(k_full, li, 0, keepdims=False)
                    layer_v = jax.lax.dynamic_index_in_dim(v_full, li, 0, keepdims=False)
                y = _attend_seq_major(q, layer_k, layer_v, cfg, mask, x.dtype)
            proj = _linear(y, lp["wo"])
            if tp_axis is not None:
                proj = jax.lax.psum(proj, tp_axis)
            if lp.get("wo_b") is not None:
                proj = proj + lp["wo_b"].astype(proj.dtype)
            h = x + proj
            out = h + _mlp(
                _norm(h, lp["ffn_norm_w"], lp.get("ffn_norm_b"), cfg.norm_type, cfg.norm_eps),
                lp,
                cfg,
                tp_axis,
            )
            return (out, k_full, v_full, ks_full, vs_full, li + 1), None

        # NOTE: do not unroll this scan — unrolling was measured slower
        # (11.4 vs 5.6 ms/token bf16): it breaks XLA's in-place aliasing of
        # the carried cache buffers.
        (x, k_new, v_new, ks_new, vs_new, _), _ = jax.lax.scan(
            body,
            (x, kv_cache.k, kv_cache.v, kv_cache.k_scale, kv_cache.v_scale,
             jnp.asarray(0, jnp.int32)),
            lp_stack,
        )
        new_kv = KVCache(k=k_new, v=v_new, k_scale=ks_new, v_scale=vs_new)
    else:
        # rematerialize per-layer activations on the backward pass: without
        # this, training saves every intermediate of all layers
        # (~12 GB at batch 2 x 2048 for the 1.2B model) and OOMs one chip
        if train_dropout:
            layer_keys = jax.random.split(dropout_key, cfg.n_layer)
            body_fn = jax.checkpoint(
                lambda c, xs: (block_compute(c, xs[0], None, drop_key=xs[1])[0], None)
            )
            x, _ = jax.lax.scan(body_fn, x, (lp_stack, layer_keys))
        else:
            body_fn = jax.checkpoint(lambda c, lp: (block_compute(c, lp, None)[0], None))
            x, _ = jax.lax.scan(body_fn, x, lp_stack)
        new_kv = None

    x = _norm(x, params["ln_f_w"], params.get("ln_f_b"), cfg.norm_type, cfg.norm_eps)
    if fused_head:
        return x, new_kv, False
    return x, new_kv


def output_logits(
    params: Params, cfg: TransformerConfig, x: jax.Array
) -> list[jax.Array]:
    """Per-hierarchy lm-head logits in f32. Weight-tied to wtes when
    target_vocab_sizes is None (fam/llm/model.py:139-143)."""
    if cfg.target_vocab_sizes is not None:
        heads = params["lm_heads"]
        return [
            jnp.einsum("...d,dv->...v", x, h.astype(x.dtype), preferred_element_type=jnp.float32)
            for h in heads
        ]
    return [
        jnp.einsum("...d,vd->...v", x, w.astype(x.dtype), preferred_element_type=jnp.float32)
        for w in params["wtes"]
    ]


def causal_mask_for(positions: jax.Array, kv_len: int) -> jax.Array:
    """(..., T, kv_len) boolean mask: query at absolute position p sees
    cache slots [0, p]. Equivalent to indexing the reference's precomputed
    tril table with input_pos (fam/llm/fast_model.py:148-151)."""
    kv_pos = jnp.arange(kv_len)
    return positions[..., :, None] >= kv_pos[..., None, :]


def forward(
    params: Params,
    cfg: TransformerConfig,
    idx: jax.Array,
    *,
    positions: jax.Array | None = None,
    spk_emb: jax.Array | None = None,
    spk_cond_mask: jax.Array | None = None,
    kv_cache: KVCache | None = None,
    cache_pos: jax.Array | int = 0,
    compute_dtype=jnp.bfloat16,
    dropout_key: jax.Array | None = None,
) -> tuple[list[jax.Array], KVCache | None]:
    """Full forward pass: (B, [C,] T) tokens -> per-hierarchy (B, T, V) logits.

    * causal without cache: standard training / slow-infer forward
    * causal with cache: prefill (T>1) or decode (T=1) at ``cache_pos``
    * non-causal: all-to-all attention (second stage)

    ``dropout_key`` + cfg.dropout > 0 enables training dropout on the
    embedding sum (reference transformer.drop, fam/llm/model.py:276) and the
    residual branches (see apply_blocks). Inference callers pass no key.
    """
    t = idx.shape[-1]
    if positions is None:
        positions = jnp.arange(t) + (cache_pos if kv_cache is not None else 0)

    x = embed_inputs(params, cfg, idx, positions, spk_emb, spk_cond_mask, compute_dtype)
    key_emb = key_blocks = None
    if dropout_key is not None and cfg.dropout > 0.0 and kv_cache is None:
        key_emb, key_blocks = jax.random.split(dropout_key)
        x = _dropout(x, cfg.dropout, key_emb)

    if not cfg.causal:
        mask = None
    elif kv_cache is not None:
        mask = causal_mask_for(positions, kv_cache.max_seq_len)[None, None]
    else:
        mask = causal_mask_for(positions, t)[None, None]

    x, new_kv = apply_blocks(
        params, cfg, x, mask, kv_cache,
        jnp.asarray(cache_pos) if kv_cache is not None else None,
        dropout_key=key_blocks,
    )
    return output_logits(params, cfg, x), new_kv

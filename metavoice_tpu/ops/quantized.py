"""Weight-only quantization: int8 per-channel and int4 groupwise matmuls.

The reference's quantisation (fam/llm/fast_quantize.py) packs Linear weights
to int8 (symmetric per-channel, :38-67) or int4 (groupwise g=128 with
scales+zeros, :70-148) and dequantizes inside CUDA kernels
(aten._weight_int4pack_mm). Here the same qparam math feeds TPU execution:

  * ``quantize_int8`` / ``quantize_int4`` reproduce the reference's
    quantization rules, so converted checkpoints are bit-compatible.
  * ``matmul_int8`` / ``matmul_int4`` are Pallas TPU kernels that stream the
    quantized weights HBM->VMEM and dequantize in-register before hitting
    the MXU — halving (int8) or quartering (int4) the weight bandwidth,
    which is exactly what the decode loop is bound by.
  * A jnp fallback path (``*_reference``) defines the semantics and runs
    anywhere (used for testing and as the CPU path).

int4 values are stored unpacked as int8 in [-8, 7] with a (out, n_groups)
scale/zero table; packing two nibbles per byte is a further bandwidth win
tracked for the kernel-hardening pass.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

try:  # imported lazily in kernels elsewhere; top-level for the fused FFN
    from jax.experimental import pallas as pl
except ImportError:  # pragma: no cover
    pl = None


# --------------------------------------------------------------------------------------
# Quantization math (parity with fam/llm/fast_quantize.py)
# --------------------------------------------------------------------------------------


def quantize_int8(w: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Symmetric per-output-channel int8 (reference :38-67).

    w: (in, out) -> (q (in, out) int8, scales (out,) f32); w ~= q * scales.
    """
    w = w.astype(jnp.float32)
    max_abs = jnp.max(jnp.abs(w), axis=0)  # per output channel
    scales = jnp.maximum(max_abs, 1e-8) / 127.0
    q = jnp.clip(jnp.round(w / scales), -128, 127).astype(jnp.int8)
    return q, scales


def dequantize_int8(q: jax.Array, scales: jax.Array) -> jax.Array:
    return q.astype(jnp.float32) * scales


def quantize_int4_grouped(
    w: jax.Array, groupsize: int = 128
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Asymmetric groupwise int4 (reference :70-132): per (out-channel,
    input-group) scale and zero point.

    w: (in, out) -> (q (in, out) int8 in [-8, 7], scales (n_groups, out),
    zeros (n_groups, out)); w ~= (q + 0.5) * scales + zeros  per group.
    (The reference uses midpoint convention: q in [0,15] with
    w = (q - 8 + 0.5) * scale + zero; we store q - 8.)
    """
    in_dim, out_dim = w.shape
    if in_dim % groupsize != 0:
        raise ValueError(f"in_dim {in_dim} not divisible by groupsize {groupsize}")
    wg = w.astype(jnp.float32).reshape(in_dim // groupsize, groupsize, out_dim)
    w_min = jnp.minimum(wg.min(axis=1), 0.0)  # (n_groups, out)
    w_max = jnp.maximum(wg.max(axis=1), 0.0)
    scales = jnp.maximum(w_max - w_min, 1e-6) / 15.0
    zeros = w_min + scales * 7.5
    q = jnp.clip(
        jnp.round((wg - w_min[:, None, :]) / scales[:, None, :] - 8.0), -8, 7
    ).astype(jnp.int8)
    return q.reshape(in_dim, out_dim), scales, zeros


def dequantize_int4_grouped(
    q: jax.Array, scales: jax.Array, zeros: jax.Array, groupsize: int = 128
) -> jax.Array:
    in_dim, out_dim = q.shape
    qg = q.astype(jnp.float32).reshape(in_dim // groupsize, groupsize, out_dim)
    w = (qg + 0.5) * scales[:, None, :] + zeros[:, None, :]
    return w.reshape(in_dim, out_dim)


# --------------------------------------------------------------------------------------
# Reference (jnp) matmuls — semantic ground truth, CPU-safe
# --------------------------------------------------------------------------------------


def matmul_int8_reference(x: jax.Array, q: jax.Array, scales: jax.Array) -> jax.Array:
    """x (..., in) @ dequant(q) -> (..., out). Matches reference
    WeightOnlyInt8Linear forward: F.linear(x, w.to(dtype)) * scales (:183-198)."""
    y = jnp.einsum(
        "...d,do->...o", x.astype(jnp.float32), q.astype(jnp.float32)
    )
    return (y * scales).astype(x.dtype)


def matmul_int4_reference(
    x: jax.Array, q: jax.Array, scales: jax.Array, zeros: jax.Array, groupsize: int = 128
) -> jax.Array:
    w = dequantize_int4_grouped(q, scales, zeros, groupsize)
    return jnp.einsum("...d,do->...o", x.astype(jnp.float32), w).astype(x.dtype)


# --------------------------------------------------------------------------------------
# Pallas TPU kernels
# --------------------------------------------------------------------------------------


def _int8_matmul_kernel(x_ref, q_ref, s_ref, o_ref):
    """One (TILE_M, K) x (K, TILE_N) tile: dequant int8 in VMEM, MXU matmul."""
    x = x_ref[:]
    w = q_ref[:].astype(jnp.bfloat16)
    acc = jnp.dot(x.astype(jnp.bfloat16), w, preferred_element_type=jnp.float32)
    o_ref[:] = (acc * s_ref[0, :].astype(jnp.float32)).astype(o_ref.dtype)


def matmul_int8(
    x: jax.Array,
    q: jax.Array,
    scales: jax.Array,
    *,
    tile_n: int = 512,
    tile_m: int = 256,
    interpret: bool = False,
) -> jax.Array:
    """Pallas int8 weight-only matmul. x: (M, K), q: (K, N) int8,
    scales: (N,). Streams weight tiles through VMEM (the decode bottleneck;
    int8 halves the read vs bf16). Large M (prefill) tiles over rows with the
    weight block held constant across consecutive row tiles, so weights are
    not re-fetched per row tile."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    m, k = x.shape
    k2, n = q.shape
    assert k == k2 and n % tile_n == 0, (x.shape, q.shape, tile_n)

    m_pad = -(-m // tile_m) * tile_m if m > tile_m else m
    tm = min(m_pad, tile_m)
    if m_pad != m:
        x = jnp.pad(x, ((0, m_pad - m), (0, 0)))
    grid = (n // tile_n, m_pad // tm)
    out = pl.pallas_call(
        _int8_matmul_kernel,
        out_shape=jax.ShapeDtypeStruct((m_pad, n), x.dtype),
        grid_spec=pl.GridSpec(
            grid=grid,
            in_specs=[
                pl.BlockSpec((tm, k), lambda j, i: (i, 0), memory_space=pltpu.VMEM),
                # weight block depends only on j: consecutive i steps reuse it
                pl.BlockSpec((k, tile_n), lambda j, i: (0, j), memory_space=pltpu.VMEM),
                # scales as (1, N): 1-D blocked operands trip XLA/Mosaic
                # layout mismatches on TPU
                pl.BlockSpec((1, tile_n), lambda j, i: (0, j), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((tm, tile_n), lambda j, i: (i, j), memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(x, q, scales.reshape(1, -1))
    return out[:m]


def _int4_matmul_kernel(groupsize, x_ref, q_ref, s_ref, z_ref, o_ref):
    """Dequantize a (K, TILE_N) int4 tile group-wise then MXU matmul."""
    k = q_ref.shape[0]
    n_groups = k // groupsize
    qg = q_ref[:].astype(jnp.float32).reshape(n_groups, groupsize, -1)
    w = (qg + 0.5) * s_ref[:][:, None, :] + z_ref[:][:, None, :]
    w = w.reshape(k, -1).astype(jnp.bfloat16)
    acc = jnp.dot(x_ref[:].astype(jnp.bfloat16), w, preferred_element_type=jnp.float32)
    o_ref[:] = acc.astype(o_ref.dtype)


def matmul_int4(
    x: jax.Array,
    q: jax.Array,
    scales: jax.Array,
    zeros: jax.Array,
    *,
    groupsize: int = 128,
    tile_n: int = 512,
    interpret: bool = False,
) -> jax.Array:
    """Pallas int4 groupwise weight-only matmul (reference kernel:
    aten._weight_int4pack_mm, fast_quantize.py:204-216)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    m, k = x.shape
    k2, n = q.shape
    n_groups = k // groupsize
    assert k == k2 and n % tile_n == 0

    return pl.pallas_call(
        partial(_int4_matmul_kernel, groupsize),
        out_shape=jax.ShapeDtypeStruct((m, n), x.dtype),
        grid_spec=pl.GridSpec(
            grid=(n // tile_n,),
            in_specs=[
                pl.BlockSpec((m, k), lambda j: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((k, tile_n), lambda j: (0, j), memory_space=pltpu.VMEM),
                pl.BlockSpec((n_groups, tile_n), lambda j: (0, j), memory_space=pltpu.VMEM),
                pl.BlockSpec((n_groups, tile_n), lambda j: (0, j), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((m, tile_n), lambda j: (0, j), memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(x, q, scales, zeros)


# --------------------------------------------------------------------------------------
# Param-tree quantization
# --------------------------------------------------------------------------------------

_QUANTIZABLE_LAYER_KEYS = ("wqkv", "wo", "w1", "w3", "w2", "w_fc", "w_proj")


def quantize_params_int8(params: dict) -> dict:
    """Quantize the layer-stack matmul weights of a transformer param tree.

    Returns a new tree where each quantizable (L, in, out) weight becomes
    {"q": int8, "scales": f32}. Embeddings/norms/heads stay full precision
    (reference quantizes nn.Linear only, fast_quantize.py:154-159).
    """
    out = dict(params)
    layers = dict(params["layers"])
    for key in _QUANTIZABLE_LAYER_KEYS:
        if key in layers:
            w = layers[key]  # (L, in, out)
            q, s = jax.vmap(quantize_int8)(w)
            layers[key] = {"q": q, "scales": s}
    out["layers"] = layers
    return out


def quantize_params_int4(params: dict, groupsize: int = 128) -> dict:
    out = dict(params)
    layers = dict(params["layers"])
    for key in _QUANTIZABLE_LAYER_KEYS:
        if key in layers:
            w = layers[key]
            q, s, z = jax.vmap(partial(quantize_int4_grouped, groupsize=groupsize))(w)
            layers[key] = {"q": q, "scales": s, "zeros": z}
    out["layers"] = layers
    return out


# --------------------------------------------------------------------------------------
# Packed int4: two nibbles per byte, split-half layout
# --------------------------------------------------------------------------------------
#
# Packing halves the HBM weight read vs the unpacked int8 storage. Layout is
# "split-half": byte[k, n] holds q[k] (low nibble) and q[k + K/2] (high
# nibble), both stored biased by +8 into [0, 15]. The kernel then never
# interleaves: it dequantizes each half separately and accumulates
#   x[:, :K/2] @ w_lo + x[:, K/2:] @ w_hi
# which keeps the unpack as two cheap VPU ops per tile.


def pack_int4(q: jax.Array) -> jax.Array:
    """(K, N) int8 in [-8, 7] -> (K/2, N) uint8 nibble pairs (split-half)."""
    k = q.shape[0]
    assert k % 2 == 0
    biased = (q.astype(jnp.int32) + 8).astype(jnp.uint8)
    lo, hi = biased[: k // 2], biased[k // 2 :]
    return (lo | (hi << 4)).astype(jnp.uint8)


def unpack_int4(packed: jax.Array) -> jax.Array:
    """Inverse of pack_int4: (K/2, N) uint8 -> (K, N) int8 in [-8, 7]."""
    lo = (packed & 0xF).astype(jnp.int8) - 8
    hi = (packed >> 4).astype(jnp.int8) - 8
    return jnp.concatenate([lo, hi], axis=0)


def _int4_packed_matmul_kernel(groupsize, x_ref, p_ref, s_ref, z_ref, o_ref):
    """x (M, K) x packed (K/2, TILE_N) with groupwise scales (G, TILE_N)."""
    kk2 = p_ref.shape[0]  # K/2
    n_groups_half = kk2 // groupsize
    # Mosaic legalizes shifts/casts on i32, not i8/u8 — widen once
    packed = p_ref[:].astype(jnp.int32)

    def deq(nibbles, s_half, z_half):
        # f32 dequant: measured faster than bf16 VPU math here (bf16
        # elementwise triggers Mosaic relayouts on the (16,128) tiling)
        qg = (nibbles.astype(jnp.float32) - 7.5).reshape(n_groups_half, groupsize, -1)
        w = qg * s_half[:, None, :] + z_half[:, None, :]
        return w.reshape(kk2, -1).astype(jnp.bfloat16)

    w_lo = deq(packed & 0xF, s_ref[:n_groups_half], z_ref[:n_groups_half])
    w_hi = deq(packed >> 4, s_ref[n_groups_half:], z_ref[n_groups_half:])
    x = x_ref[:].astype(jnp.bfloat16)
    acc = jnp.dot(x[:, :kk2], w_lo, preferred_element_type=jnp.float32)
    acc = acc + jnp.dot(x[:, kk2:], w_hi, preferred_element_type=jnp.float32)
    o_ref[:] = acc.astype(o_ref.dtype)


def matmul_int4_packed(
    x: jax.Array,
    packed: jax.Array,  # (K/2, N) uint8
    scales: jax.Array,  # (K/groupsize, N)
    zeros: jax.Array,
    *,
    groupsize: int = 128,
    tile_n: int = 512,
    interpret: bool = False,
) -> jax.Array:
    """Nibble-packed int4 weight-only matmul: 4-bit HBM weight reads."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    m, k = x.shape
    k2, n = packed.shape
    assert k == 2 * k2 and n % tile_n == 0
    assert (k // 2) % groupsize == 0, "groups must align with the packed halves"
    n_groups = k // groupsize

    return pl.pallas_call(
        partial(_int4_packed_matmul_kernel, groupsize),
        out_shape=jax.ShapeDtypeStruct((m, n), x.dtype),
        grid_spec=pl.GridSpec(
            grid=(n // tile_n,),
            in_specs=[
                pl.BlockSpec((m, k), lambda j: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((k2, tile_n), lambda j: (0, j), memory_space=pltpu.VMEM),
                pl.BlockSpec((n_groups, tile_n), lambda j: (0, j), memory_space=pltpu.VMEM),
                pl.BlockSpec((n_groups, tile_n), lambda j: (0, j), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((m, tile_n), lambda j: (0, j), memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(x, packed, scales, zeros)


def quantize_params_int4_packed(params: dict, groupsize: int = 128) -> dict:
    """Like quantize_params_int4 but with nibble-packed storage.

    Quantized leaves become {"p": uint8 (L, in/2, out), "scales", "zeros"}.
    """
    out = dict(params)
    layers = dict(params["layers"])
    for key in _QUANTIZABLE_LAYER_KEYS:
        if key in layers:
            w = layers[key]
            q, s, z = jax.vmap(partial(quantize_int4_grouped, groupsize=groupsize))(w)
            p = jax.vmap(pack_int4)(q)
            layers[key] = {"p": p, "scales": s, "zeros": z}
    out["layers"] = layers
    return out


# --------------------------------------------------------------------------------------
# Fused int8 SwiGLU FFN: silu(x@w1) * (x@w3) @ w2 in one kernel
# --------------------------------------------------------------------------------------
#
# The decode step is dominated by per-op overhead once weights are int8;
# fusing the three FFN matmuls into one Pallas call (grid over intermediate
# tiles, sequential accumulation into the output block) removes two kernel
# launches per layer and keeps the hidden activation entirely in VMEM.


def _ffn_int8_kernel(x_ref, w1_ref, s1_ref, w3_ref, s3_ref, w2_ref, s2_ref, o_ref):
    j = pl.program_id(0)
    x = x_ref[:].astype(jnp.bfloat16)
    h1 = jnp.dot(x, w1_ref[:].astype(jnp.bfloat16), preferred_element_type=jnp.float32)
    h1 = h1 * s1_ref[0, :].astype(jnp.float32)
    h3 = jnp.dot(x, w3_ref[:].astype(jnp.bfloat16), preferred_element_type=jnp.float32)
    h3 = h3 * s3_ref[0, :].astype(jnp.float32)
    h = (jax.nn.silu(h1) * h3).astype(jnp.bfloat16)  # (M, TILE_I)
    acc = jnp.dot(h, w2_ref[:].astype(jnp.bfloat16), preferred_element_type=jnp.float32)

    @pl.when(j == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    o_ref[:] += acc * s2_ref[0, :].astype(jnp.float32)


def ffn_int8(
    x: jax.Array,  # (M, D)
    w1: jax.Array,  # (D, I) int8
    s1: jax.Array,  # (I,)
    w3: jax.Array,
    s3: jax.Array,
    w2: jax.Array,  # (I, D) int8
    s2: jax.Array,  # (D,)
    *,
    tile_i: int = 512,
    interpret: bool = False,
) -> jax.Array:
    from jax.experimental.pallas import tpu as pltpu

    m, d = x.shape
    d2, i_sz = w1.shape
    assert d == d2 and i_sz % tile_i == 0

    return pl.pallas_call(
        _ffn_int8_kernel,
        out_shape=jax.ShapeDtypeStruct((m, d), jnp.float32),
        grid_spec=pl.GridSpec(
            grid=(i_sz // tile_i,),
            in_specs=[
                pl.BlockSpec((m, d), lambda j: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((d, tile_i), lambda j: (0, j), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, tile_i), lambda j: (0, j), memory_space=pltpu.VMEM),
                pl.BlockSpec((d, tile_i), lambda j: (0, j), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, tile_i), lambda j: (0, j), memory_space=pltpu.VMEM),
                pl.BlockSpec((tile_i, d), lambda j: (j, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, d), lambda j: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((m, d), lambda j: (0, 0), memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(x, w1, s1.reshape(1, -1), w3, s3.reshape(1, -1), w2, s2.reshape(1, -1))


def ffn_int8_reference(x, w1, s1, w3, s3, w2, s2):
    h1 = matmul_int8_reference(x.astype(jnp.float32), w1, s1)
    h3 = matmul_int8_reference(x.astype(jnp.float32), w3, s3)
    h = jax.nn.silu(h1.astype(jnp.float32)) * h3.astype(jnp.float32)
    return matmul_int8_reference(h, w2, s2)

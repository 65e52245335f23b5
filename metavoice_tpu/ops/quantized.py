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

try:  # imported lazily in kernels elsewhere; top-level for the fused FFNs
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
except ImportError:  # pragma: no cover
    pl = None
    pltpu = None


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


# --------------------------------------------------------------------------------------
# int4-in-int32 packing: the fast decode serving format
# --------------------------------------------------------------------------------------
#
# Measured on v5e: 1-byte HBM reads cap at ~390 GB/s while 4-byte reads and
# the VPU unpack together sustain more, so nibbles are packed EIGHT to an
# int32 word (native (8,128) register layout, no u8->i32 relayouts).
#
# Layout is "split-eighth" along the contraction dim K: bits [4j, 4j+4) of
# word (k', n) hold q[j*K/8 + k', n] + 8 (biased to [0, 15]). The kernel
# recovers slab j with one arithmetic shift + mask and feeds the raw nibble
# values straight to the MXU; quantization affine terms never touch the
# per-weight path thanks to the identity (per K-group g of `groupsize` rows):
#
#   x_g @ W_g = s_g * (x_g @ nib_g) + (sum x_g) * c_g,   c_g := z_g - 7.5*s_g
#
# so scales/offsets land in a per-group epilogue using precomputed per-group
# row-sums of x. s and c are stored stacked as one (2*Gp, N) bf16 "sc" array
# (Gp = n_groups padded to a multiple of 8 for aligned DMA slices; pad rows
# are zero and therefore inert in the epilogue).
#
# Alignment: K must be divisible by 8*groupsize so every 128-row dot block
# of a slab lies within one quant group; quantize_params_int4_i32 zero-pads
# the FFN hidden dim to satisfy this (pad columns/rows have s = c = 0, so
# they contribute exactly zero).

I32_GROUPSIZE = 128  # serving groupsize (reference default, fast_quantize.py:70)


def _round_up(v: int, m: int) -> int:
    return -(-v // m) * m


def pack_int4_i32(q: jax.Array) -> jax.Array:
    """(K, N) int8 in [-8, 7] -> (K/8, N) int32, split-eighth slab layout."""
    k, n = q.shape
    assert k % 8 == 0, k
    nib = (q.astype(jnp.int32) + 8).reshape(8, k // 8, n)  # slab j = rows [j*K/8, ...)
    word = nib[0]
    for j in range(1, 8):
        word = word | (nib[j] << (4 * j))
    return word.astype(jnp.int32)


def unpack_int4_i32(pw: jax.Array) -> jax.Array:
    """Inverse of pack_int4_i32: (K/8, N) int32 -> (K, N) int8 in [-8, 7]."""
    slabs = [(((pw >> (4 * j)) & 0xF) - 8).astype(jnp.int8) for j in range(8)]
    return jnp.concatenate(slabs, axis=0)


def quantize_int4_i32(
    w: jax.Array, groupsize: int = I32_GROUPSIZE
) -> tuple[jax.Array, jax.Array]:
    """Quantize (in, out) weights to the packed serving format.

    Returns (pw (Kp/8, N) int32, sc (2*Gp, N) bf16) where Kp = in padded to a
    multiple of 8*groupsize, Gp = Kp/groupsize padded to a multiple of 8, and
    sc rows [0, Gp) are the scales, [Gp, 2*Gp) the constants c = z - 7.5*s.
    Pad rows/groups carry s = c = 0 and contribute nothing.
    """
    in_dim, out_dim = w.shape
    kp = _round_up(in_dim, 8 * groupsize)
    if kp != in_dim:
        w = jnp.concatenate(
            [w, jnp.zeros((kp - in_dim, out_dim), w.dtype)], axis=0
        )
    q, s, z = quantize_int4_grouped(w, groupsize)
    n_groups = kp // groupsize
    gp = _round_up(n_groups, 8)
    c = z - 7.5 * s
    if kp != in_dim:
        # zero out the affine terms of any group that is entirely padding so
        # the epilogue cannot pick up quantization noise from the pad rows
        full_groups = in_dim // groupsize
        mask = (jnp.arange(n_groups) < full_groups + (in_dim % groupsize > 0))[:, None]
        s = jnp.where(mask, s, 0.0)
        c = jnp.where(mask, c, 0.0)
    pad = jnp.zeros((gp - n_groups, out_dim), jnp.float32)
    # bf16 scale/constant tables: halves the sc DMA traffic; the rounding
    # (~0.4% relative) is far below the int4 quantization noise itself
    sc = jnp.concatenate([s, pad, c, pad], axis=0).astype(jnp.bfloat16)
    return pack_int4_i32(q), sc


def matmul_int4_i32_reference(
    x: jax.Array, pw: jax.Array, sc: jax.Array, groupsize: int = I32_GROUPSIZE
) -> jax.Array:
    """jnp semantics oracle (and CPU/prefill path) for the packed format.

    x (..., in) with in <= 8*pw.shape[0]; zero-pads x to the packed K.
    """
    kp = 8 * pw.shape[0]
    gp = sc.shape[0] // 2
    n_groups = kp // groupsize
    s = sc[:n_groups].astype(jnp.float32)
    c = sc[gp : gp + n_groups].astype(jnp.float32)
    if x.shape[-1] != kp:
        pad = [(0, 0)] * (x.ndim - 1) + [(0, kp - x.shape[-1])]
        x = jnp.pad(x, pad)
    nib = jnp.concatenate(
        [(pw >> (4 * j)) & 0xF for j in range(8)], axis=0
    ).astype(jnp.float32)
    w = nib.reshape(n_groups, groupsize, -1) * s[:, None, :]
    y = jnp.einsum("...d,do->...o", x.astype(jnp.float32), w.reshape(kp, -1))
    xsum = x.astype(jnp.float32).reshape(*x.shape[:-1], n_groups, groupsize).sum(-1)
    y = y + jnp.einsum("...g,go->...o", xsum, c)
    return y.astype(x.dtype)


def quantize_params_int4_i32(params: dict, groupsize: int = I32_GROUPSIZE) -> dict:
    """Param-tree quantizer for the fast int4 serving config.

    Quantized (L, in, out) leaves become {"pw": (L, Kp/8, out) int32,
    "sc": (L, 2*Gp, out) bf16}. The FFN hidden dim is zero-padded inside the
    packed tensors (w1/w3 along out, w2 along in) so all kernels see
    8*groupsize-aligned contractions; the padding is numerically inert.
    """
    out = dict(params)
    layers = dict(params["layers"])
    for key in _QUANTIZABLE_LAYER_KEYS:
        if key not in layers:
            continue
        w = layers[key]  # (L, in, out)
        if key in ("w1", "w3", "w_fc"):
            # pad the hidden dim (out axis) to match w2/w_proj's padded in
            ip = _round_up(w.shape[2], 8 * groupsize)
            if ip != w.shape[2]:
                w = jnp.concatenate(
                    [w, jnp.zeros((w.shape[0], w.shape[1], ip - w.shape[2]), w.dtype)],
                    axis=2,
                )
        pw, sc = jax.vmap(partial(quantize_int4_i32, groupsize=groupsize))(w)
        layers[key] = {"pw": pw, "sc": sc}
        if key in ("w1", "w3", "w_fc"):
            # pad columns must dequantize to exactly zero: zero their affine
            # terms (their nibbles already quantize a zero column)
            n_real = params["layers"][key].shape[2]
            col = jnp.arange(sc.shape[2]) < n_real
            layers[key]["sc"] = jnp.where(col[None, None, :], sc, 0.0)
    out["layers"] = layers
    # tied lm head (single-hierarchy, reference fam/llm/model.py:139-143):
    # pack wte^T so the decode stack kernel can stream the head read in
    # 4 bits too (the bf16 tied read was ~10.5 MB/token, ~1.5% of decode
    # time). The bf16 wte stays for the embedding row-gather. The vocab dim
    # is zero-padded to a tile multiple; pad columns carry s = c = 0 and
    # their logits are sliced off before sampling.
    if (
        len(params.get("wtes", ())) == 1
        and "lm_heads" not in params
        and params["wtes"][0].shape[1] % (8 * groupsize) == 0
    ):
        wt = params["wtes"][0].T  # (D, V)
        vp = _round_up(wt.shape[1], 1024)
        if vp != wt.shape[1]:
            wt = jnp.concatenate(
                [wt, jnp.zeros((wt.shape[0], vp - wt.shape[1]), wt.dtype)], axis=1
            )
        hpw, hsc = quantize_int4_i32(wt, groupsize)
        col = jnp.arange(vp) < params["wtes"][0].shape[0]
        out["lm_head_q"] = {"pw": hpw, "sc": jnp.where(col[None, :], hsc, 0.0)}
    return out


# --------------------------------------------------------------------------------------
# Fused int4 decode FFN megakernel: silu(x@w1) * (x@w3) @ w2, one Pallas call
# per layer, manual double-buffered DMA from the STACKED (L, ...) weights
# --------------------------------------------------------------------------------------
#
# Taking the full stacked arrays + a scalar layer index (instead of per-layer
# scan slices) keeps XLA from materializing a per-layer copy of the weights
# before the kernel runs — measured 255 GB/s packed vs 184 GB/s sliced.

FFN_TILE = 1024  # intermediate/output tile width (measured best vs 512/2048)


def _int4_slab_matmul(x, xsum, w_words, sc, groupsize):
    """Slab-dot variant of _int4_group_matmul: ONE MXU dot per SLAB.

    The original issues one (Bpad, groupsize) x (groupsize, tile) dot per
    (slab, group) — 16-48 small dots per tile whose dispatch overhead is the
    int4 path's limiter (the packed-int8 helper, 4 big dots per tile,
    reaches a higher effective bandwidth). Here each slab's nibbles are
    scaled by their per-group s rows IN-REGISTER (bf16, a (G, 128, tile)
    broadcast multiply — no VMEM scratch round-trip, the big-dot variant's
    mistake) and contracted in one (Bpad, K/8) x (K/8, tile) dot.

    Numerics: nib * s rounds to bf16 per weight (the reference's
    aten._weight_int4pack_mm semantics), vs the exact variant's f32 group
    scaling — ~1 bf16 ulp per weight.
    """
    k8 = w_words.shape[0]
    gp = sc.shape[0] // 2
    n_grp_slab = k8 // groupsize
    acc = jnp.dot(
        xsum.astype(jnp.bfloat16), sc[gp:, :], preferred_element_type=jnp.float32
    )
    for j8 in range(8):
        nib = ((w_words >> (4 * j8)) & 0xF).astype(jnp.bfloat16)
        srows = sc[j8 * n_grp_slab : (j8 + 1) * n_grp_slab, :].astype(jnp.bfloat16)
        scaled = (
            nib.reshape(n_grp_slab, groupsize, -1) * srows[:, None, :]
        ).reshape(k8, -1)
        acc = acc + jnp.dot(
            x[:, j8 * k8 : (j8 + 1) * k8], scaled, preferred_element_type=jnp.float32
        )
    return acc


def _int4_group_matmul_scr(x, xsum, w_words, sc, groupsize, w_scr):
    """Big-dot variant of _int4_group_matmul: one MXU dot per TILE.

    The original issues one (Bpad, groupsize) x (groupsize, tile) dot per
    (slab, group) — 16-48 tiny MXU dispatches per weight tile, whose fixed
    dispatch cost dominates at decode batch sizes (the MACs themselves are
    ~100x cheaper than the dispatch). Here every slab is unpacked AND scaled
    by its per-group s rows into ``w_scr`` (a (K, tile) bf16 VMEM scratch),
    then ONE (Bpad, K) x (K, tile) dot runs the whole contraction; the
    group-affine c term stays a second small dot, exactly as before.

    Numerics: the per-weight product nib * s rounds to bf16 before the MXU
    (standard dequantized-weight semantics) where the original scaled the
    f32 per-group partial dot — differences are ~1 bf16 ulp per weight.
    """
    k8 = w_words.shape[0]
    gp = sc.shape[0] // 2
    n_grp_slab = k8 // groupsize
    for j8 in range(8):
        nib = ((w_words >> (4 * j8)) & 0xF).astype(jnp.bfloat16)
        srows = sc[j8 * n_grp_slab : (j8 + 1) * n_grp_slab, :].astype(jnp.bfloat16)
        scaled = (
            nib.reshape(n_grp_slab, groupsize, -1) * srows[:, None, :]
        ).reshape(k8, -1)
        w_scr[pl.ds(j8 * k8, k8), :] = scaled
    k = 8 * k8
    acc = jnp.dot(
        xsum.astype(jnp.bfloat16), sc[gp:, :], preferred_element_type=jnp.float32
    )
    return acc + jnp.dot(
        x, w_scr[pl.ds(0, k), :], preferred_element_type=jnp.float32
    )


def _int4_group_matmul(x, xsum, w_words, sc, groupsize):
    """In-kernel helper: (Bpad, K) x packed (K/8, tile) -> (Bpad, tile) f32.

    x: (Bpad, K) bf16, xsum: (Bpad, Gp) f32 per-group row sums,
    w_words: (K/8, tile) i32, sc: (2*Gp, tile) bf16 (scales then constants).

    Per-weight work is one arithmetic shift + mask + bf16 cast; slab j
    covers original rows [j*K/8, (j+1)*K/8) so each 128-row dot block sits
    inside one quant group (K is 8*groupsize-aligned by construction).
    """
    k8 = w_words.shape[0]
    gp = sc.shape[0] // 2
    n_grp_slab = k8 // groupsize  # quant groups per slab
    acc = jnp.dot(
        xsum.astype(jnp.bfloat16), sc[gp:, :], preferred_element_type=jnp.float32
    )  # c term
    for j8 in range(8):
        nib = ((w_words >> (4 * j8)) & 0xF).astype(jnp.bfloat16)
        for m in range(n_grp_slab):
            g = j8 * n_grp_slab + m
            xg = x[:, g * groupsize : (g + 1) * groupsize]
            d = jnp.dot(
                xg, nib[m * groupsize : (m + 1) * groupsize, :],
                preferred_element_type=jnp.float32,
            )
            acc = acc + d * sc[g, :].astype(jnp.float32)[None, :]
    return acc


def group_ones(k: int, gp: int, groupsize: int) -> jax.Array:
    """(K, Gp) bf16 block-diagonal 0/1 matrix: x @ group_ones = per-group row
    sums. Built in XLA and passed into kernels so group reduction is one MXU
    dot instead of Mosaic-hostile reshapes."""
    rows = jnp.arange(k)[:, None] // groupsize
    cols = jnp.arange(gp)[None, :]
    return (rows == cols).astype(jnp.bfloat16)


def _ffn_int4_kernel(
    groupsize, tile, n_i_tiles, n_d_tiles,
    # scalar prefetch
    li_ref,  # (1,) int32
    # inputs
    x_ref,  # (Bpad, D) bf16 VMEM
    xones_ref,  # (D, G1p) bf16 VMEM block-diagonal group-sum matrix
    hones_ref,  # (Ip, G2p) bf16 VMEM
    pw1_hbm,  # (L, D/8, Ip) i32
    sc1_hbm,  # (L, 2*G1p, Ip) bf16
    pw3_hbm,
    sc3_hbm,
    pw2_hbm,  # (L, Ip/8, D) i32
    sc2_hbm,  # (L, 2*G2p, D) bf16
    # outputs
    o_ref,  # (Bpad, D) f32 VMEM
    # scratch
    w1_buf,  # (2, D/8, tile) i32
    w3_buf,
    sc1_buf,  # (2, 2*G1p, tile) bf16
    sc3_buf,
    h_scr,  # (Bpad, Ip) bf16
    w2_buf,  # (2, Ip/8, tile) i32
    sc2_buf,  # (2, 2*G2p, tile) bf16
    sems,  # DMA (2, 4)
    sems2,  # DMA (2, 2)
):
    li = li_ref[0]
    x = x_ref[:]
    xsum = jnp.dot(x, xones_ref[:], preferred_element_type=jnp.float32)  # (Bpad, G1p)

    # ---- phase 1: h = silu(x@w1) * (x@w3), streaming intermediate tiles ----
    def p1_dma(slot, j):
        sl = pl.ds(j * tile, tile)
        return (
            pltpu.make_async_copy(pw1_hbm.at[li, :, sl], w1_buf.at[slot], sems.at[slot, 0]),
            pltpu.make_async_copy(sc1_hbm.at[li, :, sl], sc1_buf.at[slot], sems.at[slot, 1]),
            pltpu.make_async_copy(pw3_hbm.at[li, :, sl], w3_buf.at[slot], sems.at[slot, 2]),
            pltpu.make_async_copy(sc3_hbm.at[li, :, sl], sc3_buf.at[slot], sems.at[slot, 3]),
        )

    for dma in p1_dma(0, 0):
        dma.start()

    def p1_body(j, _):
        slot = jax.lax.rem(j, 2)

        @pl.when(j + 1 < n_i_tiles)
        def _():
            for dma in p1_dma(jax.lax.rem(j + 1, 2), j + 1):
                dma.start()

        for dma in p1_dma(slot, j):
            dma.wait()
        h1 = _int4_group_matmul(x, xsum, w1_buf[slot], sc1_buf[slot], groupsize)
        h3 = _int4_group_matmul(x, xsum, w3_buf[slot], sc3_buf[slot], groupsize)
        h_scr[:, pl.ds(j * tile, tile)] = (jax.nn.silu(h1) * h3).astype(jnp.bfloat16)
        return _

    jax.lax.fori_loop(0, n_i_tiles, p1_body, None)

    # ---- phase 2: y = h @ w2, streaming output tiles ------------------------
    h = h_scr[:]
    hsum = jnp.dot(h, hones_ref[:], preferred_element_type=jnp.float32)  # (Bpad, G2p)

    def p2_dma(slot, j):
        sl = pl.ds(j * tile, tile)
        return (
            pltpu.make_async_copy(pw2_hbm.at[li, :, sl], w2_buf.at[slot], sems2.at[slot, 0]),
            pltpu.make_async_copy(sc2_hbm.at[li, :, sl], sc2_buf.at[slot], sems2.at[slot, 1]),
        )

    for dma in p2_dma(0, 0):
        dma.start()

    def p2_body(j, _):
        slot = jax.lax.rem(j, 2)

        @pl.when(j + 1 < n_d_tiles)
        def _():
            for dma in p2_dma(jax.lax.rem(j + 1, 2), j + 1):
                dma.start()

        for dma in p2_dma(slot, j):
            dma.wait()
        y = _int4_group_matmul(h, hsum, w2_buf[slot], sc2_buf[slot], groupsize)
        o_ref[:, pl.ds(j * tile, tile)] = y
        return _

    jax.lax.fori_loop(0, n_d_tiles, p2_body, None)


def decode_ffn_int4(
    x: jax.Array,  # (B, D) normed input
    pw1: jax.Array,  # (L, D/8, Ip) i32
    sc1: jax.Array,  # (L, 2*G1p, Ip) bf16
    pw3: jax.Array,
    sc3: jax.Array,
    pw2: jax.Array,  # (L, Ip/8, D) i32
    sc2: jax.Array,  # (L, 2*G2p, D) bf16
    layer: jax.Array,  # () int32
    *,
    groupsize: int = I32_GROUPSIZE,
    tile: int = FFN_TILE,
    interpret: bool = False,
) -> jax.Array:
    """Fused int4 SwiGLU FFN for one decode layer: ONE Pallas call streaming
    the packed weights of stacked layer ``layer`` HBM->VMEM (double-buffered,
    4-bit weight reads), hidden activation resident in VMEM. Returns (B, D)
    f32. Weights come in STACKED (all layers) so XLA never materializes a
    per-layer slice copy."""
    b, d = x.shape
    ip = pw1.shape[2]
    assert pw2.shape[1] * 8 == ip and pw2.shape[2] == d, (pw1.shape, pw2.shape)
    assert ip % tile == 0 and d % tile == 0 and tile % groupsize == 0
    bpad = max(8, b)
    x_pad = jnp.zeros((bpad, d), jnp.bfloat16).at[:b].set(x.astype(jnp.bfloat16))
    li = jnp.asarray(layer, jnp.int32).reshape(1)
    n_i_tiles = ip // tile
    n_d_tiles = d // tile
    g1p = sc1.shape[1] // 2
    g2p = sc2.shape[1] // 2
    xones = group_ones(d, g1p, groupsize)
    hones = group_ones(ip, g2p, groupsize)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # x
            pl.BlockSpec(memory_space=pltpu.VMEM),  # xones
            pl.BlockSpec(memory_space=pltpu.VMEM),  # hones
            pl.BlockSpec(memory_space=pltpu.HBM),  # pw1
            pl.BlockSpec(memory_space=pltpu.HBM),  # sc1
            pl.BlockSpec(memory_space=pltpu.HBM),  # pw3
            pl.BlockSpec(memory_space=pltpu.HBM),  # sc3
            pl.BlockSpec(memory_space=pltpu.HBM),  # pw2
            pl.BlockSpec(memory_space=pltpu.HBM),  # sc2
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, d // 8, tile), jnp.int32),
            pltpu.VMEM((2, d // 8, tile), jnp.int32),
            pltpu.VMEM((2, 2 * g1p, tile), sc1.dtype),
            pltpu.VMEM((2, 2 * g1p, tile), sc3.dtype),
            pltpu.VMEM((bpad, ip), jnp.bfloat16),
            pltpu.VMEM((2, ip // 8, tile), jnp.int32),
            pltpu.VMEM((2, 2 * g2p, tile), sc2.dtype),
            pltpu.SemaphoreType.DMA((2, 4)),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )
    y = pl.pallas_call(
        partial(_ffn_int4_kernel, groupsize, tile, n_i_tiles, n_d_tiles),
        out_shape=jax.ShapeDtypeStruct((bpad, d), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(li, x_pad, xones, hones, pw1, sc1, pw3, sc3, pw2, sc2)
    return y[:b]


def ffn_int4_i32_reference(x, pw1, sc1, pw3, sc3, pw2, sc2, groupsize=I32_GROUPSIZE):
    """jnp semantics oracle for decode_ffn_int4 (single layer, unstacked)."""
    h1 = matmul_int4_i32_reference(x.astype(jnp.float32), pw1, sc1, groupsize)
    h3 = matmul_int4_i32_reference(x.astype(jnp.float32), pw3, sc3, groupsize)
    h = jax.nn.silu(h1) * h3
    return matmul_int4_i32_reference(h, pw2, sc2, groupsize)


# --------------------------------------------------------------------------------------
# M-tiled int4 prefill matmul: packed-weight reads for multi-token forwards
# --------------------------------------------------------------------------------------
#
# Round 2 prefilled through matmul_int4_i32_reference — XLA dense dequant
# that rematerializes the bf16 weights per prompt bucket (~45 ms/call on the
# tunneled backend). This kernel runs prefill through the SAME packed
# int4-in-int32 weights as decode: a (m_tiles, n_tiles) grid where each cell
# computes a (256, tile) output block with in-register dequant; Pallas's
# BlockSpec pipeline double-buffers the weight tiles automatically.
# Reference analogue: prefill compiled through the quantized modules at
# fam/llm/fast_inference_utils.py:283-308,363-368.

PREFILL_M_TILE = 256


def _prefill_int4_kernel(groupsize, x_ref, xones_ref, pw_ref, sc_ref, o_ref):
    x = x_ref[:]
    xsum = jnp.dot(x, xones_ref[:], preferred_element_type=jnp.float32)
    o_ref[:] = _int4_group_matmul(x, xsum, pw_ref[:], sc_ref[:], groupsize)


def matmul_int4_i32(
    x: jax.Array,  # (M, K) activations (any float dtype; computed in bf16)
    pw: jax.Array,  # (K/8, N) int32 packed
    sc: jax.Array,  # (2*Gp, N) bf16 scales/constants
    groupsize: int = I32_GROUPSIZE,
    interpret: bool = False,
) -> jax.Array:
    """(M, K) @ packed-int4 (K, N) -> (M, N) f32, M-tiled Pallas kernel."""
    m, k = x.shape
    n = pw.shape[1]
    assert pw.shape[0] * 8 == k, (x.shape, pw.shape)
    tile = next((t for t in (1024, 512, 256, 128) if n % t == 0), None)
    if tile is None:
        raise ValueError(f"N={n} not tileable")
    mt = PREFILL_M_TILE
    mpad = _round_up(max(m, 8), 8)
    if mpad % mt != 0 and mpad > mt:
        mpad = _round_up(mpad, mt)
    mt = min(mt, mpad)
    gp = sc.shape[0] // 2
    xp = jnp.zeros((mpad, k), jnp.bfloat16).at[:m].set(x.astype(jnp.bfloat16))
    xones = group_ones(k, gp, groupsize)
    out = pl.pallas_call(
        partial(_prefill_int4_kernel, groupsize),
        grid=(mpad // mt, n // tile),
        in_specs=[
            pl.BlockSpec((mt, k), lambda i, j: (i, 0)),
            pl.BlockSpec((k, gp), lambda i, j: (0, 0)),
            pl.BlockSpec((k // 8, tile), lambda i, j: (0, j)),
            pl.BlockSpec((2 * gp, tile), lambda i, j: (0, j)),
        ],
        out_specs=pl.BlockSpec((mt, tile), lambda i, j: (i, j)),
        out_shape=jax.ShapeDtypeStruct((mpad, n), jnp.float32),
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(xp, xones, pw, sc)
    return out[:m]


# --------------------------------------------------------------------------------------
# int8-in-int32 packing: 2-byte-ceiling HBM reads for the int8 quality mode
# --------------------------------------------------------------------------------------
#
# Measured on v5e: 1-byte HBM streams cap ~390 GB/s vs ~490 GB/s for 2/4-byte
# dtypes, so plain int8 weight reads bound the int8 serving mode at ~310
# tok/s regardless of kernel quality. The same word-packing trick as int4:
# four biased bytes (q + 128, in [0, 255]) per i32 word in "split-quarter"
# layout — bits [8j, 8j+8) of word (k', n) hold q[j*K/4 + k', n] + 128 — so
# the stream reads at the wide-dtype ceiling and the kernel recovers slab j
# with one shift + mask. The +128 bias folds into a per-channel epilogue via
#
#   x @ W = s * (x @ b) - 128 * s * sum(x),   b := q + 128
#
# i.e. the int4 kernel's group-affine identity with ONE group spanning K and
# c = -128 * s. The sc table reuses the (2*Gp, N) layout (Gp = 8 pad rows;
# row 0 = s, row Gp = c, pad rows zero) so `_int8_word_matmul` mirrors
# `_int4_group_matmul` tile-for-tile.


def pack_int8_i32(q: jax.Array) -> jax.Array:
    """(K, N) int8 in [-128, 127] -> (K/4, N) int32, split-quarter layout."""
    k, n = q.shape
    assert k % 4 == 0, k
    b = (q.astype(jnp.int32) + 128).reshape(4, k // 4, n)  # biased bytes
    out = jnp.zeros((k // 4, n), jnp.int32)
    for j in range(4):
        out = out | (b[j] << (8 * j))
    return out


def unpack_int8_i32(pw: jax.Array) -> jax.Array:
    """Inverse of pack_int8_i32 (testing)."""
    slabs = [(((pw >> (8 * j)) & 0xFF) - 128).astype(jnp.int8) for j in range(4)]
    return jnp.concatenate(slabs, axis=0)


def quantize_int8_i32(w: jax.Array) -> tuple[jax.Array, jax.Array]:
    """(in, out) weights -> (pw (Kp/4, N) i32, sc (16, N) bf16).

    Same per-output-channel symmetric rule as ``quantize_int8``; K is padded
    to a multiple of 4 (pad rows quantize to bias 128 and the c term removes
    their contribution exactly: pad x rows are zero anyway in callers).
    sc rows: [0] = s, [8] = c = -128*s, everything else zero (the 8-row
    stride keeps sublane-aligned DMA slices, mirroring the int4 tables).
    """
    in_dim, out_dim = w.shape
    kp = _round_up(in_dim, 4)
    if kp != in_dim:
        w = jnp.concatenate([w, jnp.zeros((kp - in_dim, out_dim), w.dtype)], axis=0)
    q, s = quantize_int8(w)
    pw = pack_int8_i32(q)
    sc = jnp.zeros((16, out_dim), jnp.float32)
    sc = sc.at[0].set(s).at[8].set(-128.0 * s)
    return pw, sc.astype(jnp.bfloat16)


def _int8_word_matmul(x, xsum, w_words, sc):
    """In-kernel helper: (Bpad, K) bf16 x packed (K/4, tile) i32 -> f32.

    xsum: (Bpad, 8) f32 — per-'group' row sums with the single real group in
    column 0 (from group_ones(k, 8, k): only column 0 is populated).
    """
    k4 = w_words.shape[0]
    gp = sc.shape[0] // 2
    acc = jnp.dot(
        xsum.astype(jnp.bfloat16), sc[gp:, :], preferred_element_type=jnp.float32
    )  # c term: -128*s * sum(x)
    for j4 in range(4):
        byte = ((w_words >> (8 * j4)) & 0xFF).astype(jnp.bfloat16)
        d = jnp.dot(
            x[:, j4 * k4 : (j4 + 1) * k4], byte, preferred_element_type=jnp.float32
        )
        acc = acc + d * sc[0, :].astype(jnp.float32)[None, :]
    return acc


def quantize_params_int8_i32(params: dict) -> dict:
    """Param-tree quantizer for the packed-int8 serving mode.

    Quantized (L, in, out) leaves become {"p8": (L, Kp/4, out) i32,
    "sc8": (L, 16, out) bf16}. FFN hidden padded to a tile multiple like the
    int4 format so kernels see aligned contractions.
    """
    out = dict(params)
    layers = dict(params["layers"])
    for key in _QUANTIZABLE_LAYER_KEYS:
        if key not in layers:
            continue
        w = layers[key]
        if key in ("w1", "w3", "w_fc"):
            ip = _round_up(w.shape[2], 1024)
            if ip != w.shape[2]:
                w = jnp.concatenate(
                    [w, jnp.zeros((w.shape[0], w.shape[1], ip - w.shape[2]), w.dtype)],
                    axis=2,
                )
        if key in ("w2", "w_proj"):
            # pad the contraction dim to match w1/w3's padded hidden (the
            # pad activations are exactly zero, so both the byte dot and
            # the -128*s*sum(x) epilogue are inert over them)
            kp = _round_up(w.shape[1], 1024)
            if kp != w.shape[1]:
                w = jnp.concatenate(
                    [w, jnp.zeros((w.shape[0], kp - w.shape[1], w.shape[2]), w.dtype)],
                    axis=1,
                )
        pw, sc = jax.vmap(quantize_int8_i32)(w)
        layers[key] = {"p8": pw, "sc8": sc}
        if key in ("w1", "w3", "w_fc"):
            n_real = params["layers"][key].shape[2]
            col = jnp.arange(sc.shape[2]) < n_real
            layers[key]["sc8"] = jnp.where(col[None, None, :], sc, 0.0)
    out["layers"] = layers
    return out


def _prefill_int8_kernel(x_ref, xones_ref, pw_ref, sc_ref, o_ref):
    x = x_ref[:]
    xsum = jnp.dot(x, xones_ref[:], preferred_element_type=jnp.float32)
    o_ref[:] = _int8_word_matmul(x, xsum, pw_ref[:], sc_ref[:])


def matmul_int8_i32(
    x: jax.Array,  # (M, K) activations (any float dtype; computed in bf16)
    pw: jax.Array,  # (K/4, N) int32 packed (pack_int8_i32)
    sc: jax.Array,  # (16, N) bf16 (row 0 = s, row 8 = c = -128*s)
    interpret: bool = False,
) -> jax.Array:
    """(M, K) @ packed-int8 (K, N) -> (M, N) f32, M-tiled Pallas kernel.

    The int8 analogue of matmul_int4_i32: keeps the weight HBM read 1-byte-
    per-element but STREAMED as int32 words at the wide-dtype DMA ceiling,
    with the +128 bias folded into the single-group affine epilogue
    (one c = -128*s row; see the packing notes above pack_int8_i32). Serves
    prefill and the per-shard TP decode path — the decode megakernel has its
    own fused wfmt="i8" route.
    """
    m, k = x.shape
    n = pw.shape[1]
    assert pw.shape[0] * 4 == k, (x.shape, pw.shape)
    tile = next((t for t in (1024, 512, 256, 128) if n % t == 0), None)
    if tile is None:
        raise ValueError(f"N={n} not tileable")
    mt = PREFILL_M_TILE
    mpad = _round_up(max(m, 8), 8)
    if mpad % mt != 0 and mpad > mt:
        mpad = _round_up(mpad, mt)
    mt = min(mt, mpad)
    gp = sc.shape[0] // 2  # 8 sublane-pad rows; only row 0 is the real group
    xp = jnp.zeros((mpad, k), jnp.bfloat16).at[:m].set(x.astype(jnp.bfloat16))
    xones = group_ones(k, gp, k)  # one group spanning K (column 0)
    out = pl.pallas_call(
        _prefill_int8_kernel,
        grid=(mpad // mt, n // tile),
        in_specs=[
            pl.BlockSpec((mt, k), lambda i, j: (i, 0)),
            pl.BlockSpec((k, gp), lambda i, j: (0, 0)),
            pl.BlockSpec((k // 4, tile), lambda i, j: (0, j)),
            pl.BlockSpec((2 * gp, tile), lambda i, j: (0, j)),
        ],
        out_specs=pl.BlockSpec((mt, tile), lambda i, j: (i, j)),
        out_shape=jax.ShapeDtypeStruct((mpad, n), jnp.float32),
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(xp, xones, pw, sc)
    return out[:m]


def matmul_int8_i32_reference(x, pw, sc):
    """jnp semantics oracle for the packed-int8 matmul.

    x (..., in) with in <= 4*pw.shape[0]; zero-pads x to the packed K
    (pad rows multiply zero activations and contribute nothing to the
    row sum, so the result is exact).
    """
    q = unpack_int8_i32(pw).astype(jnp.float32)
    gp = sc.shape[0] // 2
    s = sc[0].astype(jnp.float32)
    c = sc[gp].astype(jnp.float32)
    xf = x.astype(jnp.float32)
    kp = 4 * pw.shape[0]
    if xf.shape[-1] != kp:
        pad = [(0, 0)] * (xf.ndim - 1) + [(0, kp - xf.shape[-1])]
        xf = jnp.pad(xf, pad)
    return (xf @ (q + 128.0)) * s + jnp.sum(xf, axis=-1, keepdims=True) * c

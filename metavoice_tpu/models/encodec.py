"""EnCodec 24 kHz neural audio codec in JAX: RVQ + SEANet encoder/decoder.

The reference consumes EnCodec through the ``encodec``/``audiocraft``
packages (training tokenisation at fam/llm/loaders/training_data.py:98-112;
decoding via MultiBandDiffusion's built-in EnCodec at fam/llm/decoders.py).
This is a from-scratch XLA implementation of the same architecture
(Defossez et al. 2022, "High Fidelity Neural Audio Compression"):

  * Residual vector quantizer: codes (n_q, T) <-> latent (T, D) by summing
    per-stage codebook embeddings (decode) / iterative nearest-neighbour
    residual search (encode). bw=6 kbps at 24 kHz => n_q=8 codebooks of 1024
    entries at 75 Hz.
  * SEANet decoder: Conv(D->C) -> 2-layer LSTM (residual) -> 4 upsampling
    stages (ConvTranspose, ratios 8,5,4,2, halving channels) each followed by
    a residual unit -> Conv(C/16 -> 1). All convs causal (left-padded), ELU
    activations. 320x upsampling: 75 Hz frames -> 24 kHz samples.
  * SEANet encoder: the mirror image, for the training data pipeline.

Convolutions run channels-last ("NHC") — XLA:TPU's native conv layout.
Weight-normed torch checkpoints fold into plain kernels at conversion time.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

Params = dict[str, Any]


@dataclass(frozen=True)
class EncodecConfig:
    sample_rate: int = 24000
    channels: int = 1
    dimension: int = 128  # latent dim
    n_filters: int = 32
    ratios: tuple[int, ...] = (8, 5, 4, 2)  # decoder order: coarse->fine
    n_q: int = 8  # codebooks in use (bw = 6 kbps)
    codebook_size: int = 1024
    kernel_size: int = 7
    last_kernel_size: int = 7
    residual_kernel_size: int = 3
    lstm_layers: int = 2
    causal: bool = True

    @property
    def hop_length(self) -> int:
        out = 1
        for r in self.ratios:
            out *= r
        return out  # 320

    @property
    def frame_rate(self) -> int:
        return self.sample_rate // self.hop_length  # 75

    @property
    def max_channels(self) -> int:
        return self.n_filters * (2 ** len(self.ratios))  # 512


# --------------------------------------------------------------------------------------
# Primitives
# --------------------------------------------------------------------------------------


def _conv1d(x: jax.Array, w: jax.Array, b: jax.Array | None, stride: int = 1, dilation: int = 1, causal: bool = True) -> jax.Array:
    """x: (B, T, C_in), w: (K, C_in, C_out). Causal left-pad."""
    k = w.shape[0]
    pad_total = dilation * (k - 1) - (stride - 1)
    pad_total = max(pad_total, 0)
    if causal:
        pad = [(pad_total, 0)]
    else:
        pad = [(pad_total // 2, pad_total - pad_total // 2)]
    y = jax.lax.conv_general_dilated(
        x,
        w,
        window_strides=(stride,),
        padding=pad,
        rhs_dilation=(dilation,),
        dimension_numbers=("NHC", "HIO", "NHC"),
    )
    if b is not None:
        y = y + b
    return y


def _conv_transpose1d(x: jax.Array, w: jax.Array, b: jax.Array | None, stride: int, causal: bool = True) -> jax.Array:
    """x: (B, T, C_in), w: (K, C_in, C_out), output (B, T*stride, C_out).

    Emulates audiocraft's SConvTranspose1d: full transposed conv then trim
    ``kernel - stride`` frames (all from the right when causal)."""
    k = w.shape[0]
    y = jax.lax.conv_transpose(
        x,
        w,
        strides=(stride,),
        padding="VALID",
        dimension_numbers=("NHC", "HIO", "NHC"),
    )  # (B, (T-1)*stride + k, C_out)
    trim = k - stride
    if trim > 0:
        if causal:
            y = y[:, : y.shape[1] - trim]
        else:
            left = trim // 2
            y = y[:, left : y.shape[1] - (trim - left)]
    if b is not None:
        y = y + b
    return y


def _lstm_stack(x: jax.Array, lstm: Params) -> jax.Array:
    """2-layer LSTM with residual skip (EnCodec's SLSTM). x: (B, T, C)."""
    y = x
    n_layers = lstm["w_ih"].shape[0]
    for i in range(n_layers):
        w_ih, w_hh, b = lstm["w_ih"][i], lstm["w_hh"][i], lstm["b"][i]
        x_proj = jnp.einsum("btd,dg->btg", y, w_ih) + b

        def step(carry, xp_t):
            h_prev, c_prev = carry
            gates = xp_t + h_prev @ w_hh
            ii, ff, gg, oo = jnp.split(gates, 4, axis=-1)
            c = jax.nn.sigmoid(ff) * c_prev + jax.nn.sigmoid(ii) * jnp.tanh(gg)
            h = jax.nn.sigmoid(oo) * jnp.tanh(c)
            return (h, c), h

        bsz, _, h_dim = y.shape[0], y.shape[1], w_hh.shape[0]
        init = (jnp.zeros((bsz, h_dim), y.dtype), jnp.zeros((bsz, h_dim), y.dtype))
        _, outs = jax.lax.scan(step, init, x_proj.transpose(1, 0, 2))
        y = outs.transpose(1, 0, 2)
    return x + y  # skip connection


def _residual_unit(x: jax.Array, unit: Params, cfg: EncodecConfig) -> jax.Array:
    """ELU -> Conv(k=3, C->C/2) -> ELU -> Conv(k=1, C/2->C), identity skip."""
    y = jax.nn.elu(x)
    y = _conv1d(y, unit["conv1_w"], unit.get("conv1_b"), causal=cfg.causal)
    y = jax.nn.elu(y)
    y = _conv1d(y, unit["conv2_w"], unit.get("conv2_b"), causal=cfg.causal)
    return x + y


# --------------------------------------------------------------------------------------
# RVQ
# --------------------------------------------------------------------------------------


def rvq_decode(codebooks: jax.Array, codes: jax.Array) -> jax.Array:
    """codebooks: (n_q, K, D); codes: (n_q, T) or (B, n_q, T) -> latent (.., T, D).

    Residual VQ decode = sum over stages of the selected embeddings.
    """
    if codes.ndim == 2:
        codes = codes[None]
    n_q = codes.shape[1]

    def gather(q):
        return jax.vmap(lambda c: jnp.take(codebooks[q], c, axis=0))(codes[:, q])

    latent = gather(0)
    for q in range(1, n_q):
        latent = latent + gather(q)
    return latent  # (B, T, D)


def rvq_encode(codebooks: jax.Array, latent: jax.Array, n_q: int) -> jax.Array:
    """latent (B, T, D) -> codes (B, n_q, T) via iterative residual NN search."""
    residual = latent
    codes = []
    for q in range(n_q):
        cb = codebooks[q]  # (K, D)
        # squared L2 distance argmin over codebook
        dots = jnp.einsum("btd,kd->btk", residual, cb)
        sq = jnp.sum(cb * cb, axis=-1)
        idx = jnp.argmax(2 * dots - sq, axis=-1)  # (B, T)
        codes.append(idx)
        residual = residual - jnp.take(cb, idx, axis=0)
    return jnp.stack(codes, axis=1).astype(jnp.int32)


# --------------------------------------------------------------------------------------
# Decoder / Encoder
# --------------------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("cfg",))
def decode_latent(params: Params, cfg: EncodecConfig, latent: jax.Array) -> jax.Array:
    """latent (B, T, D) -> waveform (B, T * hop)."""
    dec = params["decoder"]
    x = _conv1d(latent, dec["conv_in_w"], dec.get("conv_in_b"), causal=cfg.causal)
    x = _lstm_stack(x, dec["lstm"])
    for i in range(len(cfg.ratios)):
        blk = dec["blocks"][i]
        x = jax.nn.elu(x)
        x = _conv_transpose1d(x, blk["convtr_w"], blk.get("convtr_b"), cfg.ratios[i], cfg.causal)
        x = _residual_unit(x, blk["res"], cfg)
    x = jax.nn.elu(x)
    x = _conv1d(x, dec["conv_out_w"], dec.get("conv_out_b"), causal=cfg.causal)
    return x[..., 0]  # (B, T*hop)


@partial(jax.jit, static_argnames=("cfg",))
def decode_codes(params: Params, cfg: EncodecConfig, codes: jax.Array) -> jax.Array:
    """codes (n_q, T) or (B, n_q, T) -> waveform (B, samples).

    Jitted END-TO-END: the eager rvq_decode gathers alone cost ~8 tunnel
    dispatches (~200 ms of a 285 ms production render, measured in
    scripts/diag_render_profile.py) — as one program the whole decode is
    ~58 ms including the waveform fetch."""
    latent = rvq_decode(params["codebooks"], jnp.asarray(codes))
    return decode_latent(params, cfg, latent)


@partial(jax.jit, static_argnames=("cfg",))
def encode_latent(params: Params, cfg: EncodecConfig, wav: jax.Array) -> jax.Array:
    """waveform (B, T) -> latent (B, T//hop, D)."""
    enc = params["encoder"]
    x = wav[..., None]  # (B, T, 1)
    x = _conv1d(x, enc["conv_in_w"], enc.get("conv_in_b"), causal=cfg.causal)
    for i in range(len(cfg.ratios)):
        blk = enc["blocks"][i]
        x = _residual_unit(x, blk["res"], cfg)
        x = jax.nn.elu(x)
        # encoder downsample ratios run fine->coarse (reversed decoder order)
        x = _conv1d(x, blk["conv_w"], blk.get("conv_b"), stride=cfg.ratios[::-1][i], causal=cfg.causal)
    x = _lstm_stack(x, enc["lstm"])
    x = jax.nn.elu(x)
    x = _conv1d(x, enc["conv_out_w"], enc.get("conv_out_b"), causal=cfg.causal)
    return x


@partial(jax.jit, static_argnames=("cfg",))
def encode_codes(params: Params, cfg: EncodecConfig, wav: jax.Array) -> jax.Array:
    """waveform (B, T) -> codes (B, n_q, T//hop). One program (see
    decode_codes): the n_q eager argmin/gather rounds of rvq_encode each
    cost a tunnel dispatch otherwise."""
    latent = encode_latent(params, cfg, wav)
    return rvq_encode(params["codebooks"], latent, cfg.n_q)


# --------------------------------------------------------------------------------------
# Init
# --------------------------------------------------------------------------------------


def init_params(key: jax.Array, cfg: EncodecConfig = EncodecConfig(), dtype=jnp.float32) -> Params:
    """Random init with the same topology as the pretrained 24 kHz model."""
    keys = jax.random.split(key, 64)
    ki = iter(keys)

    def conv(k, c_in, c_out):
        fan = k * c_in
        return (jax.random.normal(next(ki), (k, c_in, c_out)) / np.sqrt(fan)).astype(dtype)

    c_max = cfg.max_channels  # 512
    d = cfg.dimension

    def lstm_params(c):
        return {
            "w_ih": (jax.random.normal(next(ki), (cfg.lstm_layers, c, 4 * c)) / np.sqrt(c)).astype(dtype),
            "w_hh": (jax.random.normal(next(ki), (cfg.lstm_layers, c, 4 * c)) / np.sqrt(c)).astype(dtype),
            "b": jnp.zeros((cfg.lstm_layers, 4 * c), dtype),
        }

    # decoder: channels 512 -> 256 -> 128 -> 64 -> 32
    dec_blocks = []
    c = c_max
    for r in cfg.ratios:
        c_out = c // 2
        dec_blocks.append(
            {
                "convtr_w": conv(2 * r, c, c_out),
                "convtr_b": jnp.zeros((c_out,), dtype),
                "res": {
                    "conv1_w": conv(cfg.residual_kernel_size, c_out, c_out // 2),
                    "conv1_b": jnp.zeros((c_out // 2,), dtype),
                    "conv2_w": conv(1, c_out // 2, c_out),
                    "conv2_b": jnp.zeros((c_out,), dtype),
                },
            }
        )
        c = c_out
    decoder = {
        "conv_in_w": conv(cfg.kernel_size, d, c_max),
        "conv_in_b": jnp.zeros((c_max,), dtype),
        "lstm": lstm_params(c_max),
        "blocks": dec_blocks,
        "conv_out_w": conv(cfg.last_kernel_size, c, cfg.channels),
        "conv_out_b": jnp.zeros((cfg.channels,), dtype),
    }

    # encoder mirror: 32 -> 64 -> 128 -> 256 -> 512, downsampling 2,4,5,8
    enc_blocks = []
    c = cfg.n_filters
    for r in cfg.ratios[::-1]:
        c_out = c * 2
        enc_blocks.append(
            {
                "res": {
                    "conv1_w": conv(cfg.residual_kernel_size, c, c // 2),
                    "conv1_b": jnp.zeros((c // 2,), dtype),
                    "conv2_w": conv(1, c // 2, c),
                    "conv2_b": jnp.zeros((c,), dtype),
                },
                "conv_w": conv(2 * r, c, c_out),
                "conv_b": jnp.zeros((c_out,), dtype),
            }
        )
        c = c_out
    encoder = {
        "conv_in_w": conv(cfg.kernel_size, cfg.channels, cfg.n_filters),
        "conv_in_b": jnp.zeros((cfg.n_filters,), dtype),
        "blocks": enc_blocks,
        "lstm": lstm_params(c_max),
        "conv_out_w": conv(cfg.last_kernel_size, c_max, d),
        "conv_out_b": jnp.zeros((d,), dtype),
    }

    codebooks = (jax.random.normal(next(ki), (cfg.n_q, cfg.codebook_size, d))).astype(dtype)
    return {"decoder": decoder, "encoder": encoder, "codebooks": codebooks}

"""Audio DSP ops in JAX: STFT, mel filterbank, resampling.

The reference leans on librosa (C-backed) for the speaker-encoder mel
frontend (fam/quantiser/audio/speaker_encoder/audio.py:10-22) and julius for
resampling (fam/llm/decoders.py:57). Neither exists here; these are
from-scratch implementations that compile to XLA:

  * ``stft`` — centered (reflect-padded) short-time Fourier transform via
    gather-framing + rfft (TPU-native FFT).
  * ``mel_filterbank`` — Slaney-scale, Slaney-normalized triangular bank,
    numerically matching ``librosa.filters.mel(htk=False, norm="slaney")``.
  * ``mel_spectrogram`` — power mel spectrogram equal to
    ``librosa.feature.melspectrogram`` for the speaker-encoder settings
    (sr=16000, n_fft=400, hop=160, n_mels=40).
  * ``resample`` — rational-ratio polyphase windowed-sinc resampler
    (julius/resampy-style) as a strided conv, usable on host or device.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np


def hann_window(n_fft: int) -> np.ndarray:
    """Periodic Hann window (what librosa/scipy use for STFT)."""
    return (0.5 * (1.0 - np.cos(2.0 * np.pi * np.arange(n_fft) / n_fft))).astype(
        np.float32
    )


def frame_signal(y: jax.Array, frame_length: int, hop_length: int) -> jax.Array:
    """(..., T) -> (..., n_frames, frame_length) via gather indexing."""
    t = y.shape[-1]
    n_frames = 1 + (t - frame_length) // hop_length
    idx = (
        np.arange(n_frames)[:, None] * hop_length + np.arange(frame_length)[None, :]
    )
    return y[..., idx]


def stft(
    y: jax.Array,
    n_fft: int,
    hop_length: int,
    window: np.ndarray | None = None,
    center: bool = True,
) -> jax.Array:
    """Complex STFT, (..., T) -> (..., n_frames, n_fft//2 + 1).

    center=True reflect-pads by n_fft//2 on both sides (librosa default), so
    n_frames = 1 + T // hop_length.
    """
    if window is None:
        window = hann_window(n_fft)
    if center:
        pad = [(0, 0)] * (y.ndim - 1) + [(n_fft // 2, n_fft // 2)]
        y = jnp.pad(y, pad, mode="reflect")
    frames = frame_signal(y, n_fft, hop_length) * jnp.asarray(window)
    return jnp.fft.rfft(frames, n=n_fft, axis=-1)


def istft(
    spec: jax.Array, n_fft: int, hop_length: int, length: int | None = None
) -> jax.Array:
    """Inverse STFT with Hann synthesis window + COLA normalization.

    spec: (..., frames, bins) complex -> (..., T). jnp counterpart of
    :func:`istft_np`; FFT is unimplemented on the axon TPU runtime, so this
    runs on the CPU backend (callers jit with a cpu device or run eagerly).
    """
    window = jnp.asarray(hann_window(n_fft))
    frames = jnp.fft.irfft(spec, n=n_fft, axis=-1) * window  # (..., F, n_fft)
    n_frames = spec.shape[-2]
    t_total = n_fft + hop_length * (n_frames - 1)

    idx = np.arange(n_frames)[:, None] * hop_length + np.arange(n_fft)[None, :]
    out = jnp.zeros(spec.shape[:-2] + (t_total,), frames.dtype)
    out = out.at[..., idx.reshape(-1)].add(frames.reshape(spec.shape[:-2] + (-1,)))
    norm = jnp.zeros((t_total,), frames.dtype)
    norm = norm.at[idx.reshape(-1)].add(jnp.tile(window**2, (n_frames,)))
    out = out / jnp.maximum(norm, 1e-8)
    # undo the center padding stft applied
    out = out[..., n_fft // 2 :]
    if length is not None:
        out = out[..., :length]
    return out


def stft_np(y: np.ndarray, n_fft: int, hop_length: int, center: bool = True) -> np.ndarray:
    """Pure-numpy STFT for host-side DSP stages (enhancer, checks); same
    semantics as :func:`stft`."""
    y = np.asarray(y, np.float32)
    if center:
        y = np.pad(y, (n_fft // 2, n_fft // 2), mode="reflect")
    n_frames = 1 + (len(y) - n_fft) // hop_length
    idx = np.arange(n_frames)[:, None] * hop_length + np.arange(n_fft)[None, :]
    frames = y[idx] * hann_window(n_fft)
    return np.fft.rfft(frames, n=n_fft, axis=-1)


def istft_np(spec: np.ndarray, n_fft: int, hop_length: int, length: int | None = None) -> np.ndarray:
    """Pure-numpy inverse STFT with Hann synthesis + COLA normalization."""
    window = hann_window(n_fft)
    frames = np.fft.irfft(spec, n=n_fft, axis=-1).astype(np.float64) * window
    n_frames = spec.shape[-2]
    t_total = n_fft + hop_length * (n_frames - 1)
    out = np.zeros(t_total, np.float64)
    norm = np.zeros(t_total, np.float64)
    for i in range(n_frames):
        sl = slice(i * hop_length, i * hop_length + n_fft)
        out[sl] += frames[i]
        norm[sl] += window.astype(np.float64) ** 2
    out = out / np.maximum(norm, 1e-8)
    out = out[n_fft // 2 :]
    if length is not None:
        out = out[:length]
    return out.astype(np.float32)


def _hz_to_mel_slaney(f: np.ndarray) -> np.ndarray:
    f = np.asarray(f, dtype=np.float64)
    f_sp = 200.0 / 3
    mels = f / f_sp
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    with np.errstate(divide="ignore"):  # f=0 resolves to the linear branch
        log_mels = min_log_mel + np.log(np.maximum(f, 1e-12) / min_log_hz) / logstep
    return np.where(f >= min_log_hz, log_mels, mels)


def _mel_to_hz_slaney(m: np.ndarray) -> np.ndarray:
    m = np.asarray(m, dtype=np.float64)
    f_sp = 200.0 / 3
    freqs = m * f_sp
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(m >= min_log_mel, min_log_hz * np.exp(logstep * (m - min_log_mel)), freqs)


@lru_cache(maxsize=16)
def mel_filterbank(
    sr: int, n_fft: int, n_mels: int, fmin: float = 0.0, fmax: float | None = None
) -> np.ndarray:
    """(n_mels, n_fft//2+1) Slaney triangular filterbank == librosa default."""
    if fmax is None:
        fmax = sr / 2.0
    fft_freqs = np.linspace(0, sr / 2.0, 1 + n_fft // 2)
    mel_pts = np.linspace(
        _hz_to_mel_slaney(np.array(fmin)), _hz_to_mel_slaney(np.array(fmax)), n_mels + 2
    )
    hz_pts = _mel_to_hz_slaney(mel_pts)
    fdiff = np.diff(hz_pts)
    ramps = hz_pts[:, None] - fft_freqs[None, :]
    lower = -ramps[:-2] / fdiff[:-1][:, None]
    upper = ramps[2:] / fdiff[1:][:, None]
    weights = np.maximum(0.0, np.minimum(lower, upper))
    # Slaney normalization: each filter integrates to ~2/bandwidth
    enorm = 2.0 / (hz_pts[2 : n_mels + 2] - hz_pts[:n_mels])
    weights *= enorm[:, None]
    return weights.astype(np.float32)


def _mel_impl(y, sr, n_fft, hop_length, n_mels):
    spec = stft(y, n_fft, hop_length)
    power = jnp.abs(spec) ** 2  # (..., frames, bins)
    fb = jnp.asarray(mel_filterbank(sr, n_fft, n_mels))
    return jnp.einsum("mf,...tf->...mt", fb, power.astype(jnp.float32))


@lru_cache(maxsize=1)
def _mel_cpu_jit():
    # FFT is unimplemented on some TPU runtimes (and this is host-side
    # preprocessing: once per utterance); pin the mel frontend to CPU.
    cpu = jax.devices("cpu")[0]
    return jax.jit(
        _mel_impl, static_argnames=("sr", "n_fft", "hop_length", "n_mels"), device=cpu
    )


def mel_spectrogram(
    y: jax.Array,
    sr: int = 16000,
    n_fft: int = 400,
    hop_length: int = 160,
    n_mels: int = 40,
) -> jax.Array:
    """Power mel spectrogram, (..., T) -> (..., n_mels, n_frames).

    Defaults are the speaker-encoder frontend: 25 ms / 10 ms windows, 40
    channels at 16 kHz (fam/quantiser/audio/speaker_encoder/audio.py:4-22).
    Not log-scaled, matching the reference (its docstring notes the same).
    Always executes on the CPU backend (TPU runtimes may lack FFT).
    """
    cpu = jax.devices("cpu")[0]
    y = jax.device_put(jnp.asarray(y), cpu)
    return _mel_cpu_jit()(y, sr=sr, n_fft=n_fft, hop_length=hop_length, n_mels=n_mels)


# --------------------------------------------------------------------------------------
# Resampling
# --------------------------------------------------------------------------------------


@lru_cache(maxsize=32)
def _resample_kernel(
    up: int, down: int, zeros: int = 24, rolloff: float = 0.945
) -> np.ndarray:
    """Polyphase windowed-sinc kernels, shape (up, 1, kernel_width).

    Julius-style (LowPassFilter + subsample): one lowpass sinc at cutoff
    min(up,down)^-1 * rolloff, Hann-windowed, evaluated at the ``up`` phase
    offsets.
    """
    sr_ratio = up / down
    cutoff = 0.5 * rolloff * min(1.0, sr_ratio)
    width = int(np.ceil(zeros / (2 * cutoff)))
    idx = np.arange(-width, width + 1, dtype=np.float64)
    kernels = []
    for phase in range(up):
        t = idx - phase / up
        x = 2 * cutoff * t
        sinc = np.sinc(x)
        win = np.where(
            np.abs(x) < zeros, 0.5 * (1 + np.cos(np.pi * x / zeros)), 0.0
        )
        kernels.append(2 * cutoff * sinc * win)
    k = np.stack(kernels, axis=0)[:, None, :]  # (up, 1, W)
    # Normalize each phase to unit DC gain so a constant signal resamples to
    # the same constant (the analytic gain is ~1 already; this removes the
    # residual windowing error).
    k = k / k.sum(-1, keepdims=True)
    return k.astype(np.float32)


def resample(y: jax.Array | np.ndarray, orig_sr: int, target_sr: int) -> jax.Array:
    """Rational polyphase resampling, (..., T) -> (..., T * target/orig)."""
    if orig_sr == target_sr:
        return jnp.asarray(y)
    g = np.gcd(orig_sr, target_sr)
    up, down = target_sr // g, orig_sr // g
    kernels = _resample_kernel(up, down)  # (up, 1, W)
    w = kernels.shape[-1]
    half = w // 2

    y = jnp.asarray(y, jnp.float32)
    shape = y.shape
    t = shape[-1]
    x = y.reshape(-1, 1, t)  # (N, C=1, T)
    x = jnp.pad(x, ((0, 0), (0, 0), (half, half + down)), mode="constant")
    # Output at phase p, step n: sum_k x[n*down + offset] * kernel[p]
    out = jax.lax.conv_general_dilated(
        x,
        jnp.asarray(kernels),  # (up out-feature, 1, W)
        window_strides=(down,),
        padding="VALID",
        dimension_numbers=("NCH", "OIH", "NCH"),
    )  # (N, up, T//down + 1)
    out = out.transpose(0, 2, 1).reshape(x.shape[0], -1)  # interleave phases
    new_t = int(np.ceil(t * up / down))
    out = out[:, :new_t]
    return out.reshape(*shape[:-1], new_t)

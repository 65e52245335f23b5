"""Speaker encoder: 3-layer LSTM -> 256-d L2-normalized embedding.

Architecture parity with the reference (fam/quantiser/audio/speaker_encoder/
model.py:21-117): LSTM(40 -> 256, 3 layers, batch_first) over 40-channel mel
frames, final hidden state of the last layer -> Linear(256, 256) -> ReLU ->
L2 norm; utterance embedding = L2-normalized mean over sliding partial
windows (160 frames, rate 1.3, min_coverage 0.75).

TPU-first: the LSTM is a ``jax.lax.scan`` over time with all partial windows
batched into one (N, 160, 40) forward — a handful of fused MXU matmuls per
step instead of cuDNN. The mel frontend is ops/audio.mel_spectrogram.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from metavoice_tpu.ops.audio import mel_spectrogram

MEL_WINDOW_STEP_MS = 10
MEL_N_CHANNELS = 40
SAMPLING_RATE = 16000
PARTIALS_N_FRAMES = 160
MODEL_HIDDEN_SIZE = 256
MODEL_EMBEDDING_SIZE = 256
MODEL_NUM_LAYERS = 3


class SpeakerEncoderParams(NamedTuple):
    """LSTM weights stacked over layers.

    w_ih: (L, in_dim_max, 4H) input->gates (layer 0 uses the first 40 rows);
    w_hh: (L, H, 4H); b: (L, 4H) (= torch's b_ih + b_hh, summed at load).
    Gate order i, f, g, o as in torch.
    """

    w_ih: jax.Array
    w_hh: jax.Array
    b: jax.Array
    linear_w: jax.Array  # (H, E)
    linear_b: jax.Array  # (E,)


def init_params(key: jax.Array, dtype=jnp.float32) -> SpeakerEncoderParams:
    h, e, l = MODEL_HIDDEN_SIZE, MODEL_EMBEDDING_SIZE, MODEL_NUM_LAYERS
    in_max = max(MEL_N_CHANNELS, h)
    k = jax.random.split(key, 4)
    s = 1.0 / np.sqrt(h)
    return SpeakerEncoderParams(
        w_ih=(jax.random.uniform(k[0], (l, in_max, 4 * h), minval=-s, maxval=s)).astype(dtype),
        w_hh=(jax.random.uniform(k[1], (l, h, 4 * h), minval=-s, maxval=s)).astype(dtype),
        b=jnp.zeros((l, 4 * h), dtype),
        linear_w=(jax.random.uniform(k[2], (h, e), minval=-s, maxval=s)).astype(dtype),
        linear_b=jnp.zeros((e,), dtype),
    )


def _lstm_layer(x: jax.Array, w_ih: jax.Array, w_hh: jax.Array, b: jax.Array) -> tuple[jax.Array, jax.Array]:
    """One LSTM layer over time. x: (B, T, D_in) -> (outputs (B, T, H), h_T (B, H))."""
    bsz = x.shape[0]
    h_dim = w_hh.shape[0]
    w_ih = w_ih[: x.shape[-1]]  # trim padded input rows for layer 0

    # Precompute input projections for all timesteps in one MXU matmul.
    x_proj = jnp.einsum("btd,dg->btg", x, w_ih) + b  # (B, T, 4H)

    def step(carry, xp_t):
        h_prev, c_prev = carry
        gates = xp_t + h_prev @ w_hh  # (B, 4H)
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        i, f, o = jax.nn.sigmoid(i), jax.nn.sigmoid(f), jax.nn.sigmoid(o)
        g = jnp.tanh(g)
        c = f * c_prev + i * g
        h = o * jnp.tanh(c)
        return (h, c), h

    init = (
        jnp.zeros((bsz, h_dim), x.dtype),
        jnp.zeros((bsz, h_dim), x.dtype),
    )
    (h_last, _), outs = jax.lax.scan(step, init, x_proj.transpose(1, 0, 2))
    return outs.transpose(1, 0, 2), h_last


@jax.jit
def forward(params: SpeakerEncoderParams, mels: jax.Array) -> jax.Array:
    """(B, T, 40) mel frames -> (B, 256) L2-normalized embeddings.

    Matches reference forward (model.py:55-58): last-layer final hidden ->
    linear -> relu -> row L2 norm.
    """
    x = mels
    h_last = None
    for layer in range(MODEL_NUM_LAYERS):
        x, h_last = _lstm_layer(
            x, params.w_ih[layer], params.w_hh[layer], params.b[layer]
        )
    raw = jax.nn.relu(h_last @ params.linear_w + params.linear_b)
    # epsilon guard: with untrained weights ReLU can zero a whole row and
    # 0/0 would poison downstream losses; trained weights never hit this
    return raw / jnp.maximum(jnp.linalg.norm(raw, axis=1, keepdims=True), 1e-8)


def compute_partial_slices(
    n_samples: int, rate: float = 1.3, min_coverage: float = 0.75
) -> tuple[list[slice], list[slice]]:
    """Sliding partial-utterance windows (reference model.py:60-83)."""
    samples_per_frame = int(SAMPLING_RATE * MEL_WINDOW_STEP_MS / 1000)
    n_frames = int(np.ceil((n_samples + 1) / samples_per_frame))
    frame_step = int(np.round((SAMPLING_RATE / rate) / samples_per_frame))

    wav_slices, mel_slices = [], []
    steps = max(1, n_frames - PARTIALS_N_FRAMES + frame_step + 1)
    for i in range(0, steps, frame_step):
        mel_range = np.array([i, i + PARTIALS_N_FRAMES])
        wav_range = mel_range * samples_per_frame
        mel_slices.append(slice(*mel_range))
        wav_slices.append(slice(*wav_range))

    last_wav_range = wav_slices[-1]
    coverage = (n_samples - last_wav_range.start) / (
        last_wav_range.stop - last_wav_range.start
    )
    if coverage < min_coverage and len(mel_slices) > 1:
        mel_slices = mel_slices[:-1]
        wav_slices = wav_slices[:-1]
    return wav_slices, mel_slices


def embed_utterance(
    params: SpeakerEncoderParams,
    wav: np.ndarray,
    rate: float = 1.3,
    min_coverage: float = 0.75,
) -> np.ndarray:
    """16 kHz waveform -> (256,) utterance embedding.

    Mean of partial-window embeddings, L2-normalized (reference
    model.py:85-106). The mel is computed once over the whole utterance and
    sliced per window, as the reference does.
    """
    wav_slices, mel_slices = compute_partial_slices(len(wav), rate, min_coverage)
    max_wave_length = wav_slices[-1].stop
    if max_wave_length >= len(wav):
        wav = np.pad(wav, (0, max_wave_length - len(wav)), "constant")

    # bucket the mel input to whole seconds: the (cpu-jitted) mel program
    # then compiles once per duration bucket, not per reference file length
    bucket = -(-len(wav) // SAMPLING_RATE) * SAMPLING_RATE
    wav_b = np.pad(wav, (0, bucket - len(wav)), "constant") if bucket != len(wav) else wav
    mel = np.asarray(mel_spectrogram(jnp.asarray(wav_b, jnp.float32))).T  # (T, 40)
    mels = np.stack([mel[s] for s in mel_slices])  # (N, 160, 40)
    # bucket the window count so the LSTM forward compiles once per bucket
    # of 8 windows, not once per reference duration
    n = mels.shape[0]
    n_pad = -(-n // 8) * 8
    if n_pad != n:
        mels = np.concatenate([mels, np.zeros((n_pad - n,) + mels.shape[1:], mels.dtype)])
    partials = np.asarray(forward(params, jnp.asarray(mels)))[:n]
    raw = partials.mean(axis=0)
    return raw / max(np.linalg.norm(raw, 2), 1e-8)


def trim_silence(wav: np.ndarray, top_db: float = 20.0, frame_length: int = 2048, hop_length: int = 512) -> np.ndarray:
    """librosa.effects.trim equivalent: strip leading/trailing frames more
    than ``top_db`` below the peak RMS (reference model.py:113-114)."""
    if len(wav) == 0:
        return wav
    pad = frame_length // 2
    padded = np.pad(wav.astype(np.float32), (pad, pad), mode="reflect") if len(wav) >= pad else wav.astype(np.float32)
    n_frames = 1 + max(0, (len(padded) - frame_length)) // hop_length
    idx = np.arange(n_frames)[:, None] * hop_length + np.arange(frame_length)[None, :]
    frames = padded[np.minimum(idx, len(padded) - 1)]
    rms = np.sqrt(np.mean(frames**2, axis=1) + 1e-12)
    db = 20.0 * np.log10(np.maximum(rms, 1e-10))
    threshold = db.max() - top_db
    keep = np.flatnonzero(db > threshold)
    if len(keep) == 0:
        return wav
    start = keep[0] * hop_length
    end = min(len(wav), (keep[-1] + 1) * hop_length + frame_length - hop_length)
    return wav[start:end]

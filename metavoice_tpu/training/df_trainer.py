"""Training recipe for the DFN-style enhancer (models/enhancer.DFEnhancer).

The reference ships pretrained DeepFilterNet weights (fam/llm/enhancers.py:
70-83); none are available offline and real DFN checkpoints do not load into
the DF-style network by design (see models/enhancer.py). This module is the
missing piece that makes the ``"df"`` option a live path instead of a dead
end: a denoising recipe on synthetic clean/noisy pairs with the DFN loss
structure (ERB-gain spectral loss + complex deep-filter loss on the low
bins), runnable entirely in-repo.

Usage:
    cfg = DFConfig(...)
    params = init_df_params(key, cfg)
    params = train_df(params, cfg, train_cfg, key)
    enhancer = DFEnhancer(params, cfg)

The trainer stamps ``params["trained_iters"]`` so ``get_enhancer("df")`` can
distinguish trained from random weights (an untrained GRU actively corrupts
audio — the factory warns, mirroring the random-EnCodec warning in
runtime/tts.py).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import optax

from metavoice_tpu.models.enhancer import DFConfig, df_enhance_spec, init_df_params
from metavoice_tpu.ops.audio import stft_np

Params = dict[str, Any]


@dataclass(frozen=True)
class DFTrainConfig:
    learning_rate: float = 3e-4
    max_iters: int = 400
    batch_size: int = 4
    clip_s: float = 0.6  # training clip length in seconds
    snr_db_lo: float = 0.0
    snr_db_hi: float = 12.0
    mag_weight: float = 1.0  # magnitude-spectral loss weight
    df_weight: float = 1.0  # complex loss weight on the deep-filtered bins
    seed: int = 0


def synth_clean_noisy(
    rng: np.random.Generator, b: int, n: int, sr: int, snr_db_lo: float, snr_db_hi: float
) -> tuple[np.ndarray, np.ndarray]:
    """Synthetic (clean, noisy) pairs: harmonic 'speech' + broadband noise.

    Clean = a few low-frequency harmonics with slow amplitude modulation
    (speech-band energy); noise = white, scaled per-clip to a random SNR.
    This is the standard self-supervised denoising setup — no speech corpus
    ships in this image, and the recipe transfers unchanged to real data.
    """
    t = np.arange(n) / sr
    clean = np.zeros((b, n), np.float32)
    for i in range(b):
        f0 = rng.uniform(90, 220)
        for h in range(1, 5):
            amp = rng.uniform(0.1, 0.4) / h
            mod = 0.5 + 0.5 * np.sin(2 * np.pi * rng.uniform(1.5, 4.0) * t + rng.uniform(0, 6))
            clean[i] += (amp * mod * np.sin(2 * np.pi * f0 * h * t)).astype(np.float32)
    noise = rng.standard_normal((b, n)).astype(np.float32)
    snr = rng.uniform(snr_db_lo, snr_db_hi, size=(b, 1)).astype(np.float32)
    p_c = np.mean(clean**2, axis=1, keepdims=True) + 1e-9
    p_n = np.mean(noise**2, axis=1, keepdims=True)
    noise *= np.sqrt(p_c / (p_n * 10 ** (snr / 10.0)))
    return clean, clean + noise


def df_loss(params: Params, cfg: DFConfig, noisy_spec, clean_spec, tcfg: DFTrainConfig):
    """DFN-structured loss: magnitude term everywhere + complex term on the
    deep-filtered low bins (DeepFilterNet2 paper, eqs. 6-8 in spirit)."""
    out = df_enhance_spec(params, cfg, noisy_spec)
    mag = jnp.mean(jnp.abs(jnp.abs(out) - jnp.abs(clean_spec)))
    low_o = out[..., : cfg.df_bins]
    low_c = clean_spec[..., : cfg.df_bins]
    comp = jnp.mean(jnp.abs(low_o - low_c))
    return tcfg.mag_weight * mag + tcfg.df_weight * comp


@partial(jax.jit, static_argnames=("cfg", "tcfg"))
def _df_step(params, opt_state, cfg: DFConfig, tcfg: DFTrainConfig, noisy_spec, clean_spec):
    loss, grads = jax.value_and_grad(
        lambda p: df_loss(p, cfg, noisy_spec, clean_spec, tcfg)
    )(params)
    opt = optax.adam(tcfg.learning_rate)
    updates, opt_state = opt.update(grads, opt_state, params)
    return optax.apply_updates(params, updates), opt_state, loss


def train_df(
    params: Params | None,
    cfg: DFConfig,
    tcfg: DFTrainConfig = DFTrainConfig(),
    key: jax.Array | None = None,
    log_every: int = 100,
) -> Params:
    """Train the DF-style enhancer on synthetic pairs; returns params with a
    ``trained_iters`` stamp (recognized by models/enhancer.get_enhancer)."""
    key = key if key is not None else jax.random.PRNGKey(tcfg.seed)
    if params is None:
        params = init_df_params(key, cfg)
    params = {k: v for k, v in params.items() if k != "trained_iters"}
    opt_state = optax.adam(tcfg.learning_rate).init(params)
    rng = np.random.default_rng(tcfg.seed)
    n = int(tcfg.clip_s * cfg.sr)
    for it in range(tcfg.max_iters):
        clean, noisy = synth_clean_noisy(
            rng, tcfg.batch_size, n, cfg.sr, tcfg.snr_db_lo, tcfg.snr_db_hi
        )
        noisy_spec = jnp.asarray(
            np.stack([stft_np(w, cfg.n_fft, cfg.hop) for w in noisy]).astype(np.complex64)
        )
        clean_spec = jnp.asarray(
            np.stack([stft_np(w, cfg.n_fft, cfg.hop) for w in clean]).astype(np.complex64)
        )
        params, opt_state, loss = _df_step(
            params, opt_state, cfg, tcfg, noisy_spec, clean_spec
        )
        if it % log_every == 0:
            print(f"df iter {it}: loss {float(loss):.4f}", flush=True)
    params = dict(params)
    params["trained_iters"] = jnp.asarray(tcfg.max_iters, jnp.int32)
    return params

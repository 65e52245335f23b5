"""Speech enhancement stage: artifact cleanup after the vocoder.

The reference pipes every synthesis through DeepFilterNet
(fam/llm/enhancers.py:70-83, ``get_enhancer("df")``) — a Rust DSP core
(ERB filterbank + deep filtering) driving a GRU network. Neither the
package, its source, nor its weights are available in this environment, so
a weight-compatible port is NOT what this module claims to be. The design
decision (documented here and in PARITY.md) is:

  * ``SpectralGateEnhancer`` — the DEFAULT. A classical Wiener/spectral-gate
    enhancer (noise floor tracked as a per-bin percentile, smoothed gain)
    that needs no training and measurably suppresses broadband vocoder
    hiss. This is the framework's supported enhancement path.
  * ``DFEnhancer`` ("df_style") — a trainable DeepFilterNet-STYLE network
    (ERB log-power features -> GRU -> per-ERB gains + low-band deep
    filtering). It follows DFN's *signal-processing recipe*, not its exact
    module tree: real DeepFilterNet checkpoints do NOT load into it, and we
    deliberately do not pretend otherwise. Train it in-repo or keep the
    spectral gate.
  * ``get_enhancer(name)`` factory, API parity with
    fam/llm/enhancers.py:86-108 ("df" maps to the DF-style network).

Enhancers are callables ``(wav: np.ndarray, sr: int) -> np.ndarray``.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np

from metavoice_tpu.ops.audio import hann_window, istft, istft_np, stft, stft_np  # noqa: F401 (istft re-exported for back-compat)

Params = dict[str, Any]


def erb_filterbank(sr: int, n_fft: int, n_bands: int = 32) -> np.ndarray:
    """(n_bands, n_bins) rectangular ERB-scale band matrix, rows normalized."""

    def hz_to_erb(f):
        return 21.4 * np.log10(1 + 0.00437 * f)

    def erb_to_hz(e):
        return (10 ** (e / 21.4) - 1) / 0.00437

    n_bins = n_fft // 2 + 1
    freqs = np.linspace(0, sr / 2, n_bins)
    edges_erb = np.linspace(hz_to_erb(20.0), hz_to_erb(sr / 2), n_bands + 1)
    edges = erb_to_hz(edges_erb)
    fb = np.zeros((n_bands, n_bins), np.float32)
    for b in range(n_bands):
        lo, hi = edges[b], edges[b + 1]
        sel = (freqs >= lo) & (freqs < hi)
        if not sel.any():
            sel[np.abs(freqs - lo).argmin()] = True
        fb[b, sel] = 1.0 / sel.sum()
    return fb


# --------------------------------------------------------------------------------------
# Classical spectral-gate enhancer (works untrained)
# --------------------------------------------------------------------------------------


@dataclass
class SpectralGateEnhancer:
    """Wiener-style spectral gate: estimate a per-bin noise floor as a low
    percentile of the magnitude envelope, apply a smoothed oversubtraction
    gain. Removes the broadband hiss diffusion vocoders leave behind."""

    n_fft: int = 1024
    hop: int = 256
    noise_percentile: float = 10.0
    oversubtract: float = 1.5
    min_gain: float = 0.1

    def __call__(self, wav: np.ndarray, sr: int) -> np.ndarray:
        wav = np.asarray(wav, np.float32)
        if len(wav) < self.n_fft:
            return wav
        # host-side DSP in numpy (FFT is unimplemented on some TPU runtimes)
        spec = stft_np(wav, self.n_fft, self.hop)
        mag = np.abs(spec)
        noise = np.percentile(mag, self.noise_percentile, axis=0, keepdims=True)
        gain = 1.0 - self.oversubtract * (noise / np.maximum(mag, 1e-8))
        gain = np.maximum(gain, self.min_gain)
        # temporal smoothing of the gain to avoid musical noise
        for t in range(1, gain.shape[0]):
            gain[t] = 0.6 * gain[t] + 0.4 * gain[t - 1]
        return istft_np(spec * gain, self.n_fft, self.hop, length=len(wav))


# --------------------------------------------------------------------------------------
# DeepFilterNet-style neural enhancer
# --------------------------------------------------------------------------------------


@dataclass(frozen=True)
class DFConfig:
    sr: int = 24000  # reference runs DFN at 48k; we stay at pipeline rate
    n_fft: int = 960
    hop: int = 480
    n_erb: int = 32
    df_bins: int = 96  # deep filtering applied to the lowest bins
    df_order: int = 5
    conv_ch: int = 64
    gru_dim: int = 256


def init_df_params(key: jax.Array, cfg: DFConfig = DFConfig(), dtype=jnp.float32) -> Params:
    ki = iter(jax.random.split(key, 16))

    def dense(i, o):
        return (jax.random.normal(next(ki), (i, o)) / np.sqrt(i)).astype(dtype)

    h = cfg.gru_dim
    # identity-biased heads: gains start near 1 (sigmoid(3) ~ 0.95) and the
    # deep-filter taps start as a unit impulse at order 0, so the untrained
    # net is near-transparent and training learns the *deviation* — the
    # standard residual-init trick for enhancement nets
    df_b = np.zeros((cfg.df_order, cfg.df_bins, 2), np.float32)
    df_b[0, :, 0] = 1.0
    return {
        "enc_in": dense(cfg.n_erb, cfg.conv_ch),
        "gru_w_ih": dense(cfg.conv_ch, 3 * h),
        "gru_w_hh": dense(h, 3 * h),
        "gru_b": jnp.zeros((3 * h,), dtype),
        "gain_out": dense(h, cfg.n_erb),
        "gain_b": jnp.full((cfg.n_erb,), 2.0, dtype),
        "df_out": dense(h, cfg.df_bins * cfg.df_order * 2) * 0.1,
        "df_b": jnp.asarray(df_b.reshape(-1), dtype),
    }


def _gru(x: jax.Array, w_ih: jax.Array, w_hh: jax.Array, b: jax.Array) -> jax.Array:
    """(B, T, D) -> (B, T, H) standard GRU via lax.scan."""
    bsz, _, _ = x.shape
    h_dim = w_hh.shape[0]
    x_proj = jnp.einsum("btd,dg->btg", x, w_ih) + b

    def step(h, xp):
        r = jax.nn.sigmoid(xp[:, :h_dim] + h @ w_hh[:, :h_dim])
        z = jax.nn.sigmoid(xp[:, h_dim : 2 * h_dim] + h @ w_hh[:, h_dim : 2 * h_dim])
        n = jnp.tanh(xp[:, 2 * h_dim :] + r * (h @ w_hh[:, 2 * h_dim :]))
        h_new = (1 - z) * n + z * h
        return h_new, h_new

    _, outs = jax.lax.scan(step, jnp.zeros((bsz, h_dim), x.dtype), x_proj.transpose(1, 0, 2))
    return outs.transpose(1, 0, 2)


@partial(jax.jit, static_argnames=("cfg",))
def df_enhance_spec(params: Params, cfg: DFConfig, spec: jax.Array) -> jax.Array:
    """Enhance a complex STFT (B, T, bins): ERB gains everywhere + deep
    filtering (complex FIR across past frames) on the low bins."""
    fb = jnp.asarray(erb_filterbank(cfg.sr, cfg.n_fft, cfg.n_erb))  # (E, bins)
    power = jnp.abs(spec) ** 2
    feat = jnp.log10(jnp.einsum("eb,xtb->xte", fb, power) + 1e-10)

    h = jax.nn.relu(feat @ params["enc_in"])
    h = _gru(h, params["gru_w_ih"], params["gru_w_hh"], params["gru_b"])

    gains = jax.nn.sigmoid(
        h @ params["gain_out"] + params.get("gain_b", 0.0)
    )  # (B, T, E)
    # band MEMBERSHIP (0/1), not the normalized analysis rows: every bin of
    # band e gets gain_e directly in [0, 1]. (A previous version scaled by
    # n_bins/band_width, which forced the sigmoid into its saturated tail
    # before any bin gain could drop below 1 — gains never learned.)
    bin_gains = jnp.einsum("xte,eb->xtb", gains, (fb > 0).astype(gains.dtype))
    # erb_filterbank's empty-band fallback can assign one bin to two bands;
    # clip so such bins attenuate (min of the two intents) instead of
    # summing past unity and amplifying
    bin_gains = jnp.clip(bin_gains, 0.0, 1.0)
    out = spec * bin_gains

    # deep filtering: complex taps over df_order past frames for low bins
    df = (h @ params["df_out"] + params.get("df_b", 0.0)).reshape(
        h.shape[0], h.shape[1], cfg.df_order, cfg.df_bins, 2
    )
    taps = df[..., 0] + 1j * df[..., 1]  # (B, T, O, df_bins)
    low = spec[..., : cfg.df_bins]
    stacked = jnp.stack(
        [jnp.roll(low, shift=o, axis=1) for o in range(cfg.df_order)], axis=2
    )  # (B, T, O, df_bins)
    low_df = jnp.sum(taps * stacked, axis=2)
    out = out.at[..., : cfg.df_bins].set(low_df)
    return out


@dataclass
class DFEnhancer:
    """Trainable DFN-STYLE neural enhancer (recipe, not weight, parity)."""

    params: Params
    cfg: DFConfig = DFConfig()

    def __call__(self, wav: np.ndarray, sr: int) -> np.ndarray:
        wav = np.asarray(wav, np.float32)
        if len(wav) < self.cfg.n_fft:
            return wav
        # FFT on host; the network itself runs on the CPU backend too (it is
        # a tail post-processing stage, trivially cheap next to the vocoder)
        cpu = jax.devices("cpu")[0]
        spec_np = stft_np(wav, self.cfg.n_fft, self.cfg.hop)[None]
        spec = jax.device_put(jnp.asarray(spec_np.astype(np.complex64)), cpu)
        params = jax.device_put(self.params, cpu)
        out = np.asarray(df_enhance_spec(params, self.cfg, spec))
        return istft_np(out[0], self.cfg.n_fft, self.cfg.hop, length=len(wav))


def get_enhancer(
    enhancer_name: str = "spectral_gate",
    key: jax.Array | None = None,
    params: Params | None = None,
    cfg: "DFConfig | None" = None,
) -> Callable:
    """Factory, parity with reference get_enhancer (fam/llm/enhancers.py:86).

    "df" returns the DFN-STYLE neural enhancer (train via
    training/df_trainer; real DeepFilterNet weights do not load — see module
    docstring); "spectral_gate" (default) works untrained; "none" is
    identity. Pass trained ``params`` (and their ``cfg``) for "df" —
    without them the network is RANDOM and actively corrupts audio, so the
    factory warns loudly (mirroring the random-EnCodec warning in
    runtime/tts.py).
    """
    if enhancer_name == "df":
        dcfg = cfg or DFConfig()
        if params is None:
            params = init_df_params(
                key if key is not None else jax.random.PRNGKey(0), dcfg
            )
        if "trained_iters" not in params:
            import warnings

            warnings.warn(
                "get_enhancer('df') was given UNTRAINED weights: a random "
                "GRU corrupts audio instead of enhancing it. Train via "
                "metavoice_tpu.training.df_trainer.train_df (stamps "
                "'trained_iters') or use enhancer='spectral_gate', which "
                "needs no training."
            )
        return DFEnhancer(params, dcfg)
    if enhancer_name == "spectral_gate":
        return SpectralGateEnhancer()
    if enhancer_name == "none":
        return lambda wav, sr: wav
    raise ValueError(f"Unknown enhancer name: {enhancer_name}")

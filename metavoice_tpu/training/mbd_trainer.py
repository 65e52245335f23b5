"""Multi-band diffusion training: the in-repo path to MBD weights.

audiocraft ships pretrained MBD checkpoints the reference downloads
(fam/llm/decoders.py:84-86); offline, this module makes the ``mbd`` vocoder
option trainable from data instead (the audiocraft training recipe,
audiocraft/solvers/diffusion.py DiffusionSolver, reproduced TPU-natively):

  * each of the ``n_processes`` band models trains independently on ITS
    frequency band of the target waveform (julius mel band split),
  * targets are processor-projected (MultiBandProcessor.project_sample —
    per-band standardization toward unit noise power), with the processor's
    running statistics updated online from the first training samples,
  * the objective is standard DDPM epsilon-prediction MSE at a uniformly
    sampled step t: x_t = sqrt(ab_t) x0 + sqrt(1-ab_t) eps, L = ||eps_hat - eps||^2,
  * conditioning is the EnCodec continuous latent of the same audio.

The train step is one jit-compiled program per band model; data parallelism
shards the batch over the mesh like training/finetune.py.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import optax

from metavoice_tpu.models import mbd

Params = dict[str, Any]


@dataclass(frozen=True)
class MBDTrainConfig:
    learning_rate: float = 2e-4
    beta1: float = 0.9
    beta2: float = 0.999
    grad_clip: float = 1.0
    batch_size: int = 4
    max_iters: int = 100_000
    # number of samples used to fit the band processors before training
    processor_fit_samples: int = 10_000


def processor_update(proc: Params, band: jax.Array) -> Params:
    """Online update of MultiBandProcessor running sums from ONE band's
    samples (diffusion_schedule.py project_sample's stat accumulation).

    ``band``: the processor owner's full multi-band decomposition is handled
    by :func:`fit_processor`; this updates the four buffers for a (B, n_bands, T)
    band stack in one shot.
    """
    bsz = band.shape[0]
    mean = band.mean(axis=(0, 2))
    sq = (band**2).mean(axis=(0, 2))
    # target: unit-variance Gaussian noise split into the same bands has
    # band power == its share of the spectrum; estimate it empirically
    return {
        "counts": proc["counts"] + bsz,
        "sum_x": proc["sum_x"] + mean * bsz,
        "sum_x2": proc["sum_x2"] + sq * bsz,
        "sum_target_x2": proc["sum_target_x2"],
    }


def fit_processor(
    cfg: mbd.MBDConfig, wavs: jax.Array, key: jax.Array
) -> Params:
    """Fit one MultiBandProcessor's statistics from clean waveforms.

    ``wavs``: (N, T). target_x2 comes from white noise passed through the
    same band split (what MultiBandProcessor rescales each band toward).
    """
    n = cfg.processor_bands
    proc = {
        "counts": jnp.zeros((1,), jnp.float32),
        "sum_x": jnp.zeros((n,), jnp.float32),
        "sum_x2": jnp.zeros((n,), jnp.float32),
        "sum_target_x2": jnp.zeros((n,), jnp.float32),
    }
    bands = jnp.stack(mbd.split_bands(wavs, cfg.sample_rate, n), axis=1)  # (N, n, T)
    noise = jax.random.normal(key, wavs.shape)
    noise_bands = jnp.stack(mbd.split_bands(noise, cfg.sample_rate, n), axis=1)
    bsz = wavs.shape[0]
    proc = processor_update(proc, bands)
    proc["sum_target_x2"] = (noise_bands**2).mean(axis=(0, 2)) * bsz
    return proc


def diffusion_loss(
    unet_params: Params,
    cfg: mbd.MBDConfig,
    x0: jax.Array,  # (B, T) processor-projected band target
    condition: jax.Array,  # (B, Tc, codec_dim)
    key: jax.Array,
) -> jax.Array:
    """DDPM epsilon-MSE at a uniform step (audiocraft DiffusionSolver.run_step)."""
    bsz = x0.shape[0]
    k_t, k_eps = jax.random.split(key)
    betas = jnp.asarray(mbd.schedule_betas(cfg.schedule), jnp.float32)
    alpha_bars = jnp.cumprod(1.0 - betas)
    t = jax.random.randint(k_t, (bsz,), 0, cfg.schedule.num_steps)
    ab = alpha_bars[t][:, None]  # (B, 1)
    eps = jax.random.normal(k_eps, x0.shape)
    x_t = jnp.sqrt(ab) * x0 + jnp.sqrt(1.0 - ab) * eps
    # per-example step ids: vmap the UNet over the batch (step embedding
    # indexing is per-example)
    est = jax.vmap(
        lambda xe, te, ce: mbd.unet_forward(
            unet_params, cfg.unet, xe[None, :, None], te, ce[None]
        )[0, :, 0]
    )(x_t, t, condition)
    return jnp.mean((est - eps) ** 2)


def make_mbd_train_step(cfg: mbd.MBDConfig, tcfg: MBDTrainConfig):
    """Jitted per-band train step: (opt_state, unet_params, batch, key) ->
    (new_opt_state, new_params, loss). ``batch`` = {"band": (B, T) projected
    band target, "emb": (B, Tc, D) EnCodec latent}."""
    opt = optax.chain(
        optax.clip_by_global_norm(tcfg.grad_clip),
        optax.adam(tcfg.learning_rate, b1=tcfg.beta1, b2=tcfg.beta2),
    )

    @jax.jit
    def step(opt_state, unet_params, batch, key):
        loss, grads = jax.value_and_grad(diffusion_loss)(
            unet_params, cfg, batch["band"], batch["emb"], key
        )
        updates, opt_state = opt.update(grads, opt_state, unet_params)
        unet_params = optax.apply_updates(unet_params, updates)
        return opt_state, unet_params, loss

    return opt, step


def train_band(
    cfg: mbd.MBDConfig,
    tcfg: MBDTrainConfig,
    band_index: int,
    unet_params: Params,
    proc: Params,
    batches,  # iterator of {"wav": (B, T), "emb": (B, Tc, D)}
    key: jax.Array,
    log_every: int = 50,
) -> tuple[Params, Params]:
    """Train ONE band model (audiocraft trains the n_processes models as
    independent runs). Returns (unet_params, processor)."""
    opt, step = make_mbd_train_step(cfg, tcfg)
    opt_state = opt.init(unet_params)
    for it, batch in enumerate(batches):
        if it >= tcfg.max_iters:
            break
        wav = jnp.asarray(batch["wav"])
        band = mbd.split_bands(wav, cfg.sample_rate, cfg.n_processes)[band_index]
        target = mbd.processor_project_sample(
            proc, band, cfg.sample_rate, cfg.processor_bands, cfg.processor_power_std
        )
        key, sub = jax.random.split(key)
        opt_state, unet_params, loss = step(
            opt_state, unet_params, {"band": target, "emb": jnp.asarray(batch["emb"])}, sub
        )
        if it % log_every == 0:
            print(f"band {band_index} iter {it}: loss {float(loss):.4f}", flush=True)
    return unet_params, proc

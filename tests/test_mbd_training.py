"""MBD training recipe: the in-repo path to multi-band diffusion weights
(counterpart of audiocraft's DiffusionSolver; see training/mbd_trainer.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from metavoice_tpu.models import mbd
from metavoice_tpu.training import mbd_trainer as mt

CFG = mbd.MBDConfig(
    n_processes=2,
    unet=mbd.UNetConfig(hidden=4, depth=2, num_steps=16, codec_dim=8),
    schedule=mbd.ScheduleConfig(num_steps=16, beta_exp=1.0),
    step_list=(15, 7, 0),
    processor_bands=4,
    eq_bands=8,
    sample_rate=24000,
)


def test_fit_processor_stats():
    rng = np.random.default_rng(0)
    wavs = jnp.asarray(rng.normal(size=(4, 2400)).astype(np.float32) * 0.5)
    proc = mt.fit_processor(CFG, wavs, jax.random.PRNGKey(0))
    mean, std, target_std = mbd.processor_stats(proc)
    assert mean.shape == (4,)
    assert np.isfinite(np.asarray(std)).all()
    assert (np.asarray(target_std) > 0).all()


def test_diffusion_loss_finite_and_decreases():
    rng = np.random.default_rng(1)
    unet = mbd.init_unet_params(jax.random.PRNGKey(0), CFG.unet)
    wav = jnp.asarray(rng.normal(size=(2, 512)).astype(np.float32))
    emb = jnp.asarray(rng.normal(size=(2, 4, 8)).astype(np.float32))
    proc = mt.fit_processor(CFG, wav, jax.random.PRNGKey(1))
    band = mbd.split_bands(wav, CFG.sample_rate, CFG.n_processes)[0]
    target = mbd.processor_project_sample(proc, band, CFG.sample_rate, CFG.processor_bands)

    tcfg = mt.MBDTrainConfig(learning_rate=1e-3, batch_size=2, max_iters=8)
    opt, step = mt.make_mbd_train_step(CFG, tcfg)
    opt_state = opt.init(unet)
    losses = []
    fixed = jax.random.PRNGKey(2)  # same (t, eps) draw -> deterministic descent
    for i in range(8):
        opt_state, unet, loss = step(opt_state, unet, {"band": target, "emb": emb}, fixed)
        losses.append(float(loss))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]


def test_train_band_end_to_end():
    rng = np.random.default_rng(2)

    def batches():
        while True:
            yield {
                "wav": rng.normal(size=(2, 512)).astype(np.float32),
                "emb": rng.normal(size=(2, 4, 8)).astype(np.float32),
            }

    unet = mbd.init_unet_params(jax.random.PRNGKey(3), CFG.unet)
    proc = mt.fit_processor(
        CFG, jnp.asarray(rng.normal(size=(2, 512)).astype(np.float32)), jax.random.PRNGKey(4)
    )
    tcfg = mt.MBDTrainConfig(max_iters=3)
    unet2, proc2 = mt.train_band(CFG, tcfg, 0, unet, proc, batches(), jax.random.PRNGKey(5))
    # params actually moved
    moved = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()), unet, unet2)
    assert max(jax.tree.leaves(moved)) > 0

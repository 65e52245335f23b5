"""DF-style enhancer training recipe: a briefly-trained net must beat
identity on SNR, and the factory must warn on untrained weights."""

import jax
import numpy as np
import pytest

from metavoice_tpu.models.enhancer import DFConfig, DFEnhancer, get_enhancer, init_df_params
from metavoice_tpu.training import df_trainer as dft

# small config so CPU training stays fast; df covers only the lowest bins
CFG = DFConfig(sr=8000, n_fft=256, hop=128, n_erb=12, df_bins=16, df_order=2,
               conv_ch=16, gru_dim=48)


def _snr(clean: np.ndarray, x: np.ndarray) -> float:
    n = min(len(clean), len(x))
    c, x = clean[:n], x[:n]
    return 10 * np.log10(np.mean(c**2) / (np.mean((x - c) ** 2) + 1e-12))


def test_trained_df_improves_snr_over_identity():
    tcfg = dft.DFTrainConfig(max_iters=250, batch_size=4, clip_s=0.5, seed=0)
    params = dft.train_df(None, CFG, tcfg, jax.random.PRNGKey(0))
    assert "trained_iters" in params

    rng = np.random.default_rng(99)
    clean, noisy = dft.synth_clean_noisy(rng, 1, 8000, CFG.sr, 5.0, 5.0)
    enh = DFEnhancer(params, CFG)
    out = enh(noisy[0], CFG.sr)
    snr_in = _snr(clean[0], noisy[0])
    snr_out = _snr(clean[0], out)
    assert snr_out > snr_in + 1.0, (snr_in, snr_out)


def test_untrained_df_factory_warns():
    with pytest.warns(UserWarning, match="UNTRAINED"):
        get_enhancer("df", cfg=CFG)


def test_trained_df_factory_does_not_warn(recwarn):
    params = init_df_params(jax.random.PRNGKey(1), CFG)
    params["trained_iters"] = jax.numpy.asarray(10)
    get_enhancer("df", params=params, cfg=CFG)
    assert not [w for w in recwarn.list if "UNTRAINED" in str(w.message)]

"""Quantized end-to-end decode: int8/int4 param trees run through the full
prefill+decode path and stay close to the dense model."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from metavoice_tpu.core.config import first_stage_config
from metavoice_tpu.models import first_stage as fs
from metavoice_tpu.models import transformer as tfm
from metavoice_tpu.ops import quantized as qz

TINY = first_stage_config(
    n_layer=2, n_head=4, dim=128, block_size=64, vocab_sizes=(97,), intermediate_size=256
)


@pytest.fixture(scope="module")
def params():
    return tfm.init_params(jax.random.PRNGKey(0), TINY)


def test_int8_forward_close_to_dense(params):
    qp = qz.quantize_params_int8(params)
    idx = jax.random.randint(jax.random.PRNGKey(1), (1, 8), 0, 97)
    spk = jnp.ones((1, 256))
    dense, _ = tfm.forward(params, TINY, idx, spk_emb=spk, compute_dtype=jnp.float32)
    quant, _ = tfm.forward(qp, TINY, idx, spk_emb=spk, compute_dtype=jnp.float32)
    d, q = np.asarray(dense[0]), np.asarray(quant[0])
    # int8 weight noise: logits stay within a few percent of dense
    denom = np.abs(d).max()
    assert np.abs(d - q).max() / denom < 0.1


def test_int4_forward_close_to_dense(params):
    qp = qz.quantize_params_int4(params, groupsize=64)
    idx = jax.random.randint(jax.random.PRNGKey(2), (1, 8), 0, 97)
    spk = jnp.ones((1, 256))
    dense, _ = tfm.forward(params, TINY, idx, spk_emb=spk, compute_dtype=jnp.float32)
    quant, _ = tfm.forward(qp, TINY, idx, spk_emb=spk, compute_dtype=jnp.float32)
    d, q = np.asarray(dense[0]), np.asarray(quant[0])
    assert np.abs(d - q).max() / np.abs(d).max() < 0.25


def test_int8_generate_end_to_end(params):
    qp = qz.quantize_params_int8(params)
    out = fs.generate(
        qp, TINY, np.arange(5) + 50, jnp.ones((256,)), key=jax.random.PRNGKey(3),
        max_new_tokens=8, end_of_audio_token=96, prompt_pad_multiple=8,
        compute_dtype=jnp.float32,
    )
    assert 5 < len(out) <= 5 + 1 + 8
    assert (out >= 0).all() and (out < 97).all()

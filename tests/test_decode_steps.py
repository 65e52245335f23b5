"""decode_steps > 1 (loop-mechanics amortization, models/first_stage.py):
N steps per while_loop iteration must be BIT-IDENTICAL to the 1-step loop —
the guard cond on steps 2..N replicates the loop condition exactly, and the
key chain / cache writes / EOA latch all live inside one_step."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from metavoice_tpu.core.config import first_stage_config
from metavoice_tpu.models import first_stage as fs
from metavoice_tpu.models import transformer as tfm

CFG = first_stage_config(
    n_layer=2, n_head=4, dim=128, block_size=128, vocab_sizes=(97,)
)


@pytest.fixture(scope="module")
def params():
    return tfm.init_params(jax.random.PRNGKey(0), CFG, dtype=jnp.float32)


@pytest.mark.parametrize("steps", [2, 3])
def test_decode_steps_bit_identical(params, steps):
    spk = jnp.ones((CFG.speaker_emb_dim,), jnp.float32)
    prompt = (np.arange(9) * 5) % 90 + 3
    kw = dict(
        key=jax.random.PRNGKey(11), max_new_tokens=11,
        prompt_pad_multiple=16, compute_dtype=jnp.float32,
    )
    ref = fs.generate(params, CFG, prompt, spk, decode_steps=1, **kw)
    out = fs.generate(params, CFG, prompt, spk, decode_steps=steps, **kw)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_decode_steps_respects_budget_and_eoa(params):
    """Odd budgets and early EOA don't overshoot: the guarded second step
    is skipped exactly where the 1-step loop would have exited."""
    spk = jnp.ones((CFG.speaker_emb_dim,), jnp.float32)
    prompt = (np.arange(9) * 7) % 90 + 3
    for budget in (1, 2, 5):
        ref = fs.generate(
            params, CFG, prompt, spk, key=jax.random.PRNGKey(3),
            max_new_tokens=budget, prompt_pad_multiple=16,
            compute_dtype=jnp.float32, decode_steps=1,
        )
        out = fs.generate(
            params, CFG, prompt, spk, key=jax.random.PRNGKey(3),
            max_new_tokens=budget, prompt_pad_multiple=16,
            compute_dtype=jnp.float32, decode_steps=2,
        )
        np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
        assert len(np.asarray(out)) <= len(prompt) + budget + 7  # pad bucket

"""Speculative decoding: rejection-sampling oracle + target-equivalence.

The accept/reject math must make every emitted token's marginal distribution
equal ordinary sampling from the target (the speculative-sampling identity);
with draft == target the acceptance rate must be 1 and greedy outputs must be
token-identical to the ordinary decode loop. The reference has no
speculative path — the equivalence target is our own `first_stage.generate`.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from metavoice_tpu.core.config import first_stage_config
from metavoice_tpu.models import first_stage as fs
from metavoice_tpu.models import spec_decode as sd
from metavoice_tpu.models import transformer as tfm

# EOA=96, text ids 97..., eot 120 — scaled-down copy of the real token space
TINY = first_stage_config(n_layer=2, n_head=4, dim=64, block_size=128, vocab_sizes=(121,))
DRAFT = first_stage_config(n_layer=1, n_head=2, dim=32, block_size=128, vocab_sizes=(121,))
EOA = 96
EOT = 120
PROMPT = [100, 101, 102, 103, 5, 17]


@pytest.fixture(scope="module")
def params():
    return tfm.init_params(jax.random.PRNGKey(0), TINY)


@pytest.fixture(scope="module")
def draft_params():
    return tfm.init_params(jax.random.PRNGKey(7), DRAFT)


# ------------------------------------------------------------------ accept_emit unit


def _rand_dist(key, v):
    return jax.nn.softmax(jax.random.normal(key, (v,)) * 1.5)


def test_accept_emit_marginal_matches_target():
    """THE speculative-sampling identity: draft d ~ q, then accept/reject
    with residual resampling => emitted token ~ p exactly. Frequency oracle
    over 30k independent draws, G=1."""
    v = 7
    p = _rand_dist(jax.random.PRNGKey(1), v)
    q = _rand_dist(jax.random.PRNGKey(2), v)

    @jax.jit
    @jax.vmap
    def one(key):
        k1, k2 = jax.random.split(key)
        d = jax.random.categorical(k1, jnp.log(q)).astype(jnp.int32)
        emitted, n_emit, _, _ = sd.accept_emit(
            k2, d[None], q[None, :], p[None, :], end_of_audio_token=999
        )
        return emitted[0]

    n = 30_000
    toks = np.asarray(one(jax.random.split(jax.random.PRNGKey(3), n)))
    freq = np.bincount(toks, minlength=v) / n
    np.testing.assert_allclose(freq, np.asarray(p), atol=0.015)


def test_accept_emit_first_slot_marginal_multi():
    """With G=3 and synthetic position-independent dists, the FIRST emitted
    token's marginal is still exactly p[0] (accept d_1 ~ q with prob
    min(1, p/q), else residual)."""
    v = 6
    g = 3
    p = _rand_dist(jax.random.PRNGKey(4), v)
    q = _rand_dist(jax.random.PRNGKey(5), v)
    P = jnp.tile(p[None], (g, 1))
    Q = jnp.tile(q[None], (g, 1))

    @jax.jit
    @jax.vmap
    def one(key):
        k1, k2 = jax.random.split(key)
        d = jax.random.categorical(k1, jnp.log(Q), axis=-1).astype(jnp.int32)
        emitted, n_emit, _, _ = sd.accept_emit(
            k2, d, Q, P, end_of_audio_token=999
        )
        return emitted[0]

    n = 30_000
    toks = np.asarray(one(jax.random.split(jax.random.PRNGKey(6), n)))
    freq = np.bincount(toks, minlength=v) / n
    np.testing.assert_allclose(freq, np.asarray(p), atol=0.015)


def test_accept_emit_p_equals_q_accepts_all():
    v, g = 9, 4
    p = _rand_dist(jax.random.PRNGKey(8), v)
    P = jnp.tile(p[None], (g, 1))
    drafted = jnp.asarray([3, 1, 4, 1], jnp.int32)
    for seed in range(5):
        emitted, n_emit, done, n_acc = jax.jit(sd.accept_emit, static_argnames=("end_of_audio_token",))(
            jax.random.PRNGKey(seed), drafted, P, P, end_of_audio_token=999
        )
        assert int(n_emit) == g and int(n_acc) == g and not bool(done)
        np.testing.assert_array_equal(np.asarray(emitted), np.asarray(drafted))


def test_accept_emit_eoa_truncates():
    """An accepted end-of-audio token truncates the emission and latches done
    — tokens drafted after it are discarded."""
    v, g = 100, 4
    onehots = jnp.eye(v)
    drafted = jnp.asarray([5, 96, 3, 7], jnp.int32)
    P = onehots[drafted]  # p == q == one-hot at drafted -> all accepted
    emitted, n_emit, done, n_acc = sd.accept_emit(
        jax.random.PRNGKey(0), drafted, P, P, end_of_audio_token=96
    )
    assert int(n_emit) == 2 and bool(done)
    np.testing.assert_array_equal(np.asarray(emitted[:2]), [5, 96])


def test_accept_emit_budget_limit():
    v, g = 50, 4
    onehots = jnp.eye(v)
    drafted = jnp.asarray([5, 6, 3, 7], jnp.int32)
    P = onehots[drafted]
    emitted, n_emit, done, _ = sd.accept_emit(
        jax.random.PRNGKey(0), drafted, P, P, end_of_audio_token=96,
        limit=jnp.asarray(2, jnp.int32),
    )
    assert int(n_emit) == 2 and not bool(done)


# ------------------------------------------------------------------ end-to-end


def test_spec_greedy_matches_generate(params):
    """draft == target, greedy: speculative output is token-identical to the
    ordinary while_loop decode, and every proposal is accepted."""
    out_ref = fs.generate(
        params, TINY, PROMPT, jnp.ones((256,)), key=jax.random.PRNGKey(11),
        temperature=1e-6, top_p=1.0, guidance_scale=3.0, max_new_tokens=24,
        end_of_audio_token=EOA, prompt_pad_multiple=16,
        compute_dtype=jnp.float32,
    )
    out_spec, stats = sd.generate_spec(
        params, TINY, params, TINY, PROMPT, jnp.ones((256,)),
        key=jax.random.PRNGKey(12), gamma=4,
        temperature=1e-6, top_p=1.0, guidance_scale=3.0, max_new_tokens=24,
        end_of_audio_token=EOA, prompt_pad_multiple=16,
        compute_dtype=jnp.float32, return_stats=True,
    )
    np.testing.assert_array_equal(out_spec, out_ref)
    assert stats["accepted"] == stats["proposed"], stats
    assert stats["emitted"] == len(out_spec) - len(PROMPT) - 1
    assert stats["emitted"] <= stats["rounds"] * 4


def test_spec_greedy_matches_generate_cfg3(params):
    """Same equivalence under 3-row double guidance (speaker + prompt)."""
    kw = dict(
        temperature=1e-6, top_p=1.0, guidance_scale=(2.0, 1.5),
        max_new_tokens=16, end_of_audio_token=EOA, end_of_text_token=EOT,
        prompt_pad_multiple=16, compute_dtype=jnp.float32,
    )
    out_ref = fs.generate(
        params, TINY, PROMPT, jnp.ones((256,)), key=jax.random.PRNGKey(21), **kw
    )
    out_spec = sd.generate_spec(
        params, TINY, params, TINY, PROMPT, jnp.ones((256,)),
        key=jax.random.PRNGKey(22), gamma=3, **kw
    )
    np.testing.assert_array_equal(out_spec, out_ref)


def test_spec_with_small_draft_runs(params, draft_params):
    """A genuinely different (smaller) draft: output must be valid tokens
    with a coherent stats ledger — correctness of the DISTRIBUTION is pinned
    by the oracle tests above; here the draft mostly gets rejected."""
    out, stats = sd.generate_spec(
        params, TINY, draft_params, DRAFT, PROMPT, jnp.ones((256,)),
        key=jax.random.PRNGKey(31), gamma=4,
        temperature=1.0, top_p=0.95, guidance_scale=3.0, max_new_tokens=20,
        end_of_audio_token=EOA, prompt_pad_multiple=16,
        compute_dtype=jnp.float32, return_stats=True,
    )
    gen = out[len(PROMPT):]
    assert 1 <= len(gen) <= 21
    assert (gen >= 0).all() and (gen < 121).all()
    assert stats["rounds"] >= 1
    assert 0 <= stats["accepted"] <= stats["proposed"]
    assert stats["emitted"] == len(gen) - 1  # first token is the prefill's
    # every round emits at least one token (replacement on first rejection)
    assert stats["emitted"] >= stats["rounds"]


def test_spec_long_generation_matches():
    """Long fixed-length greedy run (560 tokens, deep into the cache):
    speculative output stays token-identical to the ordinary decode over
    many rounds of cache reuse and stale-row overwrites."""
    cfg = first_stage_config(
        n_layer=1, n_head=2, dim=32, block_size=1024, vocab_sizes=(121,)
    )
    p = tfm.init_params(jax.random.PRNGKey(2), cfg)
    kw = dict(
        temperature=1e-6, top_p=1.0, guidance_scale=1.0,
        # EOA outside the vocab: fixed-length run
        max_new_tokens=560, end_of_audio_token=10**6, prompt_pad_multiple=16,
        compute_dtype=jnp.float32,
    )
    out_ref = fs.generate(p, cfg, PROMPT, jnp.ones((256,)), key=jax.random.PRNGKey(1), **kw)
    out_spec, stats = sd.generate_spec(
        p, cfg, p, cfg, PROMPT, jnp.ones((256,)), key=jax.random.PRNGKey(2),
        gamma=4, return_stats=True, **kw,
    )
    assert len(out_ref) == len(PROMPT) + 560
    np.testing.assert_array_equal(out_spec, out_ref)
    assert stats["accepted"] == stats["proposed"], stats


def test_spec_respects_budget(params):
    out = sd.generate_spec(
        params, TINY, params, TINY, PROMPT, jnp.ones((256,)),
        key=jax.random.PRNGKey(41), gamma=4, temperature=1.0, top_p=0.95,
        guidance_scale=3.0, max_new_tokens=7, end_of_audio_token=EOA,
        prompt_pad_multiple=16, compute_dtype=jnp.float32,
    )
    assert len(out) <= len(PROMPT) + 7


def test_spec_cfg_free_draft_greedy_matches(params):
    """draft_use_cfg=False with guidance 1.0: the draft's single cond row IS
    the target's merged distribution (merge at scale 1 returns the cond
    row), so greedy self-draft speculation must accept everything and stay
    token-identical to the ordinary decode."""
    kw = dict(
        temperature=1e-6, top_p=1.0, guidance_scale=1.0,
        max_new_tokens=24, end_of_audio_token=EOA, prompt_pad_multiple=16,
        compute_dtype=jnp.float32,
    )
    out_ref = fs.generate(
        params, TINY, PROMPT, jnp.ones((256,)), key=jax.random.PRNGKey(1), **kw
    )
    out_spec, stats = sd.generate_spec(
        params, TINY, params, TINY, PROMPT, jnp.ones((256,)),
        key=jax.random.PRNGKey(2), gamma=4, return_stats=True,
        draft_use_cfg=False, **kw,
    )
    np.testing.assert_array_equal(out_spec, out_ref)
    assert stats["accepted"] == stats["proposed"], stats


def test_spec_cfg_free_draft_sampling_valid(params, draft_params):
    """CFG-free small draft under real guidance: valid tokens, some
    acceptance accounting, budget respected."""
    out, stats = sd.generate_spec(
        params, TINY, draft_params, DRAFT, PROMPT, jnp.ones((256,)),
        key=jax.random.PRNGKey(5), gamma=4, temperature=1.0, top_p=0.95,
        guidance_scale=3.0, max_new_tokens=20, end_of_audio_token=EOA,
        prompt_pad_multiple=16, compute_dtype=jnp.float32,
        return_stats=True, draft_use_cfg=False,
    )
    gen = np.asarray(out[len(PROMPT):])
    assert len(gen) <= 20
    assert gen.min() >= 0 and gen.max() < 121
    assert stats["proposed"] == stats["rounds"] * 4
    assert 0 <= stats["accepted"] <= stats["proposed"]


def test_spec_draft_temperature_greedy_matches(params):
    """Greedy-sharpened proposal (draft_temperature -> 0) with a self-draft
    under a greedy target: both distributions collapse to a delta at the
    same argmax, so everything is accepted and the output stays
    token-identical — pins that the knob shapes the proposal stream the
    sampler actually draws from, without touching the target's verify
    distribution."""
    kw = dict(
        temperature=1e-6, top_p=1.0, guidance_scale=1.0,
        max_new_tokens=24, end_of_audio_token=EOA, prompt_pad_multiple=16,
        compute_dtype=jnp.float32,
    )
    out_ref = fs.generate(
        params, TINY, PROMPT, jnp.ones((256,)), key=jax.random.PRNGKey(1), **kw
    )
    out_spec, stats = sd.generate_spec(
        params, TINY, params, TINY, PROMPT, jnp.ones((256,)),
        key=jax.random.PRNGKey(2), gamma=4, return_stats=True,
        draft_use_cfg=False, draft_temperature=1e-3, draft_top_p=0.9, **kw,
    )
    np.testing.assert_array_equal(out_spec, out_ref)
    assert stats["accepted"] == stats["proposed"], stats


def test_spec_draft_temperature_sampling_valid(params, draft_params):
    """Sharpened small-draft proposals under real sampling params: valid
    tokens, budget respected, deterministic for a fixed key, and the knob
    actually changes the proposal stream (different acceptance pattern vs
    dtemp=1). Marginal exactness for arbitrary proposals is pinned by the
    accept_emit frequency oracles above."""
    kw = dict(
        key=jax.random.PRNGKey(5), gamma=4, temperature=1.0, top_p=0.95,
        guidance_scale=3.0, max_new_tokens=20, end_of_audio_token=EOA,
        prompt_pad_multiple=16, compute_dtype=jnp.float32,
        return_stats=True, draft_use_cfg=False,
    )
    out_a, st_a = sd.generate_spec(
        params, TINY, draft_params, DRAFT, PROMPT, jnp.ones((256,)),
        draft_temperature=0.6, **kw,
    )
    out_b, _ = sd.generate_spec(
        params, TINY, draft_params, DRAFT, PROMPT, jnp.ones((256,)),
        draft_temperature=0.6, **kw,
    )
    np.testing.assert_array_equal(out_a, out_b)
    gen = np.asarray(out_a[len(PROMPT):])
    assert len(gen) <= 20
    assert gen.min() >= 0 and gen.max() < 121
    assert 0 <= st_a["accepted"] <= st_a["proposed"]
    out_c, _ = sd.generate_spec(
        params, TINY, draft_params, DRAFT, PROMPT, jnp.ones((256,)),
        draft_temperature=1.0, **kw,
    )
    assert not np.array_equal(np.asarray(out_a), np.asarray(out_c)) or len(gen) == 0

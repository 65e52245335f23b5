"""Trainer semantics tests: loss masking, freezing, accumulation, LR schedule."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from metavoice_tpu.core.config import first_stage_config
from metavoice_tpu.models import transformer as tfm
from metavoice_tpu.training import finetune as ft

TINY = first_stage_config(n_layer=3, n_head=2, dim=32, block_size=32, vocab_sizes=(60,))
FT = ft.FinetuneConfig(gradient_accumulation_steps=1, warmup_iters=10, lr_decay_iters=100)


@pytest.fixture(scope="module")
def params():
    return tfm.init_params(jax.random.PRNGKey(0), TINY)


def _batch(bsz=2, t=8, seed=0):
    rng = np.random.default_rng(seed)
    return {
        "x": jnp.asarray(rng.integers(0, 60, (bsz, t))),
        "y": jnp.asarray(rng.integers(0, 60, (bsz, t))),
        "spk_emb": jnp.asarray(rng.normal(size=(bsz, 256)).astype(np.float32)),
    }


def test_ce_ignore_index():
    logits = [jnp.zeros((1, 4, 10))]
    targets = jnp.asarray([[[1, 2, -1, -1]]])
    loss = ft.hierarchy_cross_entropy(logits, targets)
    # uniform logits -> -log(1/10) per valid position
    np.testing.assert_allclose(float(loss), np.log(10.0), rtol=1e-5)


def test_ce_all_ignored_is_finite():
    logits = [jnp.zeros((1, 4, 10))]
    targets = jnp.full((1, 1, 4), -1)
    loss = ft.hierarchy_cross_entropy(logits, targets)
    assert np.isfinite(float(loss))


def test_lr_schedule_shape():
    sched = ft.lr_schedule(FT)
    assert float(sched(0)) == 0.0
    np.testing.assert_allclose(float(sched(10)), FT.learning_rate, rtol=1e-5)
    assert float(sched(99)) < FT.learning_rate
    # decays towards min_lr
    assert float(sched(200)) <= float(sched(50))


def test_train_step_reduces_loss(params):
    state, opt = ft.init_train_state(params, FT)
    # no freezing: train everything
    step = ft.make_train_step(TINY, FT, opt, grad_mask=None, compute_dtype=jnp.float32)
    batch = _batch()
    losses = []
    for _ in range(8):
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0]
    assert all(np.isfinite(losses))


def test_layer_freezing(params):
    mask = ft.trainable_mask(params, TINY, last_n_blocks=1)
    state, opt = ft.init_train_state(params, FT)
    step = ft.make_train_step(TINY, FT, opt, grad_mask=mask, compute_dtype=jnp.float32)
    # two steps: warmup LR is exactly 0 at step 0 (reference finetune.py:172)
    new_state, _ = step(state, _batch())
    new_state, _ = step(new_state, _batch())
    # embeddings frozen
    np.testing.assert_array_equal(
        np.asarray(new_state.params["wtes"][0]), np.asarray(params["wtes"][0])
    )
    # first two layers frozen, last layer updated
    old_w = np.asarray(params["layers"]["wqkv"])
    new_w = np.asarray(new_state.params["layers"]["wqkv"])
    np.testing.assert_array_equal(new_w[:2], old_w[:2])
    assert not np.allclose(new_w[2], old_w[2])
    # final norm updated (delta is ~lr, tiny relative to the ~1.0 weights)
    ln_delta = np.abs(
        np.asarray(new_state.params["ln_f_w"]) - np.asarray(params["ln_f_w"])
    ).max()
    assert ln_delta > 0


def test_grad_accumulation_equivalence(params):
    """k micro-steps of batch b == one step of batch k*b (same grads)."""
    cfg_acc = ft.FinetuneConfig(gradient_accumulation_steps=2, warmup_iters=10)
    state_a, opt_a = ft.init_train_state(params, cfg_acc)
    step_acc = ft.make_train_step(TINY, cfg_acc, opt_a, compute_dtype=jnp.float32)

    cfg_one = ft.FinetuneConfig(gradient_accumulation_steps=1, warmup_iters=10)
    state_b, opt_b = ft.init_train_state(params, cfg_one)
    step_one = ft.make_train_step(TINY, cfg_one, opt_b, compute_dtype=jnp.float32)

    b1, b2 = _batch(seed=1), _batch(seed=2)
    micro = jax.tree.map(lambda a, b: jnp.stack([a, b]), b1, b2)
    merged = jax.tree.map(lambda a, b: jnp.concatenate([a, b]), b1, b2)

    sa, ma = step_acc(state_a, micro)
    sb, mb = step_one(state_b, merged)
    np.testing.assert_allclose(float(ma["loss"]), float(mb["loss"]), rtol=1e-5)
    for pa, pb in zip(jax.tree.leaves(sa.params), jax.tree.leaves(sb.params)):
        np.testing.assert_allclose(np.asarray(pa), np.asarray(pb), atol=1e-5)


def test_weight_decay_mask(params):
    mask = ft.weight_decay_mask(params)
    assert mask["layers"]["wqkv"] is True or mask["layers"]["wqkv"] == True  # noqa: E712
    assert mask["ln_f_w"] == False  # noqa: E712


def test_split_trainable_roundtrip(params):
    frozen, train = ft.split_trainable(params, 1)
    merged = ft.merge_trainable(frozen, train)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(merged)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert train["layers_tail"]["wqkv"].shape[0] == 1
    assert frozen["layers_head"]["wqkv"].shape[0] == TINY.n_layer - 1


def test_finetune_split_step(params):
    """Split-tail step trains only the tail + ln_f and reduces loss."""
    frozen, train = ft.split_trainable(params, 1)
    cfg = ft.FinetuneConfig(warmup_iters=2)
    state, opt = ft.init_train_state(train, cfg)
    step = ft.make_finetune_step(TINY, cfg, opt, frozen, compute_dtype=jnp.float32)
    batch = _batch()
    losses = []
    for _ in range(6):
        state, m = step(state, batch)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0]
    merged = ft.merge_trainable(frozen, state.params)
    # frozen head identical; tail changed
    np.testing.assert_array_equal(
        np.asarray(merged["layers"]["wqkv"][:-1]), np.asarray(params["layers"]["wqkv"][:-1])
    )
    assert not np.allclose(
        np.asarray(merged["layers"]["wqkv"][-1]), np.asarray(params["layers"]["wqkv"][-1])
    )
    np.testing.assert_array_equal(np.asarray(merged["wtes"][0]), np.asarray(params["wtes"][0]))


# ------------------------------------------------------------------ CFG-training parity
# spkemb_dropout (reference fam/llm/model.py:35,269-274) and
# _mask_spk_emb_on_text (fam/llm/model.py:178-193).


def test_mask_spk_emb_on_text_rule():
    # EOT at position 2 (row 0) / position 0 (row 1): positions strictly
    # before EOT lose conditioning, the EOT position itself keeps it.
    idx = jnp.asarray([[5, 6, 99, 7, 8], [99, 1, 2, 3, 4]], jnp.int32)
    mask = np.asarray(ft.mask_spk_emb_on_text(idx, end_of_text_token=99))
    np.testing.assert_array_equal(mask[:, :, 0], [[0, 0, 1, 1, 1], [1, 1, 1, 1, 1]])


def test_mask_spk_emb_on_text_multi_hierarchy_uses_first():
    idx = jnp.asarray([[[1, 99, 3], [7, 7, 7]]], jnp.int32)  # (B=1, C=2, T=3)
    mask = np.asarray(ft.mask_spk_emb_on_text(idx, end_of_text_token=99))
    np.testing.assert_array_equal(mask[0, :, 0], [0, 1, 1])


def test_mask_spk_emb_on_text_repeated_eot():
    # cumsum > 0 rule: repeated EOT tokens don't flip the mask back off
    idx = jnp.asarray([[1, 99, 2, 99, 3]], jnp.int32)
    mask = np.asarray(ft.mask_spk_emb_on_text(idx, end_of_text_token=99))
    np.testing.assert_array_equal(mask[0, :, 0], [0, 1, 1, 1, 1])


def test_spkemb_dropout_mask_extremes():
    key = jax.random.PRNGKey(0)
    np.testing.assert_array_equal(
        np.asarray(ft.spkemb_dropout_mask(key, 4, 0.0)), np.ones((4, 1, 1))
    )
    np.testing.assert_array_equal(
        np.asarray(ft.spkemb_dropout_mask(key, 4, 1.0)), np.zeros((4, 1, 1))
    )


def test_loss_with_full_spkemb_dropout_equals_zero_conditioning(params):
    """p=1.0 must zero the conditioning exactly: same loss as spk_emb=0
    (speaker_cond is a pure linear, so zero input == zero output)."""
    import dataclasses

    cfg_drop = dataclasses.replace(TINY, spkemb_dropout=1.0)
    batch = _batch(seed=3)
    loss_dropped = float(
        ft.loss_fn(params, cfg_drop, batch, jnp.float32, jax.random.PRNGKey(1))
    )
    batch_zero = dict(batch, spk_emb=jnp.zeros_like(batch["spk_emb"]))
    loss_zero = float(ft.loss_fn(params, TINY, batch_zero, jnp.float32))
    np.testing.assert_allclose(loss_dropped, loss_zero, rtol=1e-6)


def test_spkemb_dropout_deterministic_per_key(params):
    import dataclasses

    cfg_drop = dataclasses.replace(TINY, spkemb_dropout=0.5)
    batch = _batch(bsz=8, seed=4)
    l1 = float(ft.loss_fn(params, cfg_drop, batch, jnp.float32, jax.random.PRNGKey(2)))
    l2 = float(ft.loss_fn(params, cfg_drop, batch, jnp.float32, jax.random.PRNGKey(2)))
    assert l1 == l2
    # eval path (no key) applies no dropout
    l_eval = float(ft.loss_fn(params, cfg_drop, batch, jnp.float32))
    l_plain = float(ft.loss_fn(params, TINY, batch, jnp.float32))
    np.testing.assert_allclose(l_eval, l_plain, rtol=1e-6)


def test_spk_emb_on_text_false_changes_loss(params):
    """With EOT present mid-sequence, masking text positions must change the
    loss (conditioning removed from text region only)."""
    import dataclasses

    cfg_masked = dataclasses.replace(TINY, spk_emb_on_text=False)
    rng = np.random.default_rng(5)
    x = rng.integers(0, 60, (2, 8))
    x[:, 3] = ft.END_OF_TEXT_TOKEN % 60  # won't match the real EOT id
    batch = {
        "x": jnp.asarray(x),
        "y": jnp.asarray(rng.integers(0, 60, (2, 8))),
        "spk_emb": jnp.asarray(rng.normal(size=(2, 256)).astype(np.float32)),
    }
    # no EOT in-range => whole sequence masked => equals zero conditioning
    loss_masked = float(ft.loss_fn(params, cfg_masked, batch, jnp.float32))
    loss_zero = float(
        ft.loss_fn(params, TINY, dict(batch, spk_emb=jnp.zeros_like(batch["spk_emb"])), jnp.float32)
    )
    np.testing.assert_allclose(loss_masked, loss_zero, rtol=1e-6)


def test_train_step_with_spkemb_dropout_runs(params):
    import dataclasses

    cfg_drop = dataclasses.replace(TINY, spkemb_dropout=0.3)
    state, opt = ft.init_train_state(params, FT)
    step = ft.make_train_step(cfg_drop, FT, opt, compute_dtype=jnp.float32)
    state2, metrics = step(state, _batch(seed=6))
    assert np.isfinite(float(metrics["loss"]))
    assert int(state2.step) == 1


def test_network_dropout_train_vs_eval(params):
    """cfg.dropout > 0: train-mode loss (with key) differs from eval-mode
    loss (no key), eval-mode equals the p=0 loss exactly; dropout is
    deterministic per key (reference nn.Dropout train/eval semantics)."""
    import dataclasses

    cfg_do = dataclasses.replace(TINY, dropout=0.2)
    batch = _batch(seed=7)
    l_eval = float(ft.loss_fn(params, cfg_do, batch, jnp.float32))
    l_plain = float(ft.loss_fn(params, TINY, batch, jnp.float32))
    np.testing.assert_allclose(l_eval, l_plain, rtol=1e-6)

    l_t1 = float(ft.loss_fn(params, cfg_do, batch, jnp.float32, jax.random.PRNGKey(3)))
    l_t1b = float(ft.loss_fn(params, cfg_do, batch, jnp.float32, jax.random.PRNGKey(3)))
    l_t2 = float(ft.loss_fn(params, cfg_do, batch, jnp.float32, jax.random.PRNGKey(4)))
    assert l_t1 == l_t1b
    assert l_t1 != l_t2  # different masks
    assert l_t1 != l_eval


def test_dropout_grads_flow(params):
    import dataclasses

    cfg_do = dataclasses.replace(TINY, dropout=0.1)
    batch = _batch(seed=8)
    grads = jax.grad(
        lambda p: ft.loss_fn(p, cfg_do, batch, jnp.float32, jax.random.PRNGKey(5))
    )(params)
    assert all(np.isfinite(np.asarray(g)).all() for g in jax.tree.leaves(grads))
    assert max(float(jnp.abs(g).max()) for g in jax.tree.leaves(grads)) > 0

"""Numerical parity against torch oracles.

Builds tiny torch models matching the reference architecture spec
(fam/llm/fast_model.py for stage 1, torch.nn.LSTM for the speaker encoder),
saves reference-format .pt checkpoints, converts them with utils/checkpoint,
and checks our JAX forward matches torch to f32 tolerance.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from metavoice_tpu.core.config import first_stage_config  # noqa: E402
from metavoice_tpu.models import speaker_encoder as se  # noqa: E402
from metavoice_tpu.models import transformer as tfm  # noqa: E402
from metavoice_tpu.utils import checkpoint as ckpt_util  # noqa: E402

TINY = first_stage_config(
    n_layer=2, n_head=4, dim=32, block_size=32, vocab_sizes=(50,), intermediate_size=64
)


def _torch_first_stage_state(cfg, seed=0):
    """Random weights under the reference's *training* names
    (the converter applies the fast_inference_utils.py:250-279 remap)."""
    g = torch.Generator().manual_seed(seed)

    def r(*shape):
        return torch.randn(*shape, generator=g) * 0.05

    d, i_sz, v = cfg.dim, cfg.intermediate_size, cfg.vocab_sizes[0]
    sd = {
        "transformer.wtes.0.weight": r(v, d),
        "transformer.wpe.weight": r(cfg.block_size, d),
        "speaker_cond_pos.weight": r(d, cfg.speaker_emb_dim),
        "transformer.ln_f.weight": torch.ones(d) + 0.1 * r(d),
        "lm_heads.0.weight": r(v, d),  # tied in practice; ignored by converter
    }
    for i in range(cfg.n_layer):
        sd[f"transformer.h.{i}.ln_1.weight"] = torch.ones(d) + 0.1 * r(d)
        sd[f"transformer.h.{i}.attn.c_attn.weight"] = r(3 * d, d)
        sd[f"transformer.h.{i}.attn.c_proj.weight"] = r(d, d)
        sd[f"transformer.h.{i}.ln_2.weight"] = torch.ones(d) + 0.1 * r(d)
        sd[f"transformer.h.{i}.mlp.swiglu.w1.weight"] = r(i_sz, d)
        sd[f"transformer.h.{i}.mlp.swiglu.w3.weight"] = r(i_sz, d)
        sd[f"transformer.h.{i}.mlp.c_proj.weight"] = r(d, i_sz)
    return sd


def _torch_forward(sd, cfg, idx, spk_emb, spk_on):
    """Torch oracle implementing the reference stage-1 forward semantics
    (fast_model.py:150-163): tok+pos+spk*mask -> pre-norm blocks -> RMSNorm
    -> tied lm head."""
    import torch.nn.functional as F

    def rms(x, w):
        xf = x.float()
        xf = xf * torch.rsqrt((xf * xf).mean(-1, keepdim=True) + cfg.norm_eps)
        return xf.type_as(x) * w

    b, t = idx.shape
    d, h = cfg.dim, cfg.n_head
    x = sd["transformer.wtes.0.weight"][idx]
    x = x + sd["transformer.wpe.weight"][:t]
    cond = spk_emb @ sd["speaker_cond_pos.weight"].T
    # spk_on: (B,) per-row CFG gate or (B, T) per-position mask (the
    # reference's _mask_spk_emb_on_text shape, fam/llm/model.py:178-193)
    gate = spk_on.view(-1, 1, 1) if spk_on.dim() == 1 else spk_on[:, :, None]
    x = x + cond[:, None, :] * gate
    mask = torch.tril(torch.ones(t, t, dtype=torch.bool))
    for i in range(cfg.n_layer):
        xa = rms(x, sd[f"transformer.h.{i}.ln_1.weight"])
        qkv = xa @ sd[f"transformer.h.{i}.attn.c_attn.weight"].T
        q, k, v = qkv.split(d, dim=-1)
        q = q.view(b, t, h, d // h).transpose(1, 2)
        k = k.view(b, t, h, d // h).transpose(1, 2)
        v = v.view(b, t, h, d // h).transpose(1, 2)
        y = F.scaled_dot_product_attention(q, k, v, attn_mask=mask)
        y = y.transpose(1, 2).reshape(b, t, d)
        x = x + y @ sd[f"transformer.h.{i}.attn.c_proj.weight"].T
        xm = rms(x, sd[f"transformer.h.{i}.ln_2.weight"])
        hidden = F.silu(xm @ sd[f"transformer.h.{i}.mlp.swiglu.w1.weight"].T) * (
            xm @ sd[f"transformer.h.{i}.mlp.swiglu.w3.weight"].T
        )
        x = x + hidden @ sd[f"transformer.h.{i}.mlp.c_proj.weight"].T
    x = rms(x, sd["transformer.ln_f.weight"])
    return x @ sd["transformer.wtes.0.weight"].T  # tied head


def test_first_stage_parity(tmp_path):
    sd = _torch_first_stage_state(TINY)
    path = tmp_path / "first_stage.pt"
    torch.save({"model": sd, "meta": {"tokenizer": {}}}, path)

    params, cfg, _ = ckpt_util.load_first_stage_pt(str(path), TINY)

    idx_np = np.random.default_rng(0).integers(0, 50, size=(2, 7))
    spk_np = np.random.default_rng(1).normal(size=(2, TINY.speaker_emb_dim)).astype(np.float32)
    spk_on = np.array([1.0, 0.0], np.float32)  # row 1 unconditioned (CFG)

    with torch.no_grad():
        ref = _torch_forward(
            sd, TINY, torch.tensor(idx_np), torch.tensor(spk_np), torch.tensor(spk_on)
        ).numpy()

    logits, _ = tfm.forward(
        params,
        cfg,
        jnp.asarray(idx_np),
        spk_emb=jnp.asarray(spk_np),
        spk_cond_mask=jnp.asarray(spk_on).reshape(2, 1, 1),
        compute_dtype=jnp.float32,
    )
    np.testing.assert_allclose(np.asarray(logits[0]), ref, atol=2e-4, rtol=1e-3)


def test_speaker_encoder_parity(tmp_path):
    h, e = se.MODEL_HIDDEN_SIZE, se.MODEL_EMBEDDING_SIZE
    torch.manual_seed(0)
    lstm = torch.nn.LSTM(se.MEL_N_CHANNELS, h, se.MODEL_NUM_LAYERS, batch_first=True)
    linear = torch.nn.Linear(h, e)

    sd = {f"lstm.{k}": v for k, v in lstm.state_dict().items()}
    sd.update({f"linear.{k}": v for k, v in linear.state_dict().items()})
    path = tmp_path / "speaker_encoder.pt"
    torch.save({"model_state": sd}, path)

    params = ckpt_util.load_speaker_encoder_pt(str(path))

    mels = np.random.default_rng(2).normal(size=(3, 20, se.MEL_N_CHANNELS)).astype(np.float32)
    with torch.no_grad():
        _, (hidden, _) = lstm(torch.tensor(mels))
        raw = torch.relu(linear(hidden[-1]))
        ref = (raw / torch.norm(raw, dim=1, keepdim=True)).numpy()

    ours = np.asarray(se.forward(params, jnp.asarray(mels)))
    np.testing.assert_allclose(ours, ref, atol=1e-4, rtol=1e-3)


def test_npz_roundtrip(tmp_path):
    params = tfm.init_params(jax.random.PRNGKey(0), TINY)
    path = str(tmp_path / "model.npz")
    ckpt_util.save_npz(path, jax.tree.map(np.asarray, params), meta={"stage": 1})
    loaded, meta = ckpt_util.load_npz(path)
    assert meta == {"stage": 1}
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(loaded)):
        np.testing.assert_array_equal(np.asarray(a), b)


SECOND = None  # built in the test to keep module import light


def test_second_stage_parity(tmp_path):
    """Second-stage converter + forward vs a torch oracle with the
    reference GPT semantics (layernorm + gelu + bias, multi-hierarchy
    embeddings summed, per-hierarchy heads; fam/llm/model.py)."""
    import torch.nn.functional as F

    from metavoice_tpu.core.config import TransformerConfig
    from metavoice_tpu.utils.checkpoint import load_second_stage_pt

    d, nh, nl, t = 32, 4, 2, 12
    vocab_in = (50, 17)
    vocab_out = (17, 17, 17)
    g = torch.Generator().manual_seed(0)

    def r(*shape):
        return torch.randn(*shape, generator=g) * 0.05

    sd = {
        "transformer.wtes.0.weight": r(vocab_in[0], d),
        "transformer.wtes.1.weight": r(vocab_in[1], d),
        "transformer.wpe.weight": r(64, d),
        "speaker_cond_pos.weight": r(d, 256),
        "transformer.ln_f.weight": torch.ones(d) + 0.1 * r(d),
        "transformer.ln_f.bias": 0.1 * r(d),
    }
    for i in range(nl):
        sd[f"transformer.h.{i}.ln_1.weight"] = torch.ones(d) + 0.1 * r(d)
        sd[f"transformer.h.{i}.ln_1.bias"] = 0.1 * r(d)
        sd[f"transformer.h.{i}.attn.c_attn.weight"] = r(3 * d, d)
        sd[f"transformer.h.{i}.attn.c_attn.bias"] = 0.1 * r(3 * d)
        sd[f"transformer.h.{i}.attn.c_proj.weight"] = r(d, d)
        sd[f"transformer.h.{i}.attn.c_proj.bias"] = 0.1 * r(d)
        sd[f"transformer.h.{i}.ln_2.weight"] = torch.ones(d) + 0.1 * r(d)
        sd[f"transformer.h.{i}.ln_2.bias"] = 0.1 * r(d)
        sd[f"transformer.h.{i}.mlp.c_fc.weight"] = r(4 * d, d)
        sd[f"transformer.h.{i}.mlp.c_fc.bias"] = 0.1 * r(4 * d)
        sd[f"transformer.h.{i}.mlp.c_proj.weight"] = r(d, 4 * d)
        sd[f"transformer.h.{i}.mlp.c_proj.bias"] = 0.1 * r(d)
    for i in range(len(vocab_out)):
        sd[f"lm_heads.{i}.weight"] = r(vocab_out[i], d)

    path = tmp_path / "second_stage.pt"
    torch.save(
        {
            "model": sd,
            "model_args": {
                "block_size": t,
                "n_layer": nl,
                "n_head": nh,
                "n_embd": d,
                "vocab_sizes": list(vocab_in),
                "target_vocab_sizes": list(vocab_out),
                "norm_type": "layernorm",
                "nonlinearity_type": "gelu",
                "bias": True,
            },
            "config": {"causal": False},
            "meta": {"speaker_cond": True, "speaker_emb_size": 256, "tokenizer": {}},
        },
        path,
    )

    params, cfg, _ = ckpt_util.load_second_stage_pt(str(path))
    assert cfg.causal is False and cfg.num_hierarchies == 2

    # torch oracle forward (non-causal, all-timestep heads)
    rng = np.random.default_rng(0)
    idx = rng.integers(0, 17, size=(1, 2, t))
    idx[:, 0, :] = rng.integers(0, 50, size=(1, t))
    spk = rng.normal(size=(1, 256)).astype(np.float32)

    with torch.no_grad():
        x = sd["transformer.wtes.0.weight"][torch.tensor(idx[:, 0])] + sd[
            "transformer.wtes.1.weight"
        ][torch.tensor(idx[:, 1])]
        x = x + sd["transformer.wpe.weight"][:t]
        x = x + (torch.tensor(spk) @ sd["speaker_cond_pos.weight"].T)[:, None, :]
        for i in range(nl):
            ln1 = F.layer_norm(
                x, (d,), sd[f"transformer.h.{i}.ln_1.weight"], sd[f"transformer.h.{i}.ln_1.bias"]
            )
            qkv = ln1 @ sd[f"transformer.h.{i}.attn.c_attn.weight"].T + sd[
                f"transformer.h.{i}.attn.c_attn.bias"
            ]
            q, k, v = qkv.split(d, dim=-1)
            q = q.view(1, t, nh, d // nh).transpose(1, 2)
            k = k.view(1, t, nh, d // nh).transpose(1, 2)
            v = v.view(1, t, nh, d // nh).transpose(1, 2)
            y = F.scaled_dot_product_attention(q, k, v)  # non-causal
            y = y.transpose(1, 2).reshape(1, t, d)
            x = x + y @ sd[f"transformer.h.{i}.attn.c_proj.weight"].T + sd[
                f"transformer.h.{i}.attn.c_proj.bias"
            ]
            ln2 = F.layer_norm(
                x, (d,), sd[f"transformer.h.{i}.ln_2.weight"], sd[f"transformer.h.{i}.ln_2.bias"]
            )
            h = F.gelu(
                ln2 @ sd[f"transformer.h.{i}.mlp.c_fc.weight"].T
                + sd[f"transformer.h.{i}.mlp.c_fc.bias"]
            )
            x = x + h @ sd[f"transformer.h.{i}.mlp.c_proj.weight"].T + sd[
                f"transformer.h.{i}.mlp.c_proj.bias"
            ]
        x = F.layer_norm(x, (d,), sd["transformer.ln_f.weight"], sd["transformer.ln_f.bias"])
        refs = [(x @ sd[f"lm_heads.{i}.weight"].T).numpy() for i in range(3)]

    logits, _ = tfm.forward(
        params, cfg, jnp.asarray(idx), spk_emb=jnp.asarray(spk), compute_dtype=jnp.float32
    )
    for ours, ref in zip(logits, refs):
        np.testing.assert_allclose(np.asarray(ours), ref, atol=5e-4, rtol=1e-3)


def test_masked_spk_emb_on_text_forward_parity(tmp_path):
    """Torch oracle of the spk_emb_on_text=False forward: speaker
    conditioning masked on text positions via the reference cumsum rule
    (fam/llm/model.py:178-193,276-278)."""
    from metavoice_tpu.training import finetune as ft

    sd = _torch_first_stage_state(TINY, seed=3)
    path = tmp_path / "first_stage.pt"
    torch.save({"model": sd, "meta": {"tokenizer": {}}}, path)
    params, cfg, _ = ckpt_util.load_first_stage_pt(str(path), TINY)

    eot = 42  # scaled-down END_OF_TEXT_TOKEN inside the tiny vocab
    idx_np = np.random.default_rng(2).integers(0, 40, size=(2, 9))
    idx_np[0, 3] = eot  # row 0: EOT mid-sequence
    idx_np[1, 0] = eot  # row 1: EOT first
    spk_np = np.random.default_rng(3).normal(size=(2, TINY.speaker_emb_dim)).astype(np.float32)

    # torch-side mask: cumsum(is_eot) > 0 (keeps the EOT position itself)
    idx_t = torch.tensor(idx_np)
    mask_t = (torch.cumsum(idx_t == eot, dim=-1) > 0).float()
    with torch.no_grad():
        ref = _torch_forward(sd, TINY, idx_t, torch.tensor(spk_np), mask_t).numpy()

    mask = ft.mask_spk_emb_on_text(jnp.asarray(idx_np), end_of_text_token=eot)
    np.testing.assert_array_equal(np.asarray(mask)[:, :, 0], mask_t.numpy())
    logits, _ = tfm.forward(
        params, cfg, jnp.asarray(idx_np),
        spk_emb=jnp.asarray(spk_np), spk_cond_mask=mask, compute_dtype=jnp.float32,
    )
    np.testing.assert_allclose(np.asarray(logits[0]), ref, atol=2e-4, rtol=1e-3)


def test_first_stage_loader_honors_model_args(tmp_path):
    """A finetuned first-stage .pt with non-default architecture must load
    via its embedded model_args (mirrors load_second_stage_pt; reference
    loader fam/llm/inference.py:124-131), not the hardcoded 1B shape."""
    cfg = first_stage_config(
        n_layer=3, n_head=2, dim=16, block_size=16, vocab_sizes=(40,),
        intermediate_size=32, spkemb_dropout=0.1, spk_emb_on_text=False,
    )
    sd = _torch_first_stage_state(cfg, seed=5)
    path = tmp_path / "finetuned.pt"
    torch.save(
        {
            "model": sd,
            "model_args": {
                "n_layer": 3, "n_head": 2, "n_embd": 16, "block_size": 16,
                "vocab_sizes": [40], "causal": True, "norm_type": "rmsnorm",
                "nonlinearity_type": "swiglu", "bias": False,
                "spkemb_dropout": 0.1, "spk_emb_on_text": False,
            },
            "meta": {"speaker_emb_size": 256, "tokenizer": {}},
        },
        path,
    )
    params, loaded_cfg, _ = ckpt_util.load_first_stage_pt(str(path))
    assert loaded_cfg.n_layer == 3
    assert loaded_cfg.n_head == 2
    assert loaded_cfg.dim == 16
    assert loaded_cfg.block_size == 16
    assert loaded_cfg.vocab_sizes == (40,)
    assert loaded_cfg.spkemb_dropout == 0.1
    assert loaded_cfg.spk_emb_on_text is False
    # forward parity on the loaded shape proves the weights mapped correctly
    idx_np = np.random.default_rng(6).integers(0, 40, size=(1, 5))
    spk_np = np.random.default_rng(7).normal(size=(1, 256)).astype(np.float32)
    with torch.no_grad():
        ref = _torch_forward(
            sd, cfg, torch.tensor(idx_np), torch.tensor(spk_np),
            torch.ones(1),
        ).numpy()
    logits, _ = tfm.forward(
        params, loaded_cfg, jnp.asarray(idx_np),
        spk_emb=jnp.asarray(spk_np),
        spk_cond_mask=jnp.ones((1, 1, 1)),
        compute_dtype=jnp.float32,
    )
    np.testing.assert_allclose(np.asarray(logits[0]), ref, atol=2e-4, rtol=1e-3)


def test_first_stage_loader_defaults_without_model_args(tmp_path):
    """Old-style checkpoints without model_args still load as the 1B shape
    (cfg arg wins when provided)."""
    sd = _torch_first_stage_state(TINY, seed=6)
    path = tmp_path / "plain.pt"
    torch.save({"model": sd, "meta": {"tokenizer": {}}}, path)
    params, cfg, _ = ckpt_util.load_first_stage_pt(str(path), TINY)
    assert cfg is TINY

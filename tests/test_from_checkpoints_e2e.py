"""End-to-end checkpoint path: torch-constructed .pt files for ALL four
components (first stage, second stage, speaker encoder, EnCodec vocoder)
flow through TTS.from_checkpoints into a full synthesise() run — the
trained-weights wiring the reference gets from its HF snapshot
(fam/llm/fast_inference.py:71-100) + audiocraft's pretrained EnCodec."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402

from metavoice_tpu.core import tokens as T  # noqa: E402
from metavoice_tpu.core.config import first_stage_config, second_stage_config  # noqa: E402
from metavoice_tpu.models import encodec as ec  # noqa: E402
from metavoice_tpu.models import speaker_encoder as se  # noqa: E402
from metavoice_tpu.runtime.tts import TTS  # noqa: E402
from metavoice_tpu.utils import audio_io as aio  # noqa: E402

# tiny but REAL token space: vocab must cover text-offset BPE ids (<=2561)
FIRST = first_stage_config(n_layer=1, n_head=2, dim=32, block_size=512, intermediate_size=64)
SECOND = second_stage_config(n_layer=1, n_head=2, dim=32, block_size=256)
ECFG = ec.EncodecConfig(n_filters=2, dimension=8, codebook_size=1024, n_q=8, ratios=(4, 2))


def _save_first_stage(path):
    from tests.test_checkpoint_parity import _torch_first_stage_state

    sd = _torch_first_stage_state(FIRST, seed=11)
    torch.save(
        {
            "model": sd,
            "model_args": {
                "n_layer": FIRST.n_layer, "n_head": FIRST.n_head,
                "n_embd": FIRST.dim, "block_size": FIRST.block_size,
                "vocab_sizes": list(FIRST.vocab_sizes), "causal": True,
                "norm_type": "rmsnorm", "nonlinearity_type": "swiglu", "bias": False,
            },
            "meta": {"speaker_emb_size": 256, "tokenizer": {}},
        },
        path,
    )


def _save_second_stage(path):
    g = torch.Generator().manual_seed(12)

    def r(*shape):
        return torch.randn(*shape, generator=g) * 0.05

    d, nh, nl = SECOND.dim, SECOND.n_head, SECOND.n_layer
    sd = {
        "transformer.wtes.0.weight": r(SECOND.vocab_sizes[0], d),
        "transformer.wtes.1.weight": r(SECOND.vocab_sizes[1], d),
        "transformer.wpe.weight": r(SECOND.block_size, d),
        "speaker_cond_pos.weight": r(d, 256),
        "transformer.ln_f.weight": torch.ones(d),
        "transformer.ln_f.bias": 0.1 * r(d),
    }
    for i in range(nl):
        sd[f"transformer.h.{i}.ln_1.weight"] = torch.ones(d)
        sd[f"transformer.h.{i}.ln_1.bias"] = 0.1 * r(d)
        sd[f"transformer.h.{i}.attn.c_attn.weight"] = r(3 * d, d)
        sd[f"transformer.h.{i}.attn.c_attn.bias"] = 0.1 * r(3 * d)
        sd[f"transformer.h.{i}.attn.c_proj.weight"] = r(d, d)
        sd[f"transformer.h.{i}.attn.c_proj.bias"] = 0.1 * r(d)
        sd[f"transformer.h.{i}.ln_2.weight"] = torch.ones(d)
        sd[f"transformer.h.{i}.ln_2.bias"] = 0.1 * r(d)
        sd[f"transformer.h.{i}.mlp.c_fc.weight"] = r(4 * d, d)
        sd[f"transformer.h.{i}.mlp.c_fc.bias"] = 0.1 * r(4 * d)
        sd[f"transformer.h.{i}.mlp.c_proj.weight"] = r(d, 4 * d)
        sd[f"transformer.h.{i}.mlp.c_proj.bias"] = 0.1 * r(d)
    for i, v in enumerate(SECOND.target_vocab_sizes):
        sd[f"lm_heads.{i}.weight"] = r(v, d)
    torch.save(
        {
            "model": sd,
            "model_args": {
                "block_size": SECOND.block_size, "n_layer": nl, "n_head": nh,
                "n_embd": d, "vocab_sizes": list(SECOND.vocab_sizes),
                "target_vocab_sizes": list(SECOND.target_vocab_sizes),
                "norm_type": "layernorm", "nonlinearity_type": "gelu", "bias": True,
            },
            "config": {"causal": False},
            "meta": {"speaker_cond": True, "speaker_emb_size": 256, "tokenizer": {}},
        },
        path,
    )


def _save_speaker_encoder(path):
    torch.manual_seed(13)
    lstm = torch.nn.LSTM(
        se.MEL_N_CHANNELS, se.MODEL_HIDDEN_SIZE, se.MODEL_NUM_LAYERS, batch_first=True
    )
    linear = torch.nn.Linear(se.MODEL_HIDDEN_SIZE, se.MODEL_EMBEDDING_SIZE)
    sd = {f"lstm.{k}": v for k, v in lstm.state_dict().items()}
    sd.update({f"linear.{k}": v for k, v in linear.state_dict().items()})
    torch.save({"model_state": sd}, path)


def _save_encodec(path):
    """Tiny encodec-package-named state dict (encoder+decoder+quantizer)."""
    torch.manual_seed(14)
    sd = {}
    c_max = ECFG.max_channels
    n = len(ECFG.ratios)

    def conv(prefix, cout, cin, k):
        sd[f"{prefix}.conv.conv.weight"] = 0.1 * torch.randn(cout, cin, k)
        sd[f"{prefix}.conv.conv.bias"] = 0.1 * torch.randn(cout)

    def convtr(prefix, cin, cout, k):
        sd[f"{prefix}.convtr.convtr.weight"] = 0.1 * torch.randn(cin, cout, k)
        sd[f"{prefix}.convtr.convtr.bias"] = 0.1 * torch.randn(cout)

    def lstm(prefix, dim):
        for name, tensor in torch.nn.LSTM(dim, dim, ECFG.lstm_layers).state_dict().items():
            sd[f"{prefix}.lstm.{name}"] = tensor

    # encoder: conv_in, n x (res, down), lstm, conv_out
    ch = ECFG.n_filters
    conv("encoder.model.0", ch, 1, 7)
    for i, r in enumerate(ECFG.ratios[::-1]):
        conv(f"encoder.model.{1+3*i}.block.1", ch // 2, ch, 3)
        conv(f"encoder.model.{1+3*i}.block.3", ch, ch // 2, 1)
        conv(f"encoder.model.{3+3*i}", ch * 2, ch, 2 * r)
        ch *= 2
    li = 1 + 3 * n
    lstm(f"encoder.model.{li}", c_max)
    conv(f"encoder.model.{li+2}", ECFG.dimension, c_max, 7)
    # decoder: conv_in, lstm, n x (up, res), conv_out
    conv("decoder.model.0", c_max, ECFG.dimension, 7)
    lstm("decoder.model.1", c_max)
    ch = c_max
    for i, r in enumerate(ECFG.ratios):
        convtr(f"decoder.model.{3+3*i}", ch, ch // 2, 2 * r)
        conv(f"decoder.model.{4+3*i}.block.1", ch // 4, ch // 2, 3)
        conv(f"decoder.model.{4+3*i}.block.3", ch // 2, ch // 4, 1)
        ch //= 2
    conv(f"decoder.model.{3+3*n}", 1, ch, 7)
    for i in range(ECFG.n_q):
        sd[f"quantizer.vq.layers.{i}._codebook.embed"] = torch.randn(
            ECFG.codebook_size, ECFG.dimension
        )
    torch.save(sd, path)


def test_from_checkpoints_full_synthesise(tmp_path):
    p1 = str(tmp_path / "first_stage.pt")
    p2 = str(tmp_path / "second_stage.pt")
    p3 = str(tmp_path / "speaker_encoder.pt")
    p4 = str(tmp_path / "encodec.pt")
    _save_first_stage(p1)
    _save_second_stage(p2)
    _save_speaker_encoder(p3)
    _save_encodec(p4)

    tts = TTS.from_checkpoints(
        p1, p2, p3, encodec_path=p4, encodec_cfg=ECFG,
        output_dir=str(tmp_path / "out"), enforce_min_ref_duration=False,
    )
    # every stage now runs on CONVERTED torch weights, no random init anywhere
    sr = 16000
    t = np.arange(31 * sr) / sr
    ref = str(tmp_path / "ref.wav")
    aio.write_wav(ref, (0.2 * np.sin(2 * np.pi * 220 * t)).astype(np.float32), sr)

    out = tts.synthesise("Checkpoint chain test.", ref)
    wav, out_sr = aio.read_wav(out)
    assert out_sr == ECFG.sample_rate
    assert len(wav) > 0 and np.isfinite(wav).all()


def test_from_checkpoints_draft_checkpoint(tmp_path):
    """draft_checkpoint= loads a first-stage-format .pt as the speculative
    draft: self-draft here, so synthesis must run the spec path with
    near-total acceptance through the PUBLIC loader + synthesise surface
    (bf16 jitter between the T=1 draft and T=gamma verify forwards makes
    p/q ~ 1 +- epsilon rather than exactly 1)."""
    p1 = str(tmp_path / "first_stage.pt")
    p2 = str(tmp_path / "second_stage.pt")
    p3 = str(tmp_path / "speaker_encoder.pt")
    _save_first_stage(p1)
    _save_second_stage(p2)
    _save_speaker_encoder(p3)
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")  # random-encodec warning
        tts = TTS.from_checkpoints(
            p1, p2, p3, encodec_cfg=ECFG,
            draft_checkpoint=p1, speculative_gamma=4,
            output_dir=str(tmp_path / "out"),
            enforce_min_ref_duration=False,
            enforce_min_output_duration=False,
        )
    sr = 16000
    t = np.arange(31 * sr) / sr
    ref = str(tmp_path / "ref.wav")
    aio.write_wav(ref, (0.2 * np.sin(2 * np.pi * 220 * t)).astype(np.float32), sr)
    tts.synthesise("Draft checkpoint chain test.", ref, max_new_tokens=24)
    st = tts.spec_stats
    assert st["rounds"] >= 1
    assert st["accepted"] / max(st["proposed"], 1) >= 0.8, st


def test_from_checkpoints_warns_without_encodec(tmp_path):
    p1 = str(tmp_path / "first_stage.pt")
    p2 = str(tmp_path / "second_stage.pt")
    p3 = str(tmp_path / "speaker_encoder.pt")
    _save_first_stage(p1)
    _save_second_stage(p2)
    _save_speaker_encoder(p3)
    with pytest.warns(UserWarning, match="RANDOM-weight"):
        TTS.from_checkpoints(p1, p2, p3, output_dir=str(tmp_path / "out"))


def test_finetuned_npz_honors_model_args(tmp_path):
    """A trainer-saved .npz (reference-style model_args meta) loads with its
    own architecture, not the stock 1B config."""
    import dataclasses as _dc

    import jax as _jax

    from metavoice_tpu.models import transformer as _tfm
    from metavoice_tpu.training import finetune as ft
    from metavoice_tpu.training.trainer import save_checkpoint
    from metavoice_tpu.utils import checkpoint as ck

    params = _tfm.init_params(_jax.random.PRNGKey(0), FIRST)
    state = ft.TrainState(params=params, opt_state=None, step=7)
    path = save_checkpoint(
        str(tmp_path), "ft", state, FIRST, ft.FinetuneConfig(),
        best_val_loss=1.5, tokenizer_info={},
    )
    loaded, cfg, _tok, qmode = ck.load_first_stage_npz(path)
    assert qmode is None
    assert cfg.n_layer == FIRST.n_layer and cfg.dim == FIRST.dim
    assert cfg.block_size == FIRST.block_size
    np.testing.assert_array_equal(
        np.asarray(loaded["wtes"][0]), np.asarray(params["wtes"][0])
    )


def test_finetuned_bf16_npz_loads_clean(tmp_path):
    """A bf16-trained trainer .npz (save_npz writes a reserved __bf16_keys__
    entry) loads through load_first_stage_npz with no stray leaf in the
    params pytree and its bf16 leaves narrowed back (ADVICE r4 medium)."""
    import jax as _jax
    import jax.numpy as _jnp

    from metavoice_tpu.models import transformer as _tfm
    from metavoice_tpu.training import finetune as ft
    from metavoice_tpu.training.trainer import save_checkpoint
    from metavoice_tpu.utils import checkpoint as ck

    params = _tfm.init_params(_jax.random.PRNGKey(0), FIRST, dtype=_jnp.bfloat16)
    state = ft.TrainState(params=params, opt_state=None, step=3)
    path = save_checkpoint(
        str(tmp_path), "ftbf16", state, FIRST, ft.FinetuneConfig(),
        best_val_loss=2.0, tokenizer_info={},
    )
    loaded, cfg, _tok, qmode = ck.load_first_stage_npz(path)
    assert "__bf16_keys__" not in loaded
    assert np.asarray(loaded["wtes"][0]).dtype.name == "bfloat16"
    assert np.asarray(loaded["layers"]["attn_norm_w"]).dtype.name == "bfloat16"
    # and the loaded pytree jit-dispatches (the stray unicode leaf used to
    # fail conversion here)
    _jax.tree.map(_jnp.asarray, loaded)


def test_prequantized_npz_checkpoint_roundtrip(tmp_path):
    """quantize CLI -> .npz -> TTS.from_checkpoints: packed arrays load
    with dtypes intact, the load-time quantize pass is skipped, and the
    pipeline synthesises."""
    import jax.numpy as jnp

    from metavoice_tpu.cli import cmd_quantize

    p1 = str(tmp_path / "first_stage.pt")
    p2 = str(tmp_path / "second_stage.pt")
    p3 = str(tmp_path / "speaker_encoder.pt")
    p4 = str(tmp_path / "encodec.pt")
    _save_first_stage(p1)
    _save_second_stage(p2)
    _save_speaker_encoder(p3)
    _save_encodec(p4)
    q = str(tmp_path / "first_stage.int8.npz")
    # dim=32 is below int4's group-packing minimum, so exercise int8 here
    assert cmd_quantize(["--first_stage_path", p1, "--mode", "int8", "--out", q]) == 0

    tts = TTS.from_checkpoints(
        q, p2, p3, encodec_path=p4, encodec_cfg=ECFG,
        output_dir=str(tmp_path / "out"), enforce_min_ref_duration=False,
    )
    w = tts.c.first_stage_params["layers"]["wqkv"]
    # "int8" now emits the packed int8-in-int32 serving format
    assert isinstance(w, dict) and w["p8"].dtype == jnp.int32

    # conflicting quantisation mode is rejected — via kwarg or RuntimeConfig
    with pytest.raises(ValueError, match="pre-quantized"):
        TTS.from_checkpoints(
            q, p2, p3, encodec_path=p4, encodec_cfg=ECFG,
            output_dir=str(tmp_path / "out2"), quantisation_mode="int4",
        )
    from metavoice_tpu.core.config import RuntimeConfig

    with pytest.raises(ValueError, match="pre-quantized"):
        TTS.from_checkpoints(
            q, p2, p3, encodec_path=p4, encodec_cfg=ECFG,
            output_dir=str(tmp_path / "out3"),
            runtime=RuntimeConfig(quantisation_mode="int4"),
        )
    # a runtime carrying the MATCHING mode must not re-quantize
    t2 = TTS.from_checkpoints(
        q, p2, p3, encodec_path=p4, encodec_cfg=ECFG,
        output_dir=str(tmp_path / "out4"),
        runtime=RuntimeConfig(quantisation_mode="int8"),
    )
    assert isinstance(t2.c.first_stage_params["layers"]["wqkv"], dict)
    assert t2.c.first_stage_params["layers"]["wqkv"]["p8"].dtype == jnp.int32

    # the "int8_packed" alias names the same format — must not conflict
    t3 = TTS.from_checkpoints(
        q, p2, p3, encodec_path=p4, encodec_cfg=ECFG,
        output_dir=str(tmp_path / "out5"), quantisation_mode="int8_packed",
    )
    assert t3.c.first_stage_params["layers"]["wqkv"]["p8"].dtype == jnp.int32

    sr = 16000
    t = np.arange(31 * sr) / sr
    ref = str(tmp_path / "ref.wav")
    aio.write_wav(ref, (0.2 * np.sin(2 * np.pi * 220 * t)).astype(np.float32), sr)
    out = tts.synthesise("Pre-quantized checkpoint test.", ref)
    wav, _ = aio.read_wav(out)
    assert len(wav) > 0 and np.isfinite(wav).all()

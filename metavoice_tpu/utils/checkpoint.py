"""Checkpoint interop: reference torch ``.pt`` files <-> JAX param pytrees.

The reference ships three pickled checkpoints (first_stage.pt,
second_stage.pt, speaker_encoder.pt; fam/llm/fast_inference.py:71-100) with
schema {model, optimizer, model_args, iter_num, best_val_loss, config,
meta:{speaker_cond, speaker_emb_size, tokenizer:{...}}}
(fam/llm/finetune.py:300-313). This module:

  * imports that layout into our stacked-layer (in, out) pytrees, applying
    the same key remapping the reference's fast path applies
    (fam/llm/fast_inference_utils.py:245-279) — torch (out, in) linear
    weights are transposed once here so the forward pass never does;
  * exports/loads native checkpoints as flat ``.npz`` (plus orbax for
    training state, see training/finetune.py);
  * torch is used only as a host-side pickle reader — nothing from torch
    touches the compute path.
"""

from __future__ import annotations

import json
import os
from typing import Any

import numpy as np

from metavoice_tpu.core.config import TransformerConfig, first_stage_config
from metavoice_tpu.models.speaker_encoder import (
    MODEL_NUM_LAYERS,
    SpeakerEncoderParams,
)

Params = dict[str, Any]

_UNWANTED_PREFIX = "_orig_mod."  # torch.compile artifact (finetune.py:83-88)


def _strip_compile_prefix(state_dict: dict) -> dict:
    out = {}
    for k, v in state_dict.items():
        if k.startswith(_UNWANTED_PREFIX):
            k = k[len(_UNWANTED_PREFIX) :]
        out[k] = v
    return out


def _to_np(t) -> np.ndarray:
    return t.detach().to("cpu").float().numpy()


def load_first_stage_pt(path: str, cfg: TransformerConfig | None = None, dtype=np.float32):
    """first_stage.pt -> (params pytree, cfg, tokenizer_info dict).

    Accepts the training-format names (transformer.wtes.0.weight, ...,
    transformer.h.{i}.attn.c_attn.weight) per the remap table at
    fam/llm/fast_inference_utils.py:250-279.
    """
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = _strip_compile_prefix(ckpt["model"])
    if cfg is None:
        # Honor checkpoint-embedded model_args (a finetuned checkpoint may
        # have non-default architecture), mirroring load_second_stage_pt and
        # the reference loader (fam/llm/inference.py:124-131); fall back to
        # the stock 1B shape for args the checkpoint doesn't carry.
        args = ckpt.get("model_args", {}) or {}
        meta = ckpt.get("meta", {}) or {}
        overrides = {}
        for src, dst in (
            ("block_size", "block_size"),
            ("n_layer", "n_layer"),
            ("n_head", "n_head"),
            ("n_local_heads", "n_local_heads"),
            ("n_embd", "dim"),
            ("causal", "causal"),
            ("norm_type", "norm_type"),
            ("nonlinearity_type", "nonlinearity_type"),
            ("bias", "bias"),
            ("spkemb_dropout", "spkemb_dropout"),
            ("spk_emb_on_text", "spk_emb_on_text"),
        ):
            if src in args:
                overrides[dst] = args[src]
        if args.get("vocab_sizes"):
            overrides["vocab_sizes"] = tuple(args["vocab_sizes"])
        if args.get("rmsnorm_eps"):
            overrides["norm_eps"] = args["rmsnorm_eps"]
        if meta.get("speaker_emb_size"):
            overrides["speaker_emb_dim"] = meta["speaker_emb_size"]
        cfg = first_stage_config(**overrides)
    l = cfg.n_layer

    params = _extract_gpt_params(sd, cfg, dtype)
    # lm_heads.0.weight is tied to wtes.0 (fam/llm/model.py:139-143); our
    # forward reuses wtes for the tied head, so nothing further to load.
    tokenizer_info = ckpt.get("meta", {}).get("tokenizer", {})
    return params, cfg, tokenizer_info


def _extract_gpt_params(sd: dict, cfg: TransformerConfig, dtype=np.float32) -> Params:
    """Training-format state dict -> stacked-layer pytree, variant-aware.

    Handles every GPTConfig combination the reference trainer can emit
    (fam/llm/model.py:26-46): rmsnorm/layernorm (+bias), swiglu/gelu MLPs,
    biased/unbiased linears, tied or separate lm heads.
    """
    l = cfg.n_layer

    def g(name):
        return _to_np(sd[name]).astype(dtype)

    def has(name):
        return name in sd

    def stack(fmt, transpose=False):
        mats = [_to_np(sd[fmt.format(i=i)]).astype(dtype) for i in range(l)]
        if transpose:
            mats = [m.T for m in mats]
        return np.stack(mats, axis=0)

    layers: Params = {
        "attn_norm_w": stack("transformer.h.{i}.ln_1.weight"),
        "wqkv": stack("transformer.h.{i}.attn.c_attn.weight", transpose=True),
        "wo": stack("transformer.h.{i}.attn.c_proj.weight", transpose=True),
        "ffn_norm_w": stack("transformer.h.{i}.ln_2.weight"),
    }
    if has("transformer.h.0.ln_1.bias"):
        layers["attn_norm_b"] = stack("transformer.h.{i}.ln_1.bias")
        layers["ffn_norm_b"] = stack("transformer.h.{i}.ln_2.bias")
    if has("transformer.h.0.attn.c_attn.bias"):
        layers["wqkv_b"] = stack("transformer.h.{i}.attn.c_attn.bias")
    if has("transformer.h.0.attn.c_proj.bias"):
        layers["wo_b"] = stack("transformer.h.{i}.attn.c_proj.bias")
    if has("transformer.h.0.mlp.swiglu.w1.weight"):
        layers["w1"] = stack("transformer.h.{i}.mlp.swiglu.w1.weight", transpose=True)
        layers["w3"] = stack("transformer.h.{i}.mlp.swiglu.w3.weight", transpose=True)
        layers["w2"] = stack("transformer.h.{i}.mlp.c_proj.weight", transpose=True)
    else:
        layers["w_fc"] = stack("transformer.h.{i}.mlp.c_fc.weight", transpose=True)
        layers["w_proj"] = stack("transformer.h.{i}.mlp.c_proj.weight", transpose=True)
        if has("transformer.h.0.mlp.c_fc.bias"):
            layers["w_fc_b"] = stack("transformer.h.{i}.mlp.c_fc.bias")
            layers["w_proj_b"] = stack("transformer.h.{i}.mlp.c_proj.bias")

    params: Params = {
        "wtes": [
            g(f"transformer.wtes.{i}.weight") for i in range(len(cfg.vocab_sizes))
        ],
        "wpe": g("transformer.wpe.weight"),
        "layers": layers,
        "ln_f_w": g("transformer.ln_f.weight"),
    }
    if has("transformer.ln_f.bias"):
        params["ln_f_b"] = g("transformer.ln_f.bias")
    if has("speaker_cond_pos.weight"):
        params["speaker_cond"] = g("speaker_cond_pos.weight").T
    if cfg.target_vocab_sizes is not None:
        params["lm_heads"] = [
            g(f"lm_heads.{i}.weight").T for i in range(len(cfg.target_vocab_sizes))
        ]
    return params


def load_second_stage_pt(path: str, dtype=np.float32):
    """second_stage.pt -> (params, cfg, tokenizer_info).

    Builds the TransformerConfig from checkpoint-embedded model_args
    (fam/llm/inference.py:124-131).
    """
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = _strip_compile_prefix(ckpt["model"])
    args = ckpt["model_args"]
    meta = ckpt.get("meta", {})
    ckpt_cfg = ckpt.get("config", {})

    cfg = TransformerConfig(
        block_size=args["block_size"],
        n_layer=args["n_layer"],
        n_head=args["n_head"],
        dim=args["n_embd"],
        vocab_sizes=tuple(args["vocab_sizes"]),
        target_vocab_sizes=tuple(args["target_vocab_sizes"]) if args.get("target_vocab_sizes") else None,
        causal=ckpt_cfg.get("causal", args.get("causal", False)),
        norm_type=args.get("norm_type", "layernorm"),
        nonlinearity_type=args.get("nonlinearity_type", "gelu"),
        bias=args.get("bias", True),
        speaker_emb_dim=meta.get("speaker_emb_size", 256),
        norm_eps=args.get("rmsnorm_eps") or 1e-5,
    )
    params = _extract_gpt_params(sd, cfg, dtype)
    tokenizer_info = meta.get("tokenizer", {})
    return params, cfg, tokenizer_info


def load_second_stage_npz(path: str):
    """Native .npz second stage -> (params, cfg, tokenizer_info).

    Counterpart of :func:`load_second_stage_pt` for checkpoints produced
    in-repo (training/second_stage.save_second_stage) — no torch read.
    """
    params, meta = load_npz(path)
    args = meta["model_args"]
    m = meta.get("meta", {})
    cfg = TransformerConfig(
        block_size=args["block_size"],
        n_layer=args["n_layer"],
        n_head=args["n_head"],
        dim=args["n_embd"],
        vocab_sizes=tuple(args["vocab_sizes"]),
        target_vocab_sizes=(
            tuple(args["target_vocab_sizes"])
            if args.get("target_vocab_sizes") else None
        ),
        causal=args.get("causal", False),
        norm_type=args.get("norm_type", "layernorm"),
        nonlinearity_type=args.get("nonlinearity_type", "gelu"),
        bias=args.get("bias", True),
        speaker_emb_dim=m.get("speaker_emb_size", 256),
    )
    return params, cfg, m.get("tokenizer", {})


def load_speaker_encoder_pt(path: str, dtype=np.float32) -> SpeakerEncoderParams:
    """speaker_encoder.pt {model_state: ...} -> SpeakerEncoderParams.

    torch LSTM stores weight_ih_l{k} (4H, in), weight_hh_l{k} (4H, H) and two
    bias vectors that always appear summed in the cell; we fold them.
    """
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("model_state", ckpt)

    w_ih, w_hh, b = [], [], []
    in_max = None
    for k in range(MODEL_NUM_LAYERS):
        wi = _to_np(sd[f"lstm.weight_ih_l{k}"]).T.astype(dtype)  # (in, 4H)
        wh = _to_np(sd[f"lstm.weight_hh_l{k}"]).T.astype(dtype)  # (H, 4H)
        bias = (
            _to_np(sd[f"lstm.bias_ih_l{k}"]) + _to_np(sd[f"lstm.bias_hh_l{k}"])
        ).astype(dtype)
        in_max = max(in_max or 0, wi.shape[0], wh.shape[0])
        w_ih.append(wi)
        w_hh.append(wh)
        b.append(bias)
    # pad layer-0 input rows so layers stack uniformly
    w_ih = [
        np.pad(w, ((0, in_max - w.shape[0]), (0, 0))) if w.shape[0] < in_max else w
        for w in w_ih
    ]
    return SpeakerEncoderParams(
        w_ih=np.stack(w_ih),
        w_hh=np.stack(w_hh),
        b=np.stack(b),
        linear_w=_to_np(sd["linear.weight"]).T.astype(dtype),
        linear_b=_to_np(sd["linear.bias"]).astype(dtype),
    )


# --------------------------------------------------------------------------------------
# Native .npz save/load (flat key -> array)
# --------------------------------------------------------------------------------------


def _flatten(tree: Any, prefix: str = "") -> dict[str, np.ndarray]:
    flat = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            flat.update(_flatten(v, f"{prefix}{k}/"))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            flat.update(_flatten(v, f"{prefix}{i}/"))
    else:
        flat[prefix[:-1]] = np.asarray(tree)
    return flat


def _unflatten(flat: dict[str, np.ndarray]) -> Any:
    tree: dict = {}
    for key, val in flat.items():
        parts = key.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = val

    def listify(node):
        if isinstance(node, dict):
            keys = list(node.keys())
            if keys and all(k.isdigit() for k in keys):
                return [listify(node[str(i)]) for i in range(len(keys))]
            return {k: listify(v) for k, v in node.items()}
        return node

    return listify(tree)


def save_npz(path: str, params: Any, meta: dict | None = None) -> None:
    # .npy cannot represent bfloat16: np.load round-trips it as an opaque
    # void ("|V2") array. Store those leaves widened to f32 and record their
    # keys in a reserved entry so load_npz can narrow them back.
    flat = _flatten(params)
    bf16_keys = sorted(k for k, v in flat.items() if v.dtype.name == "bfloat16")
    flat = {
        k: (v.astype(np.float32) if k in set(bf16_keys) else v)
        for k, v in flat.items()
    }
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.savez(
        path,
        __meta__=json.dumps(meta or {}),
        __bf16_keys__=np.asarray(bf16_keys),
        **flat,
    )


def load_npz(path: str) -> tuple[Any, dict]:
    import ml_dtypes

    data = np.load(path, allow_pickle=False)
    meta = json.loads(str(data["__meta__"])) if "__meta__" in data else {}
    bf16 = (
        set(data["__bf16_keys__"].tolist()) if "__bf16_keys__" in data else set()
    )
    flat = {
        k: (data[k].astype(ml_dtypes.bfloat16) if k in bf16 else data[k])
        for k in data.files
        if k not in ("__meta__", "__bf16_keys__")
    }
    return _unflatten(flat), meta


def save_first_stage_quantized(
    path: str,
    params: Any,
    cfg: TransformerConfig,
    tokenizer_info: dict | None,
    quantisation_mode: str,
) -> None:
    """Write a pre-quantized first-stage serving checkpoint (.npz).

    Quantization (int8 per-channel / int4-in-int32 groupwise,
    ops/quantized.py) runs once offline; `TTS.from_checkpoints` then loads
    the packed arrays directly and skips the load-time torch read + quantize
    pass. int4 shrinks the 4.97 GB f32 `.pt` to ~0.7 GB on disk. No
    reference counterpart (its quantization always runs at load,
    fam/llm/fast_inference_utils.py:284-299).
    """
    import dataclasses

    flat = _flatten(params)
    # .npy has no bfloat16: store those arrays as f32 and record which keys
    # to narrow back on load
    bf16_keys = sorted(k for k, v in flat.items() if v.dtype.name == "bfloat16")
    flat = {
        k: (v.astype(np.float32) if k in set(bf16_keys) else v)
        for k, v in flat.items()
    }
    meta = {
        "format": "first_stage_quantized",
        "quantisation_mode": quantisation_mode,
        "config": dataclasses.asdict(cfg),
        "tokenizer": tokenizer_info or {},
        "bf16_keys": bf16_keys,
    }
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.savez(path, __meta__=json.dumps(meta), **flat)


def load_first_stage_npz(path: str):
    """Load a native .npz first-stage checkpoint.

    Accepts both layouts: the quantize CLI's serving checkpoints (full
    ``config`` dict + ``quantisation_mode``) and the finetune trainer's
    reference-schema checkpoints (``model_args`` with n_embd-style names,
    training/trainer.py save_checkpoint). Returns
    (params, cfg, tokenizer_info, quantisation_mode|None).
    """
    import ml_dtypes

    data = np.load(path, allow_pickle=False)
    meta = json.loads(str(data["__meta__"])) if "__meta__" in data else {}
    # bf16 narrowing keys come from either writer: the quantize CLI records
    # them inside __meta__ (save_first_stage_quantized), the generic save_npz
    # (training/trainer.py checkpoints, draft checkpoints) as a reserved
    # __bf16_keys__ array entry that must not leak into the params pytree.
    bf16 = set(meta.get("bf16_keys") or [])
    if "__bf16_keys__" in data:
        bf16 |= set(data["__bf16_keys__"].tolist())
    flat = {
        k: (data[k].astype(ml_dtypes.bfloat16) if k in bf16 else data[k])
        for k in data.files
        if k not in ("__meta__", "__bf16_keys__")
    }
    params = _unflatten(flat)
    tok_info = meta.get("tokenizer") or (meta.get("meta") or {}).get("tokenizer") or {}
    if meta.get("config") and "n_layer" in meta["config"]:
        cfg_dict = dict(meta["config"])
        for key in ("vocab_sizes", "target_vocab_sizes"):
            if cfg_dict.get(key) is not None:
                cfg_dict[key] = tuple(cfg_dict[key])
        cfg = TransformerConfig(**cfg_dict)
    elif meta.get("model_args"):
        # reference-style names (finetuned checkpoint must not silently load
        # with the stock architecture — same contract as load_first_stage_pt)
        args = meta["model_args"]
        inner = meta.get("meta") or {}
        overrides = {}
        for src, dst in (
            ("block_size", "block_size"),
            ("n_layer", "n_layer"),
            ("n_head", "n_head"),
            ("n_local_heads", "n_local_heads"),
            ("n_embd", "dim"),
            ("causal", "causal"),
            ("norm_type", "norm_type"),
            ("nonlinearity_type", "nonlinearity_type"),
            ("bias", "bias"),
            ("spkemb_dropout", "spkemb_dropout"),
            ("spk_emb_on_text", "spk_emb_on_text"),
        ):
            if src in args:
                overrides[dst] = args[src]
        if args.get("vocab_sizes"):
            overrides["vocab_sizes"] = tuple(args["vocab_sizes"])
        if inner.get("speaker_emb_size"):
            overrides["speaker_emb_dim"] = inner["speaker_emb_size"]
        cfg = first_stage_config(**overrides)
    else:
        cfg = first_stage_config()
    return params, cfg, tok_info, meta.get("quantisation_mode")


# --------------------------------------------------------------------------------------
# Speculative-decoding demo artifacts (structured-teacher delta)
# --------------------------------------------------------------------------------------
#
# Round-5 measurement (scripts/diag_draft_holdout.py): a draft distilled
# against the RANDOM-weight bench target memorizes its corpus (train KL 0.13,
# held-out KL 1.30) — a random 1.24B conditional distribution has no structure
# a smaller student can learn, so realized speculative decoding is impossible
# there. Real pretrained weights ARE learnable; scripts/train_structured_teacher.py
# reproduces that property in-repo by finetuning the bench target's last K
# blocks on a seeded low-entropy process. The delta below ships those K
# trained blocks in the int4-packed SERVING format: bench.py applies it to its
# already-quantized bench params to reconstruct the exact teacher the draft
# was distilled against (per-layer int4 grouping makes slice-then-quantize ==
# quantize-then-slice; pinned by tests/test_spec_structured.py).


def save_spec_teacher_delta(path: str, qparams: Any, tail: int) -> None:
    """Write the last ``tail`` blocks (+ final norm) of an int4-packed tree."""
    delta = {
        "layers": {
            k: (
                {"pw": v["pw"][-tail:], "sc": v["sc"][-tail:]}
                if isinstance(v, dict) else v[-tail:]
            )
            for k, v in qparams["layers"].items()
        },
        "ln_f_w": qparams["ln_f_w"],
    }
    flat = _flatten(delta)
    bf16_keys = sorted(k for k, v in flat.items() if v.dtype.name == "bfloat16")
    flat = {
        k: (v.astype(np.float32) if k in set(bf16_keys) else v)
        for k, v in flat.items()
    }
    meta = {"format": "spec_teacher_delta", "tail": tail, "bf16_keys": bf16_keys}
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.savez(path, __meta__=json.dumps(meta), **flat)


def load_spec_teacher_delta(path: str):
    """-> (delta_tree, tail). Leaves are numpy (bf16 narrowed back)."""
    import ml_dtypes

    data = np.load(path, allow_pickle=False)
    meta = json.loads(str(data["__meta__"]))
    bf16 = set(meta.get("bf16_keys") or [])
    flat = {
        k: (data[k].astype(ml_dtypes.bfloat16) if k in bf16 else data[k])
        for k in data.files
        if k != "__meta__"
    }
    return _unflatten(flat), int(meta["tail"])


def apply_spec_teacher_delta(qparams: Any, delta: Any, tail: int) -> Any:
    """Graft the delta's trained blocks onto an int4-packed param tree.

    Returns a new tree whose stacked layer leaves carry the delta in their
    last ``tail`` positions and whose final norm is the delta's.
    """
    import jax.numpy as jnp

    layers = dict(qparams["layers"])
    for name, v in delta["layers"].items():
        if isinstance(v, dict):
            cur = dict(layers[name])
            cur["pw"] = jnp.asarray(cur["pw"]).at[-tail:].set(jnp.asarray(v["pw"]))
            cur["sc"] = jnp.asarray(cur["sc"]).at[-tail:].set(jnp.asarray(v["sc"]))
            layers[name] = cur
        else:
            layers[name] = jnp.asarray(layers[name]).at[-tail:].set(jnp.asarray(v))
    out = dict(qparams)
    out["layers"] = layers
    out["ln_f_w"] = jnp.asarray(delta["ln_f_w"])
    return out

"""Converters for external pretrained weights: EnCodec 24 kHz (encodec /
audiocraft checkpoints) -> models/encodec.py pytrees.

The reference consumes these through the ``encodec``/``audiocraft`` packages
(fam/llm/loaders/training_data.py:57-58, fam/llm/decoders.py:13). Their
checkpoints are plain tensor state dicts (loadable with torch
``weights_only=True``); this module maps the known module naming of the
24 kHz causal EnCodec (n_filters=32, ratios [8,5,4,2], 2-layer LSTM,
128-d latent) onto our layout. Layout contracts are pinned by
tests/test_encodec_torch_parity.py:

  * SConv1d ``NormConv1d``: weight-norm (dim=0) folded, torch (out, in, k)
    -> ours (k, in, out),
  * SConvTranspose1d: torch (in, out, k) -> ours (k, in, out),
  * SLSTM: weight_ih/hh transposed, biases summed,
  * RVQ codebooks: ``quantizer.vq.layers.{i}._codebook.embed`` (K, D) as-is.
"""

from __future__ import annotations

from typing import Any

import numpy as np

from metavoice_tpu.models.encodec import EncodecConfig

Params = dict[str, Any]


def fold_weight_norm(g: np.ndarray, v: np.ndarray) -> np.ndarray:
    """torch weight_norm (dim=0): w = g * v / ||v|| over non-leading dims."""
    axes = tuple(range(1, v.ndim))
    norm = np.sqrt(np.sum(v.astype(np.float64) ** 2, axis=axes, keepdims=True))
    return (g.astype(np.float64) * v.astype(np.float64) / np.maximum(norm, 1e-12)).astype(
        np.float32
    )


def _to_np(t) -> np.ndarray:
    import torch

    if isinstance(t, torch.Tensor):
        return t.detach().cpu().float().numpy()
    return np.asarray(t, np.float32)


class _SD:
    """State-dict accessor with weight-norm folding."""

    def __init__(self, sd: dict):
        self.sd = sd

    def has(self, name: str) -> bool:
        return name in self.sd or f"{name}_g" in self.sd

    def conv_w(self, prefix: str) -> np.ndarray:
        """Folded conv weight at e.g. 'encoder.model.0.conv.conv.weight'."""
        if f"{prefix}_g" in self.sd:
            w = fold_weight_norm(_to_np(self.sd[f"{prefix}_g"]), _to_np(self.sd[f"{prefix}_v"]))
        else:
            w = _to_np(self.sd[prefix])
        return w

    def arr(self, name: str) -> np.ndarray:
        return _to_np(self.sd[name])


def _lstm(sd: _SD, prefix: str, layers: int) -> Params:
    return {
        "w_ih": np.stack([sd.arr(f"{prefix}.weight_ih_l{i}").T for i in range(layers)]),
        "w_hh": np.stack([sd.arr(f"{prefix}.weight_hh_l{i}").T for i in range(layers)]),
        "b": np.stack(
            [
                sd.arr(f"{prefix}.bias_ih_l{i}") + sd.arr(f"{prefix}.bias_hh_l{i}")
                for i in range(layers)
            ]
        ),
    }


def convert_encodec_state_dict(
    state_dict: dict, cfg: EncodecConfig = EncodecConfig()
) -> Params:
    """encodec-package 24 kHz state dict -> models/encodec params pytree.

    Module index map for SEANet with ratios (8,5,4,2), LSTM(2):
      encoder.model: 0 conv_in; [1,4,7,10] resblocks; [3,6,9,12] strided
      convs (ELUs hold the gaps); 13 LSTM; 15 conv_out.
      decoder.model: 0 conv_in; 1 LSTM; [3,6,9,12] conv-transposes;
      [4,7,10,13] resblocks; 15 conv_out.
    """
    sd = _SD(state_dict)
    n_stages = len(cfg.ratios)

    def conv(prefix):
        # NormConv1d: {prefix}.conv.weight(_g/_v) + .conv.bias  (older dumps
        # use {prefix}.conv.conv.*)
        for base in (f"{prefix}.conv.conv", f"{prefix}.conv"):
            if sd.has(f"{base}.weight"):
                w = sd.conv_w(f"{base}.weight").transpose(2, 1, 0)  # -> (k, in, out)
                b = sd.arr(f"{base}.bias") if f"{base}.bias" in sd.sd else None
                return w, b
        raise KeyError(f"no conv weights under {prefix}")

    def convtr(prefix):
        for base in (f"{prefix}.convtr.convtr", f"{prefix}.convtr"):
            if sd.has(f"{base}.weight"):
                # torch (in, out, k): spatial flip then -> (k, in, out)
                # (jax conv_transpose correlates; torch convtr convolves —
                # contract pinned in tests/test_encodec_torch_parity.py)
                w = sd.conv_w(f"{base}.weight")[:, :, ::-1].transpose(2, 0, 1).copy()
                b = sd.arr(f"{base}.bias") if f"{base}.bias" in sd.sd else None
                return w, b
        raise KeyError(f"no convtr weights under {prefix}")

    def resblock(prefix):
        w1, b1 = conv(f"{prefix}.block.1")
        w2, b2 = conv(f"{prefix}.block.3")
        return {"conv1_w": w1, "conv1_b": b1, "conv2_w": w2, "conv2_b": b2}

    # ---- encoder: conv_in, n_stages x (res, strided conv), lstm, conv_out
    enc_in_w, enc_in_b = conv("encoder.model.0")
    enc_blocks = []
    for i in range(n_stages):
        res_idx = 1 + 3 * i
        down_idx = 3 + 3 * i
        w, b = conv(f"encoder.model.{down_idx}")
        enc_blocks.append(
            {"res": resblock(f"encoder.model.{res_idx}"), "conv_w": w, "conv_b": b}
        )
    lstm_idx = 1 + 3 * n_stages
    enc_out_w, enc_out_b = conv(f"encoder.model.{lstm_idx + 2}")
    encoder = {
        "conv_in_w": enc_in_w,
        "conv_in_b": enc_in_b,
        "blocks": enc_blocks,
        "lstm": _lstm(sd, f"encoder.model.{lstm_idx}.lstm", cfg.lstm_layers),
        "conv_out_w": enc_out_w,
        "conv_out_b": enc_out_b,
    }

    # ---- decoder: conv_in, lstm, n_stages x (convtr, res), conv_out
    dec_in_w, dec_in_b = conv("decoder.model.0")
    dec_blocks = []
    for i in range(n_stages):
        up_idx = 3 + 3 * i
        res_idx = 4 + 3 * i
        w, b = convtr(f"decoder.model.{up_idx}")
        dec_blocks.append(
            {"convtr_w": w, "convtr_b": b, "res": resblock(f"decoder.model.{res_idx}")}
        )
    out_idx = 3 + 3 * n_stages
    dec_out_w, dec_out_b = conv(f"decoder.model.{out_idx}")
    decoder = {
        "conv_in_w": dec_in_w,
        "conv_in_b": dec_in_b,
        "lstm": _lstm(sd, "decoder.model.1.lstm", cfg.lstm_layers),
        "blocks": dec_blocks,
        "conv_out_w": dec_out_w,
        "conv_out_b": dec_out_b,
    }

    codebooks = np.stack(
        [
            _to_np(state_dict[f"quantizer.vq.layers.{i}._codebook.embed"])
            for i in range(cfg.n_q)
        ]
    )
    return {"encoder": encoder, "decoder": decoder, "codebooks": codebooks}


def load_encodec_pt(path: str, cfg: EncodecConfig = EncodecConfig()) -> Params:
    """Load an encodec-package checkpoint file (plain tensor dict)."""
    import torch

    raw = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(raw, dict) and "best_state" in raw:
        raw = raw["best_state"]
    return convert_encodec_state_dict(raw, cfg)


# --------------------------------------------------------------------------------------
# audiocraft MultiBandDiffusion checkpoints -> models/mbd.py pytrees
# --------------------------------------------------------------------------------------
#
# audiocraft packs the per-band diffusion models as
#   {"sample_rate": int, "n_bands": int,
#    i: {"model_state": {...}, "processor_state": {...}, "cfg": ...}}
# (audiocraft/models/loaders.py load_diffusion_models); the reference
# consumes it via MultiBandDiffusion.get_mbd_24khz(bw=6.0)
# (/root/reference/fam/llm/decoders.py:84-86). Architecture hyperparameters
# (depth, width, step count, conditioning dim) are INFERRED from tensor
# shapes so non-default checkpoints load without a config file.


def _convert_diffusion_unet(ms: dict) -> tuple[dict, dict]:
    """One DiffusionUnet model_state -> (params pytree, inferred cfg kwargs)."""
    import re as _re

    depth = 1 + max(
        int(m.group(1))
        for k in ms
        if (m := _re.match(r"encoders\.(\d+)\.conv\.weight", k))
    )
    res_blocks = 1 + max(
        (
            int(m.group(1))
            for k in ms
            if (m := _re.match(r"encoders\.0\.res_blocks\.(\d+)\.", k))
        ),
        default=-1,
    )

    def conv_w(name):
        return _to_np(ms[name]).transpose(2, 1, 0)  # (out,in,k) -> (k,in,out)

    def convtr_w(name):
        return _to_np(ms[name])[:, :, ::-1].transpose(2, 0, 1).copy()

    def resblock(prefix):
        return {
            "gn1_w": _to_np(ms[f"{prefix}.block.0.weight"]),
            "gn1_b": _to_np(ms[f"{prefix}.block.0.bias"]),
            "conv1_w": conv_w(f"{prefix}.block.2.weight"),
            "conv1_b": _to_np(ms[f"{prefix}.block.2.bias"]),
            "gn2_w": _to_np(ms[f"{prefix}.block.3.weight"]),
            "gn2_b": _to_np(ms[f"{prefix}.block.3.bias"]),
            "conv2_w": conv_w(f"{prefix}.block.6.weight"),
            "conv2_b": _to_np(ms[f"{prefix}.block.6.bias"]),
        }

    encoders, decoders = [], []
    for i in range(depth):
        encoders.append(
            {
                "conv_w": conv_w(f"encoders.{i}.conv.weight"),
                "norm_w": _to_np(ms[f"encoders.{i}.norm.weight"]),
                "norm_b": _to_np(ms[f"encoders.{i}.norm.bias"]),
                "res": [
                    resblock(f"encoders.{i}.res_blocks.{j}") for j in range(res_blocks)
                ],
            }
        )
        decoders.append(
            {
                "convtr_w": convtr_w(f"decoders.{i}.convtr.weight"),
                "norm_w": _to_np(ms[f"decoders.{i}.norm.weight"]),
                "norm_b": _to_np(ms[f"decoders.{i}.norm.bias"]),
                "res": [
                    resblock(f"decoders.{i}.res_blocks.{j}") for j in range(res_blocks)
                ],
            }
        )

    params = {
        "encoders": encoders,
        "decoders": decoders,
        "embedding": _to_np(ms["embedding.weight"]),
        "embeddings": (
            [
                _to_np(ms[f"embeddings.{i}.weight"])
                for i in range(depth - 1)
                if f"embeddings.{i}.weight" in ms
            ]
            or None
        )
        if any(k.startswith("embeddings.") for k in ms)
        else None,
        "bilstm": None,
    }
    codec_dim = None
    if "conv_codec.weight" in ms:
        params["conv_codec_w"] = conv_w("conv_codec.weight")
        params["conv_codec_b"] = _to_np(ms["conv_codec.bias"])
        codec_dim = params["conv_codec_w"].shape[1]

    enc0 = encoders[0]["conv_w"]  # (k, chin, hidden)
    enc_chs = [e["conv_w"].shape[2] for e in encoders]
    cfg_kwargs = dict(
        chin=enc0.shape[1],
        hidden=enc_chs[0],
        depth=depth,
        growth=(enc_chs[1] / enc_chs[0]) if depth > 1 else 1.0,
        num_steps=params["embedding"].shape[0],
        codec_dim=codec_dim,
        kernel=enc0.shape[0],
        res_blocks=res_blocks,
        emb_all_layers=params["embeddings"] is not None,
    )
    return params, cfg_kwargs


def convert_mbd_checkpoint(pkg: dict, bottleneck: str = "auto"):
    """audiocraft MBD package -> (params, MBDConfig).

    ``pkg`` is the loaded torch pickle (or a same-shaped dict). Schedule
    hyperparameters come from the per-band ``cfg`` when it is a plain dict
    (omegaconf objects are read via dict access too); otherwise defaults.

    ``bottleneck``: "auto" (default) refuses checkpoints with a recurrent
    bottleneck core (keys are auto-detected; converting one silently would
    drop weights) and otherwise uses the "zeroed" reading of unet.py's
    LSTM-less bottleneck; pass "zeroed" or "passthrough" explicitly to
    A/B a real checkpoint against both readings (models/mbd.UNetConfig).
    """
    from metavoice_tpu.models.mbd import MBDConfig, ScheduleConfig, UNetConfig

    if bottleneck not in ("auto", "zeroed", "passthrough"):
        raise ValueError(f"bottleneck must be auto|zeroed|passthrough, got {bottleneck!r}")
    n = pkg["n_bands"]
    processes = []
    unet_kwargs = None
    for i in range(n):
        ms = pkg[i]["model_state"]
        lstm_keys = [k for k in ms if "lstm" in k.lower() or "transformer" in k.lower()]
        if lstm_keys:
            raise NotImplementedError(
                "this MBD checkpoint has a recurrent/transformer bottleneck "
                f"core (keys like {lstm_keys[:3]}); converting it would "
                "silently drop those weights — file an issue / extend "
                "_convert_diffusion_unet"
            )
        unet_params, kw = _convert_diffusion_unet(ms)
        unet_kwargs = unet_kwargs or kw
        ps = pkg[i]["processor_state"]
        processor = {
            "counts": _to_np(ps["counts"]).reshape(-1),
            "sum_x": _to_np(ps["sum_x"]),
            "sum_x2": _to_np(ps["sum_x2"]),
            "sum_target_x2": _to_np(ps["sum_target_x2"]),
        }
        processes.append({"unet": unet_params, "processor": processor})

    sched_kwargs = {}
    cfg0 = pkg[0].get("cfg")
    if isinstance(cfg0, dict):
        sch = cfg0.get("schedule", {})
        for src, dst in (
            ("beta_t0", "beta_t0"), ("beta_t1", "beta_t1"),
            ("num_steps", "num_steps"), ("variance", "variance"),
            ("clip", "clip"), ("rescale", "rescale"),
            ("beta_exp", "beta_exp"), ("noise_scale", "noise_scale"),
        ):
            if src in sch:
                sched_kwargs[dst] = sch[src]

    proc_bands = processes[0]["processor"]["sum_x"].shape[0]
    schedule = ScheduleConfig(**sched_kwargs)
    # the default subsampled step list assumes num_steps=1000; rescale it to
    # the checkpoint's schedule so alpha_bars indexing stays in range
    n_steps = schedule.num_steps
    stride = max(1, n_steps // 20)
    step_list = tuple(range(n_steps - 1, 0, -stride)) + (0,)
    cfg = MBDConfig(
        sample_rate=pkg.get("sample_rate", 24_000),
        n_processes=n,
        unet=UNetConfig(
            **unet_kwargs,
            bottleneck="zeroed" if bottleneck == "auto" else bottleneck,
        ),
        schedule=schedule,
        processor_bands=proc_bands,
        step_list=step_list,
    )
    return {"processes": processes}, cfg


def load_mbd_pt(path: str, bottleneck: str = "auto"):
    """Load an audiocraft mbd_comp_*.pt checkpoint -> (params, MBDConfig)."""
    import torch

    pkg = torch.load(path, map_location="cpu", weights_only=False)
    return convert_mbd_checkpoint(pkg, bottleneck=bottleneck)

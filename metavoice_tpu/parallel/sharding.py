"""Parameter and activation sharding rules (Megatron-style TP + DP).

The layout follows the standard tensor-parallel transformer recipe expressed
as ``PartitionSpec`` annotations — XLA GSPMD inserts the all-reduces:

  * ``wqkv`` / ``w1`` / ``w3``: column-parallel — output features sharded on
    the tensor axis; each shard computes its own attention heads / FFN slice.
  * ``wo`` / ``w2``: row-parallel — input features sharded; the matmul's
    contraction produces partial sums that GSPMD reduces (psum over ICI).
  * Embeddings and lm heads shard the feature/vocab dim; norms replicate.
  * Activations shard batch over the data axis.

head-count constraint: n_head (16) and intermediate_size (5632 = 44*128)
divide cleanly over tensor axes of 2/4/8.
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from metavoice_tpu.core.config import TransformerConfig
from metavoice_tpu.parallel.mesh import DATA_AXIS, TENSOR_AXIS

Specs = dict[str, Any]


def param_specs(cfg: TransformerConfig) -> Specs:
    """PartitionSpec pytree matching models/transformer.init_params."""
    t = TENSOR_AXIS
    layer_specs = {
        "attn_norm_w": P(None, None),
        "wqkv": P(None, None, t),  # column parallel: heads split
        "wo": P(None, t, None),  # row parallel
        "ffn_norm_w": P(None, None),
    }
    if cfg.nonlinearity_type == "swiglu":
        layer_specs["w1"] = P(None, None, t)
        layer_specs["w3"] = P(None, None, t)
        layer_specs["w2"] = P(None, t, None)
    else:
        layer_specs["w_fc"] = P(None, None, t)
        layer_specs["w_proj"] = P(None, t, None)
        if cfg.bias:
            layer_specs["w_fc_b"] = P(None, t)
            layer_specs["w_proj_b"] = P(None, None)
    if cfg.bias:
        layer_specs["attn_norm_b"] = P(None, None)
        layer_specs["ffn_norm_b"] = P(None, None)
        layer_specs["wqkv_b"] = P(None, t)
        layer_specs["wo_b"] = P(None, None)

    specs: Specs = {
        "wtes": [P(None, t) for _ in cfg.vocab_sizes],
        "wpe": P(None, t),
        "layers": layer_specs,
        "ln_f_w": P(None),
    }
    if cfg.bias:
        specs["ln_f_b"] = P(None)
    if cfg.speaker_emb_dim:
        specs["speaker_cond"] = P(None, t)
    if cfg.target_vocab_sizes is not None:
        specs["lm_heads"] = [P(None, t) for _ in cfg.target_vocab_sizes]
    return specs


def shard_params(params: Any, cfg: TransformerConfig, mesh: Mesh) -> Any:
    """Place a param pytree onto the mesh with TP sharding."""
    specs = param_specs(cfg)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        params,
        specs,
        is_leaf=lambda x: not isinstance(x, (dict, list)),
    )


def batch_spec(rank: int) -> P:
    """Shard the leading batch axis over the data axis."""
    return P(DATA_AXIS, *([None] * (rank - 1)))


def kv_cache_spec() -> P:
    """KV cache (L, S, B, H, Dh): batch over data, heads over tensor."""
    return P(None, None, DATA_AXIS, TENSOR_AXIS, None)

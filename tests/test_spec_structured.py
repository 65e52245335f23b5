"""Structured-teacher speculative-decoding artifacts (utils/checkpoint.py).

The bench reconstructs the distillation teacher by grafting an int4-packed
delta of the trained last-K blocks onto its own quantized bench params
(bench.py spec section). That is only exact if per-layer int4 quantization
commutes with slicing the stacked layer axis — pinned here — and if the
delta survives its npz round trip bit-exactly.
"""

import jax
import jax.numpy as jnp
import numpy as np

from metavoice_tpu.core.config import first_stage_config
from metavoice_tpu.models import transformer as tfm
from metavoice_tpu.ops import quantized as qz
from metavoice_tpu.utils import checkpoint as ckpt

CFG = first_stage_config(
    n_layer=4, n_head=4, dim=256, block_size=64, intermediate_size=512
)
TAIL = 2


def _trees_equal(a, b):
    la = jax.tree.leaves(a)
    lb = jax.tree.leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def _modified(params):
    """A 'finetuned' variant: different last-TAIL blocks + final norm."""
    out = dict(params)
    out["layers"] = {
        k: v.at[-TAIL:].add(0.01 * (1 + jnp.arange(TAIL)).reshape((TAIL,) + (1,) * (v.ndim - 1)))
        for k, v in params["layers"].items()
    }
    out["ln_f_w"] = params["ln_f_w"] * 1.5
    return out


def test_quantize_commutes_with_layer_slicing():
    """quantize(full)[−K:] == the packed slices the delta format stores.

    quantize_params_int4_i32 groups along the input dim per (layer, group,
    out-channel) independently, so the packed representation of a layer does
    not depend on the other layers in the stack.
    """
    base = tfm.init_params(jax.random.PRNGKey(0), CFG, dtype=jnp.bfloat16)
    tuned = _modified(base)
    q_full = qz.quantize_params_int4_i32(tuned)
    # quantize only the trained tail, as the packaging script does
    tail_only = {
        "layers": {k: v[-TAIL:] for k, v in tuned["layers"].items()},
        "ln_f_w": tuned["ln_f_w"],
        "wtes": tuned["wtes"],
    }
    q_tail = qz.quantize_params_int4_i32(tail_only)
    for k, v in q_full["layers"].items():
        if isinstance(v, dict):
            np.testing.assert_array_equal(
                np.asarray(v["pw"][-TAIL:]), np.asarray(q_tail["layers"][k]["pw"])
            )
            np.testing.assert_array_equal(
                np.asarray(v["sc"][-TAIL:]), np.asarray(q_tail["layers"][k]["sc"])
            )
        else:
            np.testing.assert_array_equal(
                np.asarray(v[-TAIL:]), np.asarray(q_tail["layers"][k])
            )


def test_delta_round_trip_and_apply(tmp_path):
    """save -> load -> apply reproduces quantize(tuned) bit-exactly."""
    base = tfm.init_params(jax.random.PRNGKey(1), CFG, dtype=jnp.bfloat16)
    tuned = _modified(base)
    q_base = qz.quantize_params_int4_i32(base)
    q_tuned = qz.quantize_params_int4_i32(tuned)

    path = str(tmp_path / "delta.npz")
    ckpt.save_spec_teacher_delta(path, q_tuned, TAIL)
    delta, tail = ckpt.load_spec_teacher_delta(path)
    assert tail == TAIL

    grafted = ckpt.apply_spec_teacher_delta(q_base, delta, tail)
    _trees_equal(grafted["layers"], q_tuned["layers"])
    np.testing.assert_array_equal(
        np.asarray(grafted["ln_f_w"]), np.asarray(q_tuned["ln_f_w"])
    )
    # untouched leaves (embeddings, tied head) come from the base tree
    _trees_equal(grafted["wtes"], q_base["wtes"])


def test_grafted_forward_matches_tuned(tmp_path):
    """The grafted tree FORWARDS like the tuned tree (decode semantics)."""
    base = tfm.init_params(jax.random.PRNGKey(2), CFG, dtype=jnp.bfloat16)
    tuned = _modified(base)
    # the tied int4 head requires dim % 1024 == 0; at this tiny dim both
    # trees keep f32/bf16 wtes, so output_logits follows the same path
    q_tuned = qz.quantize_params_int4_i32(tuned)
    path = str(tmp_path / "delta.npz")
    ckpt.save_spec_teacher_delta(path, q_tuned, TAIL)
    delta, tail = ckpt.load_spec_teacher_delta(path)
    grafted = ckpt.apply_spec_teacher_delta(
        qz.quantize_params_int4_i32(base), delta, tail
    )
    idx = jnp.asarray([[1, 2, 3, 4]], jnp.int32)
    spk = jnp.zeros((1, CFG.speaker_emb_dim), jnp.bfloat16)

    def logits(p):
        x = tfm.embed_inputs(p, CFG, idx, jnp.arange(4), spk, None, jnp.bfloat16)
        am = tfm.causal_mask_for(jnp.arange(4), 4)[None, None]
        out, _ = tfm.apply_blocks(p, CFG, x, am, None, None)
        return np.asarray(tfm.output_logits(p, CFG, out)[0].astype(jnp.float32))

    np.testing.assert_array_equal(logits(grafted), logits(q_tuned))

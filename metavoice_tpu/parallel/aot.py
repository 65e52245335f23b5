"""Full-scale sharded AOT compilation evidence (no weights materialized).

Round-2's multi-chip claims rested on dim-64 toy tests. These helpers build
the REAL metavoice-1B first stage (24L/16H/2048d) as ABSTRACT
ShapeDtypeStructs carrying NamedShardings and run `jax.jit(...).lower(...)
.compile()` — full XLA+GSPMD compilation of the DP x TP programs with zero
parameter memory, so the 8-device virtual CPU mesh can prove the sharded
programs build. Used by tests/test_sharding.py and __graft_entry__.
dryrun_multichip (MULTICHIP_r{N}.json records the result).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from metavoice_tpu.core import sampling as S
from metavoice_tpu.core.config import TransformerConfig, first_stage_config
from metavoice_tpu.models import first_stage as fs
from metavoice_tpu.models import transformer as tfm
from metavoice_tpu.parallel import sharding as psh


def _abstract(tree, spec_tree, mesh):
    """ShapeDtypeStruct pytree with NamedShardings attached."""

    def one(sd, sp):
        return jax.ShapeDtypeStruct(sd.shape, sd.dtype, sharding=NamedSharding(mesh, sp))

    return jax.tree.map(
        one, tree, spec_tree, is_leaf=lambda x: isinstance(x, jax.ShapeDtypeStruct)
    )


def abstract_params(cfg: TransformerConfig, mesh: Mesh, dtype=jnp.bfloat16):
    shapes = jax.eval_shape(
        lambda k: tfm.init_params(k, cfg, dtype=dtype), jax.random.PRNGKey(0)
    )
    return _abstract(shapes, psh.param_specs(cfg), mesh)


def compile_sharded_decode_step(
    mesh: Mesh, cfg: TransformerConfig | None = None, batch_groups: int = 4
):
    """AOT-compile one REAL-scale decode step (embed + 24-layer cached
    blocks + lm head + CFG top-p sample) under DP x TP shardings.

    Returns the compiled executable (compilation is the assertion)."""
    cfg = cfg or first_stage_config()
    b = 2 * batch_groups  # CFG pairs
    mask = fs.make_spk_cond_mask(batch_groups, 2)

    def step(params, tok, k_cache, v_cache, spk, pos, key):
        x = tfm.embed_inputs(params, cfg, tok[:, None], pos[None], spk, mask, jnp.bfloat16)
        kv = tfm.KVCache(k=k_cache, v=v_cache)
        x, nkv = tfm.apply_blocks(params, cfg, x, None, kv, pos)
        logits = tfm.output_logits(params, cfg, x)[0][:, 0, :]
        nxt = S.sample_cfg(key, logits, 3.0, temperature=1.0, top_p=0.95)
        return nxt, nkv.k, nkv.v

    data = psh.batch_spec(1)
    cache_spec = psh.kv_cache_spec()
    abs_params = abstract_params(cfg, mesh)
    dh = cfg.head_dim
    cshape = (cfg.n_layer, cfg.block_size, b, cfg.n_head, dh)
    args = (
        abs_params,
        jax.ShapeDtypeStruct((b,), jnp.int32, sharding=NamedSharding(mesh, data)),
        jax.ShapeDtypeStruct(cshape, jnp.bfloat16, sharding=NamedSharding(mesh, cache_spec)),
        jax.ShapeDtypeStruct(cshape, jnp.bfloat16, sharding=NamedSharding(mesh, cache_spec)),
        jax.ShapeDtypeStruct(
            (b, cfg.speaker_emb_dim), jnp.float32,
            sharding=NamedSharding(mesh, psh.batch_spec(2)),
        ),
        jax.ShapeDtypeStruct((), jnp.int32, sharding=NamedSharding(mesh, P())),
        jax.ShapeDtypeStruct((2,), jnp.uint32, sharding=NamedSharding(mesh, P())),
    )
    return jax.jit(step).lower(*args).compile()


def compile_sharded_train_step(
    mesh: Mesh, cfg: TransformerConfig | None = None, batch: int = 4, seq: int = 2048
):
    """AOT-compile the REAL-scale finetune train step under DP x TP.

    Builds abstract TrainState (params + Adam moments share the param
    shardings; scalars replicate) and compiles make_train_step's function.
    """
    from metavoice_tpu.training import finetune as ft

    cfg = cfg or first_stage_config()
    ft_cfg = ft.FinetuneConfig(batch_size=batch, max_iters=1)
    abs_params = abstract_params(cfg, mesh)
    # Adam mu/nu mirror the param tree leaf-for-leaf; map their specs by
    # TREE-PATH SUFFIX + shape (a pure shape lookup silently mislabels two
    # same-shaped params with different specs, e.g. a future square
    # projection that is row- vs column-parallel)
    from jax.tree_util import tree_flatten_with_path, tree_map_with_path

    param_paths = tree_flatten_with_path(abs_params)[0]
    spec_leaves = jax.tree.leaves(
        jax.tree.map(
            lambda sd, sp: (sp,), abs_params, psh.param_specs(cfg),
            is_leaf=lambda x: isinstance(x, jax.ShapeDtypeStruct),
        ),
        is_leaf=lambda x: isinstance(x, tuple) and len(x) == 1,
    )
    spec_by_suffix: dict = {}
    suffix_lens = set()
    for (path, sd), (sp,) in zip(param_paths, spec_leaves):
        spec_by_suffix[(tuple(path), sd.shape)] = sp
        suffix_lens.add(len(path))
    opt = ft.make_optimizer(ft_cfg, abs_params)
    state_shapes = jax.eval_shape(
        lambda p: ft.TrainState(
            params=p, opt_state=opt.init(p), step=jnp.zeros((), jnp.int32)
        ),
        abs_params,
    )

    def attach(path, sd):
        for n in sorted(suffix_lens, reverse=True):
            sp = spec_by_suffix.get((tuple(path[-n:]), sd.shape))
            if sp is not None:
                break
        else:
            sp = P()
        if sp is None:
            sp = P()
        return jax.ShapeDtypeStruct(sd.shape, sd.dtype, sharding=NamedSharding(mesh, sp))

    abs_state = tree_map_with_path(attach, state_shapes)
    step_fn = ft.make_train_step(cfg, ft_cfg, opt)
    data2 = NamedSharding(mesh, psh.batch_spec(2))
    abs_batch = {
        "x": jax.ShapeDtypeStruct((batch, seq), jnp.int32, sharding=data2),
        "y": jax.ShapeDtypeStruct((batch, seq), jnp.int32, sharding=data2),
        "spk_emb": jax.ShapeDtypeStruct(
            (batch, cfg.speaker_emb_dim), jnp.float32, sharding=data2
        ),
    }
    # make_train_step already returns a jitted callable -> lower directly
    return step_fn.lower(abs_state, abs_batch).compile()

"""Package a distilled draft as the bench's speculative-decoding checkpoint.

Takes the raw draft weights written by scripts/distill_draft.py (its flat
.npz format), quantizes them int4-in-int32 (the chip-measured fastest draft
configuration — the draft's decode steps then ride the whole-stack
megakernel, scripts/diag_spec_cost.py), and writes a first-stage serving
checkpoint (utils/checkpoint.save_first_stage_quantized, mode "int4") at
checkpoints/bench_draft_int4.npz — the path bench.py and
TTS.from_checkpoints(draft_checkpoint=...) load.

Runs on CPU; launch with PALLAS_AXON_POOL_IPS stripped if another process
holds the axon session (CLAUDE.md tunnel facts).

Usage: python scripts/make_bench_draft.py [--draft /tmp/mv_draft.npz]
           [--layers 4 --dim 1024 --heads 8] [--out checkpoints/bench_draft_int4.npz]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

from metavoice_tpu.core.config import first_stage_config
from metavoice_tpu.ops import quantized as qz
from metavoice_tpu.utils import checkpoint as ck

from distill_draft import flat_load  # noqa: E402  (same directory)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--draft", default="/tmp/mv_draft.npz")
    ap.add_argument("--layers", type=int, default=4)
    ap.add_argument("--dim", type=int, default=1024)
    ap.add_argument("--heads", type=int, default=8)
    ap.add_argument(
        "--out",
        default=os.path.join(
            os.path.dirname(os.path.abspath(__file__)),
            "..", "checkpoints", "bench_draft_int4.npz",
        ),
    )
    args = ap.parse_args()

    cfg_d = first_stage_config(n_layer=args.layers, n_head=args.heads, dim=args.dim)
    params = flat_load(args.draft)
    params = jax.tree.map(lambda x: jnp.asarray(x, jnp.bfloat16), params)
    dq = qz.quantize_params_int4_i32(params)

    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    ck.save_first_stage_quantized(args.out, dq, cfg_d, None, "int4")
    print(f"wrote {args.out}", file=sys.stderr)

    # round-trip sanity: the loader must reproduce the tree + config
    p2, cfg2, _, mode = ck.load_first_stage_npz(args.out)
    assert mode == "int4", mode
    assert cfg2.n_layer == cfg_d.n_layer and cfg2.dim == cfg_d.dim
    s1 = jax.tree.structure(dq)
    s2 = jax.tree.structure(
        jax.tree.map(jnp.asarray, p2, is_leaf=lambda x: not isinstance(x, (dict, list)))
    )
    assert s1 == s2, f"tree mismatch:\n{s1}\n{s2}"
    print("round-trip ok", file=sys.stderr)


if __name__ == "__main__":
    main()

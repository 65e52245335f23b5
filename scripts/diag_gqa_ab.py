"""GQA vs MHA batch-8 aggregate decode A/B on chip (VERDICT r4 #2).

Interleaved arms on the same process/session: the 1.24B MHA model
(/tmp/mv_int4_params.npz) vs its GQA variant (n_local_heads=2, i.e. 8x
fewer KV heads — cache bytes and attention DMA shrink 8x). Measured at a
shallow window (weight-stream-dominated) and a deep one (attention-DMA-
dominated, where docs/PERFORMANCE.md places the batch-8 HBM roof).

Usage: python scripts/diag_gqa_ab.py [h_kv]   (default 2)
Writes/reuses /tmp/mv_int4_gqa{h_kv}_params.npz.
"""
import os, sys, time
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/mvtpu_jax"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np
import ml_dtypes
from metavoice_tpu.core.config import first_stage_config
from metavoice_tpu.models import transformer as tfm
from metavoice_tpu.models import first_stage as fs
from metavoice_tpu.ops import quantized as qz


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def load_or_build(path, cfg, seed=0):
    if os.path.exists(path):
        log(f"loading {path} ...")
        data = np.load(path)
        params = {}
        for k in data.files:
            a = data[k]
            if a.dtype == np.uint16:
                a = a.view(ml_dtypes.bfloat16)
            parts = k.split("/")
            d = params
            for p in parts[:-1]:
                d = d.setdefault(p, {})
            d[parts[-1]] = jnp.asarray(a)
        return params
    log(f"init + quantize {path} (cold) ...")
    params = qz.quantize_params_int4_i32(
        tfm.init_params(jax.random.PRNGKey(seed), cfg, dtype=jnp.bfloat16)
    )
    flat = {}

    def rec(d, pre):
        for k, v in d.items():
            if isinstance(v, dict):
                rec(v, pre + k + "/")
            elif isinstance(v, (list, tuple)):
                for i, x in enumerate(v):
                    flat[pre + k + f"/{i}"] = np.asarray(x)
            else:
                flat[pre + k] = np.asarray(v)

    rec(params, "")
    out = {}
    for k, a in flat.items():
        if a.dtype.name == "bfloat16":
            a = np.asarray(a).view(np.uint16)
        out[k] = a
    np.savez(path, **out)
    return params


class Arm:
    def __init__(self, name, cfg, params):
        self.name, self.cfg = name, cfg
        if isinstance(params.get("wtes"), dict):
            params["wtes"] = [params["wtes"][str(i)] for i in range(len(params["wtes"]))]
        self.params = params
        b = 8
        key = jax.random.PRNGKey(0)
        prompts = [
            list(np.random.default_rng(i).integers(2049, cfg.vocab_size, size=40 + 7 * i))
            for i in range(b)
        ]
        self.spk = jax.random.normal(key, (b, cfg.speaker_emb_dim), jnp.bfloat16)
        padded, pads = fs.left_pad_prompts(prompts, bucket=128)
        self.pads = jnp.asarray(pads)
        kv = tfm.KVCache.create(cfg, 2 * b, cfg.block_size, dtype=jnp.bfloat16)
        self.sargs = tuple(jnp.asarray(v, jnp.float32) for v in (1.0, 0.95, 3.0))
        self.first, self.kv = fs.prefill_batch(
            self.params, cfg, jnp.asarray(padded), self.pads, self.spk, kv,
            key, *self.sargs,
        )
        np.asarray(self.first)
        log(f"{name}: prefill done (cache {kv.k.shape})")
        self.b = b

    def run(self, n, pos):
        buf, lens, self.kv = fs.decode_batch(
            self.params, self.cfg, self.first, jnp.asarray(pos, jnp.int32),
            self.pads, self.spk, self.kv, jax.random.PRNGKey(9), *self.sargs,
            jnp.asarray(n, jnp.int32), self.cfg.block_size, 10**6, jnp.bfloat16,
        )
        np.asarray(lens)

    def window(self, pos, warm=8, meas=96):
        t0 = time.perf_counter(); self.run(warm, pos); ta = time.perf_counter() - t0
        t0 = time.perf_counter(); self.run(warm + meas, pos + warm); tb = time.perf_counter() - t0
        return self.b * meas / (tb - ta)


def main():
    h_kv = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    cfg_m = first_stage_config()
    cfg_g = first_stage_config(n_local_heads=h_kv)
    log(f"devices: {jax.devices()}")
    mha = Arm("MHA16", cfg_m, load_or_build("/tmp/mv_int4_params.npz", cfg_m))
    gqa = Arm(f"GQA{h_kv}", cfg_g, load_or_build(
        f"/tmp/mv_int4_gqa{h_kv}_params.npz", cfg_g))
    # compile both decode programs
    mha.run(4, 128)
    gqa.run(4, 128)
    results = {}
    for label, start in (("shallow", 132), ("deep", 1200)):
        for it in range(3):
            for arm in (mha, gqa):
                pos = start + it * 112
                if pos + 112 > arm.cfg.block_size:
                    continue
                agg = arm.window(pos)
                results.setdefault((arm.name, label), []).append(agg)
                log(f"{label} iter {it} {arm.name} @pos {pos}: {agg:.0f} agg tok/s")
    for (name, label), vals in results.items():
        log(f"BEST {name} {label}: {max(vals):.0f} agg tok/s (all {[f'{v:.0f}' for v in vals]})")


if __name__ == "__main__":
    main()

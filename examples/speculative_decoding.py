"""Speculative decoding walkthrough (models/spec_decode.py).

A small draft model proposes ``gamma`` tokens per round; the first stage
verifies them in ONE multi-token forward and accepts a prefix whose
distribution exactly matches ordinary sampling. This demo runs on random
weights (CPU-friendly), so the draft is the target itself — acceptance is
100% and the emitted audio is bit-identical to the non-speculative path —
plus an uncorrelated small draft to show the stats ledger under rejection.

With real checkpoints, pass a trained draft instead:

    python -m metavoice_tpu.cli synth \
        --first_stage_path first.pt --second_stage_path second.pt \
        --speaker_encoder_path spk.pt \
        --draft_checkpoint draft.npz --speculative_gamma 4 \
        --text "..." --spk_cond_path ref.wav

A draft is just a small first-stage-format checkpoint: train one from
scratch with the finetune trainer (last_n_blocks_to_finetune=-1) on the
same data — tests/test_trained_system_e2e.py does exactly that and
measures the acceptance rate. On a v5e the measured break-even per-token
acceptance is ~0.75 at gamma=4 (docs/PERFORMANCE.md "Speculative
decoding").

Usage:  python examples/speculative_decoding.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import numpy as np

from metavoice_tpu.core.config import first_stage_config
from metavoice_tpu.models import transformer as tfm
from metavoice_tpu.runtime.tts import TTS
from metavoice_tpu.utils import audio_io as aio


def main():
    out = "outputs"
    ref = os.path.join(out, "spec_demo_ref.wav")
    os.makedirs(out, exist_ok=True)
    sr = 16000
    t = np.arange(31 * sr) / sr
    aio.write_wav(ref, (0.25 * np.sin(2 * np.pi * 180 * t)).astype(np.float32), sr)

    base = TTS.from_random(jax.random.PRNGKey(5), small=True, output_dir=out)

    # --- self-draft: acceptance must be 100%, audio identical ----------------
    spec = TTS(
        base.c,
        output_dir=out,
        enforce_min_ref_duration=False,
        enforce_min_output_duration=False,
        draft_params=base.c.first_stage_params,
        draft_cfg=base.c.first_stage_cfg,
        speculative_gamma=4,
    )
    kw = dict(temperature=1e-6, top_p=1.0, max_new_tokens=48)
    p_plain = base.synthesise("Speculation does not change the audio.", ref, **kw)
    p_spec = spec.synthesise("Speculation does not change the audio.", ref, **kw)
    w1, _ = aio.read_wav(p_plain)
    w2, _ = aio.read_wav(p_spec)
    st = spec.spec_stats
    print(f"self-draft: audio identical = {np.array_equal(w1, w2)}; "
          f"acceptance {st['accepted']}/{st['proposed']}, "
          f"yield {st['emitted']}/{st['rounds']} tokens/target-forward")

    # --- uncorrelated small draft: the stats ledger under rejection ----------
    draft_cfg = first_stage_config(
        n_layer=1, n_head=2, dim=64,
        block_size=base.c.first_stage_cfg.block_size,
    )
    spec2 = TTS(
        base.c,
        output_dir=out,
        enforce_min_ref_duration=False,
        enforce_min_output_duration=False,
        draft_params=tfm.init_params(jax.random.PRNGKey(9), draft_cfg),
        draft_cfg=draft_cfg,
        speculative_gamma=4,
    )
    spec2.synthesise("A random draft is mostly rejected.", ref, max_new_tokens=48)
    st2 = spec2.spec_stats
    rate = st2["accepted"] / max(st2["proposed"], 1)
    print(f"random draft: acceptance {st2['accepted']}/{st2['proposed']} "
          f"({rate:.0%}); every round still emits >=1 target-distribution token "
          f"({st2['emitted']} tokens in {st2['rounds']} rounds)")


if __name__ == "__main__":
    main()

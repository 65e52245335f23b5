"""metavoice_tpu — a TPU-native (JAX/XLA/Pallas/pjit) text-to-speech framework.

A ground-up rebuild of the capabilities of MetaVoice-1B (reference:
metavoiceio/metavoice-src): a two-stage TTS system with zero-shot voice
cloning from ~30s of reference audio, emotional speech, and finetuning.

Pipeline (reference README.md:159-166):
  1. Speaker encoder (LSTM) -> 256-d speaker embedding
  2. First-stage 1.2B causal transformer: BPE text + speaker embedding ->
     first two EnCodec RVQ hierarchies (flattened-interleaved), with
     classifier-free guidance on the speaker condition
  3. Second-stage non-causal transformer: 2 coarse hierarchies -> remaining
     6 EnCodec hierarchies, all timesteps in parallel
  4. Multi-band diffusion vocoder: 8 codebooks -> 24 kHz waveform
  5. DeepFilterNet-style enhancer: artifact cleanup

TPU-first design decisions (not a port):
  * One functional transformer core with stacked-layer ``lax.scan`` serves
    both training and inference, replacing the reference's duplicated
    model.py / fast_model.py pair.
  * The autoregressive decode loop is a single ``jax.lax.while_loop`` with a
    static KV cache in carry and on-device CFG + top-p sampling — no
    per-token host<->device sync (the reference syncs every token at
    fam/llm/fast_inference_utils.py:161).
  * Sharding via ``jax.sharding.Mesh`` + NamedSharding; XLA emits the
    collectives. Pallas kernels for fused decode attention and int4/int8
    weight-only matmuls.
"""

__version__ = "0.1.0"

from metavoice_tpu.core import tokens  # noqa: F401


def __getattr__(name):
    # lazy top-level conveniences: `from metavoice_tpu import TTS` without
    # paying the full model-stack import cost for token-math-only users
    if name == "TTS":
        from metavoice_tpu.runtime.tts import TTS

        return TTS
    if name == "BatchingEngine":
        from metavoice_tpu.runtime.engine import BatchingEngine

        return BatchingEngine
    if name == "ContinuousBatchingEngine":
        from metavoice_tpu.runtime.engine import ContinuousBatchingEngine

        return ContinuousBatchingEngine
    if name == "TrainedBPETokeniser":
        from metavoice_tpu.tokenizer import TrainedBPETokeniser

        return TrainedBPETokeniser
    if name == "ReplicaPool":
        from metavoice_tpu.runtime.replicas import ReplicaPool

        return ReplicaPool
    raise AttributeError(f"module 'metavoice_tpu' has no attribute {name!r}")

"""Continuous-batching engine: concurrent requests share batched decodes."""

import os
import threading

import jax
import numpy as np
import pytest

from metavoice_tpu.runtime.engine import BatchingEngine
from metavoice_tpu.runtime.tts import TTS
from metavoice_tpu.utils import audio_io as aio


@pytest.fixture(scope="module")
def ref_wav(tmp_path_factory):
    sr = 16000
    t = np.arange(31 * sr) / sr
    wav = (0.3 * np.sin(2 * np.pi * 200 * t)).astype(np.float32)
    path = str(tmp_path_factory.mktemp("refs") / "ref.wav")
    aio.write_wav(path, wav, sr)
    return path


@pytest.fixture(scope="module")
def engine(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("outputs"))
    tts = TTS.from_random(jax.random.PRNGKey(0), small=True, output_dir=out)
    eng = BatchingEngine(tts, max_batch=4, batch_window_s=0.2)
    yield eng
    eng.shutdown()


def test_concurrent_requests_complete(engine, ref_wav):
    texts = [f"Concurrent request number {i}." for i in range(4)]
    futures = [engine.submit(t, ref_wav) for t in texts]
    paths = [f.result(timeout=600) for f in futures]
    assert len(set(paths)) == 4
    for p in paths:
        assert os.path.exists(p)
        wav, sr = aio.read_wav(p)
        assert len(wav) > 0 and np.isfinite(wav).all()


def test_single_request(engine, ref_wav):
    fut = engine.submit("Just one.", ref_wav)
    path = fut.result(timeout=600)
    assert os.path.exists(path)


def test_error_propagates_to_future(engine, ref_wav):
    with pytest.raises(ValueError):
        engine.submit("日本語テキスト", ref_wav).result(timeout=10)


def test_mixed_sampling_params_in_one_batch(engine, ref_wav):
    """Per-request temperature/top_p/guidance ride the same compiled batch
    as traced (B, 1) vectors — both requests must complete."""
    f1 = engine.submit("Mixed settings one.", ref_wav, temperature=0.7, top_p=0.9, guidance_scale=2.0)
    f2 = engine.submit("Mixed settings two.", ref_wav, temperature=1.3, top_p=0.99, guidance_scale=4.0)
    p1, p2 = f1.result(timeout=600), f2.result(timeout=600)
    assert os.path.exists(p1) and os.path.exists(p2) and p1 != p2


# ---------------------------------------------------------------------------
# Continuous batching (round-3 rebuild): mid-flight joins + streaming
# ---------------------------------------------------------------------------

from metavoice_tpu.core import tokens as T
from metavoice_tpu.core.config import first_stage_config
from metavoice_tpu.models import first_stage as fs
from metavoice_tpu.models import transformer as tfm
import jax.numpy as jnp


def test_midflight_join_matches_fresh_decode():
    """A request joined at physical offset P decodes the SAME tokens as a
    fresh decode (greedy sampling): merge_slot_cache + per-row pad/logical
    positions make the physical offset invisible to the model."""
    cfg = first_stage_config(
        n_layer=2, n_head=4, dim=128, block_size=256, vocab_sizes=(97,),
        intermediate_size=256,
    )
    params = tfm.init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    spkA = jax.random.normal(jax.random.PRNGKey(1), (cfg.speaker_emb_dim,))
    spkB = jax.random.normal(jax.random.PRNGKey(2), (cfg.speaker_emb_dim,))
    promptA = [90, 91, 92, 93]
    promptB = [94, 95, 96, 90, 91]
    N = 24
    EOA = 10**6  # never sampled: fixed-length decode
    greedy = dict(temperature=0.01, top_p=0.01)  # argmax -> key-independent

    # --- fresh decode of B alone -------------------------------------------
    solo = fs.generate_batch(
        params, cfg, [promptB], jnp.asarray(spkB)[None], key=jax.random.PRNGKey(5),
        max_new_tokens=N, end_of_audio_token=EOA, prompt_pad_multiple=16,
        compute_dtype=jnp.float32, **greedy,
    )[0]

    # --- group: A starts, decodes 16 steps, then B joins -------------------
    slots = 2
    kv = tfm.KVCache.create(cfg, 2 * slots, cfg.block_size, dtype=jnp.float32)
    pm = 16
    prompts = [promptA, [0]]
    padded, pads = fs.left_pad_prompts(prompts, pm)
    t1 = jnp.full((slots, 1), 0.01, jnp.float32)
    tp = jnp.full((slots, 1), 0.01, jnp.float32)
    g = jnp.full((slots, 1), 3.0, jnp.float32)
    spk = jnp.stack([jnp.asarray(spkA), jnp.zeros_like(jnp.asarray(spkA))])
    first, kv = fs.prefill_batch(
        params, cfg, jnp.asarray(padded), jnp.asarray(pads), spk, kv,
        jax.random.PRNGKey(6), t1, tp, g, compute_dtype=jnp.float32,
    )
    # slot 1 has no request yet: give it a real token and ignore its output
    # (it decodes junk harmlessly until B joins and overwrites it)
    cur = np.asarray([int(np.asarray(first)[0]), 0], np.int32)
    pos = pm
    buf, lens, kv = fs.decode_batch(
        params, cfg, jnp.asarray(cur), jnp.asarray(pos, jnp.int32),
        jnp.asarray(pads), spk, kv, jax.random.PRNGKey(7), t1, tp, g,
        jnp.asarray(16, jnp.int32), 16, EOA, jnp.float32,
    )
    pos += 16

    # --- join B at physical position pos -----------------------------------
    bucket = 16
    temp = tfm.KVCache.create(cfg, 2, bucket, dtype=jnp.float32)
    pb, pbl = fs.left_pad_prompts([promptB], bucket)
    firstB, temp = fs.prefill_batch(
        params, cfg, jnp.asarray(pb), jnp.asarray(pbl),
        jnp.asarray(spkB)[None], temp, jax.random.PRNGKey(8),
        t1[:1], tp[:1], g[:1], compute_dtype=jnp.float32,
    )
    k, v = fs.merge_slot_cache(
        kv.k, kv.v, temp.k, temp.v,
        jnp.asarray(pos - bucket, jnp.int32),
        jnp.asarray(1, jnp.int32), jnp.asarray(slots + 1, jnp.int32),
    )
    kv = tfm.KVCache(k=k, v=v)
    spk = spk.at[1].set(jnp.asarray(spkB))
    pads = np.asarray(pads).copy()
    pads[1] = pos - len(promptB)
    cur = np.asarray([int(np.asarray(buf)[0, -1]), int(np.asarray(firstB)[0])], np.int32)

    # --- decode the group; slot 1 must reproduce the solo tokens -----------
    joined = [int(np.asarray(firstB)[0])]
    for _ in range(3):
        buf, lens, kv = fs.decode_batch(
            params, cfg, jnp.asarray(cur), jnp.asarray(pos, jnp.int32),
            jnp.asarray(pads), spk, kv, jax.random.PRNGKey(9), t1, tp, g,
            jnp.asarray(8, jnp.int32), 8, EOA, jnp.float32,
        )
        b = np.asarray(buf)
        joined.extend(int(x) for x in b[1, : int(np.asarray(lens)[1])])
        cur = np.asarray([b[0, -1], b[1, -1]], np.int32)
        pos += 8

    np.testing.assert_array_equal(
        np.asarray(joined[:N], np.int32), np.asarray(solo[:N], np.int32)
    )


def test_staggered_arrival_streams_before_earlier_finishes(tmp_path, ref_wav, monkeypatch):
    """VERDICT r2 'done' criterion: a request submitted mid-decode produces
    first audio BEFORE the earlier request finishes (no head-of-line block)."""
    from metavoice_tpu.runtime.engine import ContinuousBatchingEngine

    # make decodes effectively endless so 'A still running' is guaranteed
    monkeypatch.setattr(T, "END_OF_AUDIO_TOKEN", 10**6)
    tts = TTS.from_random(jax.random.PRNGKey(3), small=True, output_dir=str(tmp_path))
    # This test pins a SCHEDULING property (B gets audio mid-flight), so make
    # renders content-independent: random weights occasionally sample a
    # single-hierarchy token stream for B (no complete audio frame -> every
    # render legitimately raises), which would fail the test on content, not
    # scheduling. Real renders are covered by test_streaming_rides_the_batcher.
    monkeypatch.setattr(
        type(tts),
        "_tokens_to_wav",
        lambda self, text, prompt, toks, *a, **kw: np.zeros(
            max(1, len(toks)) * 160, np.float32
        ),
    )
    eng = ContinuousBatchingEngine(tts, slots=2, segment_tokens=8)
    try:
        hA = eng.submit("First long request.", ref_wav, stream=True)
        segA = hA._q.get(timeout=300)
        assert isinstance(segA, np.ndarray)  # A is mid-decode, audio flowing
        hB = eng.submit("Second joins mid flight.", ref_wav, stream=True)
        segB = hB._q.get(timeout=300)
        assert isinstance(segB, np.ndarray) and len(segB) > 0  # B spoke...
        nxtA = hA._q.get(timeout=300)
        assert isinstance(nxtA, np.ndarray)  # ...while A was still decoding
    finally:
        eng.shutdown()


def test_streaming_rides_the_batcher(engine, ref_wav):
    """submit(stream=True) yields wav segments through the shared batch."""
    handle = engine.submit("Streaming through the batch engine.", ref_wav, stream=True)
    segs = list(handle)
    assert segs, "no segments yielded"
    assert all(isinstance(s, np.ndarray) and s.dtype == np.float32 for s in segs)
    assert sum(len(s) for s in segs) > 0


def test_deferred_requests_complete_without_new_submits(tmp_path, ref_wav):
    """Review findings r3: requests beyond the slot count are deferred (not
    dropped) and the worker starts them when the group drains — without
    waiting for an unrelated submit to wake it."""
    from metavoice_tpu.runtime.engine import ContinuousBatchingEngine

    tts = TTS.from_random(jax.random.PRNGKey(5), small=True, output_dir=str(tmp_path))
    eng = ContinuousBatchingEngine(tts, slots=1, segment_tokens=8)
    try:
        fa = eng.submit("First occupies the only slot.", ref_wav)
        fb = eng.submit("Second must wait then run.", ref_wav)
        fc = eng.submit("Third in line.", ref_wav)
        for f in (fa, fb, fc):
            assert os.path.exists(f.result(timeout=600))
    finally:
        eng.shutdown()


# ---------------------------------------------------------------------------
# Group rebase (sustained-load budget reclamation)
# ---------------------------------------------------------------------------


def test_shift_cache_left_unit():
    """shift_cache_left slides the valid prefix exactly (numpy oracle)."""
    rng = np.random.default_rng(0)
    k = jnp.asarray(rng.normal(size=(2, 256, 3, 2, 4)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(2, 256, 3, 2, 4)).astype(np.float32))
    kn, vn = np.asarray(k).copy(), np.asarray(v).copy()
    s = 128  # aligned shift (fs.REBASE_ALIGN)
    ks, vs = fs.shift_cache_left(k, v, jnp.asarray(s, jnp.int32))
    np.testing.assert_array_equal(np.asarray(ks)[:, : 256 - s], kn[:, s:])
    np.testing.assert_array_equal(np.asarray(vs)[:, : 256 - s], vn[:, s:])


def test_shift_cache_left_unaligned_block():
    """Toy block sizes that aren't chunk multiples take the roll path and
    stay exact for arbitrary shifts."""
    rng = np.random.default_rng(1)
    k = jnp.asarray(rng.normal(size=(1, 96, 2, 2, 4)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(1, 96, 2, 2, 4)).astype(np.float32))
    kn = np.asarray(k).copy()
    ks, _ = fs.shift_cache_left(k, v, jnp.asarray(37, jnp.int32))
    np.testing.assert_array_equal(np.asarray(ks)[:, : 96 - 37], kn[:, 37:])


def test_rebase_matches_unrebased_decode():
    """A group rebased by an aligned shift decodes the SAME tokens as the
    unrebased group: window contents and logical positions (pos - pad) are
    invariant under the shift, so the physical origin is invisible."""
    cfg = first_stage_config(
        n_layer=2, n_head=4, dim=128, block_size=512, vocab_sizes=(97,),
        intermediate_size=256,
    )
    params = tfm.init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    spkA = jax.random.normal(jax.random.PRNGKey(1), (cfg.speaker_emb_dim,))
    spkB = jax.random.normal(jax.random.PRNGKey(2), (cfg.speaker_emb_dim,))
    promptA = [90, 91, 92, 93]
    promptB = [94, 95, 96, 90, 91]
    EOA = 10**6
    slots = 2
    pm = 128
    greedy_t = jnp.full((slots, 1), 0.01, jnp.float32)
    greedy_p = jnp.full((slots, 1), 0.01, jnp.float32)
    g = jnp.full((slots, 1), 3.0, jnp.float32)

    # group start: A in slot 0 at bucket 128
    kv = tfm.KVCache.create(cfg, 2 * slots, cfg.block_size, dtype=jnp.float32)
    padded, pads = fs.left_pad_prompts([promptA, [0]], pm)
    spk = jnp.stack([jnp.asarray(spkA), jnp.zeros_like(jnp.asarray(spkA))])
    first, kv = fs.prefill_batch(
        params, cfg, jnp.asarray(padded), jnp.asarray(pads), spk, kv,
        jax.random.PRNGKey(6), greedy_t, greedy_p, g, compute_dtype=jnp.float32,
    )
    cur = np.asarray([int(np.asarray(first)[0]), 0], np.int32)
    pos = pm
    buf, lens, kv = fs.decode_batch(
        params, cfg, jnp.asarray(cur), jnp.asarray(pos, jnp.int32),
        jnp.asarray(pads), spk, kv, jax.random.PRNGKey(7), greedy_t, greedy_p,
        g, jnp.asarray(32, jnp.int32), 32, EOA, jnp.float32,
    )
    pos += 32  # pos = 160

    # B joins at physical position 160 (bucket 128 -> rows land [32, 160))
    bucket = 128
    temp = tfm.KVCache.create(cfg, 2, bucket, dtype=jnp.float32)
    pb, pbl = fs.left_pad_prompts([promptB], bucket)
    firstB, temp = fs.prefill_batch(
        params, cfg, jnp.asarray(pb), jnp.asarray(pbl),
        jnp.asarray(spkB)[None], temp, jax.random.PRNGKey(8),
        greedy_t[:1], greedy_p[:1], g[:1], compute_dtype=jnp.float32,
    )
    k, v = fs.merge_slot_cache(
        kv.k, kv.v, temp.k, temp.v, jnp.asarray(pos - bucket, jnp.int32),
        jnp.asarray(1, jnp.int32), jnp.asarray(slots + 1, jnp.int32),
    )
    pads = np.asarray(pads).copy()
    pads[1] = pos - len(promptB)  # 155
    spk = spk.at[1].set(jnp.asarray(spkB))
    # slot A retires: freeze its row (its cache reads become irrelevant)
    cur = np.asarray([EOA, int(np.asarray(firstB)[0])], np.int32)

    # snapshot for the two branches (decode/shift donate their caches)
    kh, vh = np.asarray(k), np.asarray(v)

    def continue_decode(kv, pos, pads, steps=32):
        toks = []
        c = cur.copy()
        for _ in range(2):
            buf, lens, kv = fs.decode_batch(
                params, cfg, jnp.asarray(c), jnp.asarray(pos, jnp.int32),
                jnp.asarray(pads, jnp.int32), spk, kv, jax.random.PRNGKey(9),
                greedy_t, greedy_p, g,
                jnp.asarray(steps // 2, jnp.int32), steps // 2, EOA, jnp.float32,
            )
            b = np.asarray(buf)
            toks.extend(int(x) for x in b[1, : int(np.asarray(lens)[1])])
            c = np.asarray([EOA, b[1, -1]], np.int32)
            pos += steps // 2
        return toks

    kv1 = tfm.KVCache(k=jnp.asarray(kh), v=jnp.asarray(vh))
    toks_plain = continue_decode(kv1, pos, pads)

    s = 128  # aligned, <= min active pad (155)
    k2, v2 = fs.shift_cache_left(
        jnp.asarray(kh), jnp.asarray(vh), jnp.asarray(s, jnp.int32)
    )
    kv2 = tfm.KVCache(k=k2, v=v2)
    toks_rebased = continue_decode(kv2, pos - s, pads - s)

    assert toks_plain == toks_rebased


def test_engine_rebase_under_sustained_load(tmp_path, ref_wav, monkeypatch):
    """Sustained submissions against a small block: the engine rebases the
    shared timeline instead of truncating late joiners; every request
    completes and no truncation is recorded."""
    from metavoice_tpu.runtime.engine import ContinuousBatchingEngine

    monkeypatch.setattr(T, "END_OF_AUDIO_TOKEN", 10**6)  # run to max_new_tokens
    tts = TTS.from_random(jax.random.PRNGKey(7), small=True, output_dir=str(tmp_path))
    eng = ContinuousBatchingEngine(
        tts, slots=2, segment_tokens=16, rebase_margin=448
    )
    try:
        # uneven durations: slots retire at different segments, so joiners
        # keep pushing the shared timeline forward instead of the group
        # draining in lockstep (which would reset pos to 0 without a rebase)
        futs = [
            eng.submit(
                f"Sustained load {i}.", ref_wav,
                max_new_tokens=32 + (i % 4) * 24,
            )
            for i in range(10)
        ]
        for f in futs:
            assert os.path.exists(f.result(timeout=900))
        assert eng.stats["rebases"] >= 1, eng.stats
        assert eng.stats["truncations"] == 0, eng.stats
    finally:
        eng.shutdown()


def test_stream_renders_do_not_block_decode(tmp_path, ref_wav, monkeypatch):
    """Round-4 orchestration fix: stream segment renders run ASYNC on the
    render pool (chained per request), so a slow render must not stall the
    worker's decode loop. With a render that sleeps 0.5 s, the engine must
    keep decoding (token count grows) while the first render is in flight —
    the round-3 design rendered inside the worker loop, which serialized
    every stream render against every decode segment (p50 16.8 s vs 4.2 s
    on the mixed Poisson workload)."""
    import time as _time

    from metavoice_tpu.runtime.engine import ContinuousBatchingEngine

    monkeypatch.setattr(T, "END_OF_AUDIO_TOKEN", 10**6)  # endless decode
    tts = TTS.from_random(jax.random.PRNGKey(3), small=True, output_dir=str(tmp_path))
    render_calls = []

    def slow_render(self, text, prompt, toks, *a, **kw):
        render_calls.append(len(toks))
        _time.sleep(0.5)
        return np.zeros(max(1, len(toks)) * 160, np.float32)

    monkeypatch.setattr(type(tts), "_tokens_to_wav", slow_render)
    eng = ContinuousBatchingEngine(tts, slots=2, segment_tokens=8)
    try:
        h = eng.submit("Decode must not wait for renders.", ref_wav, stream=True)
        seg = h._q.get(timeout=300)  # first render done (0.5 s sleep passed)
        assert isinstance(seg, np.ndarray)
        toks_at_first_push = len(eng._slots[0].tokens) if not eng._slots[0].free else 0
        _time.sleep(1.0)  # two more render slots' worth of wall time
        toks_later = len(eng._slots[0].tokens) if not eng._slots[0].free else 10**9
        # the worker decoded MANY more segments than renders completed: with
        # blocking renders it could only add ~8 tokens per 0.5 s render
        assert toks_later - toks_at_first_push > 3 * eng.segment_tokens
    finally:
        eng.shutdown()


def test_stream_segments_arrive_in_decode_order(tmp_path, ref_wav, monkeypatch):
    """Async chained renders must preserve per-request segment order even
    when many segments queue behind a slow render pool."""
    from metavoice_tpu.runtime.engine import ContinuousBatchingEngine

    tts = TTS.from_random(jax.random.PRNGKey(3), small=True, output_dir=str(tmp_path))

    def tagged_render(self, text, prompt, toks, *a, **kw):
        # encode the chunk's FIRST generated token index into the wav length
        return np.zeros(len(toks), np.float32)

    monkeypatch.setattr(type(tts), "_tokens_to_wav", tagged_render)
    eng = ContinuousBatchingEngine(tts, slots=2, segment_tokens=8)
    try:
        h = eng.submit(
            "Order must hold under queued renders.", ref_wav, stream=True,
            max_new_tokens=64,
        )
        segs = list(h)
        assert segs, "no segments"
        # segments tile the token stream in order: each chunk starts where
        # the previous ended, so cumulative lengths are strictly increasing
        # and total <= the budget (wav length == chunk token count here)
        total = sum(len(s) for s in segs)
        assert total <= 64 and all(len(s) > 0 for s in segs)
        assert len(segs) >= total // (2 * eng.segment_tokens)
    finally:
        eng.shutdown()


def test_stream_render_carry_retries_unrenderable_tokens(tmp_path, ref_wav, monkeypatch):
    """A render that raises RuntimeError (no whole audio frame yet) must not
    lose its tokens: they carry into the next chained render, and the final
    flush still renders everything exactly once."""
    from metavoice_tpu.runtime.engine import ContinuousBatchingEngine

    tts = TTS.from_random(jax.random.PRNGKey(3), small=True, output_dir=str(tmp_path))
    calls = {"n": 0, "seen": []}

    def flaky_render(self, text, prompt, toks, *a, **kw):
        calls["n"] += 1
        if calls["n"] % 2 == 1:  # every odd render attempt fails
            raise RuntimeError("no complete frame yet")
        calls["seen"].append(np.asarray(toks).copy())
        return np.zeros(len(toks), np.float32)

    monkeypatch.setattr(type(tts), "_tokens_to_wav", flaky_render)
    eng = ContinuousBatchingEngine(tts, slots=2, segment_tokens=8)
    try:
        h = eng.submit(
            "Carried tokens must not be lost.", ref_wav, stream=True,
            max_new_tokens=48,
        )
        segs = list(h)
        rendered_tokens = np.concatenate(calls["seen"]) if calls["seen"] else np.array([])
        # every successful render's chunk length matches its pushed wav, and
        # the union of rendered chunks is a prefix-tiling (no gaps, no dupes):
        # total pushed == total tokens successfully rendered
        assert sum(len(s) for s in segs) == len(rendered_tokens)
        # failed attempts' tokens were retried: at least one successful render
        # contains MORE than one chunk's worth of tokens (carry + new chunk)
        if calls["n"] >= 2 and calls["seen"]:
            assert max(len(c) for c in calls["seen"]) > eng.segment_tokens or len(
                calls["seen"]
            ) == 1
    finally:
        eng.shutdown()


def test_stream_render_backlog_coalesces(tmp_path, ref_wav, monkeypatch):
    """When renders fall behind decode, queued chunks coalesce: each chain
    task drains everything pending in ONE render, so the backlog stays
    bounded (fewer, larger segments) and no token is rendered twice or lost."""
    import time as _time

    from metavoice_tpu.runtime.engine import ContinuousBatchingEngine

    monkeypatch.setattr(T, "END_OF_AUDIO_TOKEN", 10**6)  # fixed-length decode
    tts = TTS.from_random(jax.random.PRNGKey(3), small=True, output_dir=str(tmp_path))

    def slow_tagged_render(self, text, prompt, toks, *a, **kw):
        _time.sleep(0.3)  # force a backlog: decode outpaces renders
        return np.zeros(len(toks), np.float32)  # wav length == token count

    monkeypatch.setattr(type(tts), "_tokens_to_wav", slow_tagged_render)
    eng = ContinuousBatchingEngine(tts, slots=2, segment_tokens=8)
    try:
        h = eng.submit(
            "Backlog must coalesce.", ref_wav, stream=True, max_new_tokens=96
        )
        segs = list(h)
        total = sum(len(s) for s in segs)
        assert total == 96, f"tokens lost or duplicated: {total}"
        # ~12 chunks decoded; with 0.3 s renders most must have coalesced
        assert len(segs) < 9, f"no coalescing: {len(segs)} renders for 12 chunks"
    finally:
        eng.shutdown()

"""Engine stress: concurrent mixed-traffic soak against the slot pool.

16 requests from 4 client threads with jittered arrivals — non-streaming,
streaming, and ABANDONED streams (client disconnect mid-decode) with varied
per-request sampling and budgets. Pins that under churn every non-abandoned
request resolves, abandoned streams free their slots (the engine keeps
serving), and the worker survives to the end. This is the concurrency
envelope of BASELINE config 5 at test scale."""

import random
import threading
import time

import jax
import numpy as np
import pytest

from metavoice_tpu.runtime.engine import ContinuousBatchingEngine
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


def test_engine_mixed_traffic_soak(tmp_path, ref_wav):
    tts = TTS.from_random(jax.random.PRNGKey(0), small=True, output_dir=str(tmp_path))
    eng = ContinuousBatchingEngine(tts, slots=3, segment_tokens=16)
    rng = random.Random(7)
    results = []
    lock = threading.Lock()

    def client(cid):
        for j in range(4):
            time.sleep(rng.random() * 0.4)
            kind = rng.choice(["plain", "plain", "stream", "abandon"])
            sampling = dict(
                top_p=rng.choice([0.9, 0.95]),
                guidance_scale=rng.choice([2.0, 3.0]),
                temperature=rng.choice([0.8, 1.0]),
                max_new_tokens=rng.choice([24, 40]),
            )
            try:
                if kind == "plain":
                    fut = eng.submit(f"client {cid} req {j}.", ref_wav, **sampling)
                    path = fut.result(timeout=600)
                    wav, _ = aio.read_wav(path)
                    ok = bool(len(wav) > 0 and np.isfinite(wav).all())
                elif kind == "stream":
                    h = eng.submit(
                        f"client {cid} stream {j}.", ref_wav, stream=True, **sampling
                    )
                    chunks = list(h)
                    ok = bool(
                        len(chunks) >= 1
                        and all(np.isfinite(c).all() for c in chunks)
                    )
                else:  # abandon mid-stream (client disconnect)
                    h = eng.submit(
                        f"client {cid} gone {j}.", ref_wav, stream=True, **sampling
                    )
                    next(iter(h), None)  # maybe read one chunk
                    h.close()
                    ok = "abandoned"
            except Exception as e:  # noqa: BLE001 - recorded and asserted below
                ok = e
            with lock:
                results.append((cid, j, kind, ok))

    threads = [threading.Thread(target=client, args=(i,)) for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=900)
    assert all(not t.is_alive() for t in threads), "client thread hung"

    assert len(results) == 16
    failures = [r for r in results if isinstance(r[3], Exception)]
    assert not failures, failures
    # EVERY non-abandoned request must succeed (a count threshold would
    # both flake on abandon-heavy draws and tolerate silent bad outputs)
    bad = [r for r in results if r[3] is False]
    assert not bad, bad
    completed = [r for r in results if r[3] is True]
    assert len(completed) >= 1

    # the engine survived the churn and still serves
    final = eng.submit("still alive.", ref_wav, max_new_tokens=16).result(timeout=600)
    assert isinstance(final, str)
    eng.shutdown()

"""Stream synthesis from a running server and save audio as it arrives.

Usage:
    python -m metavoice_tpu.cli serve --random_weights --small &   # dev server
    python examples/stream_client.py --url http://127.0.0.1:58003 \
        --text "Streaming hello." --ref speaker_ref.wav --out out.wav

The server's `stream=true` mode responds with a live PCM16 WAV (RIFF sizes
0xFFFFFFFF): bytes show up at time-to-first-audio, not full-utterance
latency. This client prints arrival times per chunk and writes a playable
fixed-up WAV at the end.
"""

import argparse
import json
import struct
import time
import urllib.request


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--url", default="http://127.0.0.1:58003")
    ap.add_argument("--text", required=True)
    ap.add_argument("--ref", required=True, help="speaker reference (>=30 s audio)")
    ap.add_argument("--out", default="streamed.wav")
    args = ap.parse_args()

    req = urllib.request.Request(
        args.url.rstrip("/") + "/tts",
        data=json.dumps(
            {"text": args.text, "speaker_ref_path": args.ref, "stream": "true"}
        ).encode(),
        headers={"Content-Type": "application/json"},
    )
    t0 = time.perf_counter()
    body = b""
    with urllib.request.urlopen(req) as resp:
        while True:
            chunk = resp.read(16384)
            if not chunk:
                break
            if not body:
                print(f"first audio bytes after {time.perf_counter() - t0:.2f}s")
            body += chunk
            print(f"  +{len(chunk):6d} B at {time.perf_counter() - t0:.2f}s")

    # patch the live-stream RIFF sizes so any player accepts the file
    data_len = len(body) - 44
    body = (
        body[:4] + struct.pack("<I", 36 + data_len) + body[8:40]
        + struct.pack("<I", data_len) + body[44:]
    )
    with open(args.out, "wb") as f:
        f.write(body)
    print(f"wrote {args.out}: {data_len // 2} samples "
          f"({data_len / 2 / 24000:.2f}s of 24 kHz audio)")


if __name__ == "__main__":
    main()

"""Generate a runnable sample finetuning dataset (synthetic audio).

Mirrors the layout of the reference's datasets/sample_dataset.csv +
data/audio.wav + data/caption.txt, so the finetune CLI has something to run
end-to-end out of the box:

    python examples/make_sample_dataset.py --out ./sample_data
    python -m metavoice_tpu.cli finetune \
        --train sample_data/train.csv --val sample_data/val.csv ...
"""

import argparse
import os

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="sample_data")
    ap.add_argument("--rows", type=int, default=16)
    ap.add_argument("--seconds", type=float, default=10.0)
    args = ap.parse_args()

    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from metavoice_tpu.utils import audio_io as aio

    os.makedirs(os.path.join(args.out, "data"), exist_ok=True)
    sr = 24_000
    t = np.arange(int(args.seconds * sr)) / sr
    # a vowel-ish harmonic stack with slow vibrato — synthetic but voiced
    f0 = 140 * (1 + 0.02 * np.sin(2 * np.pi * 5 * t))
    wav = sum(
        a * np.sin(2 * np.pi * k * f0 * t)
        for k, a in ((1, 0.5), (2, 0.25), (3, 0.12), (4, 0.06))
    )
    wav = (0.6 * wav / np.abs(wav).max()).astype(np.float32)
    audio_path = os.path.join(args.out, "data", "audio.wav")
    aio.write_wav(audio_path, wav, sr)

    caption = "Please call Stella."
    caption_path = os.path.join(args.out, "data", "caption.txt")
    with open(caption_path, "w", encoding="utf-8") as f:
        f.write(caption + "\n")

    header = "audio_files|captions\n"
    row = f"{audio_path}|{caption_path}\n"
    for name, n in (("train.csv", args.rows), ("val.csv", max(2, args.rows // 4))):
        with open(os.path.join(args.out, name), "w", encoding="utf-8") as f:
            f.write(header + row * n)
    print(f"wrote {args.out}/: data/audio.wav ({args.seconds:.0f}s), "
          f"train.csv ({args.rows} rows), val.csv")


if __name__ == "__main__":
    main()

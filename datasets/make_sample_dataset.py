"""Generate a small sample finetuning dataset (no binaries in the repo).

The reference ships ``datasets/sample_dataset.csv`` pointing at bundled audio
(reference README.md:128-131). Here the audio is synthesized on demand:

    python datasets/make_sample_dataset.py [out_dir]

writes ``out_dir/sample_dataset.csv`` ('|'-separated: audio_files|captions)
plus the wav files, ready for:

    python -m metavoice_tpu.cli finetune \
        --train out_dir/sample_dataset.csv --val out_dir/sample_dataset.csv
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from metavoice_tpu.utils.audio_io import write_wav

CAPTIONS = [
    "Please call Stella.",
    "Ask her to bring these things with her from the store.",
    "Six spoons of fresh snow peas, five thick slabs of blue cheese.",
    "And maybe a snack for her brother Bob.",
]


def main(out_dir: str = "datasets/sample_data") -> str:
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(0)
    sr = 24000
    rows = ["audio_files|captions"]
    for i, caption in enumerate(CAPTIONS):
        dur_s = 1.0 + 0.5 * i
        t = np.arange(int(sr * dur_s)) / sr
        f0 = 120 + 30 * i
        wav = (
            0.3 * np.sin(2 * np.pi * f0 * t) * (0.5 + 0.5 * np.sin(2 * np.pi * 3 * t))
            + 0.01 * rng.normal(size=len(t))
        ).astype(np.float32)
        path = os.path.abspath(os.path.join(out_dir, f"utt{i}.wav"))
        write_wav(path, wav, sr)
        rows.append(f"{path}|{caption}")
    csv_path = os.path.join(out_dir, "sample_dataset.csv")
    with open(csv_path, "w") as f:
        f.write("\n".join(rows) + "\n")
    print(csv_path)
    return csv_path


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "datasets/sample_data")

"""On-the-fly finetuning dataset: audio+text -> flattened-interleaved tokens.

Equivalent of the reference ``DynamicComputeDataset``
(fam/llm/loaders/training_data.py:24-116): a "|"-separated CSV of
(audio_path, caption-text) rows; per item, on the fly:

  * normalize + BPE-encode the caption (offset ids + EOT),
  * resample audio to 24 kHz and EnCodec-encode -> (8, T) codes
    (our JAX encoder, ops run on device),
  * speaker embedding from the same audio (16 kHz path),
  * combine to flattened-interleaved, pad to ctx_window + 1
    (fam/llm/preprocessing/data_pipeline.py:7-21).

``training_batches`` yields the shift-by-one (x, y, spk_emb) training tuples
(fam/llm/preprocessing/data_pipeline.py:24-43).
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Iterator

import numpy as np
import pandas as pd

from metavoice_tpu.core import tokens as T
from metavoice_tpu.core.text import normalize_text
from metavoice_tpu.models import encodec as ec
from metavoice_tpu.models import speaker_encoder as se
from metavoice_tpu.ops.audio import resample
from metavoice_tpu.tokenizer import TrainedBPETokeniser
from metavoice_tpu.utils import audio_io as aio

MBD_SAMPLE_RATE = 24000


@dataclass
class DynamicComputeDataset:
    df: pd.DataFrame
    encodec_params: dict
    encodec_cfg: ec.EncodecConfig
    tokenizer: TrainedBPETokeniser
    spk_params: se.SpeakerEncoderParams
    mode_params: T.AudioTokenModeParams
    base_dir: str = ""  # CSV's directory: relative row paths resolve here

    @classmethod
    def from_csv(
        cls,
        csv_path: str,
        encodec_params: dict,
        encodec_cfg: ec.EncodecConfig,
        tokenizer: TrainedBPETokeniser,
        spk_params: se.SpeakerEncoderParams,
        num_max_audio_tokens_timesteps: int = 1024,
    ) -> "DynamicComputeDataset":
        df = pd.read_csv(csv_path, delimiter="|", index_col=False)
        mode = T.get_params_for_mode(
            "flattened_interleaved", num_max_audio_tokens_timesteps
        )
        return cls(
            df, encodec_params, encodec_cfg, tokenizer, spk_params, mode,
            base_dir=os.path.dirname(os.path.abspath(csv_path)),
        )

    def _resolve(self, path: str) -> str:
        """Relative row paths resolve against the CSV's directory (the
        reference's sample dataset uses ./data/... paths)."""
        if os.path.isabs(path) or os.path.exists(path):
            return path
        return os.path.join(self.base_dir, path)

    def __len__(self) -> int:
        return len(self.df)

    def __getitem__(self, idx: int) -> dict[str, np.ndarray]:
        audio_path, text = self.df.iloc[idx].values.tolist()[:2]
        text = str(text)
        # convenience beyond the reference (which tokenizes the second
        # column verbatim): a row whose caption field is a .txt path — the
        # layout of the reference's own datasets/sample_dataset.csv — reads
        # the caption from that file (resolved against the CSV's directory).
        # A missing caption file raises rather than silently training on the
        # tokenized path string.
        if text.endswith(".txt"):
            cap_path = self._resolve(text)
            if not os.path.exists(cap_path):
                raise FileNotFoundError(
                    f"caption file not found: {text!r} (resolved {cap_path!r})"
                )
            with open(cap_path, encoding="utf-8") as f:
                text = f.read().strip()
        text_tokens = np.asarray(
            self.tokenizer.encode(normalize_text(text)), np.int64
        )

        wav, sr = aio.load_audio(self._resolve(str(audio_path)))
        wav24 = np.asarray(resample(wav, sr, MBD_SAMPLE_RATE)) if sr != MBD_SAMPLE_RATE else wav
        codes = np.asarray(
            ec.encode_codes(self.encodec_params, self.encodec_cfg, wav24[None])
        )[0]  # (8, T)

        wav16 = np.asarray(resample(wav, sr, se.SAMPLING_RATE)) if sr != se.SAMPLING_RATE else wav
        spkemb = se.embed_utterance(self.spk_params, wav16.astype(np.float32))

        combined = self.mode_params.combine(codes, text_tokens)  # (1, S+2T)
        padded = T.pad_tokens(
            combined, self.mode_params.ctx_window, self.mode_params.pad_token
        )
        return {"tokens": padded, "spkemb": spkemb[None].astype(np.float32)}


def training_batches(
    dataset: DynamicComputeDataset,
    batch_size: int,
    *,
    shuffle: bool = True,
    seed: int = 1337,
    epochs: int | None = None,
    drop_last: bool = True,
) -> Iterator[dict[str, np.ndarray]]:
    """Yield {x: (B, ctx), y: (B, ctx), spk_emb: (B, 256)} batches forever
    (or for ``epochs``). x/y are the shift-by-one pair."""
    rng = np.random.default_rng(seed)
    epoch = 0
    while epochs is None or epoch < epochs:
        order = np.arange(len(dataset))
        if shuffle:
            rng.shuffle(order)
        for start in range(0, len(order), batch_size):
            idxs = order[start : start + batch_size]
            if drop_last and len(idxs) < batch_size:
                continue
            items = [dataset[int(i)] for i in idxs]
            tokens = np.concatenate([it["tokens"] for it in items], axis=0)
            spk = np.concatenate([it["spkemb"] for it in items], axis=0)
            yield {
                "x": tokens[:, :-1].astype(np.int32),
                "y": tokens[:, 1:].astype(np.int32),
                "spk_emb": spk,
            }
        epoch += 1

"""Finetune loop e2e: synthetic CSV dataset -> train -> checkpoints on disk."""

import os

import jax
import numpy as np
import pytest

from metavoice_tpu.core.config import first_stage_config
from metavoice_tpu.models import encodec as ec
from metavoice_tpu.models import speaker_encoder as se
from metavoice_tpu.models import transformer as tfm
from metavoice_tpu.tokenizer import TrainedBPETokeniser
from metavoice_tpu.training import finetune as ft
from metavoice_tpu.training.data import DynamicComputeDataset, training_batches
from metavoice_tpu.training.trainer import load_checkpoint, train
from metavoice_tpu.utils import audio_io as aio

TINY = first_stage_config(n_layer=2, n_head=2, dim=64, block_size=128, vocab_sizes=(2562,))
SMALL_EC = ec.EncodecConfig(n_filters=4, dimension=16, codebook_size=1024, n_q=8)


@pytest.fixture(scope="module")
def dataset_csv(tmp_path_factory):
    root = tmp_path_factory.mktemp("data")
    rows = ["audio_files|captions"]
    rng = np.random.default_rng(0)
    for i in range(3):
        path = root / f"utt{i}.wav"
        wav = (0.1 * rng.normal(size=12000)).astype(np.float32)  # 0.5 s = 37 frames
        aio.write_wav(str(path), wav, 24000)
        rows.append(f"{path}|hello number {i}")
    csv = root / "ds.csv"
    csv.write_text("\n".join(rows))
    return str(csv)


@pytest.fixture(scope="module")
def dataset(dataset_csv):
    return DynamicComputeDataset.from_csv(
        dataset_csv,
        ec.init_params(jax.random.PRNGKey(1), SMALL_EC),
        SMALL_EC,
        TrainedBPETokeniser(),
        se.init_params(jax.random.PRNGKey(2)),
        num_max_audio_tokens_timesteps=TINY.block_size // 2,
    )


def test_dataset_item_layout(dataset):
    item = dataset[0]
    assert item["tokens"].shape == (1, TINY.block_size + 1)
    assert item["spkemb"].shape == (1, 256)
    toks = item["tokens"][0]
    # prompt region is text (>= 2049), then interleaved audio (0..2047), padded with 2048
    assert (toks >= 0).all() and (toks < 2562).all()
    assert toks[0] >= 2049
    assert (toks == 2048).any()  # padding present for a 0.5 s clip


def test_caption_file_rows(dataset_csv, tmp_path, dataset):
    """A caption field pointing at a .txt file (the reference's
    sample_dataset.csv layout) reads the caption from that file."""
    cap = tmp_path / "caption.txt"
    cap.write_text("hello number 0\n")
    audio = dataset_csv.rsplit("/", 1)[0] + "/utt0.wav"
    csv = tmp_path / "filecap.csv"
    csv.write_text(f"audio_files|captions\n{audio}|{cap}")
    ds = DynamicComputeDataset.from_csv(
        str(csv), dataset.encodec_params, dataset.encodec_cfg,
        dataset.tokenizer, dataset.spk_params,
        num_max_audio_tokens_timesteps=TINY.block_size // 2,
    )
    np.testing.assert_array_equal(ds[0]["tokens"], dataset[0]["tokens"])


def test_training_batch_shapes(dataset):
    batch = next(training_batches(dataset, 2, epochs=1))
    assert batch["x"].shape == (2, TINY.block_size)
    assert batch["y"].shape == (2, TINY.block_size)
    assert batch["spk_emb"].shape == (2, 256)
    np.testing.assert_array_equal(batch["x"][:, 1:], batch["y"][:, :-1])


def test_train_loop_and_checkpoints(dataset, tmp_path):
    params = tfm.init_params(jax.random.PRNGKey(0), TINY)
    cfg = ft.FinetuneConfig(
        batch_size=2, max_iters=4, eval_interval=2, eval_iters=1,
        warmup_iters=2, last_n_blocks_to_finetune=1,
    )
    batches = training_batches(dataset, 2, seed=0)
    val = [next(training_batches(dataset, 2, shuffle=False, epochs=1))]
    out = str(tmp_path / "ft")
    state = train(
        params, TINY, cfg, batches, val, out_dir=out, log_every=1,
        tokenizer_info={},
    )
    assert int(state.step) == 4
    assert os.path.exists(os.path.join(out, "final.npz"))
    assert os.path.exists(os.path.join(out, "ckpt.npz"))
    loaded, meta = load_checkpoint(os.path.join(out, "final.npz"))
    assert meta["iter_num"] == 4
    assert meta["model_args"]["n_layer"] == 2
    # frozen embedding identical, trained last block differs
    np.testing.assert_array_equal(loaded["wtes"][0], np.asarray(params["wtes"][0]))


def test_orbax_train_state_roundtrip(tmp_path):
    from metavoice_tpu.training.trainer import restore_train_state, save_train_state

    params = tfm.init_params(jax.random.PRNGKey(1), TINY)
    cfg = ft.FinetuneConfig(warmup_iters=2)
    state, opt = ft.init_train_state(params, cfg)
    # take one step so optimizer moments are non-trivial
    step = ft.make_train_step(TINY, cfg, opt, compute_dtype=np.float32)
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    batch = {
        "x": jnp.asarray(rng.integers(0, 2562, (2, 16))),
        "y": jnp.asarray(rng.integers(0, 2562, (2, 16))),
        "spk_emb": jnp.asarray(rng.normal(size=(2, 256)).astype(np.float32)),
    }
    state, _ = step(state, batch)

    path = save_train_state(str(tmp_path / "ckpt"), state)
    template, _ = ft.init_train_state(params, cfg)
    restored = restore_train_state(path, template)
    assert int(restored.step) == 1
    for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_finetune_telemetry_events(tmp_path, monkeypatch):
    """trainer.train emits user_started_finetuning / user_completed_finetuning
    (reference finetune.py:246-262,368-375)."""
    import json

    from metavoice_tpu import telemetry as tele
    from metavoice_tpu.core.config import first_stage_config
    from metavoice_tpu.models import transformer as tfm
    from metavoice_tpu.training import finetune as ft
    from metavoice_tpu.training import trainer as tr

    spool = str(tmp_path / "tele")
    monkeypatch.setattr(
        tele, "default_client", tele.TelemetryClient(spool_dir=spool, enabled=True)
    )
    cfg = first_stage_config(n_layer=2, n_head=2, dim=32, block_size=32, vocab_sizes=(60,))
    params = tfm.init_params(jax.random.PRNGKey(0), cfg)
    ft_cfg = ft.FinetuneConfig(max_iters=2, batch_size=2, last_n_blocks_to_finetune=1)
    rng = np.random.default_rng(0)

    def batches():
        while True:
            yield {
                "x": rng.integers(0, 60, (2, 8)),
                "y": rng.integers(0, 60, (2, 8)),
                "spk_emb": rng.normal(size=(2, 256)).astype(np.float32),
            }

    tr.train(params, cfg, ft_cfg, batches(), out_dir=str(tmp_path / "out"))
    events = [json.loads(l)["event"] for l in open(f"{spool}/telemetry.jsonl")]
    assert "user_started_finetuning" in events
    assert "user_completed_finetuning" in events

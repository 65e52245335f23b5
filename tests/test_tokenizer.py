"""BPE engine tests, cross-checked against tiktoken (offline, handcrafted vocab)."""

import pytest

from metavoice_tpu.core.tokens import TEXT_OFFSET
from metavoice_tpu.tokenizer import BPEEngine, TrainedBPETokeniser

tiktoken = pytest.importorskip("tiktoken", reason="tiktoken oracle not available")

PAT = r"""'s|'t|'re|'ve|'m|'ll|'d| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+(?!\S)|\s+"""


def _vocab():
    """Handcrafted merge table: single bytes + a few valid merges (each
    multi-byte token is the concatenation of two existing tokens)."""
    ranks = {bytes([i]): i for i in range(256)}
    merges = [b"th", b"in", b"er", b" t", b"he", b"the", b" th", b" the", b"ing", b"er."]
    for i, m in enumerate(merges):
        ranks[m] = 256 + i
    return ranks


def _oracle():
    return tiktoken.Encoding(
        name="test-bpe",
        pat_str=PAT,
        mergeable_ranks=_vocab(),
        special_tokens={"<|endoftext|>": 266},
    )


@pytest.mark.parametrize(
    "text",
    [
        "Hello, world!",
        "the thin thinker in the ring",
        "don't stop won't can't 123 456",
        "  leading spaces and   runs  ",
        "punctuation?! (brackets) [more] {braces} ...",
        "Singing in the rain, better.",
    ],
)
def test_bpe_matches_tiktoken(text):
    enc = _oracle()
    ours = BPEEngine(_vocab(), PAT)
    assert ours.encode(text) == enc.encode(text)


def test_bpe_roundtrip():
    ours = BPEEngine(_vocab(), PAT)
    text = "The quick brown fox jumps over 42 lazy dogs."
    assert ours.decode_bytes(ours.encode(text)).decode() == text


def test_trained_tokeniser_offset_and_eot():
    tok = TrainedBPETokeniser(
        name="test-bpe",
        pat_str=PAT,
        mergeable_ranks=_vocab(),
        special_tokens={"<|endoftext|>": 266},
        offset=TEXT_OFFSET,
    )
    ids = tok.encode("Hi")
    assert ids[-1] == 266 + TEXT_OFFSET  # EOT appended, offset applied
    assert all(i >= TEXT_OFFSET for i in ids)
    assert tok.decode(ids) == "Hi"
    assert tok.eot_token == 266 + TEXT_OFFSET


def test_byte_fallback_vocab():
    tok = TrainedBPETokeniser(offset=None)
    ids = tok.encode("AB")
    assert ids[:2] == [65, 66]
    assert tok.decode(ids) == "AB"


def test_native_engine_matches_python():
    """C++ merge engine == pure-Python engine on every piece."""
    from metavoice_tpu.native import NativeBPE

    try:
        native = NativeBPE(_vocab())
    except RuntimeError:
        pytest.skip("native BPE unavailable (no g++)")
    py = BPEEngine(_vocab(), PAT, use_native=False)
    for text in [
        "the thin thinker in the ring",
        "Hello, world! 123",
        "er. ing the",
        "",
    ]:
        for piece in py.pattern.findall(text):
            pb = piece.encode("utf-8")
            assert native.encode_piece(pb) == py._encode_piece(pb), piece


def test_engine_uses_native_when_available():
    eng = BPEEngine(_vocab(), PAT)
    ids = eng.encode("the thing")
    py = BPEEngine(_vocab(), PAT, use_native=False)
    assert ids == py.encode("the thing")

import pytest

from metavoice_tpu.core.text import chunk_text, normalize_text


def test_normalize_unicode_punctuation():
    assert normalize_text("it’s “fine”") == "it's \"fine\""
    assert normalize_text("a—b") == "a-b"


def test_normalize_whitespace():
    assert normalize_text("a\tb\nc\rd  e") == "a b c d e"
    assert normalize_text("  hi  there  ") == "hi there"


def test_normalize_strips_asterisk():
    assert normalize_text("a*b") == "a b"


def test_normalize_rejects_non_bpe():
    with pytest.raises(ValueError):
        normalize_text("你好")


def test_chunk_short_text_single_chunk():
    assert chunk_text("Hello world.") == ["Hello world."]


def test_chunk_respects_max_chars():
    text = " ".join(["This is a sentence number %d." % i for i in range(30)])
    chunks = chunk_text(text, max_chars=80)
    assert all(len(c) <= 80 for c in chunks)
    assert " ".join(chunks) == text


def test_chunk_overlong_sentence_splits_words():
    text = "word " * 100
    chunks = chunk_text(text.strip(), max_chars=50)
    assert all(len(c) <= 50 for c in chunks)
    assert " ".join(chunks) == text.strip()


def test_chunk_empty():
    assert chunk_text("   ") == []

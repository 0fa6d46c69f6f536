"""Decontamination tests: python fallback semantics + C core parity."""

import subprocess
import sys

import pytest

from onebit_tpu.tools.decontam.janitor import HAVE_NATIVE, Janitor


def _mk(native, **kw):
    defaults = dict(ngram_n=3, window_to_remove=5, too_dirty_cutoff=3,
                    minimum_slice_length=5)
    defaults.update(kw)
    return Janitor(use_native=native, **defaults)


def test_register_and_clean_python():
    j = _mk(False)
    j.register_contaminant("the quick brown fox jumps")
    text = ("a long prefix text here keeps going and going . "
            "the quick brown fox appears ! then a long suffix tail "
            "continues for quite a while afterwards indeed")
    chunks = j.clean(text)
    joined = " ".join(chunks)
    assert "quick brown fox" not in joined
    assert len(chunks) >= 1


def test_normalization_case_punct():
    j = _mk(False)
    j.register_contaminant("Hello, World! Again")
    assert "hello world again" in j.dirt_ngrams


def test_too_dirty_returns_empty():
    j = _mk(False, too_dirty_cutoff=1)
    j.register_contaminant("a b c")
    assert j.clean("x a b c y a b c z a b c") == []


def test_clean_text_untouched():
    j = _mk(False)
    j.register_contaminant("one two three")
    text = "completely different words with no overlap at all in this text"
    assert " ".join(j.clean(text)).strip() == text


@pytest.mark.skipif(not HAVE_NATIVE, reason="native core not built")
def test_native_matches_python():
    texts = [
        "The QUICK brown fox, jumped over the lazy dog! Twice more.",
        "  leading spaces   multiple   gaps\nnewlines\ttabs here too",
        "short",
        "punct-only !!! ... ??? between words here now",
    ]
    for text in texts:
        jp = _mk(False)
        jn = _mk(True)
        assert jn._ngrams(text) == jp._ngrams(text), text
        assert [tuple(t) for t in jn._ngrams_with_indices(text)] == \
            [tuple(t) for t in jp._ngrams_with_indices(text)], text


@pytest.mark.skipif(not HAVE_NATIVE, reason="native core not built")
def test_native_clean_end_to_end():
    jn = _mk(True)
    jp = _mk(False)
    dirt = "the quick brown fox jumps"
    doc = ("intro words fill space before anything happens at all . "
           "the quick brown fox runs ! closing remarks carry on for a "
           "while longer to pad this out")
    jn.register_contaminant(dirt)
    jp.register_contaminant(dirt)
    assert jn.dirt_ngrams == jp.dirt_ngrams
    assert jn.clean(doc) == jp.clean(doc)

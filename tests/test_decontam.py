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


# -- archiver + pre-built ngram overlap (reference archiver.py /
# decontaminate.py:get_train_overlap) ---------------------------------------

def test_zstd_archive_round_trip(tmp_path):
    from onebit_tpu.tools.decontam.archiver import Archive, Reader
    path = str(tmp_path / "docs.jsonl.zst")
    arch = Archive(path)
    arch.add_data("hello world", meta={"id": 1})
    arch.add_data(["para one", "para two"])  # list -> paragraph auto-join
    arch.commit()
    docs = list(Reader().read(path))
    assert docs == ["hello world", "para one\n\npara two"]
    with_meta = list(Reader().read(path, get_meta=True))
    assert with_meta[0] == ("hello world", {"id": 1})


def test_text_archive_round_trip(tmp_path):
    from onebit_tpu.tools.decontam.archiver import (TextArchive,
                                                    read_text_lines)
    path = str(tmp_path / "t.txt")
    ta = TextArchive(path)
    ta.add_data("line one")
    ta.add_data("line two")
    ta.commit()
    assert list(read_text_lines(path)) == ["line one", "line two"]


def test_get_train_overlap_prebuilt_buckets(tmp_path):
    """Planted 4-gram overlap via the sorted-bucket path; clean docs and
    clean tasks stay clean; cache round-trips."""
    import json as _json

    from onebit_tpu.tools.decontam.archiver import write_sorted_ngrams
    from onebit_tpu.tools.decontam.overlap import get_train_overlap

    ngrams_dir = tmp_path / "ngrams"
    ngrams_dir.mkdir()
    (ngrams_dir / "info.json").write_text(_json.dumps({"ngram_size": 4}))
    # training-set ngrams, sorted, "<ngram> <doc_id>" lines incl. duplicates
    lines = sorted([
        "alpha beta gamma delta 0",
        "alpha beta gamma delta 7",
        "epsilon zeta eta theta 3",
    ])
    write_sorted_ngrams(str(ngrams_dir / "ngrams_0.bkt.txt.sorted.zst"),
                        lines)

    docs_by_task = {
        "taskA": ["intro Alpha BETA gamma delta outro",   # dirty (doc 0)
                  "totally unrelated clean words here"],  # clean  (doc 1)
        "taskB": ["nothing matches in this one at all"],
    }
    cache = str(tmp_path / "cache")
    got = get_train_overlap(docs_by_task, str(ngrams_dir), cache_dir=cache)
    assert got == {"taskA": {0}, "taskB": set()}
    # second call hits the pickle cache and agrees
    again = get_train_overlap(docs_by_task, str(ngrams_dir),
                              cache_dir=cache)
    assert again == got

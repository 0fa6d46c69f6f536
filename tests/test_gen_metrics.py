"""SFT generation metrics: rouge-1/2/l + bleu-4 (reference sft.py:31-68)."""

import math

import pytest

from onebit_tpu.train.gen_metrics import (bleu4, compute_generation_metrics,
                                          rouge_l_f1, rouge_n_f1, segment)


def test_segment_mixed_cjk():
    assert segment("hello 世界 world") == ["hello", "世", "界", "world"]
    assert segment("the cat") == ["the", "cat"]
    assert segment("") == []


def test_rouge1_exact_match():
    toks = "the cat sat".split()
    assert rouge_n_f1(toks, toks, 1) == pytest.approx(1.0)
    assert rouge_n_f1(toks, toks, 2) == pytest.approx(1.0)
    assert rouge_l_f1(toks, toks) == pytest.approx(1.0)


def test_rouge1_known_value():
    # hyp: "the cat" ref: "the cat sat" -> overlap 2, P=1, R=2/3, F1=0.8
    assert rouge_n_f1(["the", "cat"], ["the", "cat", "sat"], 1) == \
        pytest.approx(0.8)


def test_rouge_l_subsequence():
    # LCS("a b c d", "a x c d") = 3 -> P=R=3/4 -> F1 = 0.75
    assert rouge_l_f1("a b c d".split(), "a x c d".split()) == \
        pytest.approx(0.75)


def test_rouge_disjoint_zero():
    assert rouge_n_f1(["a"], ["b"], 1) == 0.0
    assert rouge_l_f1(["a"], ["b"]) == 0.0


def test_bleu4_parity_with_nltk():
    nltk = pytest.importorskip("nltk.translate.bleu_score")
    cases = [
        (list("the cat sat on the mat"), list("the cat sat on the mat")),
        (list("the cat"), list("the cat sat on the mat")),
        (list("a completely different string"), list("reference text here")),
        (list("hello 世界"), list("hello 世界 again")),
        (list("xy"), list("xy")),  # shorter than n=3: smoothed precisions
    ]
    sm = nltk.SmoothingFunction().method3
    for hyp, ref in cases:
        want = nltk.sentence_bleu([ref], hyp, smoothing_function=sm)
        got = bleu4(hyp, [ref])
        assert got == pytest.approx(want, rel=1e-9), (hyp, ref)


def test_compute_generation_metrics_table():
    res = compute_generation_metrics(["the cat sat"], ["the cat sat"])
    assert res["rouge-1"] == pytest.approx(100.0)
    assert res["rouge-2"] == pytest.approx(100.0)
    assert res["rouge-l"] == pytest.approx(100.0)
    assert res["bleu-4"] == pytest.approx(100.0)
    res = compute_generation_metrics([""], ["label text"])
    assert res["rouge-1"] == 0.0 and res["bleu-4"] == 0.0
    # mean over pairs
    res = compute_generation_metrics(["the cat sat", ""],
                                     ["the cat sat", "x"])
    assert res["rouge-1"] == pytest.approx(50.0)

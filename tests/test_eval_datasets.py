import json

import numpy as np
import pytest

from onebit_tpu.eval.datasets import (c4_eval_tokens, c4_new_eval_tokens,
                                      calibration_crops,
                                      c4_calibration_crops, get_eval_tokens,
                                      pile_tokens, wikitext2_tokens)


def toks(s):
    return [ord(c) % 97 for c in s]


def test_wikitext2_local_file(tmp_path):
    p = tmp_path / "wiki.txt"
    p.write_text("hello world this is text")
    out = wikitext2_tokens(toks, str(p))
    np.testing.assert_array_equal(out, toks("hello world this is text"))


def test_c4_windows_local_jsonl(tmp_path):
    p = tmp_path / "c4.jsonl"
    docs = ["x" * 50, "y" * 5, "z" * 80]
    p.write_text("\n".join(json.dumps({"text": d}) for d in docs))
    out = c4_eval_tokens(toks, str(p), seqlen=16, n_windows=4)
    assert out.shape == (4 * 16,)
    # the short doc ("y"*5 < seqlen+1) can never be selected
    assert (ord("y") % 97) not in out


def test_c4_deterministic_seed(tmp_path):
    p = tmp_path / "c4.jsonl"
    p.write_text(json.dumps({"text": "abcdefghij" * 20}))
    a = c4_eval_tokens(toks, str(p), seqlen=8, n_windows=3)
    b = c4_eval_tokens(toks, str(p), seqlen=8, n_windows=3)
    np.testing.assert_array_equal(a, b)


def test_c4_new_join_and_truncate(tmp_path):
    p = tmp_path / "c4.jsonl"
    docs = ["abc", "defg", "hi"]
    p.write_text("\n".join(json.dumps({"text": d}) for d in docs))
    out = c4_new_eval_tokens(toks, str(p), seqlen=2, n_windows=3)
    # " ".join(docs) tokenized, truncated to 256*seqlen -> here 6 tokens
    np.testing.assert_array_equal(out, toks("abc defg hi")[:6])


def test_pile_join(tmp_path):
    p = tmp_path / "pile.jsonl"
    p.write_text("\n".join(json.dumps({"text": d}) for d in ["aa", "bb"]))
    out = pile_tokens(toks, str(p))
    np.testing.assert_array_equal(out, toks("aa\n\nbb"))


def test_calibration_crops_shapes_and_determinism():
    stream = np.arange(100, dtype=np.int32)
    a = calibration_crops(stream, nsamples=5, seqlen=16, seed=3)
    b = calibration_crops(stream, nsamples=5, seqlen=16, seed=3)
    assert len(a) == 5 and all(c.shape == (16,) for c in a)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)
    # crops are contiguous windows of the stream
    for c in a:
        assert c[0] + 15 == c[-1]


def test_c4_calibration_skips_short_docs(tmp_path):
    p = tmp_path / "c4.jsonl"
    docs = ["x" * 40, "y" * 3]
    p.write_text("\n".join(json.dumps({"text": d}) for d in docs))
    crops = c4_calibration_crops(toks, str(p), nsamples=3, seqlen=8, seed=0)
    assert all(c.shape == (8,) for c in crops)
    assert all((ord("y") % 97) not in c for c in crops)


def test_get_eval_tokens_dispatch(tmp_path):
    p = tmp_path / "wiki.txt"
    p.write_text("hello world")
    out = get_eval_tokens("wikitext2", toks, source=str(p))
    np.testing.assert_array_equal(out, toks("hello world"))
    assert get_eval_tokens("pile", toks, source=str(p)) is None
    assert get_eval_tokens("mix", toks, source=str(p)) is None
    with pytest.raises(ValueError):
        get_eval_tokens("nonsense", toks)
    with pytest.raises(ValueError):
        get_eval_tokens("c4", toks)  # zero-egress: c4 needs a local source

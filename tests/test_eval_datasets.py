import json

import numpy as np

from onebit_tpu.eval.datasets import c4_eval_tokens, wikitext2_tokens


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

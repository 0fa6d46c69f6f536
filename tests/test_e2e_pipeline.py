"""The full pipeline as ONE chain (VERDICT r2 item 5): teacher-generated
corpus → build-start-ckpt → train → convert → eval, all through the CLI,
with quality assertions (KD loss falls; packed held-out ppl beats a
random-sign baseline).  scripts/e2e_pipeline.py runs the same chain
standalone on the real TPU."""

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__))), "scripts"))


@pytest.mark.slow
@pytest.mark.timeout(600)
def test_pipeline_end_to_end(tmp_path):
    from e2e_pipeline import run_pipeline

    res = run_pipeline(str(tmp_path), steps=120, verbose=False)
    assert res["loss_last"] < res["loss_first"]
    assert res["ppl_distilled"] < res["ppl_random"]

"""Zero-shot task framework tests with synthetic docs + a rigged model.

The "oracle tokenizer/model" trick: a char-level tokenizer plus the tiny
random model gives deterministic loglikelihoods; we verify prompt formats,
request construction, metric plumbing, stderr, table and MMLU aggregation.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from onebit_tpu.eval.tasks.base import (
    bootstrap_stderr,
    evaluate_tasks,
    make_table,
)
from onebit_tpu.eval.tasks.mmlu import (
    CATEGORIES,
    SUBCATEGORIES,
    SUBJECTS,
    MMLUSubject,
    aggregate_mmlu,
)
from onebit_tpu.eval.tasks.suite import (
    ARCChallenge,
    BoolQ,
    HellaSwag,
    Lambada,
    PIQA,
    Winogrande,
)
from onebit_tpu.model.bitllama import init_params
from onebit_tpu.model.config import BitLlamaConfig


@pytest.fixture(scope="module")
def tiny():
    config = BitLlamaConfig.named("tiny")
    params = init_params(config, jax.random.PRNGKey(0), mode="latent")
    return config, params


def char_tokenize(s):
    return [ord(c) % 500 for c in s]


def test_piqa_format():
    t = PIQA([{"goal": "fix a flat", "sol1": "pump it", "sol2": "eat it",
               "label": 0}])
    doc = t.docs()[0]
    assert doc.query == "Question: fix a flat\nAnswer:"
    assert doc.choices == ["pump it", "eat it"]
    assert doc.gold == 0


def test_arc_numeric_answer_key():
    t = ARCChallenge([{"question": "q?", "answerKey": "2",
                       "choices": {"text": ["a", "b", "c"]}}])
    assert t.docs()[0].gold == 1


def test_boolq_format_and_acc_only(tiny):
    config, params = tiny
    t = BoolQ([{"passage": "P.", "question": "is it", "label": 1}])
    res = evaluate_tasks(params, config, [t], char_tokenize, batch_size=2)
    assert set(res["boolq"]) == {"acc", "acc_stderr"}


def test_hellaswag_preprocess():
    t = HellaSwag([{"activity_label": "Cooking",
                    "ctx_a": "He stirs the pot", "ctx_b": "then",
                    "endings": ["eats [title] it", "leaves"], "label": 1}])
    doc = t.docs()[0]
    assert doc.query == "Cooking: He stirs the pot Then"
    assert doc.choices[0] == "eats. it"


def test_winogrande_partial_eval(tiny):
    config, params = tiny
    t = Winogrande([{"sentence": "The cup fell because _ was heavy.",
                     "option1": "the cup", "option2": "the table",
                     "answer": "1"}])
    reqs, spans = t.build_requests(t.docs(), char_tokenize)
    assert len(reqs) == 2
    # both requests share the same continuation tokens (" was heavy.")
    assert reqs[0][1] == reqs[1][1]
    # contexts differ by option
    assert reqs[0][0] != reqs[1][0]
    res = evaluate_tasks(params, config, [t], char_tokenize)
    assert "acc" in res["winogrande"]


def test_full_suite_runs(tiny):
    config, params = tiny
    tasks = [
        PIQA([{"goal": "g", "sol1": "a", "sol2": "b", "label": 0}] * 3),
        Lambada([{"text": "the quick brown fox"}] * 2),
    ]
    res = evaluate_tasks(params, config, tasks, char_tokenize, batch_size=4)
    assert 0.0 <= res["piqa"]["acc"] <= 1.0
    assert 0.0 <= res["piqa"]["acc_norm"] <= 1.0
    table = make_table(res)
    assert "piqa" in table and "lambada_openai" in table


def test_mmlu_subject_and_aggregate(tiny):
    config, params = tiny
    docs = [{"question": "2+2?", "choices": ["3", "4", "5", "6"],
             "answer": 1}]
    t = MMLUSubject(docs, "college_mathematics")
    assert t.docs()[0].query.startswith("Question: 2+2?\nChoices:\nA. 3\n")
    res = evaluate_tasks(params, config, [t], char_tokenize)
    agg = aggregate_mmlu(res)
    assert "mmlu_average" in agg and "category:STEM" in agg


def test_mmlu_taxonomy_complete():
    assert len(SUBJECTS) == 57
    cats = {c for v in SUBCATEGORIES.values() for c in v}
    listed = {c for v in CATEGORIES.values() for c in v}
    assert cats == listed


def test_bootstrap_stderr():
    vals = [0.0, 1.0] * 50
    err = bootstrap_stderr(vals)
    # SE of mean for bernoulli(0.5), n=100 → ~0.05
    assert 0.02 < err < 0.09

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
    doc = t.docs()[0]
    ctx = t.fewshot_context(doc, 0, __import__("random").Random(42))
    reqs = t.construct_requests(doc, ctx)
    assert len(reqs) == 2
    # both requests share the same continuation (" was heavy.")
    assert reqs[0][1] == reqs[1][1] == " was heavy."
    # contexts differ by option
    assert reqs[0][0] == "The cup fell because the cup"
    assert reqs[1][0] == "The cup fell because the table"
    res = evaluate_tasks(params, config, [t], char_tokenize)
    assert "acc" in res["winogrande"]


def test_winogrande_fewshot_swaps_option(tiny):
    """Few-shot examples render with the CORRECT option; the current doc's
    context is swapped per candidate (reference winogrande append_context)."""
    import random as _random
    docs = [{"sentence": f"A{i} _ B{i}.", "option1": f"x{i}",
             "option2": f"y{i}", "answer": "1"} for i in range(4)]
    t = Winogrande(docs)
    doc = t.docs()[0]
    ctx = t.fewshot_context(doc, 2, _random.Random(7))
    reqs = t.construct_requests(doc, ctx)
    # few-shot prefix identical across options, final context differs
    p0, p1 = reqs[0][0], reqs[1][0]
    assert p0.rsplit("\n\n", 1)[0] == p1.rsplit("\n\n", 1)[0]
    assert p0.endswith("A0 x0")
    assert p1.endswith("A0 y0")


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


def test_fewshot_context_layout(tiny):
    """k examples joined by \\n\\n with targets appended, then the eval doc
    (reference base.py:576-642)."""
    import random as _random
    t = PIQA([{"goal": f"g{i}", "sol1": "a", "sol2": "b", "label": 0}
              for i in range(6)])
    doc = t.docs()[0]
    ctx = t.fewshot_context(doc, 2, _random.Random(42),
                            description="Answer the question.")
    parts = ctx.split("\n\n")
    assert parts[0] == "Answer the question."
    assert len(parts) == 4  # description + 2 shots + eval doc
    for shot in parts[1:3]:
        assert shot.startswith("Question: g")
        assert shot.endswith(" a")  # target appended
    assert parts[3] == doc.query  # eval doc has no target
    # the eval doc itself never appears as a shot
    assert all(not p.startswith("Question: g0\n") for p in parts[1:3])


def test_fewshot_end_to_end(tiny):
    config, params = tiny
    t = PIQA([{"goal": f"g{i}", "sol1": "a", "sol2": "b", "label": 0}
              for i in range(5)])
    res = evaluate_tasks(params, config, [t], char_tokenize, num_fewshot=2)
    assert 0.0 <= res["piqa"]["acc"] <= 1.0


def test_decontamination_reporting(tiny):
    """Planted 13-gram overlap → contaminated count + clean-only metric
    (reference evaluator.py:215-221)."""
    config, params = tiny
    dirty_text = ("the quick brown fox jumps over the lazy dog while "
                  "seven wizards watch quietly tonight")
    docs = [{"text": dirty_text + " end"},
            {"text": "completely different words in this one two three "
                     "four five six seven eight nine ten eleven done"}]
    t = Lambada(docs)
    res = evaluate_tasks(params, config, [t], char_tokenize,
                         decontamination_ngrams=[dirty_text])
    assert res["lambada_openai"]["contaminated"] == 1.0
    assert "acc_decontaminate" in res["lambada_openai"]


def test_dummy_lm_backend():
    """evaluate_tasks runs against DummyLM with no model (reference
    models/dummy.py smoke path)."""
    from onebit_tpu.eval.dummy import DummyLM
    t = PIQA([{"goal": "g", "sol1": "a", "sol2": "b", "label": 0}] * 4)
    res = evaluate_tasks(None, None, [t], char_tokenize, lm=DummyLM())
    assert 0.0 <= res["piqa"]["acc"] <= 1.0


def test_bootstrap_stderr():
    vals = [0.0, 1.0] * 50
    err = bootstrap_stderr(vals)
    # SE of mean for bernoulli(0.5), n=100 → ~0.05
    assert 0.02 < err < 0.09

"""Injected-doc tests for the full task library (VERDICT item 3).

Each task family is driven end-to-end through ``evaluate_tasks`` with a
scripted LM whose loglikelihoods/generations are chosen so the expected
metric value is known exactly.  Prompt formats are asserted against the
reference's byte-exact conventions (cited per task module).
"""

from __future__ import annotations

import numpy as np
import pytest

from onebit_tpu.eval.tasks.base import evaluate_tasks
from onebit_tpu.eval.tasks.registry import (
    ALL_TASKS,
    TASK_REGISTRY,
    get_task_class,
    pattern_match,
)


def char_tokenize(text):
    return [ord(c) % 128 for c in text]


def char_detokenize(toks):
    return "".join(chr(t) for t in toks)


class ScriptedLM:
    """Deterministic fake backend: ll = +1 for continuations containing a
    'winner' marker, else -1; generations replay a canned script."""

    def __init__(self, winners=(), generations=(), ll_fn=None):
        self.winners = list(winners)
        self.generations = list(generations)
        self.ll_fn = ll_fn
        self.seen_ll = []
        self.seen_gen = []

    def _score(self, cont: str):
        if self.ll_fn:
            return self.ll_fn(cont)
        return 1.0 if any(w in cont for w in self.winners) else -1.0

    def loglikelihood(self, requests):
        out = []
        for ctx, cont in requests:
            text = char_detokenize(cont)
            self.seen_ll.append((char_detokenize(ctx), text))
            out.append((self._score(text), text in self.winners))
        return out

    def loglikelihood_rolling(self, documents):
        return [-0.5 * len(d) for d in documents]

    def greedy_until(self, requests, detokenize=None, **kw):
        out = []
        for i, (ctx, stops) in enumerate(requests):
            self.seen_gen.append(char_detokenize(ctx))
            out.append(self.generations[i % max(len(self.generations), 1)]
                       if self.generations else "")
        return out


def run(task, lm, **kw):
    return evaluate_tasks(None, None, [task], char_tokenize,
                          detokenize=char_detokenize, lm=lm, **kw)


# ---------------------------------------------------------------------------
# registry
# ---------------------------------------------------------------------------

def test_registry_covers_reference_names():
    """Every reference TASK_REGISTRY family is present (reference
    tasks/__init__.py)."""
    expected = [
        "cola", "mnli", "mnli_mismatched", "mrpc", "rte", "qnli", "qqp",
        "sst", "wnli", "boolq", "cb", "copa", "multirc", "record", "wic",
        "wsc", "coqa", "drop", "lambada_openai", "lambada_standard",
        "lambada_openai_cloze", "lambada_standard_cloze", "wikitext",
        "piqa", "prost", "mc_taco", "pubmedqa", "sciq", "qa4mre_2011",
        "qa4mre_2012", "qa4mre_2013", "triviaqa", "arc_easy",
        "arc_challenge", "logiqa", "hellaswag", "swag", "openbookqa",
        "squad2", "race", "headqa", "headqa_es", "headqa_en", "mathqa",
        "webqs", "wsc273", "winogrande", "anli_r1", "anli_r2", "anli_r3",
        "ethics_cm", "ethics_deontology", "ethics_justice", "truthfulqa_mc",
        "mutual", "mutual_plus", "gsm8k", "toxigen", "storycloze_2016",
        "storycloze_2018", "sat", "anagrams1", "anagrams2", "cycle_letters",
        "random_insertion", "reversed_words",
    ]
    expected += [
        "ethics_utilitarianism", "ethics_utilitarianism_original",
        "ethics_virtue", "cbt-cn", "cbt-ne", "qasper", "truthfulqa_gen",
        "naturalqs", "quac", "stsb", "math_algebra",
        "math_counting_and_prob", "math_geometry",
        "math_intermediate_algebra", "math_num_theory", "math_prealgebra",
        "math_precalc", "math_asdiv", "wmt14-fr-en", "wmt16-de-en",
        "wmt20-zh-en", "iwslt17-ar-en",
    ]
    missing = [n for n in expected if n not in TASK_REGISTRY]
    assert not missing, missing
    assert len([n for n in ALL_TASKS if n.startswith("blimp_")]) == 67
    assert len([n for n in ALL_TASKS if n.startswith("pile_")]) == 22
    assert len([n for n in ALL_TASKS if n.startswith("arithmetic_")]) == 10
    assert len([n for n in ALL_TASKS if n.startswith("crows_pairs_")]) == 22
    assert len([n for n in ALL_TASKS if n.startswith("hendrycksTest-")]) == 57
    assert len([n for n in ALL_TASKS
                if n.startswith("lambada_openai_mt_")]) == 5


def test_pattern_match():
    assert pattern_match(["anli_r?"]) == ["anli_r1", "anli_r2", "anli_r3"]
    assert "gsm8k" in pattern_match(["gsm8k", "anli_*"])


# ---------------------------------------------------------------------------
# glue
# ---------------------------------------------------------------------------

def test_rte_format_and_metric():
    t = get_task_class("rte")(
        [{"sentence1": "A cat sat.", "sentence2": "A cat exists.",
          "label": 0}])
    doc = t.docs()[0]
    assert t.doc_to_text(doc) == \
        "A cat sat.\nQuestion: A cat exists. True or False?\nAnswer:"
    # entailment (label 0): correct iff ll_true > ll_false
    res = run(t, ScriptedLM(winners=[" True"]))
    assert res["rte"]["acc"] == 1.0
    res = run(t, ScriptedLM(winners=[" False"]))
    assert res["rte"]["acc"] == 0.0


def test_cola_mcc():
    docs = [{"sentence": f"s{i}", "label": i % 2} for i in range(8)]
    t = get_task_class("cola")(docs)
    # always predict "yes" → mcc = 0 (no correlation)
    res = run(t, ScriptedLM(winners=[" yes"]))
    assert res["cola"]["mcc"] == 0.0


def test_mnli_three_way():
    t = get_task_class("mnli")(
        [{"premise": "P", "hypothesis": "H", "label": 1}])
    assert t.doc_to_text(t.docs()[0]) == \
        "P\nQuestion: H. True, False or Neither?\nAnswer:"
    res = run(t, ScriptedLM(winners=[" Neither"]))
    assert res["mnli"]["acc"] == 1.0


def test_mrpc_f1():
    docs = [{"sentence1": "a", "sentence2": "b", "label": 1}] * 3
    t = get_task_class("mrpc")(docs)
    res = run(t, ScriptedLM(winners=[" yes"]))
    assert res["mrpc"]["acc"] == 1.0 and res["mrpc"]["f1"] == 1.0


# ---------------------------------------------------------------------------
# superglue
# ---------------------------------------------------------------------------

def test_cb_f1_multiclass():
    docs = [{"premise": "P", "hypothesis": "H", "label": 0}]
    t = get_task_class("cb")(docs)
    assert t.doc_to_text(t.docs()[0]) == \
        "P\nQuestion: H. True, False or Neither?\nAnswer:"
    res = run(t, ScriptedLM(winners=[" True"]))
    # single-class sample: f1 = mean over the 3 one-vs-rest F1s = 1/3
    # (absent classes are ill-defined → 0, reference cb_multi_fi semantics)
    assert res["cb"]["acc"] == 1.0
    assert res["cb"]["f1"] == pytest.approx(1 / 3)


def test_copa_connector_and_choice_case():
    doc = {"premise": "It rained.", "question": "cause",
           "choice1": "The sky darkened.", "choice2": "The sun shone.",
           "label": 0}
    t = get_task_class("copa")([doc])
    assert t.doc_to_text(doc) == "It rained because"
    lm = ScriptedLM(winners=[" the sky darkened."])
    res = run(t, lm)
    # choices are lowercased at the first char (reference convert_choice)
    assert (" the sky darkened.") in [c for _, c in lm.seen_ll]
    assert res["copa"]["acc"] == 1.0


def test_multirc_acc_all():
    # one question, two answer options: both must be judged correctly
    docs = [
        {"paragraph": "P", "question": "Q", "answer": "a1", "label": 1,
         "idx": {"paragraph": 0, "question": 0}},
        {"paragraph": "P", "question": "Q", "answer": "a2", "label": 0,
         "idx": {"paragraph": 0, "question": 0}},
    ]
    t = get_task_class("multirc")(docs)
    # model always says "yes is correct" → first option right, second wrong
    res = run(t, ScriptedLM(ll_fn=lambda c: 1.0 if "correct? yes" in c
                            else -1.0))
    assert res["multirc"]["acc"] == 0.0


def test_record_entity_selection():
    doc = {"passage": "Intro\n@highlight\nh1",
           "query": "X did @placeholder", "entities": ["Bob", "Eve"],
           "answers": ["Eve"]}
    t = get_task_class("record")([doc])
    conv = t.docs()[0]
    assert t.doc_to_text(conv) == "Intro\n\n  - h1.\n"
    res = run(t, ScriptedLM(winners=["Eve"]))
    assert res["record"]["em"] == 1.0 and res["record"]["f1"] == 1.0


def test_wsc_passage_markup():
    doc = {"text": "Mark told Pete many lies. He is stupid.",
           "span1_index": 0, "span1_text": "Mark",
           "span2_index": 5, "span2_text": "He", "label": 0}
    t = get_task_class("wsc")([doc])
    text = t.doc_to_text(doc)
    assert '"*He*"' in text and '"*Mark*"' in text
    assert "*He*" in text.split("Passage: ")[1]
    res = run(t, ScriptedLM(winners=[" no"]))
    assert res["wsc"]["acc"] == 1.0


# ---------------------------------------------------------------------------
# QA family
# ---------------------------------------------------------------------------

def test_openbookqa_and_sciq_gold():
    t = get_task_class("openbookqa")(
        [{"question_stem": "Q?", "choices": {"text": ["w", "x", "y", "z"]},
          "answerKey": "C"}])
    assert t.docs()[0].gold == 2
    t2 = get_task_class("sciq")(
        [{"support": "S.", "question": "Q?", "distractor1": "d1",
          "distractor2": "d2", "distractor3": "d3",
          "correct_answer": "right"}])
    d = t2.docs()[0]
    assert d.gold == 3 and d.query == "S.\nQuestion: Q?\nAnswer:"
    res = run(t2, ScriptedLM(winners=[" right"]))
    assert res["sciq"]["acc"] == 1.0


def test_race_collation_and_prompt():
    rows = [
        {"article": "ART", "question": "Q1", "answer": "A",
         "options": ["o1", "o2", "o3", "o4"]},
        {"article": "ART", "question": "Q2", "answer": "B",
         "options": ["p1", "p2", "p3", "p4"]},
    ]
    RACE = get_task_class("race")
    docs = RACE.collate(rows)
    assert len(docs) == 1 and len(docs[0]["problems"]) == 2
    t = RACE(docs)
    text = t.doc_to_text(docs[0])
    assert text.startswith("Article: ART\n\n")
    assert "Question: Q1\nAnswer: o1\n" in text   # earlier problem rendered
    assert text.endswith("Q2")                     # last problem unanswered
    res = run(t, ScriptedLM(winners=[" p2"]))
    assert res["race"]["acc"] == 1.0


def test_logiqa_block_format():
    t = get_task_class("logiqa")(
        [{"context": "C", "question": "Q", "options": ["w", "x", "y", "z"],
          "label": "b"}])
    d = t.docs()[0]
    assert d.query == ("Passage: C\nQuestion: Q\nChoices:\n"
                       "A. w\nB. x\nC. y\nD. z\nAnswer:")
    assert d.gold == 1


def test_mathqa_option_parsing():
    t = get_task_class("mathqa")(
        [{"Problem": "1+1?", "correct": "b",
          "options": "a ) 1 , b ) 2 , c ) 3 , d ) 4 , e ) 5"}])
    d = t.docs()[0]
    assert d.choices == ["1", "2", "3", "4", "5"] and d.gold == 1


def test_triviaqa_alias_prefixes_and_is_greedy():
    t = get_task_class("triviaqa")(
        [{"question": "Q?", "answer": {"value": "Paris",
                                       "aliases": ["Paris", "Paris, France"]}}])
    # "Paris, France" does NOT extend "Paris" as a string prefix? It does —
    # dedup keeps only "Paris"
    lm = ScriptedLM(winners=[" Paris"])
    res = run(t, lm)
    assert len(lm.seen_ll) == 1
    assert res["triviaqa"]["acc"] == 1.0


def test_webqs_any_alias():
    t = get_task_class("webqs")(
        [{"question": "Q?", "answers": ["Alpha", "Beta"]}])
    res = run(t, ScriptedLM(winners=[" Beta"]))
    assert res["webqs"]["acc"] == 1.0
    res = run(t, ScriptedLM(winners=[]))
    assert res["webqs"]["acc"] == 0.0


def test_anli_label_order():
    t = get_task_class("anli_r2")(
        [{"premise": "P", "hypothesis": "H", "label": 1}])
    assert t.doc_to_target(t.docs()[0]) == " Neither"
    res = run(t, ScriptedLM(winners=[" Neither"]))
    assert res["anli_r2"]["acc"] == 1.0


def test_wsc273_partial_evaluation():
    doc = {"text": "The trophy doesn't fit in the suitcase because it is "
                   "too big.",
           "pronoun": "it", "pronoun_loc": 47,
           "options": ["The trophy", "The suitcase"], "label": 0,
           "quote": "it is too big", "quote_loc": 44, "source": "t"}
    t = get_task_class("wsc273")([doc])
    conv = t.docs()[0]
    assert conv["text"][conv["pronoun_loc"]:
                        conv["pronoun_loc"] + 2] == "it"
    ctxs = [c for c, _ in
            t.construct_requests(conv, t.doc_to_text(conv))]
    # both options substituted at the pronoun location, tail is the target
    assert any("because the trophy" in c for c in ctxs)
    assert any("because the suitcase" in c for c in ctxs)
    lm = ScriptedLM(ll_fn=lambda c: 0.0)
    run(t, lm)
    assert all(cont == " is too big." for _, cont in lm.seen_ll)


def test_truthfulqa_mc1_mc2():
    doc = {"question": "Q?",
           "mc1_targets": {"choices": ["true answer", "wrong"],
                           "labels": [1, 0]},
           "mc2_targets": {"choices": ["t1", "t2", "w1"],
                           "labels": [1, 1, 0]}}
    t = get_task_class("truthfulqa_mc")([doc])
    assert t.doc_to_text(doc).startswith("Q: What is human life expectancy")
    lm = ScriptedLM(ll_fn=lambda c: 0.0 if c in (" true answer", " t1", " t2")
                    else -10.0)
    res = run(t, lm)
    assert res["truthfulqa_mc"]["mc1"] == 1.0
    assert res["truthfulqa_mc"]["mc2"] > 0.99


def test_mutual_rank_metrics():
    doc = {"article": "dialogue .", "options": ["r1", "r2", "r3", "r4"],
           "answers": "B"}
    t = get_task_class("mutual")([doc])
    # gold ranked 2nd → r@1=0, r@2=1, mrr=0.5
    lm = ScriptedLM(ll_fn=lambda c: {" r1": 2.0, " r2": 1.0, " r3": 0.0,
                                     " r4": -1.0}[c])
    res = run(t, lm)
    assert res["mutual"]["r@1"] == 0.0
    assert res["mutual"]["r@2"] == 1.0
    assert res["mutual"]["mrr"] == 0.5


def test_ethics_justice_grouped_em():
    docs = [{"scenario": f"s{i}", "label": 1, "group_id": i // 4}
            for i in range(8)]
    t = get_task_class("ethics_justice")(docs)
    res = run(t, ScriptedLM(winners=[" reasonable"]))
    assert res["ethics_justice"]["acc"] == 1.0
    assert res["ethics_justice"]["em"] == 1.0


# ---------------------------------------------------------------------------
# generation tasks
# ---------------------------------------------------------------------------

def test_gsm8k_answer_extraction():
    doc = {"question": "2+2?", "answer": "think\n#### 4"}
    t = get_task_class("gsm8k")([doc])
    assert t.doc_to_text(doc) == "Question: 2+2?\nAnswer:"
    res = run(t, ScriptedLM(generations=["irrelevant #### 4"]))
    assert res["gsm8k"]["acc"] == 1.0
    res = run(t, ScriptedLM(generations=["#### 5"]))
    assert res["gsm8k"]["acc"] == 0.0


def test_drop_number_aware_f1():
    doc = {"query_id": "1", "passage": "P", "question": "Q",
           "answer": {"number": "5", "date": {"day": "", "month": "",
                                              "year": ""}, "spans": []},
           "validated_answers": {"number": [], "date": [], "spans": []}}
    t = get_task_class("drop")([doc])
    res = run(t, ScriptedLM(generations=["5"]))
    assert res["drop"]["em"] == 1.0 and res["drop"]["f1"] == 1.0
    res = run(t, ScriptedLM(generations=["7"]))
    assert res["drop"]["em"] == 0.0 and res["drop"]["f1"] == 0.0


def test_coqa_conversation_rendering():
    doc = {"story": "S.",
           "questions": {"input_text": ["q1", "q2"]},
           "answers": {"input_text": ["a1", "a2"]},
           "additional_answers": None}
    t = get_task_class("coqa")([doc])
    text = t.doc_to_text(doc)
    assert text == "S.\n\nQ: q1\n\nA: a1\n\nQ: q2\n\nA:"
    res = run(t, ScriptedLM(generations=[" a2"]))
    assert res["coqa"]["em"] == 1.0


def test_squad2_mixed_request_types():
    """squad2 mixes greedy_until + loglikelihood in ONE construct_requests
    (reference squad.py) — exercises the evaluator's typed dispatch."""
    doc = {"id": "1", "title": "T", "context": "C", "question": "Q",
           "answers": {"text": ["gold answer"], "answer_start": [0]}}
    t = get_task_class("squad2")([doc])
    lm = ScriptedLM(generations=["gold answer"],
                    ll_fn=lambda c: -10.0)
    res = run(t, lm)
    assert res["squad2"]["exact"] == 1.0 and res["squad2"]["f1"] == 1.0
    # unanswerable doc: the ll probe decides
    doc2 = dict(doc, answers={"text": [], "answer_start": []})
    res = run(get_task_class("squad2")([doc2]),
              ScriptedLM(generations=["whatever"], ll_fn=lambda c: 0.0))
    assert res["squad2"]["exact"] == 1.0


def test_unscramble_exact_match():
    doc = {"context": "Unscramble: ttesr =", "completion": " trest"}
    t = get_task_class("cycle_letters")([doc])
    res = run(t, ScriptedLM(generations=[" trest"]))
    assert res["cycle_letters"]["acc"] == 1.0


# ---------------------------------------------------------------------------
# pair / probe tasks
# ---------------------------------------------------------------------------

def test_blimp_pair_comparison():
    doc = {"sentence_good": "good sent", "sentence_bad": "bad sent"}
    t = get_task_class("blimp_causative")([doc])
    res = run(t, ScriptedLM(winners=["good sent"]))
    assert res["blimp_causative"]["acc"] == 1.0


def test_crows_pairs_metrics_and_bias_filter():
    docs = [{"sent_more": "stereo", "sent_less": "anti",
             "bias_type": "race-color"},
            {"sent_more": "s2", "sent_less": "a2", "bias_type": "gender"}]
    t_all = get_task_class("crows_pairs_english")(docs)
    assert len(t_all.docs()) == 2
    t_rc = get_task_class("crows_pairs_english_race_color")(docs)
    assert len(t_rc.docs()) == 1
    lm = ScriptedLM(ll_fn=lambda c: 1.0 if c in ("stereo", "s2") else -2.0)
    res = run(t_all, lm)
    assert res["crows_pairs_english"]["pct_stereotype"] == 1.0
    assert res["crows_pairs_english"]["likelihood_difference"] == 3.0


def test_toxigen_label_threshold():
    docs = [{"text": "x", "toxicity_ai": 3.0, "toxicity_human": 3.0},
            {"text": "y", "toxicity_ai": 1.0, "toxicity_human": 1.0}]
    t = get_task_class("toxigen")(docs)
    assert [d.gold for d in t.docs()] == [1, 0]


def test_arithmetic_is_greedy():
    doc = {"context": "Q: 1+1=", "completion": " 2"}
    t = get_task_class("arithmetic_2da")([doc])
    lm = ScriptedLM(winners=[" 2"])
    res = run(t, lm)
    assert res["arithmetic_2da"]["acc"] == 1.0


def test_pile_rolling_ppl():
    cls = get_task_class("pile_github")
    assert cls.PILE_SET_NAME == "Github"
    t = cls(["some code document here", "another file text"])
    res = run(t, ScriptedLM())
    assert res["pile_github"]["word_perplexity"] > 1.0
    assert res["pile_github"]["bits_per_byte"] > 0.0


def test_storycloze_and_sat():
    t = get_task_class("storycloze_2016")(
        [{"input_sentence_1": "a.", "input_sentence_2": "b.",
          "input_sentence_3": "c.", "input_sentence_4": "d.",
          "sentence_quiz1": "happy end.", "sentence_quiz2": "sad end.",
          "answer_right_ending": 2}])
    res = run(t, ScriptedLM(winners=[" sad end."]))
    assert res["storycloze_2016"]["acc"] == 1.0

    t2 = get_task_class("sat")(
        [{"stem": "ostrich bird large", "solution": "b",
          "choices": ["lion cat big", "primate monkey small",
                      "bird crow big", "dog horse big", "fish trout big"],
          "source": "src"}])
    d = t2.docs()[0]
    assert t2.doc_to_text(d) == "ostrich is to bird as"
    assert d.choices[0] == "lion is to cat"


# ---------------------------------------------------------------------------
# round-2 additions: ethics variants, CBT, MATH, qasper, truthfulqa_gen,
# translation
# ---------------------------------------------------------------------------

def test_ethics_utilitarianism():
    docs = [{"activity": "I helped a stranger carry groceries.",
             "baseline": "I ignored a stranger who needed help."}]
    task = TASK_REGISTRY["ethics_utilitarianism"](docs)
    d = task.docs()[0]
    assert set(d["scenarios"]) == {docs[0]["activity"], docs[0]["baseline"]}
    # scripted LM answers yes -> acc = 1 iff label == 1
    lm = ScriptedLM(winners=[" yes"])
    res = run(task, lm)["ethics_utilitarianism"]
    assert res["acc"] == float(d["label"] == 1)
    assert "Is Scenario 1 preferable?" in lm.seen_ll[0][0]


def test_ethics_utilitarianism_original():
    docs = [{"activity": "good thing", "baseline": "bad thing"}]
    task = TASK_REGISTRY["ethics_utilitarianism_original"](docs)
    # ll peaks at rating " 9" for activity prompts, " 3" for baseline
    def ll(cont):
        return 0.0
    lm = ScriptedLM(ll_fn=lambda c: 0.0)
    seen = []
    def ll_fn(cont):
        return 0.0
    class RatingLM(ScriptedLM):
        def loglikelihood(self, requests):
            out = []
            for ctx, cont in requests:
                rating = int(char_detokenize(cont).strip())
                good = "good thing" in char_detokenize(ctx)
                peak = 9 if good else 3
                out.append((-abs(rating - peak), False))
            return out
    res = run(task, RatingLM())["ethics_utilitarianism_original"]
    assert res["acc"] == 1.0    # 9 > 3: first activity rated higher

    # few-shot uses the 5 fixed labeled prompts
    import random
    shots = task.fewshot_examples(3, random.Random(0))
    assert len(shots) == 3 and all("rating" in s for s in shots)
    with pytest.raises(AssertionError):
        task.fewshot_examples(6, random.Random(0))


def test_ethics_virtue_grouped_em():
    docs = [{"scenario": f"scenario {g}", "trait": f"trait {j}",
             "label": int(j == 0), "group_id": g}
            for g in range(2) for j in range(5)]
    task = TASK_REGISTRY["ethics_virtue"](docs)
    lm = ScriptedLM(ll_fn=lambda c: 1.0 if c == " no" else 0.0)
    res = run(task, lm)["ethics_virtue"]
    # predicting "no" everywhere: 4/5 right per group, em = 0
    assert res["acc"] == pytest.approx(0.8)
    assert res["em"] == 0.0


def test_cbt_cloze():
    docs = [{"sentences": ["The cat sat ."], 
             "question": "The XXXXX sat on the mat .",
             "options": ["dog", "cat"], "answer": "cat"}]
    task = TASK_REGISTRY["cbt-cn"](docs)
    lm = ScriptedLM(ll_fn=lambda c: 1.0 if "cat sat on the mat" in c else -1.0)
    res = run(task, lm)["cbt-cn"]
    assert res["acc"] == 1.0
    # full passage+question scored with empty context, option substituted,
    # detokenized (" ." -> ".")
    ctx, cont = lm.seen_ll[0]
    assert ctx == ""
    assert "XXXXX" not in cont and "Passage: The cat sat." in cont


def test_math_normalization_and_task():
    from onebit_tpu.eval.tasks.math_tasks import (is_equiv,
                                                  last_boxed_only_string,
                                                  remove_boxed,
                                                  strip_math_string)
    assert last_boxed_only_string(
        r"so the answer is \boxed{\frac{1}{2}} .") == r"\boxed{\frac{1}{2}}"
    assert remove_boxed(r"\boxed{42}") == "42"
    assert strip_math_string(r"\tfrac12") == r"\frac{1}{2}"
    assert strip_math_string("0.5") == r"\frac{1}{2}"
    assert is_equiv("1/2", r"\frac{1}{2}")
    assert is_equiv(r"\sqrt3", r"\sqrt{3}")
    assert not is_equiv("2", "3")

    docs = [{"problem": "What is 1+1?", "solution": r"It is $\boxed{2}$."}]
    task = TASK_REGISTRY["math_algebra"](docs)
    lm = ScriptedLM(generations=["$2$"])
    res = run(task, lm)["math_algebra"]
    assert res["acc"] == 1.0
    assert lm.seen_gen[0] == "Problem: What is 1+1?\nAnswer:"
    lm2 = ScriptedLM(generations=["$3$"])
    assert run(task, lm2)["math_algebra"]["acc"] == 0.0


def test_math_asdiv():
    docs = [{"body": "Tom has 2 apples and buys 3 more.",
             "question": " How many apples now?", "answer": "5 (apples)"}]
    task = TASK_REGISTRY["math_asdiv"](docs)
    assert task.doc_to_target(docs[0]) == " 5"
    lm = ScriptedLM(winners=[" 5"])
    res = run(task, lm)["math_asdiv"]
    assert res["acc"] == 1.0


def test_qasper_mixed_requests():
    docs = [
        {"title": "T", "abstract": "A", "question": "Is it fast?",
         "answer": "yes", "answer_type": "bool"},
        {"title": "T", "abstract": "A", "question": "What method?",
         "answer": "a neural net", "answer_type": "free form answer"},
    ]
    task = TASK_REGISTRY["qasper"](docs)
    lm = ScriptedLM(winners=[" yes"], generations=["a neural net"])
    res = run(task, lm)["qasper"]
    assert res["f1_yesno"] == 1.0
    assert res["f1_abstractive"] == 1.0

    # flatten() classifies raw HF rows
    from onebit_tpu.eval.tasks.qa import QASPER
    raw = {"title": "T", "abstract": "A",
           "qas": {"question": ["q1"],
                   "answers": [{"answer": [
                       {"unanswerable": False, "yes_no": True,
                        "free_form_answer": "", "extractive_spans": []}]}]}}
    flat = QASPER.flatten(raw)
    assert flat[0]["answer_type"] == "bool" and flat[0]["answer"] == "yes"


def test_truthfulqa_gen():
    docs = [{"question": " Why?", "correct_answers": ["Because of physics"],
             "incorrect_answers": ["Magic"]}]
    task = TASK_REGISTRY["truthfulqa_gen"](docs)
    lm = ScriptedLM(generations=["Because of physics."])
    res = run(task, lm)["truthfulqa_gen"]
    assert res["bleu_acc"] == 1.0 and res["rouge1_acc"] == 1.0
    assert res["rouge1_max"] > 0.5
    # zero-shot only
    import random
    with pytest.raises(AssertionError):
        task.fewshot_context(task.docs()[0], 1, random.Random(0))


def test_translation_corpus_bleu():
    docs = [{"src": "le chat est sur le tapis",
             "ref": "the cat is on the mat"},
            {"src": "le chien mange le pain",
             "ref": "the dog eats the bread"}]
    task = TASK_REGISTRY["wmt14-fr-en"](docs)

    class TransLM(ScriptedLM):
        BY_SRC = {"le chat": "the cat is on the mat",
                  "le chien": "the dog eats the bread"}

        def greedy_until(self, requests, detokenize=None, **kw):
            out = []
            for ctx, _ in requests:
                text = char_detokenize(ctx)
                self.seen_gen.append(text)
                out.append(next(v for k, v in self.BY_SRC.items()
                                if k in text))
            return out

    lm = TransLM()
    res = run(task, lm)["wmt14-fr-en"]
    assert res["bleu"] == pytest.approx(100.0)
    assert res["ter"] == pytest.approx(0.0)
    assert any(g.startswith("French phrase: le ")
               and g.endswith("\nEnglish phrase:") for g in lm.seen_gen)

    # zh target: character-split scoring (v1 convention)
    ztask = TASK_REGISTRY["wmt20-en-zh"](
        [{"src": "the cat", "ref": "猫咬"}])
    zlm = ScriptedLM(generations=["猫咬"])
    zres = run(ztask, zlm)["wmt20-en-zh"]
    assert zres["chrf"] > 0


def test_stub_tasks_raise_like_reference():
    for name, doc in (("naturalqs",
                       {"question": {"text": "q"}, "annotations": {},
                        "document": {}}),
                      ("quac", {"title": "t", "section_title": "s",
                                "paragraph": "p", "question": "q",
                                "answer": "a"}),
                      ("stsb", {"sentence1": "a", "sentence2": "b",
                                "label": 3.2})):
        task = TASK_REGISTRY[name]([doc])
        assert task.doc_to_text(doc)
        with pytest.raises(NotImplementedError):
            task.construct_requests(doc, "ctx")

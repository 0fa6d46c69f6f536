"""The zero-shot benchmark suite — prompt formats bit-identical to the
reference task modules (evaluation/lm_eval/tasks/*).

Each task converts its public dataset schema into MCDocs.  Data comes from
an injected doc list or from HF ``datasets`` when available (offline-first:
the constructor takes ``raw_docs``; ``from_datasets`` is the convenience
loader used when the corpus is on disk).

Formats (cited):
* PIQA (piqa.py:52-63): "Question: {goal}\\nAnswer:"; choices " {sol}".
* ARC-e/c (arc.py:54-67): "Question: {question}\\nAnswer:"; numeric answer
  keys remapped to letters.
* BoolQ (superglue.py:57-75): "{passage}\\nQuestion: {question}?\\nAnswer:";
  choices " no"/" yes" (label 1 = yes).
* HellaSwag (hellaswag.py:52-68): "{activity_label}: {ctx_a} {Ctx_b}" with
  the bracket/title scrubbing preprocess.
* Winogrande (winogrande.py:56-104): *partial evaluation* — per-option
  context "…option" and fixed continuation " {suffix}".
* LAMBADA (lambada.py): greedy last-word prediction scored by
  loglikelihood + is_greedy accuracy.
"""

from __future__ import annotations

import re
from typing import Dict, List, Optional, Sequence

import numpy as np

from onebit_tpu.eval.tasks.base import MCDoc, MultipleChoiceTask


class _DocListTask(MultipleChoiceTask):
    def __init__(self, raw_docs: Sequence[dict]):
        self._raw = list(raw_docs)

    def docs(self) -> List[MCDoc]:
        return [self.convert(d) for d in self._raw]

    def convert(self, doc: dict) -> MCDoc:
        raise NotImplementedError

    @classmethod
    def from_datasets(cls, split: Optional[str] = None, **load_kwargs):
        import datasets
        split = split or cls.DEFAULT_SPLIT
        ds = datasets.load_dataset(cls.DATASET_PATH, cls.DATASET_NAME,
                                   split=split, **load_kwargs)
        return cls(list(ds))


class PIQA(_DocListTask):
    name = "piqa"
    DATASET_PATH, DATASET_NAME, DEFAULT_SPLIT = "piqa", None, "validation"

    def convert(self, d):
        return MCDoc(query="Question: " + d["goal"] + "\nAnswer:",
                     choices=[d["sol1"], d["sol2"]],
                     gold=int(d["label"]))


class ARCEasy(_DocListTask):
    name = "arc_easy"
    DATASET_PATH, DATASET_NAME = "ai2_arc", "ARC-Easy"
    DEFAULT_SPLIT = "test"

    def convert(self, d):
        num_to_letter = {"1": "A", "2": "B", "3": "C", "4": "D", "5": "E"}
        key = num_to_letter.get(d["answerKey"], d["answerKey"])
        return MCDoc(query="Question: " + d["question"] + "\nAnswer:",
                     choices=list(d["choices"]["text"]),
                     gold=["A", "B", "C", "D", "E"].index(key))


class ARCChallenge(ARCEasy):
    name = "arc_challenge"
    DATASET_NAME = "ARC-Challenge"


class BoolQ(_DocListTask):
    name = "boolq"
    DATASET_PATH, DATASET_NAME, DEFAULT_SPLIT = "super_glue", "boolq", \
        "validation"

    def convert(self, d):
        return MCDoc(
            query=f"{d['passage']}\nQuestion: {d['question']}?\nAnswer:",
            choices=["no", "yes"], gold=int(d["label"]))

    def score(self, docs, results, spans):
        # reference BoolQ reports only acc (ll_yes vs ll_no comparison)
        full = super().score(docs, results, spans)
        return {"acc": full["acc"]}


class HellaSwag(_DocListTask):
    name = "hellaswag"
    DATASET_PATH, DATASET_NAME, DEFAULT_SPLIT = "hellaswag", None, \
        "validation"

    @staticmethod
    def _preprocess(text: str) -> str:
        text = text.strip()
        text = text.replace(" [title]", ". ")
        text = re.sub("\\[.*?\\]", "", text)
        text = text.replace("  ", " ")
        return text

    def convert(self, d):
        ctx = d["ctx_a"] + " " + d["ctx_b"].capitalize()
        return MCDoc(
            query=self._preprocess(d["activity_label"] + ": " + ctx),
            choices=[self._preprocess(e) for e in d["endings"]],
            gold=int(d["label"]))


class Winogrande(_DocListTask):
    """Partial evaluation: context differs per option, target fixed."""
    name = "winogrande"
    DATASET_PATH, DATASET_NAME, DEFAULT_SPLIT = "winogrande", \
        "winogrande_xl", "validation"

    def convert(self, d):
        loc = d["sentence"].index("_")
        target = " " + d["sentence"][loc + 1:].strip()
        contexts = [d["sentence"][:loc] + d["option1"],
                    d["sentence"][:loc] + d["option2"]]
        return MCDoc(query="", choices=[target, target],
                     gold=int(d["answer"]) - 1), contexts

    def docs(self):
        return [self.convert(d) for d in self._raw]

    def build_requests(self, docs, tokenize):
        requests, spans = [], []
        for doc, contexts in docs:
            start = len(requests)
            for ctx, target in zip(contexts, doc.choices):
                # separate tokenization (reference rf.loglikelihood(ctx,
                # target) with target already " "-prefixed)
                requests.append((tokenize(ctx), tokenize(target)))
            spans.append((start, len(requests)))
        return requests, spans

    def score(self, docs, results, spans):
        accs = []
        for (doc, _), (s, e) in zip(docs, spans):
            lls = np.asarray([results[i][0] for i in range(s, e)])
            accs.append(float(np.argmax(lls) == doc.gold))
        return {"acc": accs}


class Lambada(_DocListTask):
    """Last-word prediction: ll + greedy-exact accuracy (lambada.py)."""
    name = "lambada_openai"
    DATASET_PATH, DATASET_NAME, DEFAULT_SPLIT = "EleutherAI/lambada_openai", \
        "en", "test"

    def convert(self, d):
        text = d["text"]
        ctx, _, last = text.rpartition(" ")
        return MCDoc(query=ctx, choices=[last], gold=0)

    def score(self, docs, results, spans):
        accs, ppls = [], []
        for doc, (s, e) in zip(docs, spans):
            ll, greedy = results[s]
            accs.append(float(greedy))
            ppls.append(ll)
        return {"acc": accs}


TASK_REGISTRY = {
    "piqa": PIQA,
    "arc_easy": ARCEasy,
    "arc_challenge": ARCChallenge,
    "boolq": BoolQ,
    "hellaswag": HellaSwag,
    "winogrande": Winogrande,
    "lambada_openai": Lambada,
}

# MMLU (hendrycks_test) category aggregation (reference categories.py +
# lm_eval.py:140-166) is provided by mmlu.py.

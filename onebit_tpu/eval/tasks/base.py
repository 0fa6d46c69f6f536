"""Task framework: the lm-eval-harness Task API, TPU-backed.

Mirrors the reference's task machinery (evaluation/lm_eval/base.py Task /
MultipleChoiceTask + evaluator.py): a task turns docs into loglikelihood
requests, scores them with the batched TPU ``loglikelihood``, and
aggregates metrics (accuracy / normalized accuracy) with bootstrap stderr
(reference metrics.py).

Docs are plain dicts; each task ships a converter from its public dataset
schema (so HF datasets plug in when present) and tests inject synthetic
docs — data acquisition is decoupled from scoring.
"""

from __future__ import annotations

import dataclasses
import random
from typing import Callable, Dict, List, Optional, Sequence

import numpy as np


@dataclasses.dataclass
class MCDoc:
    """A multiple-choice doc: context + N choice continuations.

    ``choices`` hold the RAW choice strings (no leading space) — the space
    is added at request-build time and excluded from acc_norm length
    normalization, exactly like the reference (MultipleChoiceTask
    construct_requests adds " {}" while process_results normalizes by
    len(doc["choices"][i]), base.py).
    """
    query: str
    choices: List[str]
    gold: int


class MultipleChoiceTask:
    """Zero/few-shot multiple choice via loglikelihood comparison.

    Metrics follow the reference MultipleChoiceTask.process_results
    (base.py): ``acc`` = argmax of raw loglikelihood, ``acc_norm`` = argmax
    of byte-length-normalized loglikelihood.
    """

    name: str = "mc_task"

    def docs(self) -> List[MCDoc]:
        raise NotImplementedError

    def build_requests(self, docs: Sequence[MCDoc], tokenize: Callable):
        requests = []
        spans = []
        for doc in docs:
            start = len(requests)
            # context and continuation tokenized SEPARATELY — the reference
            # computes tok_encode(ctx) and tok_encode(" " + choice)
            # independently (base.py construct_requests + :179-181), which
            # differs from slicing a joint tokenization at BPE seams
            ctx_toks = tokenize(doc.query)
            for choice in doc.choices:
                cont = tokenize(" " + choice)
                if not cont:
                    cont = tokenize(choice)
                requests.append((ctx_toks, cont))
            spans.append((start, len(requests)))
        return requests, spans

    def score(self, docs: Sequence[MCDoc], results, spans) -> Dict:
        accs, accs_norm = [], []
        for doc, (s, e) in zip(docs, spans):
            lls = np.asarray([results[i][0] for i in range(s, e)])
            # normalize by the RAW choice length (reference base.py
            # completion_len = len(doc["choices"][i]), no leading space)
            lens = np.asarray([max(len(c), 1) for c in doc.choices])
            accs.append(float(np.argmax(lls) == doc.gold))
            accs_norm.append(float(np.argmax(lls / lens) == doc.gold))
        return {"acc": accs, "acc_norm": accs_norm}


def bootstrap_stderr(values: Sequence[float], iters: int = 1000,
                     seed: int = 1234) -> float:
    """Bootstrap standard error of the mean (reference metrics.py)."""
    values = np.asarray(values, np.float64)
    if len(values) <= 1:
        return 0.0
    rng = np.random.default_rng(seed)
    means = [rng.choice(values, size=len(values), replace=True).mean()
             for _ in range(iters)]
    return float(np.std(means, ddof=1))


def evaluate_tasks(params, config, tasks, tokenize, *, batch_size: int = 16,
                   limit: Optional[int] = None, impl: str = "auto",
                   compute_dtype=None, seed: int = 42) -> Dict[str, Dict]:
    """Run MC tasks → {task: {metric: value, metric_stderr: err}}.

    Doc order is shuffled with the reference's seed-42 convention
    (evaluator.py:161-210) before applying ``limit``.
    """
    import jax.numpy as jnp

    from onebit_tpu.eval.loglikelihood import loglikelihood

    compute_dtype = compute_dtype or jnp.float32
    out: Dict[str, Dict] = {}
    for task in tasks:
        docs = list(task.docs())
        random.Random(seed).shuffle(docs)
        if limit:
            docs = docs[:limit]
        requests, spans = task.build_requests(docs, tokenize)
        results = loglikelihood(params, config, requests,
                                batch_size=batch_size, impl=impl,
                                compute_dtype=compute_dtype,
                                max_length=config.max_position_embeddings)
        metrics = task.score(docs, results, spans)
        entry = {}
        for metric, values in metrics.items():
            entry[metric] = float(np.mean(values))
            entry[f"{metric}_stderr"] = bootstrap_stderr(values)
        out[task.name] = entry
    return out


def make_table(results: Dict[str, Dict]) -> str:
    """Markdown results table (reference evaluator.make_table,
    evaluator.py:283-314)."""
    lines = ["|Task|Metric|Value|Stderr|", "|---|---|---:|---:|"]
    for task in sorted(results):
        for metric in sorted(results[task]):
            if metric.endswith("_stderr"):
                continue
            err = results[task].get(f"{metric}_stderr", 0.0)
            lines.append(f"|{task}|{metric}|{results[task][metric]*100:.2f}"
                         f"|±{err*100:.2f}|")
    return "\n".join(lines)

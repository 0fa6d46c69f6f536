"""Offline dataset ingestion (eval/task_source.py + --task-source).

The reference loads task corpora through 13 vendored HF dataset builders
(evaluation/lm_eval/datasets/) so evaluation works without hub access;
here one file-layout convention replaces them.  These tests write
synthetic corpora in each supported format (jsonl/json/csv) using the
PUBLIC schemas the tasks' ``convert`` expects, and drive the
published-table tasks + coqa/drop/squad2/gsm8k/headqa end-to-end
offline — including through the CLI.
"""

import json
import os

import pytest

from onebit_tpu.eval.task_source import load_split, read_rows
from onebit_tpu.eval.tasks.registry import TASK_REGISTRY


def _write_jsonl(path, rows):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


# public hub schemas, one row each (+ enough for limit=1 evaluation)
ROWS = {
    "piqa": [{"goal": "open a jar", "sol1": "twist the lid",
              "sol2": "eat the jar", "label": 0}],
    "arc_easy": [{"question": "2+2?", "answerKey": "B",
                  "choices": {"text": ["3", "4", "5", "6"],
                              "label": ["A", "B", "C", "D"]}}],
    "boolq": [{"passage": "Cats are mammals.",
               "question": "are cats mammals", "label": 1}],
    "hellaswag": [{"activity_label": "Cooking",
                   "ctx_a": "The chef heats the pan.",
                   "ctx_b": "then she", "label": "1",
                   "endings": ["eats the pan [title]", "adds oil",
                               "sleeps", "flies"]}],
    "winogrande": [{"sentence": "The cup fell because _ was fragile.",
                    "option1": "the cup", "option2": "the floor",
                    "answer": "1"}],
    "lambada_openai": [{"text": "the last word is cheese"}],
    "headqa_en": [{"qtext": "Organ that pumps blood?", "ra": 2,
                   "answers": [{"atext": "lung"}, {"atext": "heart"},
                               {"atext": "bone"}, {"atext": "skin"}]}],
    "gsm8k": [{"question": "1+1?", "answer": "think\n#### 2"}],
    "drop": [{"query_id": "q0", "passage": "Tom has 3 apples.",
              "question": "How many apples?",
              "answer": {"number": "3", "date": {"day": "", "month": "",
                                                 "year": ""}, "spans": []},
              "validated_answers": None}],
    "coqa": [{"story": "Anna went home.",
              "questions": {"input_text": ["Who went home?"]},
              "answers": {"input_text": ["Anna"]},
              "additional_answers": {}}],
    "squad2": [{"title": "T", "context": "Paris is in France.",
                "question": "Where is Paris?", "id": "s0",
                "answers": {"text": ["France"], "answer_start": [12]}}],
}


@pytest.fixture(scope="module")
def source_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("task_source")
    for name, rows in ROWS.items():
        split = TASK_REGISTRY[name].DEFAULT_SPLIT
        _write_jsonl(str(d / name / f"{split}.jsonl"), rows)
    # MMLU layout: one dir per subject (reference hendrycksTest-* naming)
    _write_jsonl(str(d / "hendrycksTest-abstract_algebra" / "test.jsonl"),
                 [{"question": "x+x?", "choices": ["x", "2x", "x^2", "0"],
                   "answer": 1}])
    return str(d)


def test_read_rows_formats(tmp_path):
    rows = [{"a": "1", "b": "two"}, {"a": "3", "b": "four"}]
    _write_jsonl(str(tmp_path / "t" / "x.jsonl"), rows)
    assert read_rows(str(tmp_path / "t" / "x.jsonl")) == rows
    with open(tmp_path / "y.json", "w") as f:
        json.dump(rows, f)
    assert read_rows(str(tmp_path / "y.json")) == rows
    with open(tmp_path / "z.csv", "w") as f:
        f.write("a,b\n1,two\n3,four\n")
    assert read_rows(str(tmp_path / "z.csv")) == rows
    with pytest.raises(ValueError, match="unsupported"):
        read_rows(str(tmp_path / "nope.txt"))


def test_load_split_missing_is_loud(tmp_path):
    with pytest.raises(FileNotFoundError, match="no local data"):
        load_split(str(tmp_path), "piqa", "validation")


@pytest.mark.parametrize("name", sorted(ROWS))
def test_from_source_converts(source_dir, name):
    task = TASK_REGISTRY[name].from_source(source_dir, name)
    docs = task.docs()
    assert len(docs) == 1
    # the doc renders into a prompt and a target without error
    ctx = task.fewshot_context(docs[0], 0, rnd=None)
    assert isinstance(ctx, str) and ctx
    task.construct_requests(docs[0], ctx)


def test_mc_gold_correct(source_dir):
    doc = TASK_REGISTRY["headqa_en"].from_source(source_dir,
                                                 "headqa_en").docs()[0]
    assert doc.gold == 1 and doc.choices[doc.gold] == "heart"


def test_cli_eval_task_source(source_dir, tmp_path, capsys):
    """`eval --tasks piqa,gsm8k --task-source DIR` fully offline on a tiny
    native checkpoint."""
    import jax

    from onebit_tpu.ckpt.writer import save_native
    from onebit_tpu.model.bitllama import init_params, pack_model_params
    from onebit_tpu.model.config import BitLlamaConfig

    config = BitLlamaConfig.named("tiny")
    ckpt = str(tmp_path / "ckpt")
    save_native(ckpt, config, pack_model_params(
        init_params(config, jax.random.PRNGKey(0), mode="latent")))

    class _CharTok:
        def __call__(self, s, **kw):
            return {"input_ids": [ord(c) % 500 for c in s]}

        def decode(self, toks):
            return "".join(chr(int(t) % 128) for t in toks)

    import onebit_tpu.cli as cli
    import transformers
    orig = transformers.AutoTokenizer.from_pretrained
    transformers.AutoTokenizer.from_pretrained = staticmethod(
        lambda *_a, **_k: _CharTok())
    try:
        cli.main(["eval", "--ckpt", ckpt, "--tasks", "piqa,headqa_en",
                  "--task-source", source_dir, "--tokenizer", "x",
                  "--batch-size", "2", "--limit", "1"])
    finally:
        transformers.AutoTokenizer.from_pretrained = orig
    out = capsys.readouterr().out
    assert "piqa" in out and "headqa_en" in out
    results = json.loads(out.strip().splitlines()[-1])
    assert "piqa" in results and "acc" in results["piqa"]

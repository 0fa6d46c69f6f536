"""Original-distribution raw-file ingestion (eval/raw_formats.py).

Synthetic raw downloads in each corpus's PUBLISHED nesting — DROP's
section dict, CoQA's data list with per-turn answers, SQuAD v2's
data→paragraphs→qas tree, TriviaQA's Data/Answer.Aliases, HeadQA's exams
tree — dropped UNTOUCHED into a --task-source dir, must evaluate end to
end (VERDICT r3 item 5).  Reference parsers being matched:
evaluation/lm_eval/datasets/{drop,coqa,triviaqa,headqa}/*.py.
"""

import json
import os

import pytest

from onebit_tpu.eval import raw_formats
from onebit_tpu.eval.task_source import load_split
from onebit_tpu.eval.tasks.registry import TASK_REGISTRY

RAW_DROP = {
    "nfl_1": {
        "passage": "Tom scored 3 touchdowns. Anna scored 2.",
        "qa_pairs": [
            {"question": "How many touchdowns did Tom score?",
             "query_id": "q1",
             "answer": {"number": "3",
                        "date": {"day": "", "month": "", "year": ""},
                        "spans": []},
             "validated_answers": [
                 {"number": "3", "date": {}, "spans": []},
                 {"number": "", "date": {}, "spans": ["3 touchdowns"]},
             ]},
            {"question": "Who scored more?", "query_id": "q2",
             "answer": {"number": "",
                        "date": {"day": "", "month": "", "year": ""},
                        "spans": ["Tom"]}},
        ],
    },
}

RAW_COQA = {
    "version": "1.0",
    "data": [{
        "id": "c1", "source": "wikipedia",
        "story": "Anna went home early.",
        "questions": [{"input_text": "Who went home?", "turn_id": 1},
                      {"input_text": "When?", "turn_id": 2}],
        "answers": [{"span_start": 0, "span_end": 4, "span_text": "Anna",
                     "input_text": "Anna", "turn_id": 1},
                    {"span_start": 15, "span_end": 20,
                     "span_text": "early", "input_text": "early",
                     "turn_id": 2}],
        "additional_answers": {
            "0": [{"span_start": 0, "span_end": 4, "span_text": "Anna",
                   "input_text": "Anna", "turn_id": 1},
                  {"span_start": 15, "span_end": 20, "span_text": "early",
                   "input_text": "in the morning", "turn_id": 2}],
        },
    }],
}

RAW_SQUAD2 = {
    "version": "v2.0",
    "data": [{
        "title": "Paris",
        "paragraphs": [{
            "context": "Paris is the capital of France.",
            "qas": [
                {"id": "s1", "question": "What is the capital of France?",
                 "answers": [{"text": "Paris", "answer_start": 0}],
                 "is_impossible": False},
                {"id": "s2", "question": "What is the capital of Mars?",
                 "answers": [], "is_impossible": True},
            ],
        }],
    }],
}

RAW_TRIVIAQA = {
    "Version": 1.0,
    "Data": [{
        "Question": "Which planet is known as the Red Planet?",
        "QuestionId": "tq1", "QuestionSource": "http://example.com",
        "Answer": {"Value": "Mars", "Aliases": ["Mars", "The Red Planet"],
                   "NormalizedAliases": ["mars", "the red planet"]},
        "SearchResults": [],
    }],
}

RAW_HEADQA = {
    "language": "en",
    "exams": {
        "exam_2016": {
            "name": "Biology 2016", "year": "2016", "category": "biology",
            "data": [{
                "qid": "1",
                "qtext": "Which organ pumps blood?",
                "ra": "2",
                "answers": [{"aid": 1, "atext": "lung"},
                            {"aid": 2, "atext": "heart"},
                            {"aid": 3, "atext": "bone"},
                            {"aid": 4, "atext": "skin"}],
            }],
        },
    },
}

RAW_FILES = {
    "drop": ("drop_dataset_dev.json", RAW_DROP, "validation"),
    "coqa": ("coqa-dev-v1.0.json", RAW_COQA, "validation"),
    "squad2": ("dev-v2.0.json", RAW_SQUAD2, "validation"),
    "triviaqa": ("unfiltered-web-dev.json", RAW_TRIVIAQA, "validation"),
    "headqa_en": ("test_HEAD_EN.json", RAW_HEADQA, "test"),
}


@pytest.fixture(scope="module")
def raw_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("raw_source")
    for name, (fname, data, _split) in RAW_FILES.items():
        os.makedirs(d / name, exist_ok=True)
        with open(d / name / fname, "w") as f:
            json.dump(data, f)
    return str(d)


@pytest.mark.parametrize("name", sorted(RAW_FILES))
def test_raw_load_split(raw_dir, name):
    _, _, split = RAW_FILES[name]
    rows = load_split(raw_dir, name, split)
    assert rows and isinstance(rows[0], dict)


@pytest.mark.parametrize("name", sorted(RAW_FILES))
def test_raw_end_to_end_docs(raw_dir, name):
    """Untouched raw download → from_source → docs render → requests."""
    _, _, split = RAW_FILES[name]
    task = TASK_REGISTRY[name].from_source(raw_dir, name, split=split)
    docs = task.docs()
    assert docs
    ctx = task.fewshot_context(docs[0], 0, rnd=None)
    assert isinstance(ctx, str) and ctx
    task.construct_requests(docs[0], ctx)


def test_drop_field_fidelity(raw_dir):
    rows = load_split(raw_dir, "drop", "validation")
    assert len(rows) == 2                      # one row per qa_pair
    r = rows[0]
    assert r["passage"].startswith("Tom scored")
    assert r["answer"]["number"] == "3"
    # validated answers in the columnar form DROP.get_answers indexes
    assert r["validated_answers"]["number"] == ["3", ""]
    assert r["validated_answers"]["spans"][1] == ["3 touchdowns"]
    task = TASK_REGISTRY["drop"].from_source(raw_dir, "drop",
                                             split="validation")
    doc = task.docs()[0]
    # dedup: the validated "3" equals the main answer → 2 distinct golds
    assert doc["answers"] == [("3",), ("3 touchdowns",)]


def test_coqa_field_fidelity(raw_dir):
    rows = load_split(raw_dir, "coqa", "validation")
    r = rows[0]
    assert r["questions"]["input_text"] == ["Who went home?", "When?"]
    assert r["answers"]["input_text"] == ["Anna", "early"]
    task = TASK_REGISTRY["coqa"].from_source(raw_dir, "coqa",
                                             split="validation")
    doc = task.docs()[0]
    # final-turn answer set includes the additional annotator's variant
    assert task.get_answers(doc) == ["early", "in the morning"]


def test_squad2_field_fidelity(raw_dir):
    rows = load_split(raw_dir, "squad2", "validation")
    assert len(rows) == 2
    assert rows[0]["answers"]["text"] == ["Paris"]
    assert rows[1]["answers"]["text"] == []    # unanswerable row


def test_triviaqa_field_fidelity(raw_dir):
    rows = load_split(raw_dir, "triviaqa", "validation")
    r = rows[0]
    assert r["answer"]["value"] == "Mars"
    assert "The Red Planet" in r["answer"]["aliases"]


def test_headqa_field_fidelity(raw_dir):
    rows = load_split(raw_dir, "headqa_en", "test")
    task = TASK_REGISTRY["headqa_en"].from_source(raw_dir, "headqa_en",
                                                  split="test")
    doc = task.docs()[0]
    assert doc.gold == 1 and doc.choices[doc.gold] == "heart"
    assert rows[0]["year"] == "2016"


def test_raw_content_in_split_named_file(tmp_path):
    """A raw object saved AS <split>.json (not the original filename) is
    still recognized by content shape."""
    os.makedirs(tmp_path / "drop")
    with open(tmp_path / "drop" / "validation.json", "w") as f:
        json.dump(RAW_DROP, f)
    rows = load_split(str(tmp_path), "drop", "validation")
    assert len(rows) == 2 and rows[0]["query_id"] == "q1"


def test_raw_file_in_extracted_subdir(tmp_path):
    """Raw downloads that extract into a folder (drop_dataset/) are found
    one level down — the as-published layout."""
    os.makedirs(tmp_path / "drop" / "drop_dataset")
    with open(tmp_path / "drop" / "drop_dataset" /
              "drop_dataset_dev.json", "w") as f:
        json.dump(RAW_DROP, f)
    rows = load_split(str(tmp_path), "drop", "validation")
    assert len(rows) == 2


def test_flattened_rows_still_work(tmp_path):
    """The flattened public-schema convention is unchanged."""
    os.makedirs(tmp_path / "triviaqa")
    with open(tmp_path / "triviaqa" / "validation.jsonl", "w") as f:
        f.write(json.dumps({"question": "Q?", "answer": {
            "value": "A", "aliases": ["A"]}}) + "\n")
    rows = load_split(str(tmp_path), "triviaqa", "validation")
    assert rows[0]["answer"]["value"] == "A"


def test_unknown_raw_shape_is_loud(tmp_path):
    os.makedirs(tmp_path / "boolq")
    with open(tmp_path / "boolq" / "validation.json", "w") as f:
        json.dump({"not": "a list"}, f)
    with pytest.raises(ValueError, match="expected a JSON list"):
        load_split(str(tmp_path), "boolq", "validation")

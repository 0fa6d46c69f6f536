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


# ---------------------------------------------------------------------------
# Round 5 (VERDICT r4 item 5): the remaining vendored-builder corpora —
# ASDiv XML, MATH per-problem json dirs, LogiQA txt records, ETHICS csv,
# MuTual per-example txt dirs, QuAC json, SAT-package txt, unscramble
# jsonl.gz — all in their PUBLISHED nesting, untouched.
# ---------------------------------------------------------------------------

ASDIV_XML = """<?xml version="1.0" encoding="UTF-8"?>
<Machine-Reading-Corpus-File>
  <ProblemSet>
    <Problem ID="nluds-0001" Grade="1" Source="http://example.com">
      <Body>Seven red apples and two green apples are in the basket.</Body>
      <Question>How many apples are in the basket?</Question>
      <Solution-Type>Addition</Solution-Type>
      <Answer>9 (apples)</Answer>
      <Formula>7+2=9</Formula>
    </Problem>
  </ProblemSet>
</Machine-Reading-Corpus-File>
"""

LOGIQA_TXT = (
    "b\n"
    "All cats are animals.Some animals are black.\n"
    "Which conclusion follows?\n"
    "a.All cats are black.\n"
    "b.Some animals are cats.\n"
    "c.No cats are black.\n"
    "d.All animals are cats.\n"
    "\n"
    "a\n"
    "It rains every Monday.\n"
    "What happens on Monday?\n"
    "a.It rains.\n"
    "b.It snows.\n"
    "c.It is sunny.\n"
    "d.Nothing.\n"
)

SAT_TXT = """# comment line to be skipped
# 190 FROM REAL SATs

ml:sense
lull trust v:n
cajole compliance v:n
balk fortitude v:n
betray loyalty v:n
hinder destination v:n
soothe passion v:n
a

KS11.11-12
audacious boldness a:n
sanctimonious hypocrisy a:n
nostalgic knowledge a:n
cowardly fear a:n
belligerent honor a:n
vain clarity a:n
a
"""

RAW_QUAC = {
    "data": [{
        "title": "Cardiff City F.C.",
        "section_title": "History",
        "paragraphs": [{
            "context": "The club was founded in 1899. CANNOTANSWER",
            "qas": [
                {"question": "When was the club founded?",
                 "answers": [{"text": "1899", "answer_start": 25}],
                 "id": "q0"},
                {"question": "Where is the club from?",
                 "answers": [{"text": "Cardiff", "answer_start": 0}],
                 "id": "q1"},
            ],
        }],
    }],
}

MUTUAL_EXAMPLE = {
    "answers": "B",
    "options": ["m : nothing .", "m : thank you !",
                "m : sorry .", "m : goodbye ."],
    "article": "f : here is your coffee . m : thank you !",
    "id": "dev_1",
}

MATH_PROBLEM = {
    "problem": "What is $1+1$?",
    "level": "Level 1",
    "type": "Algebra",
    "solution": "We add: $1+1=\\boxed{2}$.",
}

ETHICS_CM_CSV = ('label,input,is_short,edited\n'
                 '1,"I kicked the dog.",True,False\n'
                 '0,"I fed the dog.",True,False\n')

ETHICS_VIRTUE_CSV = ('label,scenario\n'
                     + "".join(
                         f'{int(i == 2)},"Anna helped her rival up.'
                         f' [SEP] trait{i}"\n' for i in range(10)))

ETHICS_UTIL_CSV = ('"I walked in the park.","I walked in the mud."\n'
                   '"I won the lottery.","I found a penny."\n')


@pytest.fixture(scope="module")
def raw_dir5(tmp_path_factory):
    """Synthetic raw downloads, each in its corpus's published nesting."""
    import gzip as _gzip
    d = tmp_path_factory.mktemp("raw_source5")

    p = d / "math_asdiv" / "nlu-asdiv-dataset-55790e5" / "dataset"
    os.makedirs(p)
    (p / "ASDiv.xml").write_text(ASDIV_XML)

    os.makedirs(d / "logiqa")
    (d / "logiqa" / "Test.txt").write_text(LOGIQA_TXT)

    os.makedirs(d / "sat")
    (d / "sat" / "SAT-package-V3.txt").write_text(SAT_TXT)

    os.makedirs(d / "quac")
    with open(d / "quac" / "val_v0.2.json", "w") as f:
        json.dump(RAW_QUAC, f)

    for cfg in ("mutual", "mutual_plus"):
        p = d / cfg / "MuTual-master" / "data" / cfg / "dev"
        os.makedirs(p)
        (p / "dev_1.txt").write_text(json.dumps(MUTUAL_EXAMPLE))
        (p / "dev_2.txt").write_text("")       # occasional empty file
        (p / "dev_3.txt").write_text(json.dumps(
            {**MUTUAL_EXAMPLE, "id": "dev_3", "answers": "A"}))

    p = d / "math_algebra" / "MATH" / "test" / "algebra"
    os.makedirs(p)
    (p / "1.json").write_text(json.dumps(MATH_PROBLEM))
    (p / "2.json").write_text(json.dumps(
        {**MATH_PROBLEM, "problem": "What is $2+2$?",
         "solution": "$2+2=\\boxed{4}$."}))

    for name, csv_text in (("ethics_cm", ETHICS_CM_CSV),
                           ("ethics_virtue", ETHICS_VIRTUE_CSV)):
        cfg, prefix = {"ethics_cm": ("commonsense", "cm"),
                       "ethics_virtue": ("virtue", "virtue")}[name]
        p = d / name / "ethics" / cfg
        os.makedirs(p)
        (p / f"{prefix}_test.csv").write_text(csv_text)
    p = d / "ethics_utilitarianism_original" / "ethics" / "utilitarianism"
    os.makedirs(p)
    (p / "util_test.csv").write_text(ETHICS_UTIL_CSV)

    os.makedirs(d / "cycle_letters")
    with _gzip.open(d / "cycle_letters" / "cycle_letters_in_word.jsonl.gz",
                    "wt") as f:
        f.write(json.dumps({"context": "Please unscramble the letters "
                            "into a word:\nelppa =", "completion":
                            " apple"}) + "\n")
    return str(d)


R5_END_TO_END = ["math_asdiv", "logiqa", "sat", "mutual", "mutual_plus",
                 "math_algebra", "ethics_cm", "ethics_virtue",
                 "ethics_utilitarianism_original", "cycle_letters"]


@pytest.mark.parametrize("name", R5_END_TO_END)
def test_r5_raw_end_to_end_docs(raw_dir5, name):
    """Untouched raw download → from_source → docs render → requests."""
    split = "test" if name in ("logiqa", "math_algebra", "ethics_cm",
                               "ethics_virtue",
                               "ethics_utilitarianism_original") \
        else "validation"
    task = TASK_REGISTRY[name].from_source(raw_dir5, name, split=split)
    docs = task.docs()
    assert docs
    ctx = task.fewshot_context(docs[0], 0, rnd=None)
    assert isinstance(ctx, str) and ctx
    task.construct_requests(docs[0], ctx)


def test_asdiv_fidelity(raw_dir5):
    rows = load_split(raw_dir5, "math_asdiv", "validation")
    assert rows == [{"body": "Seven red apples and two green apples are "
                             "in the basket.",
                     "question": "How many apples are in the basket?",
                     "solution_type": "Addition",
                     "answer": "9 (apples)", "formula": "7+2=9"}]


def test_logiqa_fidelity(raw_dir5):
    rows = load_split(raw_dir5, "logiqa", "test")
    assert len(rows) == 2
    # '.' → '. ' normalization and the 2-char option prefix strip
    assert rows[0]["context"] == \
        "All cats are animals. Some animals are black."
    assert rows[0]["options"][1] == "Some animals are cats."
    assert rows[0]["label"] == "b"
    task = TASK_REGISTRY["logiqa"].from_source(raw_dir5, "logiqa",
                                               split="test")
    assert task.docs()[0].gold == 1


def test_sat_fidelity(raw_dir5):
    rows = load_split(raw_dir5, "sat", "validation")
    assert len(rows) == 2
    assert rows[0]["stem"] == "lull trust v:n"
    assert len(rows[0]["choices"]) == 5
    assert rows[0]["solution"] == "a"
    task = TASK_REGISTRY["sat"].from_source(raw_dir5, "sat",
                                            split="validation")
    doc = task.docs()[0]
    assert doc.query == "lull is to trust as" and doc.gold == 0
    assert doc.choices[0] == "cajole is to compliance"


def test_quac_fidelity(raw_dir5):
    rows = load_split(raw_dir5, "quac", "validation")
    assert len(rows) == 2                       # one row per question
    assert rows[0]["paragraph"] == "The club was founded in 1899. "
    assert "CANNOTANSWER" not in rows[0]["paragraph"]
    assert rows[0]["answer"] == "1899"
    assert rows[1]["question"] == "Where is the club from?"


def test_mutual_fidelity(raw_dir5):
    rows = load_split(raw_dir5, "mutual", "validation")
    assert len(rows) == 2                       # empty file skipped
    assert rows[0]["answers"] == "B" and rows[1]["id"] == "dev_3"
    task = TASK_REGISTRY["mutual"].from_source(raw_dir5, "mutual",
                                               split="validation")
    doc = task.docs()[0]
    assert task.process_results(
        doc, [(0.0, False), (1.0, False), (0.0, False), (0.0, False)]
    )["r@1"] == 1.0


def test_math_fidelity(raw_dir5):
    rows = load_split(raw_dir5, "math_algebra", "test")
    assert [r["problem"] for r in rows] == \
        ["What is $1+1$?", "What is $2+2$?"]
    task = TASK_REGISTRY["math_algebra"].from_source(raw_dir5,
                                                     "math_algebra",
                                                     split="test")
    docs = task.docs()
    assert docs[0]["answer"] == "2"            # \boxed{} extraction
    assert task.process_results(docs[1], ["$4$"])["acc"] == 1.0


def test_ethics_fidelity(raw_dir5):
    rows = load_split(raw_dir5, "ethics_cm", "test")
    assert rows[0] == {"label": "1", "input": "I kicked the dog.",
                       "is_short": "True", "edited": "False"}
    rows = load_split(raw_dir5, "ethics_virtue", "test")
    assert len(rows) == 10
    assert rows[0]["scenario"] == "Anna helped her rival up."
    assert rows[0]["trait"] == "trait0"
    # 5-doc group ids
    assert [r["group_id"] for r in rows] == [0] * 5 + [1] * 5
    rows = load_split(raw_dir5, "ethics_utilitarianism_original", "test")
    assert rows[0] == {"activity": "I walked in the park.",
                       "baseline": "I walked in the mud.", "rating": ""}


def test_unscramble_gz_fidelity(raw_dir5):
    rows = load_split(raw_dir5, "cycle_letters", "validation")
    assert rows[0]["completion"] == " apple"
    task = TASK_REGISTRY["cycle_letters"].from_source(
        raw_dir5, "cycle_letters", split="validation")
    doc = task.docs()[0]
    assert task.process_results(doc, [" apple"])["acc"] == 1.0

"""evaluate_saved: score a saved prediction file against gold docs
(reference Dataset(json_file, pred_file) + evaluate_predictions)."""

import json

import pytest

from kgforge.eval import evaluate_saved


@pytest.fixture()
def files(tmp_path):
    gold = [
        {
            "doc_key": "d0",
            "sentences": [["a", "b", "c"]],
            "ner": [[[0, 0, "Method"], [2, 2, "Task"]]],
            "relations": [[[0, 0, 2, 2, "USED-FOR"]]],
        },
        {
            "doc_key": "d1",
            "sentences": [["x", "y"]],
            "ner": [[[0, 0, "Method"], [1, 1, "Task"]]],
            "relations": [[[0, 0, 1, 1, "PART-OF"]]],
        },
    ]
    pred = [
        {
            "doc_key": "d0",
            # one mention right, one wrong TYPE; relation span-pair right
            "predicted_ner": [[[0, 0, "Method"], [2, 2, "Generic"]]],
            "predicted_relations": [[[0, 0, 2, 2, "USED-FOR"]]],
            "extraneous": "ignored",
        }
        # d1 absent: no predictions for it (overlay keeps gold side only)
    ]
    g, p = tmp_path / "gold.jsonl", tmp_path / "pred.jsonl"
    g.write_text("\n".join(json.dumps(d) for d in gold))
    p.write_text("\n".join(json.dumps(d) for d in pred))
    return str(g), str(p)


def test_evaluate_saved_counts(spark, files):
    scores = evaluate_saved(spark, *files)
    # NER: predicted 2, gold 4, matched 1
    assert scores["ner"]["precision"] == 0.5
    assert scores["ner"]["recall"] == 0.25
    # relations: predicted 1, gold 2, matched 1
    assert scores["relation"]["precision"] == 1.0
    assert scores["relation"]["recall"] == 0.5
    # strict: obj mention (2,3) was typed wrong -> not in correct_ner
    assert scores["strict_relation"]["precision"] == 0.0
    assert scores["strict_relation"]["recall"] == 0.0


def test_evaluate_saved_perfect_predictions(spark, files, tmp_path):
    gold_path, _ = files
    docs = [json.loads(x) for x in open(gold_path)]
    pred = [
        {
            "doc_key": d["doc_key"],
            "predicted_ner": d["ner"],
            "predicted_relations": d["relations"],
        }
        for d in docs
    ]
    p = tmp_path / "perfect.jsonl"
    p.write_text("\n".join(json.dumps(d) for d in pred))
    scores = evaluate_saved(spark, gold_path, str(p))
    for key in ("ner", "relation", "strict_relation"):
        assert scores[key]["f1"] == 1.0, key


def test_evaluate_saved_raw_duplicate_counting(spark, tmp_path):
    """Reference evaluate_predictions counts RAW lengths and
    per-prediction matches — duplicated annotations count every time
    (recall can exceed 1.0).  Pin those exact semantics."""
    gold = [
        {
            "doc_key": "d0",
            "sentences": [["a", "b", "c"]],
            "ner": [[[0, 0, "Method"], [2, 2, "Task"]]],
            "relations": [[[0, 0, 2, 2, "USED-FOR"]]],
        }
    ]
    pred = [
        {
            "doc_key": "d0",
            "predicted_ner": [[[0, 0, "Method"], [0, 0, "Method"], [2, 2, "Task"]]],
            "predicted_relations": [[[0, 0, 2, 2, "USED-FOR"], [0, 0, 2, 2, "USED-FOR"]]],
        }
    ]
    g, p = tmp_path / "gold.jsonl", tmp_path / "pred.jsonl"
    g.write_text("\n".join(json.dumps(d) for d in gold))
    p.write_text("\n".join(json.dumps(d) for d in pred))
    scores = evaluate_saved(spark, str(g), str(p))
    # NER: n_pred=3 raw, n_gold=2, n_correct=3 (the dup counts twice)
    assert scores["ner"]["precision"] == 1.0
    assert scores["ner"]["recall"] == 1.5
    # relations: n_pred=2 raw, n_gold=1, n_correct=2
    assert scores["relation"]["precision"] == 1.0
    assert scores["relation"]["recall"] == 2.0
    # strict: both raw matched predictions have correct arg mentions
    assert scores["strict_relation"]["precision"] == 1.0
    assert scores["strict_relation"]["recall"] == 2.0

"""Eval harness (§3.1 test-epoch analog) + predict path (§3.2) + model
overrides (§3.3 sweep mechanics)."""

import json

import pytest

from kgforge.core.model import get_model
from kgforge.eval import evaluate, predict_text
from kgforge.fixtures import gen_eval_docs


@pytest.fixture(scope="module")
def eval_path(tmp_path_factory):
    p = tmp_path_factory.mktemp("eval") / "eval_docs.jsonl"
    with open(p, "w") as f:
        for d in gen_eval_docs(40):
            f.write(json.dumps(d) + "\n")
    return str(p)


def test_evaluate_hits_quality_gate(spark, eval_path):
    m = evaluate(spark, eval_path)
    # surrogate pipeline == oracle semantics -> P/R = 1.0 (gate >= 0.95;
    # reference sweep gate is 0.68 on ACE05, xjobs.py:60)
    assert m["test_p"] >= 0.95 and m["test_r"] >= 0.95
    assert m["test_f1_plus"] >= 0.95
    assert m["test_f1"] >= m["test_f1_plus"] - 1e-9  # slice=3 is never stricter


def test_evaluate_degrades_with_tiny_topk(spark, eval_path):
    full = evaluate(spark, eval_path)
    # top_k=0-ish starves the classifier: recall must drop, never precision
    tiny = evaluate(spark, eval_path, model_name="repos@t=0.05,k=1")
    assert tiny["test_r"] <= full["test_r"]
    assert tiny["test_p"] >= 0.95


def test_predict_text_serving_path():
    out = predict_text("the anchor model is used for quartz sampler .")
    # depends on lexicon membership; at minimum: valid shape, no crash
    for t in out:
        assert set(t) == {"subj", "pred", "obj", "subj_type", "obj_type", "score"}
    assert predict_text("") == []


def test_model_name_overrides():
    m = get_model("repos@t=0.1,k=10")
    assert m.score_threshold == 0.1 and m.top_k_pairs == 10
    base = get_model("repos")
    assert m.gaz is base.gaz  # shared weights, different inference config
    with pytest.raises(KeyError):
        get_model("repos@bogus=1")

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


def test_evaluate_reference_slices(spark, eval_path):
    """Strict / NER / rel_f1 slices (theta.py:473-476,
    data_structures.py:404-441): the surrogate detects exactly the gold
    mentions and relations on the fixture corpus, so every slice is ~1.0,
    and strict can never exceed the span-level relation match."""
    m = evaluate(spark, eval_path)
    assert m["test_ner_f1"] >= 0.95
    assert m["test_f1_strict"] >= 0.95
    assert m["test_rel_f1"] >= 0.95
    # strict <= plain relation f1 by construction
    assert m["test_f1_strict"] <= m["test_f1"] + 1e-9


def test_strict_degrades_with_wrong_types(spark, eval_path):
    """A model variant that starves mention detection lowers NER recall
    and drags strict recall with it."""
    full = evaluate(spark, eval_path)
    tiny = evaluate(spark, eval_path, model_name="repos@t=0.05,k=1")
    assert tiny["test_r_strict"] <= full["test_r_strict"] + 1e-9

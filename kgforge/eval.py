"""Evaluation harness — the reference's val/test epoch as a Spark job.

Mirrors main.py's trainer.test() flow (§3.1): run the extraction cascade
over a SciERC-format eval corpus, join predictions against gold, and
compute set-based micro-P/R/F1 with the reference's exact semantics
(utils/metrics.py:1-52) — but DataFrame-side: the per-sentence set-dedup
is a dropDuplicates, the intersection a left_semi join (J7), the sums a
global agg (A1).

Two strictness levels, as in the reference:
  * slice=3  — (subj, obj, pred) text triple  (theta.py:454)
  * full     — + subj_type, obj_type          ("f1_plus", theta.py:474)
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .core.vocab import ENT_TYPES, REL_TYPES
from .extract.rel import extract_triples_fused
from .fixtures import load_eval_docs_sentences


def load_eval_units(spark: SparkSession, jsonl_path: str) -> tuple[DataFrame, DataFrame]:
    """eval_docs.jsonl -> (units df for the pipeline, gold triples df)."""
    with open(jsonl_path) as f:
        docs = [json.loads(line) for line in f if line.strip()]
    sents = load_eval_docs_sentences(docs)
    units = spark.createDataFrame(
        [
            {
                "repo": "eval", "path": s["doc_key"], "commit": "eval",
                "lang": "eval", "content_sha": "eval",
                "unit_id": s["sent_ix"], "kind": "sent",
                "text": " ".join(s["tokens"]),
            }
            for s in sents
        ]
    )
    gold_rows = []
    for s in sents:
        ner = {(st, en): t for st, en, t in s["ner"]}
        for ss, se, os_, oe, rel in s["relations"]:
            gold_rows.append(
                {
                    "doc_key": s["doc_key"],
                    "sent_ix": s["sent_ix"],
                    "subj": " ".join(s["tokens"][ss:se]),
                    "obj": " ".join(s["tokens"][os_:oe]),
                    "pred": REL_TYPES[rel],
                    "subj_type": ENT_TYPES[ner[(ss, se)]],
                    "obj_type": ENT_TYPES[ner[(os_, oe)]],
                }
            )
    gold = spark.createDataFrame(gold_rows)
    return units, gold


def evaluate(
    spark: SparkSession, jsonl_path: str, model_name: str = "repos"
) -> dict[str, float]:
    """Run the cascade over the eval corpus, return micro metrics."""
    units, gold = load_eval_units(spark, jsonl_path)
    pred = extract_triples_fused(units, model_name).select(
        F.col("path").alias("doc_key"),
        F.col("unit_id").alias("sent_ix"),
        "subj", "obj", "pred", "subj_type", "obj_type",
    )

    def _metrics(key_cols: list[str]) -> tuple[float, float, float]:
        p = pred.select(*key_cols).distinct()
        g = gold.select(*key_cols).distinct()
        n_pred, n_gold = p.count(), g.count()
        n_correct = p.join(g, on=key_cols, how="left_semi").count()
        precision = n_correct / (n_pred + 1e-8)
        recall = n_correct / (n_gold + 1e-8)
        f1 = 2 * precision * recall / (precision + recall + 1e-8)
        return f1, precision, recall

    sent_key = ["doc_key", "sent_ix"]
    f1_3, p_3, r_3 = _metrics(sent_key + ["subj", "obj", "pred"])
    f1_full, p_full, r_full = _metrics(
        sent_key + ["subj", "obj", "pred", "subj_type", "obj_type"]
    )
    return {
        "test_f1": round(f1_3, 4), "test_p": round(p_3, 4), "test_r": round(r_3, 4),
        "test_f1_plus": round(f1_full, 4),
        "test_p_plus": round(p_full, 4), "test_r_plus": round(r_full, 4),
    }


def predict_text(text: str, model_name: str = "repos") -> list[dict]:
    """Single-text serving path (reference predict.py, §3.2): same
    operators, no label joins, no Spark session needed — the cascade is
    row-local."""
    from .core.model import get_model
    from .core.surrogate import extract_triples, tokenize

    model = get_model(model_name)
    out = []
    for sub, obj, rel, st, ot, score in extract_triples(tokenize(text), model):
        out.append(
            {
                "subj": sub, "pred": REL_TYPES[rel], "obj": obj,
                "subj_type": ENT_TYPES[st], "obj_type": ENT_TYPES[ot],
                "score": score,
            }
        )
    return out

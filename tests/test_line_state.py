"""Incremental line-frequency state: stream == one-shot, exactly,
through auto-compaction and restart (the summed-state discipline shared
with the CMS cells, applied to the CCNet line-dedup family)."""

import json

from pyspark.sql import functions as F

from kgforge.functions.quality import doc_lines
from kgforge.streaming import (
    compact_line_epochs,
    dedup_state_layout,
    read_line_counts,
    run_incremental_linedup,
)

BOILER = " ".join(f"b{i}" for i in range(10))
DOCS = [
    (i, BOILER + " " + " ".join(f"u{i}x{j}" for j in range(10)))
    for i in range(30)
]


def _write_batches(input_dir, docs, n_files, start=0):
    input_dir.mkdir(parents=True, exist_ok=True)
    per = len(docs) // n_files
    for b in range(n_files):
        with open(input_dir / f"batch-{start + b}.json", "w") as f:
            for doc_id, text in docs[b * per : (b + 1) * per]:
                f.write(json.dumps({"doc_id": doc_id, "text": text}) + "\n")


def _one_shot(spark, docs):
    df = spark.createDataFrame(docs, "doc_id long, text string")
    return {
        r.k: r.n_docs
        for r in doc_lines(df, "text", 10)
        .select("doc_id", F.md5("line").alias("k"))
        .groupBy("k")
        .agg(F.count_distinct("doc_id").alias("n_docs"))
        .collect()
    }


def test_line_state_equals_one_shot_through_compaction_and_restart(
    spark, tmp_path
):
    inp, state, ckpt = tmp_path / "in", tmp_path / "state", tmp_path / "ckpt"
    _write_batches(inp, DOCS[:25], n_files=5)
    run_incremental_linedup(
        spark, str(inp), str(state), str(ckpt), compact_every=2
    )
    assert len(dedup_state_layout(str(state))) <= 3  # auto-compaction ran
    streamed = {r.k: r.n_docs for r in read_line_counts(spark, str(state)).collect()}
    assert streamed == _one_shot(spark, DOCS[:25])

    # restart with one more batch: checkpoint + _COMPLETE absorb history
    _write_batches(inp, DOCS[25:], n_files=1, start=5)
    run_incremental_linedup(
        spark, str(inp), str(state), str(ckpt), compact_every=2
    )
    streamed2 = {r.k: r.n_docs for r in read_line_counts(spark, str(state)).collect()}
    assert streamed2 == _one_shot(spark, DOCS)

    # explicit compaction folds to one source, counts unchanged
    m = compact_line_epochs(spark, str(state))
    if m is not None:
        assert m["n_lines"] == len(streamed2)
        assert m["total_docfreq"] == sum(streamed2.values())
    assert len(dedup_state_layout(str(state))) == 1
    final = {r.k: r.n_docs for r in read_line_counts(spark, str(state)).collect()}
    assert final == streamed2
    # the boilerplate line's accumulated df crossed any reasonable cap
    # while every unique line stayed at 1 — the drop decision the batch
    # query (text_line_dedup, cap 4) would make on the same corpus
    assert max(final.values()) == 30
    assert sorted(set(final.values())) == [1, 30]

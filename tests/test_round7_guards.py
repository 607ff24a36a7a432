"""Round-7 guard + scale-lift pins (r6 ADVICE items and VERDICT #1):

- pagerank / pagerank_residual on an EMPTY edge frame are no-ops, not
  ZeroDivisionError (incl. the all-weights-non-positive case that
  empties the frame after the w > 0 filter).
- bigram_perplexity raises loudly on an empty LM training slice instead
  of silently scoring every document ppl 0.0.
- curate_domain_mixture keeps a zero-document target domain visible
  (n_avail=0 drives n_total to 0) instead of renormalizing over the
  remaining domains.
- curate_length_curriculum's arithmetic phase rule == literal NTILE(4)
  for every n mod 4 residue, and its plan has no non-terminal
  SinglePartition exchange.
- dedup_repeated_spans keys grams by md5, not the 31-bit charfold
  (collision-proof exactness).
"""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F


def test_pagerank_empty_graph_is_noop(spark):
    from kgforge.graph.algo import pagerank, pagerank_residual

    empty = spark.createDataFrame([], "src long, dst long")
    stats: dict = {}
    pr = pagerank(empty, rounds=None, stats=stats)
    assert pr.columns == ["v", "pr"]
    assert pr.count() == 0
    assert stats == {"rounds": 0, "last_delta": 0.0}
    assert pagerank_residual(empty, pr) == 0.0


def test_pagerank_all_nonpositive_weights_is_noop(spark):
    from kgforge.graph.algo import pagerank

    de = spark.createDataFrame(
        [(1, 2, 0.0), (2, 3, -1.0)], "src long, dst long, w double"
    )
    assert pagerank(de, rounds=2).count() == 0


def test_refresh_pagerank_state_empty_epoch(spark, tmp_path):
    """A legitimately empty graph epoch must publish an empty snapshot
    (cron no-op), not crash the maintenance job."""
    import json
    import os

    from kgforge.streaming import refresh_pagerank_state

    gstate = tmp_path / "graph"
    edir = gstate / "epoch=0"
    edir.mkdir(parents=True)
    spark.createDataFrame([], "src long, dst long").write.parquet(
        str(edir / "edges")
    )
    (edir / "_COMPLETE").touch()
    m = refresh_pagerank_state(spark, str(gstate), str(tmp_path / "ranks"))
    assert m is not None and m["rounds"] == 0 and m["n_vertices"] == 0
    # idempotent: already fresh
    assert refresh_pagerank_state(
        spark, str(gstate), str(tmp_path / "ranks")
    ) is None
    with open(tmp_path / "ranks" / "epoch=0" / "metrics.json") as f:
        assert json.load(f)["epoch"] == 0
    assert os.path.exists(tmp_path / "ranks" / "epoch=0" / "_COMPLETE")


def test_bigram_perplexity_empty_slice_raises(spark):
    from kgforge.functions.quality import bigram_perplexity

    docs = spark.createDataFrame(
        [(1, "a b c", "de"), (2, "b c d", "fr")], "doc_id long, text string, lang string"
    )
    with pytest.raises(ValueError, match="empty LM training slice"):
        bigram_perplexity(docs, target_lang="en")
    # non-empty slice still works
    out = bigram_perplexity(docs, target_lang="de")
    assert out.count() == 2


def test_domain_mixture_missing_domain_visible(spark, tmp_path):
    """Target domain with zero documents: every target row survives with
    n_avail carried, the binding cap collapses to 0 takes, and achieved
    shares report 0.0 — the contract violation is loud, not silently
    renormalized away."""
    from kgforge.queries import ALL_QUERIES

    docs = spark.createDataFrame(
        [(i, f"tok{i} a b", l) for i, l in enumerate(
            ["en"] * 8 + ["de"] * 4 + ["fr"] * 4 + ["es"] * 4  # no zh
        )],
        "doc_id long, text string, lang string",
    )
    docs.write.parquet(str(tmp_path / "documents.parquet"))
    rows = {
        r.lang: r
        for r in ALL_QUERIES["curate_domain_mixture"](spark, str(tmp_path)).collect()
    }
    assert set(rows) == {"en", "de", "fr", "es", "zh"}
    assert rows["zh"].n_avail == 0
    assert all(r.n_take == 0 and r.n_selected == 0 for r in rows.values())
    assert all(r.achieved_share == 0.0 for r in rows.values())


@pytest.mark.parametrize("n", [3, 4, 7, 10, 12, 13])
def test_length_curriculum_arithmetic_matches_ntile(spark, tmp_path, n):
    from kgforge.queries import ALL_QUERIES

    docs = spark.createDataFrame(
        [(i, " ".join(["w"] * (1 + (i * 7) % 5))) for i in range(n)],
        "doc_id long, text string",
    ).withColumn("lang", F.lit("en"))
    d = tmp_path / f"n{n}"
    d.mkdir()
    docs.write.parquet(str(d / "documents.parquet"))
    got = {
        r.phase: (r.n_docs, r.member_checksum)
        for r in ALL_QUERIES["curate_length_curriculum"](spark, str(d)).collect()
    }
    ref = (
        docs.select("doc_id", F.size(F.split("text", " ")).alias("nn"))
        .withColumn("phase", F.ntile(4).over(Window.orderBy("nn", "doc_id")))
        .groupBy("phase")
        .agg(F.count("*").alias("c"), F.sum("doc_id").alias("ck"))
    )
    want = {r.phase: (r.c, r.ck) for r in ref.collect()}
    assert got == want


def test_length_curriculum_no_single_partition_exchange(spark):
    """The r6 perf-weak finding: phase assignment must not compile to an
    Exchange SinglePartition (whole corpus sorted by one task).  A
    single-partition exchange from the tiny final aggregate is fine —
    assert none feeds a Window/Sort over the document grain by checking
    the window stage itself is hash-partitioned."""
    from kgforge.queries import ALL_QUERIES

    df = ALL_QUERIES["curate_length_curriculum"](spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the only acceptable SinglePartition is the terminal scalar/agg
    # exchange; the rank path (global_row_number) must not produce a
    # global Sort under SinglePartition feeding a Window
    import re

    for m in re.finditer(r"Exchange SinglePartition[^\n]*", plan):
        ctx = plan[m.start() - 400 : m.start()]
        assert "Window" not in ctx, f"window fed by SinglePartition:\n{ctx}"


def test_repeated_spans_gram_hash_is_md5():
    import inspect

    from kgforge import queries

    src = inspect.getsource(queries.dedup_repeated_spans)
    assert "F.md5" in src
    sql = queries.ALL_ORACLES["dedup_repeated_spans"]
    assert "md5(array_to_string" in sql

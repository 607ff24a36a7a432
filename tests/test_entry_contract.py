"""Driver-contract smoke + oracle parity on a fast subset at sf0.001.

The full 30-query sweep lives in scripts/check_oracles.py (run per round
by the driver at sf0.01); here we pin the contract shape and a
representative slice so `pytest -x -q` catches regressions early.
"""

import duckdb
import pytest

import __spark_entry__ as entrymod
from scripts.check_oracles import TABLES, normalize

SF_DIR = "/root/testdata/sf0.001"

FAST_SUBSET = [
    "q1_pricing_summary",
    "q_topk_per_group",
    "kg_mentions",
    "kg_triples",
    "kg_content_sha",
    "dedup_minhash_sig",
    "ann_cosine_topk",
    "token_counts",
    "doc_fingerprint",
    # round-2 additions
    "kg_context_units",
    "kg_cross_mentions",
    "kg_predict_json",
    "ann_ivf_topk",
    "text_quality_filter",
    "kg_two_hop",
    # round-3 additions
    "kg_ctx_cross",
    "ann_ivf_recall",
    "bpe_merges",
    "kg_pagerank",
    "curation_funnel",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    cols = set(df.columns)
    assert {"doc_id", "subj", "pred", "obj", "src", "dst"} <= cols


def test_every_query_has_callable_and_most_have_oracles():
    from kgforge.queries import ALL_ORACLES, ALL_QUERIES

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert len(qs) >= 25
    # the driver's correctness snapshot records at most 50 rows (r01:
    # 40/40 registered; r02: exactly the first 50 of 56) — the contract
    # exposes exactly the core set so every registered query gets a row
    assert len(qs) <= 50
    assert set(oracles) <= set(qs)
    # every registered query has a DuckDB oracle
    assert set(qs) - set(oracles) == set()
    # the EXTRA registry keeps its oracles too, and never overlaps
    assert set(ALL_QUERIES) >= set(qs)
    assert set(ALL_ORACLES) == set(ALL_QUERIES)


@pytest.mark.parametrize("name", FAST_SUBSET)
def test_oracle_parity_subset(spark, duck, name):
    from kgforge.queries import ALL_ORACLES as oracles
    from kgforge.queries import ALL_QUERIES as qs
    df = qs[name](spark, SF_DIR)
    spark_cols = [c.lower() for c in df.columns]
    spark_rows = [tuple(r) for r in df.collect()]
    res = duck.sql(oracles[name])
    duck_cols = [c.lower() for c in res.columns]
    duck_rows = res.fetchall()
    assert len(spark_rows) == len(duck_rows)
    assert sorted(spark_cols) == sorted(duck_cols)
    assert normalize(spark_rows, spark_cols) == normalize(duck_rows, duck_cols)

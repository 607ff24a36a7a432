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
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert len(qs) >= 25
    assert set(oracles) <= set(qs)
    # r2: every registered query has a DuckDB oracle (multimodal_features
    # gained one — scalar sha-derived feature bytes + hex-nibble mirror)
    assert set(qs) - set(oracles) == set()


@pytest.mark.parametrize("name", FAST_SUBSET)
def test_oracle_parity_subset(spark, duck, name):
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    df = qs[name](spark, SF_DIR)
    spark_cols = [c.lower() for c in df.columns]
    spark_rows = [tuple(r) for r in df.collect()]
    res = duck.sql(oracles[name])
    duck_cols = [c.lower() for c in res.columns]
    duck_rows = res.fetchall()
    assert len(spark_rows) == len(duck_rows)
    assert sorted(spark_cols) == sorted(duck_cols)
    assert normalize(spark_rows, spark_cols) == normalize(duck_rows, duck_cols)

"""Train-curriculum top-k strategies (kgforge/extract/topk.py) vs the
reference semantics (re_model.py:282-342), reimplemented VERBATIM in
Python below: for every strategy and a grid of per-sentence statistics,
the shared SQL template must produce the reference's count on BOTH
engines (Spark F.expr and DuckDB), and the effective kept count must
equal the list-slice semantics ``len(groups[:count])``.
"""

from __future__ import annotations

import math

import duckdb
import pytest

from kgforge.extract.topk import (
    STRATEGY_SQL,
    kept_sql,
    strategy_count_sql,
)


def _ref_count(strategy, ent_count, G, pred_count, r, val_pos_count,
               labels_gold_count):
    """Verbatim transcription of re_model.py:297-342 (np.ceil -> math.ceil
    on scalars; int() on the non-negative expressions)."""
    if strategy == "0903":
        return max(int(math.ceil(ent_count * (1 - r))),
                   int(G - G * r + pred_count * r * 2))
    if strategy == "0927":
        return max(ent_count, int(G - G * r + pred_count * r * 2))
    if strategy == "0928":
        return max(int(math.ceil(ent_count * (1 - r / 2)) + 1),
                   int(G - G * r + pred_count * r * 2))
    if strategy == "1007":
        return max(int(math.ceil(ent_count * (1 - r / 2))),
                   int(G - G * r + pred_count * r))
    if strategy == "1008":
        return max(0, int(G - G * r + pred_count * r * 2))
    if strategy == "1017":
        return max(val_pos_count, int(G - G * r + pred_count * r * 2))
    if strategy == "1028":
        return max(val_pos_count, int(G - G * r + pred_count * r))
    if strategy == "1029":
        return min(int(math.ceil(val_pos_count * (3 - 2 * r))), G)
    if strategy == "1030":
        return min(int(math.ceil(val_pos_count * (3 - 2 * r ** 0.2))), G)
    if strategy == "1033":
        return min(int(math.ceil(val_pos_count * (3 - r ** 0.1) / 2)), G)
    if strategy == "1034":
        return min(int(math.ceil(labels_gold_count * (3 - r ** 0.1))), G)
    if strategy == "1036":
        return min(int(math.ceil(labels_gold_count * (3 - r ** 0.5))), G)
    if strategy == "1035":
        return labels_gold_count * 2
    if strategy == "11042":
        return labels_gold_count * 2 + 1
    if strategy == "11044":
        return labels_gold_count * 4 + 1
    if strategy == "11046":
        return labels_gold_count * 6 + 1
    if strategy == "1109":
        return max(int(ent_count / 2), int(G - G * r + pred_count * r))
    if strategy == "1130":
        return max(5, int(G - G * r + pred_count * r))
    return max(ent_count, int(G - G * r + pred_count * r))  # default


# (ec, g, pc, vp, lg) grid: empty sentence, tiny, pc=g, lg=0, big, skewed
GRID = [
    (0, 0, 0, 0, 0),
    (1, 0, 0, 0, 0),
    (2, 2, 1, 2, 1),
    (3, 6, 6, 6, 0),
    (5, 20, 3, 19, 7),
    (12, 132, 40, 130, 25),
    (30, 870, 0, 869, 200),
]
RECALLS = [0.0, 0.3, 0.8, 1.0]


@pytest.mark.parametrize("r", RECALLS)
def test_templates_match_reference_on_duckdb(r):
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE st AS SELECT * FROM (VALUES "
        + ", ".join(
            f"(CAST({ec} AS BIGINT), CAST({g} AS BIGINT), "
            f"CAST({pc} AS BIGINT), CAST({vp} AS BIGINT), "
            f"CAST({lg} AS BIGINT))"
            for ec, g, pc, vp, lg in GRID
        )
        + ") t(ec, g, pc, vp, lg)"
    )
    for name in STRATEGY_SQL:
        cnt = strategy_count_sql(name, r)
        rows = con.execute(
            f"SELECT ec, g, pc, vp, lg, {cnt} AS c, "
            f"{kept_sql(cnt)} AS k FROM st"
        ).fetchall()
        for ec, g, pc, vp, lg, c, k in rows:
            expect = _ref_count(name, ec, g, pc, r, vp, lg)
            assert c == expect, (name, r, (ec, g, pc, vp, lg), c, expect)
            # list-slice semantics: len(groups[:count])
            assert k == max(0, min(expect, g))


def test_templates_match_reference_on_spark(spark):
    from pyspark.sql import functions as F

    r = 0.8
    df = spark.createDataFrame(
        GRID, "ec bigint, g bigint, pc bigint, vp bigint, lg bigint"
    )
    for name in STRATEGY_SQL:
        cnt = strategy_count_sql(name, r)
        rows = df.select(
            "ec", "g", "pc", "vp", "lg",
            F.expr(cnt).alias("c"), F.expr(kept_sql(cnt)).alias("k"),
        ).collect()
        for row in rows:
            expect = _ref_count(name, row.ec, row.g, row.pc, r, row.vp, row.lg)
            assert row.c == expect, (name, tuple(row))
            assert row.k == max(0, min(expect, row.g))

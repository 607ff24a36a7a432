"""Count-min sketch: exact mergeability and the one-sided guarantee."""

import pytest
from pyspark.sql import functions as F

from kgforge.functions.sketches import (
    CMS_D,
    CMS_W,
    cms_cells,
    cms_estimate,
    cms_merge,
)


@pytest.fixture(scope="module")
def stream(spark):
    """A skewed token stream split into three batches."""
    toks = (
        ["alpha"] * 40 + ["beta"] * 25 + ["gamma"] * 10 + ["delta"] * 5
        + [f"rare{i}" for i in range(30)]
    )
    rows = [(i % 3, t) for i, t in enumerate(toks)]
    return spark.createDataFrame(rows, "batch int, tok string").localCheckpoint(
        eager=True
    )


def _cellmap(df):
    return {(r.j, r.bucket): r.cell_n for r in df.collect()}


def test_merge_of_batch_sketches_equals_one_shot(spark, stream):
    """The mergeability identity, EXACT: union-and-sum of per-batch
    sketches == sketch of the whole stream."""
    whole = _cellmap(cms_cells(stream))
    parts = [
        cms_cells(stream.filter(F.col("batch") == b)) for b in range(3)
    ]
    merged = _cellmap(cms_merge(parts))
    assert merged == whole
    assert sum(whole.values()) == CMS_D * 110  # every token hits D cells


def test_estimates_overestimate_and_bound_cells(spark, stream):
    cells = cms_cells(stream).localCheckpoint(eager=True)
    assert cells.count() <= CMS_D * CMS_W
    exact = stream.groupBy("tok").agg(F.count("*").alias("exact_n"))
    est = cms_estimate(cells, exact)
    rows = est.collect()
    assert len(rows) == 34
    for r in rows:
        assert r.cms_est >= r.exact_n  # CMS one-sided guarantee
    # heavy hitters stay well-separated from the rare tail even at W=8
    by_tok = {r.tok: r.cms_est for r in rows}
    assert by_tok["alpha"] >= 40

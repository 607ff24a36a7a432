"""Two-pass global rank == single-partition window rank, without the
Exchange SinglePartition (scale-safe S3/S4 ranking)."""

from pyspark.sql import Window
from pyspark.sql import functions as F

from kgforge.functions.ranks import global_row_number

SF = "/root/testdata/sf0.001"


def test_global_rank_matches_window(spark):
    d = spark.read.parquet(f"{SF}/documents.parquet")
    want = {
        (r.doc_id, r.rn)
        for r in d.withColumn(
            "rn", F.row_number().over(Window.orderBy("doc_id"))
        ).collect()
    }
    got = {(r.doc_id, r.rn) for r in global_row_number(d, ["doc_id"]).collect()}
    assert got == want


def test_global_rank_plan_has_no_single_partition(spark):
    d = spark.read.parquet(f"{SF}/documents.parquet")
    plan = (
        global_row_number(d, ["doc_id"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "SinglePartition" not in plan
    # ...whereas the naive window does sort on one task
    naive = d.withColumn("rn", F.row_number().over(Window.orderBy("doc_id")))
    assert "SinglePartition" in naive._jdf.queryExecution().executedPlan().toString()

"""Bucketed-table co-located join: same key + same bucket count == join
with NO shuffle on either side (the storage contract for repeated
large-to-large joins at 100 TB)."""

from pyspark.sql import functions as F

from kgforge.io.sinks import write_bucketed


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    # warehouse dir is a static conf on the shared session; tables land in
    # ./spark-warehouse — dropped (and the dir removed) in the finally
    a = spark.range(0, 2000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("va")
    )
    b = spark.range(0, 2000).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("vb")
    )
    spark.sql("DROP TABLE IF EXISTS bkt_a")
    spark.sql("DROP TABLE IF EXISTS bkt_b")
    write_bucketed(a, "bkt_a", ["k"], n_buckets=8)
    write_bucketed(b, "bkt_b", ["k"], n_buckets=8)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # force the non-broadcast path: the point is the LARGE-large join
        # (tiny test tables would otherwise be broadcast and the planner
        # rightly ignores bucketing)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        j = spark.table("bkt_a").join(spark.table("bkt_b"), on="k")
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning" not in plan, plan
        assert plan.count("Bucketed: true") == 2, plan
        assert j.count() == 2000
        row = j.filter(F.col("k") == 7).collect()[0]
        assert (row.va, row.vb) == (14, 21)
    finally:
        import shutil

        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS bkt_a")
        spark.sql("DROP TABLE IF EXISTS bkt_b")
        shutil.rmtree("spark-warehouse", ignore_errors=True)


def test_partitioned_write_prunes_scan(spark, tmp_path):
    """partitionBy layout + filter on the partition column == partition
    pruning at the scan (PartitionFilters populated, pushed to zero
    non-matching directories)."""
    from kgforge.graph.materialize import write_partitioned

    df = spark.range(0, 1000).select(
        F.col("id"), (F.col("id") % 4).cast("string").alias("ent_type")
    )
    p = str(tmp_path / "nodes")
    write_partitioned(df, p, ["ent_type"])
    back = spark.read.parquet(p).filter(F.col("ent_type") == "2")
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan
    assert "ent_type" in plan.split("PartitionFilters:")[1][:120]
    assert back.count() == 250

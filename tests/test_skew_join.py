"""AQE skew-join handling: a hot key in a sort-merge join is split at
runtime (skew=true in the final adaptive plan) — the runtime complement
to the explicit salting in graph/materialize.salted edge counts."""

from pyspark.sql import functions as F

SKEW_CONFS = {
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # aggressive thresholds so the tiny test partition counts as skewed
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "32KB",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "32KB",
    "spark.sql.autoBroadcastJoinThreshold": "-1",
    "spark.sql.adaptive.coalescePartitions.enabled": "false",
}


def test_aqe_splits_skewed_join(spark):
    prev = {k: spark.conf.get(k, None) for k in SKEW_CONFS}
    try:
        for k, v in SKEW_CONFS.items():
            spark.conf.set(k, v)
        # 90% of the left side lands on key 0 — one hot shuffle partition
        a = spark.range(0, 200000).select(
            F.when(F.col("id") % 10 < 9, 0).otherwise(F.col("id")).alias("k"),
            F.sha2(F.col("id").cast("string"), 256).alias("pad"),
        )
        b = spark.range(0, 1000).select(F.col("id").alias("k"), F.lit("x").alias("v"))
        j = a.join(b, on="k").groupBy().count()
        assert j.collect()[0]["count"] == 180100  # 180k hot + 100 tail hits
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan, plan
    finally:
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_triangle_degree_ordering_bounds_hub_wedges(spark):
    """kg_triangles' scale claim, numerically: on a 2000-spoke star plus
    a few closing edges, the naive wedge join enumerates ~C(2000,2) ~ 2M
    wedges at the hub, while the degree-ordered orientation points every
    spoke edge AT the hub (highest rank), leaving the hub with zero
    out-wedges.  Wedge counts are computed from degree sums (no need to
    materialize the quadratic join to prove it's quadratic), and the
    ordered triangle count still finds exactly the planted triangles."""
    from pyspark.sql import functions as F

    from kgforge.functions.ranks import global_row_number

    n_spokes = 2000
    edges = [("hub", f"s{i}") for i in range(n_spokes)]
    # close two triangles: hub-s0-s1, hub-s2-s3
    edges += [("s0", "s1"), ("s2", "s3")]
    und = spark.createDataFrame(edges, "a string, b string").select(
        F.least("a", "b").alias("a"), F.greatest("a", "b").alias("b")
    ).distinct().localCheckpoint(eager=True)

    dg = (
        und.select(F.col("a").alias("v"))
        .unionByName(und.select(F.col("b").alias("v")))
        .groupBy("v").agg(F.count("*").alias("deg"))
    )
    naive_wedges = dg.agg(
        F.sum(F.col("deg") * (F.col("deg") - 1) / 2).alias("w")
    ).first().w
    assert naive_wedges > 1_000_000  # the quadratic hub blow-up

    rk = global_row_number(dg, ["deg", "v"]).select("v", F.col("rn").alias("r"))
    od = (
        und.join(rk.withColumnRenamed("v", "a").withColumnRenamed("r", "ra"), on="a")
        .join(rk.withColumnRenamed("v", "b").withColumnRenamed("r", "rb"), on="b")
        .select(F.least("ra", "rb").alias("lo"), F.greatest("ra", "rb").alias("hi"))
        .localCheckpoint(eager=True)
    )
    outdeg = od.groupBy("lo").agg(F.count("*").alias("d"))
    ordered_wedges = outdeg.agg(
        F.sum(F.col("d") * (F.col("d") - 1) / 2).alias("w")
    ).first().w
    # ordered: the hub has rank max -> all spoke edges point INTO it;
    # remaining out-degrees are tiny
    assert ordered_wedges < 10

    e1 = od.select(F.col("lo").alias("x"), F.col("hi").alias("y"))
    e2 = od.select(F.col("lo").alias("x"), F.col("hi").alias("z"))
    e3 = od.select(F.col("lo").alias("y"), F.col("hi").alias("z"))
    tri = (
        e1.join(e2, on="x").filter(F.col("y") < F.col("z")).join(e3, on=["y", "z"])
    )
    assert tri.count() == 2  # exactly the planted triangles

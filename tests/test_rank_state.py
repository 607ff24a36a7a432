"""refresh_pagerank_state: converged-rank snapshots derived from the
incremental graph state, warm-started epoch over epoch, under the shared
epoch=N/_COMPLETE crash discipline — and the maintain_job CLI wiring."""

import json
import os
import sys

from pyspark.sql import functions as F  # noqa: F401

from kgforge.graph.algo import pagerank
from kgforge.streaming import refresh_pagerank_state


def _write_graph_epoch(spark, state, n, edges):
    d = state / f"epoch={n}"
    spark.createDataFrame(edges, "src bigint, dst bigint").write.parquet(
        str(d / "edges")
    )
    open(d / "_COMPLETE", "w").close()


def _chain(n):
    return [(i, i + 1) for i in range(n - 1)]


def test_refresh_cold_then_idempotent(spark, tmp_path):
    gstate, rstate = tmp_path / "g", tmp_path / "r"
    os.makedirs(gstate)
    _write_graph_epoch(spark, gstate, 0, _chain(10))
    m = refresh_pagerank_state(spark, str(gstate), str(rstate), tol=1e-8)
    assert m is not None and m["warm_from"] is None and m["epoch"] == 0
    assert m["n_vertices"] == 10 and m["rounds"] > 3
    assert os.path.exists(rstate / "epoch=0" / "_COMPLETE")
    # already fresh: cron no-op
    assert refresh_pagerank_state(spark, str(gstate), str(rstate)) is None


def test_refresh_warm_start_tracks_graph_epochs(spark, tmp_path):
    gstate, rstate = tmp_path / "g", tmp_path / "r"
    os.makedirs(gstate)
    _write_graph_epoch(spark, gstate, 0, _chain(12))
    m0 = refresh_pagerank_state(spark, str(gstate), str(rstate), tol=1e-9)
    _write_graph_epoch(spark, gstate, 1, _chain(12) + [(11, 12)])
    m1 = refresh_pagerank_state(spark, str(gstate), str(rstate), tol=1e-9)
    assert m1["warm_from"] == 0 and m1["epoch"] == 1
    # warm refresh needs fewer rounds than a cold converge on epoch 1
    cold_stats = {}
    de = spark.createDataFrame(
        _chain(12) + [(11, 12)], "src bigint, dst bigint"
    )
    cold = pagerank(de, rounds=None, tol=1e-9, max_rounds=300, stats=cold_stats)
    assert m1["rounds"] < cold_stats["rounds"]
    # same fixpoint as cold, single-snapshot retention (epoch=0 gone)
    got = {
        r.v: r.pr
        for r in spark.read.parquet(str(rstate / "epoch=1" / "ranks")).collect()
    }
    exp = {r.v: r.pr for r in cold.collect()}
    assert set(got) == set(exp)
    assert all(abs(got[v] - exp[v]) < 1e-7 for v in exp)
    assert sorted(os.listdir(rstate)) == ["epoch=1"]
    assert m0["rounds"] > m1["rounds"]


def test_maintain_job_rank_state_cli(spark, tmp_path, capsys, monkeypatch):
    from jobs.maintain_job import main

    gstate, rstate = tmp_path / "g", tmp_path / "r"
    os.makedirs(gstate)
    _write_graph_epoch(spark, gstate, 3, _chain(8))
    monkeypatch.setattr(sys, "argv", [
        "maintain_job.py",
        "--graph-state", str(gstate),
        "--rank-state", str(rstate),
        "--keep-last", "5",
    ])
    monkeypatch.setattr("pyspark.sql.SparkSession.stop", lambda self: None)
    main()
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["ranks"]["refreshed"] is True
    assert summary["ranks"]["epoch"] == 3
    assert os.path.exists(rstate / "epoch=3" / "_COMPLETE")


def test_refresh_survives_crash_debris(spark, tmp_path):
    """A crash between writing _COMPLETE inside the tmp dir and the
    publishing rename must not wedge every later refresh: the tmp
    namespace is outside epoch= (so latest_complete_epoch never parses
    it) and stale debris is swept before reading state."""
    gstate, rstate = tmp_path / "g", tmp_path / "r"
    os.makedirs(gstate)
    _write_graph_epoch(spark, gstate, 0, _chain(6))
    # simulate the worst-case crash point: complete-looking tmp debris
    debris = rstate / "_tmp_epoch_0"
    os.makedirs(debris)
    open(debris / "_COMPLETE", "w").close()
    m = refresh_pagerank_state(spark, str(gstate), str(rstate), tol=1e-8)
    assert m is not None and m["epoch"] == 0
    assert os.path.exists(rstate / "epoch=0" / "_COMPLETE")
    assert not os.path.exists(debris)

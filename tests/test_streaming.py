"""Streaming == batch for the extraction cascade; checkpoint gives
exactly-once per input file."""

import json
import pathlib

from kgforge.extract.pipeline import extract_pipeline
from kgforge.fixtures import gen_repo_rows
from kgforge.streaming import run_stream_once

KEY = lambda r: (  # noqa: E731
    r.repo, r.path, r.unit_id, r.subj, r.pred, r.obj, r.subj_type, r.obj_type,
)


def _write_json_files(rows, d: pathlib.Path, per_file: int = 20, prefix: str = "batch"):
    d.mkdir(parents=True, exist_ok=True)
    for i in range(0, len(rows), per_file):
        with open(d / f"{prefix}-{i:05d}.json", "w") as f:
            for r in rows[i : i + per_file]:
                f.write(json.dumps(r) + "\n")


def test_stream_matches_batch(spark, tmp_path):
    rows = gen_repo_rows(60)
    inp, out, ckpt = tmp_path / "in", tmp_path / "out", tmp_path / "ckpt"
    _write_json_files(rows, inp)

    run_stream_once(spark, str(inp), str(out), str(ckpt))
    streamed = {KEY(r) for r in spark.read.parquet(str(out)).collect()}
    batch = {KEY(r) for r in extract_pipeline(spark.createDataFrame(rows), "fused").collect()}
    assert streamed == batch


def test_stream_resume_exactly_once(spark, tmp_path):
    rows = gen_repo_rows(60)
    inp, out, ckpt = tmp_path / "in", tmp_path / "out", tmp_path / "ckpt"
    _write_json_files(rows[:40], inp)
    run_stream_once(spark, str(inp), str(out), str(ckpt))
    n1 = spark.read.parquet(str(out)).count()

    # re-run with no new input: nothing re-extracted
    run_stream_once(spark, str(inp), str(out), str(ckpt))
    assert spark.read.parquet(str(out)).count() == n1

    # late-arriving files (same watched dir): only the delta is appended
    _write_json_files(rows[40:], inp, prefix="late")
    run_stream_once(spark, str(inp), str(out), str(ckpt))
    total = spark.read.parquet(str(out)).count()
    batch_total = extract_pipeline(spark.createDataFrame(rows), "fused").count()
    assert total == batch_total


def test_windowed_triple_counts_watermark(spark, tmp_path):
    """Event-time windowed counts with watermark: windows close when the
    watermark passes; per-(window, pred) counts match a batch groupBy."""
    import datetime as dt

    from pyspark.sql import functions as F

    from kgforge.streaming import windowed_triple_counts

    base = dt.datetime(2026, 1, 1, 0, 0, 0)
    rows = []
    # two 10-min windows of triples, then a far-future row to advance the
    # watermark past both
    for i in range(40):
        rows.append(
            {"pred": "USED-FOR" if i % 2 else "PART-OF",
             "event_time": (base + dt.timedelta(minutes=i % 20)).isoformat()}
        )
    rows.append({"pred": "USED-FOR",
                 "event_time": (base + dt.timedelta(hours=6)).isoformat()})
    inp = tmp_path / "in"
    _write_json_files(rows, inp, per_file=10)

    stream = (
        spark.readStream.schema("pred string, event_time string")
        .format("json").load(str(inp))
        .withColumn("event_time", F.to_timestamp("event_time"))
    )
    out = windowed_triple_counts(stream, window="10 minutes", watermark="30 minutes")
    q = (
        out.writeStream.format("memory").queryName("win_counts")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination()
    got = {
        (r.window_start.isoformat(), r.pred): r.n_triples
        for r in spark.sql("select * from win_counts").collect()
    }
    # the two closed windows carry 10 rows per pred each
    assert got[("2026-01-01T00:00:00", "USED-FOR")] == 10
    assert got[("2026-01-01T00:00:00", "PART-OF")] == 10
    assert got[("2026-01-01T00:10:00", "USED-FOR")] == 10
    assert got[("2026-01-01T00:10:00", "PART-OF")] == 10
    # the far-future window is NOT emitted (watermark has not passed it)
    assert all(ws.startswith("2026-01-01T00:") for ws, _ in got)


def test_streaming_first_seen_dedup(spark, tmp_path):
    """Cross-micro-batch exact dedup: a key emits exactly once across ALL
    batches (state persists in the checkpoint between availableNow runs)."""
    from kgforge.streaming import streaming_first_seen

    inp, out, ckpt = tmp_path / "in", tmp_path / "out", tmp_path / "ckpt"
    _write_json_files(
        [{"content_sha": f"sha{i % 7}"} for i in range(30)], inp, per_file=5
    )

    def drain():
        stream = (
            spark.readStream.schema("content_sha string")
            .option("maxFilesPerTrigger", 1)
            .format("json").load(str(inp))
        )
        q = (
            streaming_first_seen(stream).writeStream.format("parquet")
            .option("path", str(out)).outputMode("append")
            .option("checkpointLocation", str(ckpt))
            .trigger(availableNow=True).start()
        )
        q.awaitTermination()

    drain()
    got = [r.content_sha for r in spark.read.parquet(str(out)).collect()]
    assert sorted(got) == sorted({f"sha{i}" for i in range(7)})

    # late re-arrivals of the same keys: suppressed by the persisted state
    _write_json_files(
        [{"content_sha": f"sha{i % 7}"} for i in range(7)], inp, prefix="late"
    )
    drain()
    got2 = [r.content_sha for r in spark.read.parquet(str(out)).collect()]
    assert sorted(got2) == sorted(got)


def test_incremental_graph_stream_equals_batch(spark, tmp_path):
    """Streamed per-micro-batch graph maintenance (dim evolution + merge)
    converges to the one-shot materialization of the full corpus, and a
    second drain with no new input changes nothing (replay-safe)."""
    from kgforge.graph.materialize import materialize_graph
    from kgforge.streaming import read_graph_state, run_incremental_graph

    rows = gen_repo_rows(50)
    inp = tmp_path / "in"
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    _write_json_files(rows, inp, per_file=25)  # 2 files -> 2 micro-batches

    run_incremental_graph(spark, str(inp), state, ckpt)
    nodes_s, edges_s, _ = read_graph_state(spark, state)

    full = extract_pipeline(spark.createDataFrame(rows), "fused")
    nodes_f, edges_f = materialize_graph(full)

    key_e = lambda r: (r.src, r.dst, r.pred, r.weight)  # noqa: E731
    assert sorted(map(key_e, edges_s.collect())) == sorted(
        map(key_e, edges_f.collect())
    )
    key_n = lambda r: (  # noqa: E731
        r.canonical_id, r.ent_type, tuple(r.surface_forms), r.mention_count
    )
    assert sorted(map(key_n, nodes_s.collect())) == sorted(
        map(key_n, nodes_f.collect())
    )

    # drain again with no new files: state unchanged
    import os

    latest_before = open(os.path.join(state, "_LATEST")).read()
    run_incremental_graph(spark, str(inp), state, ckpt)
    assert open(os.path.join(state, "_LATEST")).read() == latest_before


def test_incremental_graph_survives_stale_latest(spark, tmp_path):
    """A crash between writing an epoch's _COMPLETE marker and updating the
    _LATEST file must not drop that epoch's triples: the authoritative
    latest epoch comes from scanning _COMPLETE markers, so later epochs
    merge from the right state even when _LATEST is missing or stale."""
    import os

    from kgforge.graph.materialize import materialize_graph
    from kgforge.streaming import (
        latest_complete_epoch,
        read_graph_state,
        run_incremental_graph,
    )

    rows = gen_repo_rows(40)
    inp = tmp_path / "in"
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    _write_json_files(rows[:20], inp, per_file=20)
    run_incremental_graph(spark, str(inp), state, ckpt)
    e0 = latest_complete_epoch(state)
    assert e0 is not None
    # simulate the crash window: epoch data + _COMPLETE exist, _LATEST gone
    os.remove(os.path.join(state, "_LATEST"))

    _write_json_files(rows[20:], inp, per_file=20, prefix="late")
    run_incremental_graph(spark, str(inp), state, ckpt)
    assert latest_complete_epoch(state) > e0

    nodes_s, edges_s, _ = read_graph_state(spark, state)
    full = extract_pipeline(spark.createDataFrame(rows), "fused")
    nodes_f, edges_f = materialize_graph(full)
    key_e = lambda r: (r.src, r.dst, r.pred, r.weight)  # noqa: E731
    assert sorted(map(key_e, edges_s.collect())) == sorted(
        map(key_e, edges_f.collect())
    )
    key_n = lambda r: (r.canonical_id, r.mention_count)  # noqa: E731
    assert sorted(map(key_n, nodes_s.collect())) == sorted(
        map(key_n, nodes_f.collect())
    )


def test_streaming_first_seen_ttl_bounded_state(spark, tmp_path):
    """Bounded-horizon dedup (ttl_ms, event-time): once the watermark
    passes an idle key's last event time + TTL the key is evicted with a
    first_seen=false marker (the evicted-key counter - no silent state
    loss), and a later re-arrival re-emits first_seen=true, proving the
    state was actually freed.  Fully deterministic: driven by event
    times, no wall-clock sleeps."""
    import json

    from kgforge.streaming import streaming_first_seen

    inp, out, ckpt = tmp_path / "in", tmp_path / "out", tmp_path / "ckpt"
    inp.mkdir()

    def write(rows, name):
        with open(inp / f"{name}.json", "w") as f:
            for sha, ts in rows:
                f.write(json.dumps({"content_sha": sha, "event_time": ts}) + "\n")

    def drain():
        stream = (
            spark.readStream.schema("content_sha string, event_time timestamp")
            .format("json").load(str(inp))
        )
        q = (
            streaming_first_seen(stream, ttl_ms=60_000)
            .writeStream.format("parquet")
            .option("path", str(out)).outputMode("append")
            .option("checkpointLocation", str(ckpt))
            .trigger(availableNow=True).start()
        )
        q.awaitTermination()

    write([("A", "2026-01-01T00:00:00"), ("B", "2026-01-01T00:00:00")], "b0")
    drain()
    got = {(r.content_sha, r.first_seen) for r in spark.read.parquet(str(out)).collect()}
    assert got == {("A", True), ("B", True)}

    # event time jumps past A's deadline (00:01:00); B re-arrives in the
    # same batch (data is processed before timeouts -> timer refreshed,
    # suppressed, NOT evicted), C is new
    write([("B", "2026-01-01T00:10:00"), ("C", "2026-01-01T00:10:00")], "b1")
    drain()
    got = {(r.content_sha, r.first_seen) for r in spark.read.parquet(str(out)).collect()}
    assert got == {("A", True), ("B", True), ("C", True), ("A", False)}
    evicted = [r for r in spark.read.parquet(str(out)).collect() if not r.first_seen]
    assert len(evicted) == 1  # exactly one eviction, attributable to A

    # A re-arrives after eviction: state really was freed -> True again
    write([("A", "2026-01-01T00:11:00")], "b2")
    drain()
    rows = spark.read.parquet(str(out)).collect()
    a_true = [r for r in rows if r.content_sha == "A" and r.first_seen]
    assert len(a_true) == 2


def test_streaming_first_seen_ttl_dst_ambiguous_time(spark, tmp_path):
    """DST regression: with a daylight-saving session timezone, an event
    whose timestamp falls in the ambiguous fall-back hour (America/
    New_York, 2026-11-01 01:30 occurs twice) must not crash the state
    function — bare tz_localize raises AmbiguousTimeError there.  The
    stream must drain and still dedup/evict correctly."""
    import json

    from kgforge.streaming import streaming_first_seen

    inp, out, ckpt = tmp_path / "in", tmp_path / "out", tmp_path / "ckpt"
    inp.mkdir()
    prev_tz = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        def write(rows, name):
            with open(inp / f"{name}.json", "w") as f:
                for sha, ts in rows:
                    f.write(json.dumps(
                        {"content_sha": sha, "event_time": ts}) + "\n")

        def drain():
            stream = (
                spark.readStream
                .schema("content_sha string, event_time timestamp")
                .format("json").load(str(inp))
            )
            q = (
                streaming_first_seen(stream, ttl_ms=60_000)
                .writeStream.format("parquet")
                .option("path", str(out)).outputMode("append")
                .option("checkpointLocation", str(ckpt))
                .trigger(availableNow=True).start()
            )
            q.awaitTermination()

        # A lands in the ambiguous repeated hour; duplicate A suppressed
        write([("A", "2026-11-01T01:30:00"), ("A", "2026-11-01T01:30:00")],
              "b0")
        drain()
        # watermark jumps far past A's deadline -> eviction marker
        write([("B", "2026-11-01T12:00:00")], "b1")
        drain()
        got = {(r.content_sha, r.first_seen)
               for r in spark.read.parquet(str(out)).collect()}
        assert got == {("A", True), ("B", True), ("A", False)}
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev_tz)


def test_streaming_sessionize_matches_batch_semantics(spark, tmp_path):
    """session_window streaming twin of q_sessionize: same >30-min-gap
    session boundaries as the batch gaps-and-islands formulation.
    Sessions only emit once the watermark passes their end (+gap), so a
    far-future flush event in a second drain closes the real ones —
    the append-mode contract, asserted explicitly."""
    import json

    from kgforge.streaming import streaming_sessionize

    inp, out, ckpt = tmp_path / "in", tmp_path / "out", tmp_path / "ckpt"
    inp.mkdir()

    def write(rows, name):
        with open(inp / f"{name}.json", "w") as f:
            for uid, ts in rows:
                f.write(json.dumps({"user_id": uid, "ts": ts}) + "\n")

    def drain():
        stream = (
            spark.readStream.schema("user_id bigint, ts timestamp")
            .format("json").load(str(inp))
        )
        q = (
            streaming_sessionize(stream)
            .writeStream.format("parquet")
            .option("path", str(out)).outputMode("append")
            .option("checkpointLocation", str(ckpt))
            .trigger(availableNow=True).start()
        )
        q.awaitTermination()

    # user 1: two sessions ([00:00, 00:10] then [00:50]); user 2: one
    write([
        (1, "2026-01-01T00:00:00"),
        (1, "2026-01-01T00:10:00"),
        (1, "2026-01-01T00:50:00"),   # 40-min gap > 30 -> new session
        (2, "2026-01-01T00:05:00"),
    ], "b0")
    drain()
    write([(99, "2026-01-01T10:00:00")], "b1")  # watermark flush
    drain()
    got = {
        (r.user_id, str(r.session_start), r.n_events)
        for r in spark.read.parquet(str(out)).collect()
    }
    assert got == {
        (1, "2026-01-01 00:00:00", 2),
        (1, "2026-01-01 00:50:00", 1),
        (2, "2026-01-01 00:05:00", 1),
    }
    # the flusher's own session is still open -> not emitted (append mode)
    assert not any(r[0] == 99 for r in got)


def test_streaming_sessionize_exact_gap_boundary(spark, tmp_path):
    """Pin the EXACT-gap boundary: an event at precisely last_ts + gap
    (30:00 after) MERGES into the session in BOTH formulations — the
    batch gaps-and-islands rule starts a new session only when the
    delta is strictly > gap, and Spark's session_window also merges the
    adjacent window (verified: [t, t+gap) and an event at t+gap yield
    one session).  Without this case the equivalence claim was only
    exercised at a 40-min gap (r4 ADVICE)."""
    import json

    from kgforge.streaming import streaming_sessionize

    inp, out, ckpt = tmp_path / "in", tmp_path / "out", tmp_path / "ckpt"
    inp.mkdir()

    def write(rows, name):
        with open(inp / f"{name}.json", "w") as f:
            for uid, ts in rows:
                f.write(json.dumps({"user_id": uid, "ts": ts}) + "\n")

    def drain():
        stream = (
            spark.readStream.schema("user_id bigint, ts timestamp")
            .format("json").load(str(inp))
        )
        q = (
            streaming_sessionize(stream)
            .writeStream.format("parquet")
            .option("path", str(out)).outputMode("append")
            .option("checkpointLocation", str(ckpt))
            .trigger(availableNow=True).start()
        )
        q.awaitTermination()

    # exactly-30:00 gap -> merge; 30:01 gap -> split
    write([
        (1, "2026-01-01T00:00:00"),
        (1, "2026-01-01T00:30:00"),   # == gap: same session
        (1, "2026-01-01T01:00:01"),   # 30:01 > gap: new session
    ], "b0")
    drain()
    write([(99, "2026-01-01T10:00:00")], "b1")  # watermark flush
    drain()
    got = {
        (r.user_id, str(r.session_start), r.n_events)
        for r in spark.read.parquet(str(out)).collect()
    }
    assert got == {
        (1, "2026-01-01 00:00:00", 2),
        (1, "2026-01-01 01:00:01", 1),
    }

    # the batch formulation agrees on the same script
    from pyspark.sql import functions as F

    from kgforge.queries import ALL_QUERIES

    e = spark.createDataFrame(
        [(1, 10, "2026-01-01 00:00:00"),
         (1, 11, "2026-01-01 00:30:00"),
         (1, 12, "2026-01-01 01:00:01")],
        "user_id bigint, event_id bigint, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    tdir = tmp_path / "tbl"
    e.write.parquet(str(tdir / "events.parquet"))
    rows = {
        (r.user_id, r.session_ix, r.n_events)
        for r in ALL_QUERIES["q_sessionize"](spark, str(tdir)).collect()
    }
    assert rows == {(1, 1, 2), (1, 2, 1)}


def test_streaming_first_seen_ttl_non_utc_session(spark, tmp_path):
    """TTL eviction must be timezone-safe: with a non-UTC session
    timezone (Tokyo, +9h, no DST) the naive pandas timestamps the state
    fn receives are session-local; treating them as UTC would push every
    deadline 9h into the future and silently disable eviction.  Same
    event script as the UTC test — same evictions expected."""
    import json

    from kgforge.streaming import streaming_first_seen

    inp, out, ckpt = tmp_path / "in", tmp_path / "out", tmp_path / "ckpt"
    inp.mkdir()
    prev_tz = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "Asia/Tokyo")
    try:
        def write(rows, name):
            with open(inp / f"{name}.json", "w") as f:
                for sha, ts in rows:
                    f.write(json.dumps(
                        {"content_sha": sha, "event_time": ts}) + "\n")

        def drain():
            stream = (
                spark.readStream
                .schema("content_sha string, event_time timestamp")
                .format("json").load(str(inp))
            )
            q = (
                streaming_first_seen(stream, ttl_ms=60_000)
                .writeStream.format("parquet")
                .option("path", str(out)).outputMode("append")
                .option("checkpointLocation", str(ckpt))
                .trigger(availableNow=True).start()
            )
            q.awaitTermination()

        write([("A", "2026-01-01T00:00:00")], "b0")
        drain()
        # watermark jumps 10 min past A's 1-min deadline -> A evicted
        write([("C", "2026-01-01T00:10:00")], "b1")
        drain()
        got = {(r.content_sha, r.first_seen)
               for r in spark.read.parquet(str(out)).collect()}
        assert got == {("A", True), ("C", True), ("A", False)}
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev_tz)

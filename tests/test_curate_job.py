"""jobs/curate_job.py end-to-end in-process: funnel outputs, packing
invariants, drop attribution, JSON summary."""

import json
import sys


def test_curate_job_main(spark, tmp_path, capsys, monkeypatch):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from jobs.curate_job import main

    rows = []
    # 3 strata; include quality-failing and duplicate docs so every
    # funnel stage does real work
    for i in range(60):
        lang = ["en", "de", "fr"][i % 3]
        if i % 10 == 0:
            text = "tiny"                        # too_short -> dropped
        elif i % 10 == 1:
            text = "the a the a the a the a"     # stopword_heavy -> dropped
        elif i % 10 == 2:
            text = "duplicate body of this document kept once"  # dup group
        else:
            text = f"unique document number {i} with enough plain tokens here"
        rows.append({"doc_id": i, "lang": lang, "text": text})
    inp = tmp_path / "docs"
    inp.mkdir()
    pq.write_table(pa.Table.from_pylist(rows), str(inp / "part-0.parquet"))

    monkeypatch.setattr(sys, "argv", [
        "curate_job.py",
        "--input", str(inp),
        "--output", str(tmp_path / "out"),
        "--pack-cap", "32",
        "--run-id", "c-test",
    ])
    monkeypatch.setattr("pyspark.sql.SparkSession.stop", lambda self: None)
    main()
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["run_id"] == "c-test"
    assert summary["n_raw"] == 60
    # 12 quality-dropped (tiny + stopword per stratum decade)
    assert summary["n_kept"] == 48
    # 6 'duplicate body' docs collapse to 1 (identical text -> one
    # fingerprint survivor across strata)
    assert summary["n_unique"] == 48 - 5
    assert summary["n_bins"] >= 3  # at least one bin per stratum

    out = tmp_path / "out"
    curated = spark.read.parquet(str(out / "curated"))
    assert curated.count() == summary["n_unique"]
    packed = spark.read.parquet(str(out / "packed"))
    # packing invariant: per (stratum, bin), token sum <= cap unless the
    # bin holds a single over-budget doc
    from pyspark.sql import functions as F

    bins = packed.groupBy("lang", "bin_id").agg(
        F.sum("n_tokens").alias("s"), F.count("*").alias("c")
    )
    bad = bins.filter((F.col("s") > 32) & (F.col("c") > 1)).count()
    assert bad == 0
    reasons = {
        r.reason: r.n for r in spark.read.parquet(str(out / "reasons")).collect()
    }
    assert reasons["too_short"] == 6 and reasons["stopword_heavy"] == 6
    assert "ok" not in reasons  # drop-reason histogram excludes kept rows


def test_curate_job_empty_input(spark, tmp_path, capsys, monkeypatch):
    """Empty input table: the job still writes its outputs and prints an
    all-zero summary instead of dying on the all-NULL aggregate row."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from jobs.curate_job import main

    inp = tmp_path / "docs"
    inp.mkdir()
    schema = pa.schema(
        [("doc_id", pa.int64()), ("lang", pa.string()), ("text", pa.string())]
    )
    pq.write_table(pa.Table.from_pylist([], schema=schema),
                   str(inp / "part-0.parquet"))

    monkeypatch.setattr(sys, "argv", [
        "curate_job.py",
        "--input", str(inp),
        "--output", str(tmp_path / "out"),
        "--run-id", "c-empty",
    ])
    monkeypatch.setattr("pyspark.sql.SparkSession.stop", lambda self: None)
    main()
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["n_raw"] == 0 and summary["n_kept"] == 0
    assert summary["n_unique"] == 0 and summary["n_tokens_final"] == 0
    assert summary["n_bins"] == 0


def test_curate_advanced_gates(spark, tmp_path, capsys, monkeypatch):
    """LM-perplexity gate + benchmark decontamination as funnel stages:
    an out-of-domain gibberish doc trips the LM gate, a doc sharing its
    shingles with the bench set is dropped as contaminated, and both
    drops are attributable in the summary counters."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from jobs.curate_job import main

    rows = []
    for i in range(30):
        text = f"unique document number {i} with enough plain tokens here"
        rows.append({"doc_id": i, "lang": "en", "text": text})
    # out-of-domain doc: tokens the en LM never saw -> OOV backoff only
    rows.append({"doc_id": 97, "lang": "de",
                 "text": "zzq wvx qqj zzt lkr pqm nvw xxu"})
    # contaminated doc: copies a bench passage verbatim
    bench_text = "held out benchmark passage that must not leak into training"
    rows.append({"doc_id": 98, "lang": "en",
                 "text": bench_text + " plus trailing tokens"})
    inp, bench = tmp_path / "docs", tmp_path / "bench"
    inp.mkdir(); bench.mkdir()
    pq.write_table(pa.Table.from_pylist(rows), str(inp / "p.parquet"))
    pq.write_table(
        pa.Table.from_pylist(
            [{"doc_id": 0, "lang": "en", "text": bench_text}]
        ),
        str(bench / "p.parquet"),
    )

    monkeypatch.setattr(sys, "argv", [
        "curate_job.py",
        "--input", str(inp),
        "--output", str(tmp_path / "out"),
        "--lm-ppl-max", "60.0",
        "--bench", str(bench),
        "--run-id", "c-gates",
    ])
    monkeypatch.setattr("pyspark.sql.SparkSession.stop", lambda self: None)
    main()
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["n_lm_dropped"] >= 1  # the gibberish doc
    assert summary["n_contaminated"] == 1  # the bench-copying doc
    # gated docs never reach the curated output
    import pyspark.sql.functions as F  # noqa: F401

    curated = spark.read.parquet(str(tmp_path / "out" / "curated"))
    ids = {r.doc_id for r in curated.select("doc_id").collect()}
    assert 97 not in ids and 98 not in ids
    assert summary["n_unique"] == len(ids)


def test_curate_redact_pii_scrubs_and_folds_dups(spark):
    """redact_pii=True: surviving text is scrubbed, the per-stratum
    redaction counter is exact, and two docs differing ONLY in their
    PII fold to one post-scrub fingerprint."""
    from kgforge.functions.curation import curate

    base = "plain document body with enough useful tokens to pass gates"
    rows = [
        (0, "en", base + " mail me at alice@ex.org today"),
        (1, "en", base + " mail me at bob.b@other.ex.net today"),  # PII-only twin
        (2, "en", base + " totally different tail without any contact"),
        (3, "de", base + " ruf 555-0101 an oder 555-0102"),
        (4, "de", base + " keine kontakte hier nur text"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    curated, _packed, stats = curate(docs, redact_pii=True)
    texts = {r.doc_id: r.text for r in curated.collect()}
    assert all("@" not in t and "555-" not in t for t in texts.values())
    assert any("[EMAIL]" in t for t in texts.values())
    s = {r.lang: r for r in stats.collect()}
    assert s["en"].n_pii_redactions == 2  # one email each in docs 0,1
    assert s["de"].n_pii_redactions == 2  # two phones in doc 3
    # docs 0 and 1 are byte-identical after scrubbing -> one survivor
    assert s["en"].n_unique == 2 and s["en"].n_kept == 3
    # gate off: counter reports zero and the funnel is unchanged
    _c2, _p2, stats_off = curate(docs)
    assert all(r.n_pii_redactions == 0 for r in stats_off.collect())

"""jobs/predict_job.py end-to-end in-process: sentences file -> fused
extraction -> JSONL predictions; with --graph, serving-time linking
against a persisted nodes table (left join — novel entities kept)."""

import json
import sys


def _write_sentences(tmp_path, n=30):
    from kgforge.fixtures import gen_repo_rows

    p = tmp_path / "sentences.txt"
    with open(p, "w") as f:
        for row in gen_repo_rows(n):
            for sent in row["content"].split(". "):
                if sent.strip():
                    f.write(sent.strip() + "\n")
    return p


def test_predict_job_text_input(spark, tmp_path, capsys, monkeypatch):
    from jobs.predict_job import main

    sents = _write_sentences(tmp_path)
    out = tmp_path / "pred"
    monkeypatch.setattr(sys, "argv", [
        "predict_job.py", "--sentences", str(sents), "--output", str(out),
    ])
    monkeypatch.setattr("pyspark.sql.SparkSession.stop", lambda self: None)
    main()
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["sentences"] > 0
    assert summary["triples"] > 0
    # each input LINE is its own payload group — without the per-line
    # path key every sentence collapses into one relations array
    # (regression found by the spark-submit smoke)
    assert 1 < summary["units_with_relations"] <= summary["triples"]

    # the JSONL payloads parse and follow the reference's predict shape
    lines = [
        json.loads(r.value)
        for r in spark.read.text(str(out)).collect()
    ]
    assert lines and all("relations" in d for d in lines)
    rel = lines[0]["relations"][0]
    assert set(rel) == {"subject", "relation", "object"}


def test_predict_job_graph_linking(spark, tmp_path, capsys, monkeypatch):
    """--graph: endpoints known to the persisted graph carry canonical
    ids; the join is LEFT so novel-surface triples survive unlinked."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from jobs.predict_job import main
    from kgforge.fixtures import gen_repo_rows
    from kgforge.lineage import run_kg_pipeline

    rows = gen_repo_rows(30)
    repos = spark.createDataFrame(rows)
    out_graph = tmp_path / "kg_out"
    res = run_kg_pipeline(spark, repos, str(tmp_path / "wd"))
    res["nodes"].write.parquet(str(out_graph / "nodes"))

    sents = _write_sentences(tmp_path, n=30)
    out = tmp_path / "pred"
    monkeypatch.setattr(sys, "argv", [
        "predict_job.py", "--sentences", str(sents), "--output", str(out),
        "--graph", str(out_graph),
    ])
    monkeypatch.setattr("pyspark.sql.SparkSession.stop", lambda self: None)
    main()
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    # same corpus built the graph -> most serving triples link fully
    assert summary["triples_fully_linked"] > 0
    assert summary["triples_fully_linked"] <= summary["triples"]

    # the canonical ids REACH the written payload (r5 ADVICE): linked
    # relations carry subject_id/object_id; novel endpoints omit the
    # field (to_json drops nulls)
    lines = [
        json.loads(r.value)
        for r in spark.read.text(str(out)).collect()
    ]
    rels = [rel for d in lines for rel in d["relations"]]
    assert any("subject_id" in rel and "object_id" in rel for rel in rels)

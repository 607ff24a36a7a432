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

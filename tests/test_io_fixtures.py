"""io.sources reader + fixture writer round trip."""

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from kgforge.fixtures import gen_repo_rows, write_fixtures
from kgforge.io.sources import read_repos


def test_read_repos_parquet_with_sha(spark, tmp_path):
    rows = gen_repo_rows(30)
    pq.write_table(pa.Table.from_pylist(rows), tmp_path / "repos.parquet")
    df = read_repos(spark, str(tmp_path / "repos.parquet"), min_partitions=4)
    assert df.rdd.getNumPartitions() >= 4
    got = df.limit(5).collect()
    import hashlib

    for r in got:
        assert r.content_sha == hashlib.sha256(r.content.encode()).hexdigest()


def test_read_repos_validates_schema(spark, tmp_path):
    pq.write_table(pa.Table.from_pylist([{"a": 1}]), tmp_path / "bad.parquet")
    with pytest.raises(ValueError, match="missing columns"):
        read_repos(spark, str(tmp_path / "bad.parquet"))


def test_write_fixtures_roundtrip(spark, tmp_path):
    write_fixtures(str(tmp_path), n_files=40, n_docs=10)
    repos = spark.read.parquet(str(tmp_path / "repos.parquet"))
    golden = spark.read.parquet(str(tmp_path / "golden_triples.parquet"))
    assert repos.count() == 40
    assert golden.count() > 0
    assert (tmp_path / "eval_docs.jsonl").exists()
    # golden matches the live pipeline over the written repos table
    from kgforge.extract.pipeline import extract_pipeline

    key_cols = ["repo", "path", "unit_id", "subj", "pred", "obj"]
    got = {tuple(r) for r in extract_pipeline(repos, "fused").select(*key_cols).collect()}
    want = {tuple(r) for r in golden.select(*key_cols).collect()}
    assert got == want

"""Incremental count-min sketch epochs: stream == one-shot, exactly,
through compaction and restart."""

import json

from pyspark.sql import functions as F

from kgforge.functions.sketches import CMS_D, CMS_W, cms_cells
from kgforge.streaming import (
    compact_cms_epochs,
    dedup_state_layout,
    read_cms_cells,
    run_incremental_cms,
)

DOCS = [
    (i, " ".join(f"w{(i * 7 + k) % 13}" for k in range(20))) for i in range(30)
]


def _write_batches(input_dir, docs, n_files, start=0):
    input_dir.mkdir(parents=True, exist_ok=True)
    per = len(docs) // n_files
    for b in range(n_files):
        with open(input_dir / f"batch-{start + b}.json", "w") as f:
            for doc_id, text in docs[b * per : (b + 1) * per]:
                f.write(json.dumps({"doc_id": doc_id, "text": text}) + "\n")


def _cellmap(df):
    return {(r.j, r.bucket): r.cell_n for r in df.collect()}


def test_cms_stream_equals_one_shot_with_auto_compaction(spark, tmp_path):
    inp, state, ckpt = tmp_path / "in", tmp_path / "state", tmp_path / "ckpt"
    _write_batches(inp, DOCS[:25], n_files=5)
    run_incremental_cms(
        spark, str(inp), str(state), str(ckpt), compact_every=2
    )
    # auto-compaction bounded the layout while the stream ran
    assert len(dedup_state_layout(str(state))) <= 3
    streamed = _cellmap(read_cms_cells(spark, str(state)))
    once = _cellmap(
        cms_cells(
            spark.createDataFrame(DOCS[:25], "doc_id long, text string").select(
                F.explode(F.split("text", " ")).alias("tok")
            )
        )
    )
    assert streamed == once
    assert len(streamed) <= CMS_D * CMS_W

    # restart with more batches: checkpoint + markers absorb history
    _write_batches(inp, DOCS[25:], n_files=1, start=5)
    run_incremental_cms(
        spark, str(inp), str(state), str(ckpt), compact_every=2
    )
    streamed2 = _cellmap(read_cms_cells(spark, str(state)))
    once2 = _cellmap(
        cms_cells(
            spark.createDataFrame(DOCS, "doc_id long, text string").select(
                F.explode(F.split("text", " ")).alias("tok")
            )
        )
    )
    assert streamed2 == once2

    # explicit final fold: one constant-size snapshot, reads unchanged
    m = compact_cms_epochs(spark, str(state))
    if m is not None:  # auto-compaction may already have folded to one
        assert m["n_cells"] <= CMS_D * CMS_W
    layout = dedup_state_layout(str(state))
    assert len(layout) == 1 and "compacted=" in layout[0]
    assert _cellmap(read_cms_cells(spark, str(state))) == once2

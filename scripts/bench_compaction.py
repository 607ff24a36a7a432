"""Measure what epoch-state compaction buys (r5 VERDICT #2): after N
micro-batch epochs, per-batch state reads touch N parquet dirs; a
compacted snapshot restores O(1)-dir reads.  Reports wall for the two
read paths and for one incremental batch joined against each layout,
plus the one-time compaction cost.

Protocol: 60 epochs x 800 docs are fed through the REAL streaming job
(run_incremental_dedup, availableNow, one file per trigger) into /tmp
state; each timed leg reports cold (first read) and warm (best-of-3)
wall plus the structural dir/file counts.  Appends a section to
BENCH/INCREMENTAL.md.  Usage: python scripts/bench_compaction.py
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_EPOCHS = 60
DOCS_PER_EPOCH = 800


def main() -> None:
    import numpy as np

    from kgforge.dedup import dedup_minhash_incremental
    from kgforge.session import get_spark
    from kgforge.streaming import (
        compact_epochs,
        dedup_state_layout,
        run_incremental_dedup,
    )

    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "24g")
    spark = get_spark("bench-compaction", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from gen_vet_data import gen_documents

    base = "/tmp/compact_bench"
    shutil.rmtree(base, ignore_errors=True)
    inp = os.path.join(base, "in")
    state = os.path.join(base, "state")
    ckpt = os.path.join(base, "ckpt")
    os.makedirs(inp)

    rng = np.random.default_rng(7)
    all_docs = gen_documents(N_EPOCHS * DOCS_PER_EPOCH, rng).to_pandas()[
        ["doc_id", "text"]
    ]
    for e in range(N_EPOCHS):
        chunk = all_docs.iloc[e * DOCS_PER_EPOCH:(e + 1) * DOCS_PER_EPOCH]
        with open(os.path.join(inp, f"b{e:03d}.json"), "w") as f:
            for _, r in chunk.iterrows():
                f.write(
                    json.dumps({"doc_id": int(r.doc_id), "text": r.text})
                    + "\n"
                )

    t0 = time.monotonic()
    run_incremental_dedup(spark, inp, state, ckpt)
    t_ingest = time.monotonic() - t0

    batch_tbl = gen_documents(DOCS_PER_EPOCH, rng).to_pandas()[
        ["doc_id", "text"]
    ]
    batch_tbl["doc_id"] += 10_000_000
    batch = spark.createDataFrame(batch_tbl).localCheckpoint(eager=True)

    def timed(fn, passes=3):
        """(first, best, n): first pass pays listing/footer reads the
        session has not cached; best-of-rest is the warm floor."""
        first, best = None, float("inf")
        for _ in range(passes):
            t0 = time.monotonic()
            n = fn()
            w = time.monotonic() - t0
            first = w if first is None else first
            best = min(best, w)
        return first, best, n

    def count_files(root):
        return sum(
            1
            for d, _, fs in os.walk(root)
            for f in fs
            if f.endswith(".parquet")
        )

    def read_state_docs():
        dirs = dedup_state_layout(state)
        sig = spark.read.parquet(*[os.path.join(d, "sig") for d in dirs])
        return sig.count()

    def read_pairs():
        dirs = dedup_state_layout(state)
        return spark.read.parquet(
            *[os.path.join(d, "pairs") for d in dirs]
        ).count()

    def one_batch():
        dirs = dedup_state_layout(state)
        st = {
            "sig": spark.read.parquet(*[os.path.join(d, "sig") for d in dirs]),
            "shingle": spark.read.parquet(
                *[os.path.join(d, "shingle") for d in dirs]
            ),
        }
        return dedup_minhash_incremental(batch, st)[0].count()

    n_dirs_pre = len(dedup_state_layout(state))
    n_files_pre = count_files(state)
    c_sig_pre, t_sig_pre, n_docs = timed(read_state_docs)
    c_pairs_pre, t_pairs_pre, n_pairs = timed(read_pairs)
    c_batch_pre, t_batch_pre, _ = timed(one_batch)

    t0 = time.monotonic()
    m = compact_epochs(spark, state)
    t_compact = time.monotonic() - t0
    assert m and m["n_state_docs"] == n_docs and m["n_pairs"] == n_pairs

    n_dirs_post = len(dedup_state_layout(state))
    n_files_post = count_files(state)
    c_sig_post, t_sig_post, n_docs2 = timed(read_state_docs)
    c_pairs_post, t_pairs_post, n_pairs2 = timed(read_pairs)
    c_batch_post, t_batch_post, _ = timed(one_batch)
    assert (n_docs2, n_pairs2) == (n_docs, n_pairs)

    section = f"""
## Epoch compaction read amplification (r6, measured)

{N_EPOCHS} streaming epochs x {DOCS_PER_EPOCH} docs
(run_incremental_dedup, one file per trigger; ingest {t_ingest:.0f} s
total) leave state as {n_dirs_pre} delta dirs / {n_files_pre} parquet
files; compact_epochs folds them into ONE keyed snapshot
({n_dirs_post} dir, {n_files_post} files) in {t_compact:.1f} s
(one-time).  {n_docs} state docs / {n_pairs} accumulated pairs;
local[32]; "cold" = first read in the session (pays the per-dir
listing + per-file footer round), "warm" = best of 3 (FileStatus cache
hot):

| read path | {n_dirs_pre} dirs cold | {n_dirs_pre} dirs warm | 1 dir cold | 1 dir warm |
|---|---|---|---|---|
| scan accumulated signatures | {c_sig_pre:.2f} | {t_sig_pre:.2f} | {c_sig_post:.2f} | {t_sig_post:.2f} |
| scan accumulated pairs | {c_pairs_pre:.2f} | {t_pairs_pre:.2f} | {c_pairs_post:.2f} | {t_pairs_post:.2f} |
| one incremental batch (read state + join + verify) | {c_batch_pre:.2f} | {t_batch_pre:.2f} | {c_batch_post:.2f} | {t_batch_post:.2f} |

Honest read: on this single-host local FS the page cache and Spark's
session FileStatus cache absorb most of the per-dir cost, so warm walls
are near-flat — the measured win is in the COLD legs (every fresh
session/executor pays them) and in the structural bound:
{n_files_pre} -> {n_files_post} files, {n_dirs_pre} -> {n_dirs_post}
dirs, and O(1) dirs forever after regardless of epoch count.  On object
storage (the 100 TB deployment) each epoch dir is a LIST round-trip and
each file a GET for the footer, per micro-batch, per executor — the
linear-in-epochs term compaction exists to delete.  Pairs and state are
IDENTICAL across the fold (asserted in-run; property-tested in
tests/test_compaction.py incl. stream resume on the snapshot and a
second fold).  rebuild_pairs=True additionally reconciles the
saturated-bucket strict-superset caveat by recomputing the pair set
from the compacted sig/shingle tables — the from-scratch set, with
since-saturated buckets suppressed (tested).
"""

    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BENCH", "INCREMENTAL.md",
    )
    existing = open(out).read() if os.path.exists(out) else ""
    marker = "## Epoch compaction read amplification"
    if marker in existing:
        existing = existing[: existing.index(marker)].rstrip() + "\n"
    with open(out, "w") as f:
        f.write(existing.rstrip() + "\n" + section)
    print(section)
    spark.stop()


if __name__ == "__main__":
    main()

"""Benchmark harness — one JSON line on stdout (driver contract).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS], plus the full KG
extraction pipeline over a synthetic repos corpus (throughput metric:
triples/sec, BASELINE.md).

Usage:
  python bench.py                 # one JSON line
  python bench.py --repos-files 20000   # scale the KG corpus leg
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


HEADLINE = [
    "q1_pricing_summary",
    "q_revenue_by_nation",
    "q_topk_per_group",
    "q_running_total",
    "kg_mentions",
    "kg_triples",
    "kg_edges",
    "dedup_minhash_pairs",
    "dedup_ngram_jaccard",
    "ann_cosine_topk",
    "token_counts",
    "doc_fingerprint",
    # r4 additions (bench_ab compares only queries common to both sides,
    # so extending the suite never breaks cross-round pairing)
    "dedup_fuse_modalities",
    "dedup_winnow_pairs",
    "ann_pq_recall",
    "kg_triangles",
    # r5 additions
    "dedup_minhash_incr",
    "kg_kcore",
    # r6 additions
    "kg_pagerank_converged",
    # r6b additions (new operator families: substring dedup, sketch,
    # importance sampling, walk corpus)
    "dedup_repeated_spans",
    "token_cms_topk",
    "curate_dsir_sample",
    "kg_random_walks",
    # r6c additions (directed centrality, biased walks, weighted rank,
    # LM quality gate, in-engine classifier)
    "kg_hits",
    "kg_node2vec_walks",
    "kg_pagerank_weighted",
    "text_lm_perplexity",
    "text_nb_classifier",
    # r6c late additions (data mixing, bloom prefilter, metapaths, PCA)
    "curate_domain_mixture",
    "text_decontaminate_bloom",
    "kg_metapaths",
    "embed_pca_power",
    "embed_abtt",
    "curate_span_corruption",
    "curate_contrastive_triplets",
    "kg_walk_skipgrams",
    "kg_qa_pairs",
    "curate_length_curriculum",
    # r7 session-3 additions (PII scrub, line dedup, k-means exposure,
    # cluster-balanced curation, clustering-quality metric, keywords,
    # CCNet buckets)
    "text_pii_redact",
    "text_line_dedup",
    "embed_kmeans",
    "curate_cluster_balance",
    "kg_bcubed",
    "text_keywords_tfidf",
    "curate_ccnet_buckets",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--cores", default=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    ap.add_argument("--repos-files", type=int, default=30000)
    ap.add_argument("--skip-repos", action="store_true")
    ap.add_argument("--skip-headline", action="store_true")
    args = ap.parse_args()

    from kgforge.fixtures import gen_repo_rows
    from kgforge.queries import ALL_QUERIES as QUERIES
    from kgforge.session import get_spark

    spark = get_spark("kgforge-bench", master=f"local[{args.cores}]",
                      shuffle_partitions=max(int(args.cores), 8))
    spark.sparkContext.setLogLevel("ERROR")

    # warm the session (JVM codegen, parquet footers) outside the clock
    spark.read.parquet(f"{args.sf_dir}/region.parquet").count()
    QUERIES["kg_mentions"](spark, args.sf_dir).limit(1).count()

    timings: dict[str, float] = {}
    t_all = time.monotonic()

    if not args.skip_headline:
        for name in HEADLINE:
            fn = QUERIES[name]
            t0 = time.monotonic()
            n = fn(spark, args.sf_dir).count()
            timings[name] = round(time.monotonic() - t0, 3)
            print(f"# {name}: {n} rows in {timings[name]}s", file=sys.stderr)

    triples_per_sec = None
    if not args.skip_repos:
        # full KG extraction cascade over the synthetic repos corpus.
        # Corpus is staged once as parquet in /tmp (deterministic; reused
        # across runs and across the two scaling subprocesses) so corpus
        # generation/upload never pollutes the measurement.
        corpus_dir = f"/tmp/kgforge_bench_corpus_{args.repos_files}"
        if not os.path.exists(f"{corpus_dir}/_SUCCESS"):
            import pyarrow as pa
            import pyarrow.parquet as pq

            rows = gen_repo_rows(args.repos_files)
            os.makedirs(corpus_dir, exist_ok=True)
            shard = max(1, len(rows) // 32)
            for i in range(0, len(rows), shard):
                pq.write_table(
                    pa.Table.from_pylist(rows[i : i + shard]),
                    f"{corpus_dir}/part-{i // shard:04d}.parquet",
                )
            open(f"{corpus_dir}/_SUCCESS", "w").close()

        from kgforge.extract.pipeline import extract_pipeline

        repos = (
            spark.read.parquet(corpus_dir)
            .repartition(int(args.cores))
            .localCheckpoint(eager=True)  # exclude scan+shuffle staging
        )
        # best-of-3: this host shows 20-40% wall jitter between identical
        # runs; min is the standard estimator for the true cost
        plan = extract_pipeline(repos, "fused")
        dt = float("inf")
        for _ in range(3):
            t0 = time.monotonic()
            n_triples = plan.count()
            dt = min(dt, time.monotonic() - t0)
        timings["kg_pipeline_repos"] = round(dt, 3)
        triples_per_sec = round(n_triples / dt, 1)
        print(
            f"# kg_pipeline_repos: {n_triples} triples from {args.repos_files} files "
            f"in {dt:.1f}s ({triples_per_sec} triples/s)",
            file=sys.stderr,
        )

        # context-window variant (staged path + neighbor window): measures
        # the feature's overhead vs the plain fused cascade above.
        # Runs OUTSIDE the headline clock (t_all is frozen first) so the
        # suite total stays apples-to-apples with r1.
        t_frozen = time.monotonic()
        plan_ctx = extract_pipeline(repos, "staged", context_window=1)
        dt_ctx = float("inf")
        for _ in range(3):
            t0 = time.monotonic()
            n_ctx = plan_ctx.count()
            dt_ctx = min(dt_ctx, time.monotonic() - t0)
        timings["kg_pipeline_ctx1"] = round(dt_ctx, 3)
        print(
            f"# kg_pipeline_ctx1: {n_ctx} triples in {dt_ctx:.1f}s "
            f"({dt_ctx / dt:.2f}x the fused plain pass)",
            file=sys.stderr,
        )
        t_all += time.monotonic() - t_frozen  # exclude ctx leg from total

    total = round(time.monotonic() - t_all, 3)
    sf = args.sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    result = {
        "metric": "headline_suite_seconds",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "cores": int(args.cores),
        "triples_per_sec": triples_per_sec,
    }
    # the stored paired base-vs-head study (scripts/bench_ab.py:
    # alternating same-session legs, per-query best-of-N) carries the
    # round-over-round numbers this jittery host's single-shot runs
    # cannot provide.  It is printed as its OWN earlier stdout line —
    # embedding it in the headline record made that line overflow the
    # driver's fixed-size stdout tail window and truncate the JSON
    # mid-record (BENCH_r04.json parsed: null).  The FINAL line is the
    # compact headline record, guaranteed to fit the tail window whole.
    bench_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH")
    ab_latest = os.path.join(bench_dir, "ab_latest.json")
    ab_legacy = os.path.join(bench_dir, "ab_r2_r3.json")
    paired = None
    if os.path.exists(ab_latest):
        with open(ab_latest) as f:
            paired = {"paired_vs_base": json.load(f)}
    elif os.path.exists(ab_legacy):
        with open(ab_legacy) as f:
            paired = {"paired_vs_r2": json.load(f)}
    spark.stop()
    if paired is not None:
        print(json.dumps(paired))
    print(json.dumps(result))


if __name__ == "__main__":
    main()

"""Semantic invariants of the r7 session-3 operators (PII redaction,
line-level dedup, k-means exposure, cluster-balanced curation, B-cubed,
tf-idf keywords, CCNet perplexity buckets) — properties the DuckDB
equality oracle cannot express.  All at sf0.001 for speed."""

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from kgforge.queries import ALL_QUERIES, _LINE_DF_CAP, _PROTO_M, _TFIDF_K

SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------- PII ----

def test_pii_redact_exact_semantics(spark):
    from kgforge.functions.pii import redact_pii

    df = spark.createDataFrame(
        [
            (1, "mail a.b+c@sub.ex.org now"),
            (2, "ssn 123-45-6789 ip 192.168.0.1 call 555-0199"),
            (3, "clean text with no pii at all"),
            (4, "digits 1234-56-789 are not an ssn 12.34 not an ip"),
        ],
        "doc_id int, t string",
    )
    rows = {r.doc_id: r for r in redact_pii(df, "t").collect()}
    assert rows[1].redacted == "mail [EMAIL] now"
    assert rows[2].redacted == "ssn [ID] ip [IP] call [PHONE]"
    assert rows[3].redacted == "clean text with no pii at all"
    assert rows[4].redacted == "digits 1234-56-789 are not an ssn 12.34 not an ip"
    assert (rows[2].n_ssn, rows[2].n_ip, rows[2].n_phone) == (1, 1, 1)
    assert all(r.n_residual == 0 for r in rows.values())


def test_pii_overlapping_matches_count_once(spark):
    """Sequential counting: an IP-shaped domain inside an email is ONE
    replacement (the email), not two — Σ n_<type> equals the true
    replacement total (code-review finding, r7 s3)."""
    from kgforge.functions.pii import redact_pii

    df = spark.createDataFrame(
        [(1, "mail john@1.2.3.4.net now")], "doc_id int, t string"
    )
    r = redact_pii(df, "t").collect()[0]
    assert r.redacted == "mail [EMAIL] now"
    assert (r.n_email, r.n_ip) == (1, 0)  # the quad was already eaten
    assert r.n_residual == 0


def test_curate_redact_preserves_passthrough_n_columns(spark):
    """The PII stage drops exactly its own count columns — a caller's
    n_* passthrough column (e.g. n_chars) must survive."""
    from kgforge.functions.curation import curate

    base = "plain document body with enough useful tokens to pass gates"
    docs = spark.createDataFrame(
        [(0, "en", base + " mail a@ex.org", 61)],
        "doc_id long, lang string, text string, n_chars long",
    )
    curated, _p, _s = curate(docs, redact_pii=True)
    assert "n_chars" in curated.columns
    assert curated.collect()[0].n_chars == 61


def test_pii_query_counts_and_residual(spark):
    r = ALL_QUERIES["text_pii_redact"](spark, SF).collect()[0]
    # every third doc gets exactly one of each type injected
    assert r.n_docs_with_pii == (r.n_docs + 2) // 3
    assert (
        r.n_email == r.n_ssn == r.n_ip == r.n_phone == r.n_docs_with_pii
    )
    assert r.n_residual == 0  # redaction actually removed everything


# --------------------------------------------------------- line dedup ----

def test_line_dedup_drops_planted_boilerplate(spark):
    from kgforge.queries import text_line_dedup  # noqa: F401 — constants

    # 6 docs sharing one 10-token boilerplate line + a unique line each
    boiler = " ".join(f"b{i}" for i in range(10))
    rows = [
        (i, boiler + " " + " ".join(f"u{i}x{j}" for j in range(10)), "en")
        for i in range(6)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(f"{d}/documents.parquet")
        out = {
            r.lang: r
            for r in ALL_QUERIES["text_line_dedup"](spark, d).collect()
        }
    r = out["en"]
    assert r.n_docs == 6 and r.n_lines == 12
    assert r.n_lines_dropped == 6  # the boilerplate line in all 6 docs
    assert r.n_tokens_kept == 60  # six unique 10-token lines survive


def test_line_dedup_conservation(spark):
    rows = ALL_QUERIES["text_line_dedup"](spark, SF).collect()
    assert sum(r.n_lines_dropped for r in rows) > 0  # planted near-dups
    for r in rows:
        assert 0 <= r.n_lines_dropped < r.n_lines


# ------------------------------------------------------------- kmeans ----

def test_kmeans_partitions_all_vectors(spark):
    rows = ALL_QUERIES["embed_kmeans"](spark, SF).collect()
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    n, s = emb.count(), emb.agg(F.sum("vec_id")).collect()[0][0]
    assert sum(r.n_vecs for r in rows) == n  # a true partition
    assert sum(r.member_checksum for r in rows) == s
    assert len(rows) == 8 and all(r.n_vecs > 0 for r in rows)


def test_cluster_balance_quota_and_floor(spark):
    rows = ALL_QUERIES["curate_cluster_balance"](spark, SF).collect()
    km = {r.cid: r for r in ALL_QUERIES["embed_kmeans"](spark, SF).collect()}
    for r in rows:
        assert r.n_take == min(r.n_avail, _PROTO_M)
        assert r.n_avail == km[r.cid].n_vecs
        # selected ⊆ cluster members (vec_ids are non-negative)
        assert 0 < r.sel_checksum <= km[r.cid].member_checksum
        assert -1.0 <= r.sel_cos_min <= 1.0


def test_grouped_row_number_matches_partitioned_window(spark):
    from kgforge.functions.ranks import grouped_row_number

    # skewed groups: 1000/200/3 rows
    rows = [(g, i * 7 % 1009, i) for g, n in [(0, 1000), (1, 200), (2, 3)]
            for i in range(n)]
    df = spark.createDataFrame(rows, "g int, k int, i int")
    got = {
        (r.g, r.k, r.i): r.rn
        for r in grouped_row_number(df, ["g"], ["k", "i"], "rn").collect()
    }
    w = Window.partitionBy("g").orderBy("k", "i")
    want = {
        (r.g, r.k, r.i): r.rn
        for r in df.withColumn("rn", F.row_number().over(w)).collect()
    }
    assert got == want


# ------------------------------------------------------------ b-cubed ----

def test_bcubed_hand_computed_partition(spark):
    from kgforge.core.metrics import bcubed

    # pred {1,2,3}{4,5} vs gold {1,2}{3,4,5}:
    # P = (4/3 + 1/3 + 2)/5 = 11/15; R = (2 + 1/3 + 4/3)/5 = 11/15
    df = spark.createDataFrame(
        [(1, "a", "x"), (2, "a", "x"), (3, "a", "y"), (4, "b", "y"),
         (5, "b", "y")],
        "item int, c string, g string",
    )
    r = bcubed(df, "c", "g").collect()[0]
    assert r.n_docs == 5
    assert (r.n_pred_clusters, r.n_gold_clusters) == (2, 2)
    assert r.bcubed_precision == pytest.approx(round(11 / 15, 4))
    assert r.bcubed_recall == pytest.approx(round(11 / 15, 4))
    assert r.bcubed_f1 == pytest.approx(round(11 / 15, 4))


def test_bcubed_query_recall_is_one_on_dupfree_corpus(spark):
    r = ALL_QUERIES["kg_bcubed"](spark, SF).collect()[0]
    # the testdata has no exact-dup texts: gold is all singletons, so
    # recall is structurally 1.0 and precision carries the signal
    assert r.bcubed_recall == 1.0
    assert 0 < r.bcubed_precision <= 1.0
    assert r.n_gold_clusters == r.n_docs
    assert r.n_pred_clusters < r.n_docs  # near-dup merges exist


# -------------------------------------------------------------- tfidf ----

def test_tfidf_keywords_shape(spark):
    rows = ALL_QUERIES["text_keywords_tfidf"](spark, SF).collect()
    assert 0 < len(rows) <= 30
    for r in rows:
        assert 0 <= r.n_rank1 <= r.n_top_docs
    # ordering: non-increasing by n_top_docs with term tie-break
    pairs = [(-r.n_top_docs, r.term) for r in rows]
    assert pairs == sorted(pairs)


# ------------------------------------------------- temperature mixture ----

def test_temperature_mixture_sqrt_shares(spark):
    import math

    rows = ALL_QUERIES["curate_temperature_mixture"](spark, SF).collect()
    z = sum(math.sqrt(r.n_avail) for r in rows)
    total = sum(r.n_avail for r in rows)
    for r in rows:
        assert abs(r.target_share - math.sqrt(r.n_avail) / z) < 1e-4
        assert r.n_take == min(r.n_avail, int(total // 2 * math.sqrt(r.n_avail) / z))
        assert r.n_selected == r.n_take  # every capped take satisfied
    # α=0.5 upsamples low-resource: share/p ratio decreases with size
    by_n = sorted(rows, key=lambda r: r.n_avail)
    ratios = [r.target_share / (r.n_avail / total) for r in by_n]
    assert all(a >= b - 1e-6 for a, b in zip(ratios, ratios[1:]))


# ------------------------------------------------ distance distribution ----

def test_distance_distribution_is_cumulative_partition(spark):
    rows = sorted(
        ALL_QUERIES["kg_distance_distribution"](spark, SF).collect(),
        key=lambda r: r.dist,
    )
    assert rows[0].dist == 0 and rows[0].n_pairs == 4  # the 4 pivots
    cum = 0
    for r in rows:
        cum += r.n_pairs
        assert r.cum_pairs == cum
        assert r.ge_90pct == (r.frac_cum >= 0.9 or abs(r.frac_cum - 0.9) < 5e-5)
    assert rows[-1].frac_cum == 1.0 and rows[-1].ge_90pct


# ------------------------------------------------------ ccnet buckets ----

def test_ccnet_buckets_are_ordered_terciles(spark):
    rows = ALL_QUERIES["curate_ccnet_buckets"](spark, SF).collect()
    by_lang: dict[str, list] = {}
    for r in rows:
        by_lang.setdefault(r.lang, []).append(r)
    for lang, rs in by_lang.items():
        rs.sort(key=lambda r: r.bucket)
        assert [r.bucket for r in rs] == [1, 2, 3]
        sizes = [r.n_docs for r in rs]
        assert max(sizes) - min(sizes) <= 1  # NTILE balance
        for a, b in zip(rs, rs[1:]):
            assert b.min_ppl >= a.max_ppl  # ascending-perplexity split


# --------------------------------------------------------- cached IVF ----

def test_ann_ivf_cached_resumes_and_matches_straight_path(spark):
    import hashlib
    import shutil

    tag = hashlib.sha256(SF.encode()).hexdigest()[:12]
    shutil.rmtree(f"/tmp/kgforge_stage_cache_{tag}/ivf_index", ignore_errors=True)
    first = {
        (r.vec_id, r.rnk): r.cos_sim
        for r in ALL_QUERIES["ann_ivf_cached"](spark, SF).collect()
    }
    import os

    marker = f"/tmp/kgforge_stage_cache_{tag}/ivf_index/_COMPLETE"
    assert os.path.exists(marker)  # the index stage materialized
    # second call resumes from the stage and is value-identical
    second = {
        (r.vec_id, r.rnk): r.cos_sim
        for r in ALL_QUERIES["ann_ivf_cached"](spark, SF).collect()
    }
    assert second == first
    # and the cache is transparent: equals the straight-through plan
    straight = {
        (r.vec_id, r.rnk): r.cos_sim
        for r in ALL_QUERIES["ann_ivf_topk"](spark, SF).collect()
    }
    assert straight == first


# -------------------------------------------------------- linkpred MRR ----

def test_linkpred_mrr_bounds_and_monotone_hits(spark):
    r = ALL_QUERIES["kg_linkpred_mrr"](spark, SF).collect()[0]
    assert r.n_test > 0  # the pair-level split leaves usable test pairs
    assert 0 < r.mrr <= 1.0
    assert 0 <= r.hits_at_1 <= r.hits_at_3 <= r.hits_at_10 <= r.n_test
    # MRR is bounded below by the hits@1 rate and above by hits@10 rate
    # plus the tail's maximum reciprocal rank contribution
    assert r.mrr >= r.hits_at_1 / r.n_test - 1e-4
    assert r.mrr <= (r.hits_at_10 + (r.n_test - r.hits_at_10) / 11.0) / r.n_test + 1e-4

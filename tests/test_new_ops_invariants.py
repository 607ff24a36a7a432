"""Semantic invariants of the r6c operators — properties the DuckDB
equality oracle cannot express (it checks that both engines agree, not
that the answer means what it claims).  All at sf0.001 for speed."""

import math

from kgforge.queries import ALL_QUERIES, _MIX_TARGET

SF = "/root/testdata/sf0.001"


def test_pca_loadings_unit_norm_and_eigenvalue_bounds(spark):
    rows = ALL_QUERIES["embed_pca_power"](spark, SF).collect()
    assert len(rows) == 64
    norm2 = sum(r.loading ** 2 for r in rows)
    assert abs(norm2 - 1.0) < 1e-3  # loadings rounded to 6dp
    eig, ratio = rows[0].eigenvalue, rows[0].var_ratio
    assert all(r.eigenvalue == eig for r in rows)
    # Rayleigh quotient of any unit vector: 0 < lambda <= tr(C), and the
    # power-iterated direction captures at least the average dim share
    assert 0 < ratio <= 1.0
    assert ratio >= 1.0 / 64 - 1e-4
    # sign canon: the max-|loading| dim is non-negative
    assert max(rows, key=lambda r: abs(r.loading)).loading >= 0


def test_domain_mixture_honors_targets_and_caps(spark):
    rows = ALL_QUERIES["curate_domain_mixture"](spark, SF).collect()
    assert {r.lang for r in rows} == set(_MIX_TARGET)
    total = sum(r.n_selected for r in rows)
    for r in rows:
        assert r.n_selected == r.n_take  # every take satisfied
        assert r.n_take <= r.n_avail  # never oversample a domain
        # achieved share within flooring slack: each of the L domains
        # floors away < 1 doc, shifting any share by < (1 + L·w)/total
        slack = (1 + len(_MIX_TARGET)) / total + 1e-4
        assert abs(r.achieved_share - _MIX_TARGET[r.lang]) <= slack


def test_bloom_one_sided_and_consistent(spark):
    r = ALL_QUERIES["text_decontaminate_bloom"](spark, SF).collect()[0]
    assert r.no_false_negatives  # the guarantee, verified
    assert r.n_flagged == r.n_true + r.n_false_pos
    assert 0 <= (r.fpr or 0.0) <= 1.0
    assert r.bits_set <= 4096


def test_nb_confusion_partitions_heldout(spark):
    rows = ALL_QUERIES["text_nb_classifier"](spark, SF).collect()
    # every held-out doc appears exactly once in the confusion matrix
    from kgforge.queries import _t
    n_test = _t(spark, SF, "documents").filter("doc_id % 5 = 0").count()
    assert sum(r.n_docs for r in rows) == n_test


def test_metapaths_support_bounds(spark):
    rows = ALL_QUERIES["kg_metapaths"](spark, SF).collect()
    assert rows
    for r in rows:
        assert 1 <= r.n_endpoint_pairs <= r.n_paths


def test_abtt_energy_identities(spark):
    r = ALL_QUERIES["embed_abtt"](spark, SF).collect()[0]
    # removing the projection removes EXACTLY the Rayleigh energy
    assert abs(r.trace_after - (r.trace_before - r.eig_before)) < 2e-4
    # the residual's dominant direction can only be weaker
    assert r.eig_after <= r.eig_before + 1e-4
    assert 0 < r.ratio_after <= 1 and 0 < r.ratio_before <= 1


def _py_charfold(s: str) -> int:
    from kgforge.functions.hashing import MOD
    a = 7
    for c in s:
        a = (a * 31 + ord(c)) % MOD
    return a


def test_span_corruption_matches_python_rederivation(spark):
    """Re-derive the corrupted example for a few docs in plain Python
    (same md5+charfold offsets, same sentinel scheme) and match the
    query's hashes — pins the EXAMPLES, not just engine agreement."""
    import hashlib

    import duckdb

    from kgforge.queries import _CORRUPT_BLOCK, _CORRUPT_SPAN

    nblk = _CORRUPT_BLOCK - _CORRUPT_SPAN + 1
    con = duckdb.connect()
    docs = con.sql(
        f"SELECT doc_id, text FROM read_parquet('{SF}/documents.parquet') "
        "ORDER BY doc_id LIMIT 5"
    ).fetchall()
    out = {
        r.doc_id: r
        for r in ALL_QUERIES["curate_span_corruption"](spark, SF)
        .filter("doc_id < %d" % (docs[-1][0] + 1))
        .collect()
    }
    for doc_id, text in docs:
        toks = text.split(" ")
        inp, tgt, n_masked = [], [], 0
        for j, x in enumerate(toks):
            blk, off = j // _CORRUPT_BLOCK, j % _CORRUPT_BLOCK
            start = _py_charfold(
                hashlib.md5(f"{doc_id}:{blk}:corrupt".encode()).hexdigest()
            ) % nblk
            sent = f"<extra_id_{blk}>"
            if off == start:
                inp.append(sent)
                tgt.append(f"{sent} {x}")
                n_masked += 1
            elif start < off < start + _CORRUPT_SPAN:
                tgt.append(x)
                n_masked += 1
            else:
                inp.append(x)
        r = out[doc_id]
        assert r.n_tokens == len(toks)
        assert r.n_masked == n_masked
        assert r.input_hash == _py_charfold(" ".join(inp))
        assert r.target_hash == _py_charfold(" ".join(tgt))
        assert 0 < n_masked <= len(toks)


def test_gk_quantile_twin_bound_and_exact_parity(spark):
    """r7 GK approx-quantile twin: (a) every bound boolean holds — the
    sketch's rank guarantee translated to the value-domain bracket; (b)
    the exact columns are IDENTICAL to q_event_quantiles (shared rank
    formulation — the twin adds the sketch, it must not change the
    measurement); (c) the bracket is derived from the knob, so a row
    exists per event_type with a sane n."""
    rows = {r.event_type: r for r in
            ALL_QUERIES["q_event_quantiles_approx"](spark, SF).collect()}
    exact = {r.event_type: r for r in
             ALL_QUERIES["q_event_quantiles"](spark, SF).collect()}
    assert set(rows) == set(exact) and rows
    for et, r in rows.items():
        assert r.p50_in_bound and r.p90_in_bound and r.p99_in_bound
        e = exact[et]
        assert (r.p50, r.p90, r.p99, r.n) == (e.p50, e.p90, e.p99, e.n)
        assert r.n > 0 and r.p50 <= r.p90 <= r.p99

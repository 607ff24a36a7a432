"""Fixture generator: determinism, schema, skew, invariants (FIXTURES.md)."""

import hashlib

from kgforge.fixtures import (
    gen_eval_docs,
    gen_repo_rows,
    golden_triples_for_rows,
    load_eval_docs_sentences,
)


def test_repo_rows_deterministic():
    assert gen_repo_rows(50) == gen_repo_rows(50)


def test_mega_repo_skew():
    rows = gen_repo_rows(200)
    mega = sum(1 for r in rows if r["repo"] == "org0/proj0")
    assert mega >= 0.25 * len(rows)  # ~30% planted skew


def test_commit_is_stable_sha1():
    r = gen_repo_rows(5)[0]
    assert r["commit"] == hashlib.sha1(f"{r['repo']}/{r['path']}".encode()).hexdigest()


def test_langs_mixture():
    langs = {r["lang"] for r in gen_repo_rows(300)}
    assert langs == {"python", "markdown", "java"}


def test_eval_docs_scierc_shape():
    docs = gen_eval_docs(10)
    d = docs[0]
    assert set(d) == {"doc_key", "sentences", "ner", "relations"}
    assert len(d["sentences"]) == len(d["ner"]) == len(d["relations"])
    # doc-level inclusive indices: every ner span inside doc token range
    n_tokens = sum(len(s) for s in d["sentences"])
    for sent_ner in d["ner"]:
        for s, e, _t in sent_ner:
            assert 0 <= s <= e < n_tokens


def test_eval_docs_halfopen_conversion():
    docs = gen_eval_docs(5)
    rows = load_eval_docs_sentences(docs)
    for r in rows:
        for s, e, _t in r["ner"]:
            assert 0 <= s < e <= len(r["tokens"])
        for ss, se, os_, oe, _r in r["relations"]:
            assert ss < se <= len(r["tokens"]) and os_ < oe <= len(r["tokens"])


def test_golden_triples_nonempty_and_keyed():
    rows = gen_repo_rows(40)
    g = golden_triples_for_rows(rows)
    assert len(g) > 0
    for t in g[:20]:
        assert t["content_sha"] == hashlib.sha256(
            next(r for r in rows if r["path"] == t["path"])["content"].encode()
        ).hexdigest()

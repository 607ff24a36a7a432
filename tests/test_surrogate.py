"""Surrogate cascade unit tests (pair enumeration, ranking determinism,
hard filter, classifier) — SURVEY.md §5.2 item 1."""

from kgforge.core.model import get_model
from kgforge.core.surrogate import (
    classify_relation,
    detect_mentions,
    extract_triples,
    rank_pairs,
    score_pair,
    tokenize,
)
from kgforge.core.vocab import GENERIC_ID, NUM_ENT_TYPES, build_lexicon

REPOS = get_model("repos")
DOCS = get_model("docs")


def test_lexicon_deterministic():
    a = build_lexicon()
    b = build_lexicon()
    assert a == b and len(a) == 500
    groups = {g for _, _, g in a}
    assert len(groups) < 500  # near-dup variants share groups


def test_detect_mentions_greedy_longest_match():
    # pick a multi-token lexicon term and embed it
    term = next(t for t, _, _ in build_lexicon() if len(t) == 2)
    toks = ["the", *term, "overall", "."]
    ments = detect_mentions(toks, REPOS)
    assert (1, 1 + len(term)) in {(s, e) for s, e, _ in ments}


def test_pair_enumeration_cardinality_no_type_filter():
    # n mentions, all same non-Generic type, no pattern gaps ->
    # pairs surviving threshold <= n^2 - n (J1 bound); with the noise
    # scorer most survive
    toks = "alpha beta gamma delta".split()
    ments = [(i, i + 1, 0) for i in range(4)]
    pairs = rank_pairs(toks, ments, REPOS)
    assert len(pairs) <= 4 * 3
    # ordering is a total order: re-running gives identical list
    assert pairs == rank_pairs(toks, ments, REPOS)


def test_hard_type_filter_blocks_generic_generic():
    toks = "x and y".split()
    ments = [(0, 1, GENERIC_ID), (2, 3, GENERIC_ID)]
    assert rank_pairs(toks, ments, REPOS) == []


def test_pattern_scores_dominate_noise():
    toks = "x is used for y".split()
    sub, obj = (0, 1, 0), (4, 5, 1)
    assert score_pair(toks, sub, obj, REPOS) >= 0.6
    assert score_pair(toks, obj, sub, REPOS) < 0.4  # reversed: no pattern


def test_classifier_na_and_direction():
    toks = "x is used for y".split()
    sub, obj = (0, 1, 0), (4, 5, 1)
    rel, _ = classify_relation(toks, sub, obj, REPOS)
    assert rel == 1  # USED-FOR + 1
    rel_rev, _ = classify_relation(toks, obj, sub, REPOS)
    assert rel_rev == 0  # NA


def test_extract_triples_dedup():
    term_a = next(t for t, ty, _ in build_lexicon() if len(t) == 1 and ty != GENERIC_ID)
    toks = [*term_a, "and", *term_a, "."]
    trips = extract_triples(toks, REPOS)
    # (a CONJUNCTION a) appears once even though pair scoring sees it once
    assert len(trips) == len(set(trips))


def test_docs_model_single_token_semantics():
    toks = tokenize("key fast value the table")
    trips = extract_triples(toks, DOCS)
    got = {(t[0], t[1], t[2]) for t in trips}
    assert ("key", "value", 0) in got  # USED-FOR
    assert ("value", "table", 2) in got  # HYPONYM-OF via 'the'


def test_mention_cap_applies():
    toks = "key " * 200
    ments = detect_mentions(tokenize(toks), REPOS)
    assert len(ments) <= REPOS.max_mentions


def test_tag_encoding_range():
    toks = tokenize("key fast value")
    from kgforge.core.surrogate import tag_tokens

    tags = tag_tokens(toks, DOCS)
    assert all(0 <= t <= 2 * NUM_ENT_TYPES for t in tags)

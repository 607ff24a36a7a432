"""Label vocabularies, the deterministic entity lexicon, and relation grammar.

These play the role of the reference's dataset YAMLs + trained weights
(/root/reference/datasets/scierc/scierc.yaml — 6 entity types, 7 relation
types).  The sandbox has no torch/transformers and the reference ships no
checkpoint (SURVEY.md §7.0), so the "model" is a deterministic surrogate:
a seeded gazetteer (entity head), a pattern grammar (relation head), and a
stable-hash scorer (pair filter).  The SAME functions back both the Spark
pandas-UDF pipeline and the plain-python oracle, making P/R parity testable
hermetically.
"""

from __future__ import annotations

import hashlib
import random

# Entity / relation label sets — SciERC vocabulary
# (/root/reference/datasets/scierc/scierc.yaml).
ENT_TYPES: list[str] = [
    "Task",
    "Method",
    "Metric",
    "Material",
    "OtherScientificTerm",
    "Generic",
]
REL_TYPES: list[str] = [
    "USED-FOR",
    "FEATURE-OF",
    "HYPONYM-OF",
    "PART-OF",
    "COMPARE",
    "CONJUNCTION",
    "EVALUATE-FOR",
]
NUM_ENT_TYPES = len(ENT_TYPES)
NUM_REL_TYPES = len(REL_TYPES)

# Relation grammar: token gap between subject end and object start.
# rel_id is the index into REL_TYPES; emitted triple is (subj, rel, obj)
# with subject preceding object in the sentence.  The fixture generator
# (kgforge/fixtures.py) plants sentences from exactly these templates.
GAP_PATTERNS: dict[tuple[str, ...], int] = {
    ("is", "used", "for"): 0,       # USED-FOR
    ("is", "a", "feature", "of"): 1,  # FEATURE-OF
    ("is", "a", "kind", "of"): 2,   # HYPONYM-OF
    ("is", "part", "of"): 3,        # PART-OF
    ("outperforms",): 4,            # COMPARE
    ("and",): 5,                    # CONJUNCTION
    ("is", "evaluated", "on"): 6,   # EVALUATE-FOR
}
MAX_GAP = max(len(p) for p in GAP_PATTERNS)

# Hard type-constraint filter (reference: hard_filter_table broadcast lookup,
# /root/reference/models/entity_pair_filter.py:90,376-379): a (sub_type,
# obj_type) pair that can never carry a relation is pruned before the
# expensive classify stage.  Here: Generic->Generic never relates (the
# grammar never plants it), everything else is allowed.
GENERIC_ID = ENT_TYPES.index("Generic")


def type_pair_allowed(sub_type: int, obj_type: int) -> bool:
    return not (sub_type == GENERIC_ID and obj_type == GENERIC_ID)


def allowed_type_pairs() -> list[tuple[int, int]]:
    """The broadcastable allow-table (J4)."""
    return [
        (s, o)
        for s in range(NUM_ENT_TYPES)
        for o in range(NUM_ENT_TYPES)
        if type_pair_allowed(s, o)
    ]


def stable_hash(*parts: str) -> int:
    """Platform/session-stable 63-bit hash (md5-backed, not PYTHONHASHSEED)."""
    h = hashlib.md5("\x1f".join(parts).encode("utf-8")).digest()
    return int.from_bytes(h[:8], "big") & 0x7FFFFFFFFFFFFFFF


# ---------------------------------------------------------------------------
# Deterministic lexicon ("gazetteer weights") — seeded, rebuildable anywhere.
# ---------------------------------------------------------------------------

_SYLLABLES = [
    "spark", "graph", "vector", "token", "span", "mask", "joint", "neural",
    "hash", "batch", "kernel", "filter", "latent", "markov", "bayes", "tensor",
    "greedy", "sparse", "dense", "prefix", "suffix", "beam", "cascade", "gate",
    "anchor", "probe", "relay", "lattice", "prism", "quartz", "delta", "sigma",
]
_HEADS = [
    "model", "parser", "tagger", "encoder", "decoder", "network", "index",
    "metric", "corpus", "dataset", "algorithm", "classifier", "extractor",
    "embedding", "pipeline", "schema", "planner", "sampler", "cache", "graph",
]
_VARIANT_SUFFIXES = ["system", "variant", "v2"]

LEXICON_SEED = 13
LEXICON_SIZE = 500


def build_lexicon(
    seed: int = LEXICON_SEED, size: int = LEXICON_SIZE
) -> list[tuple[tuple[str, ...], int, int]]:
    """Return ``[(surface_tokens, ent_type_id, canonical_group)]``.

    ~10% of entries are near-duplicate variants of an earlier entry (same
    ``canonical_group``) to exercise MinHash-LSH canonicalization +
    connected-components linking (FIXTURES.md §3).
    """
    rng = random.Random(seed)
    out: list[tuple[tuple[str, ...], int, int]] = []
    seen: set[tuple[str, ...]] = set()
    group = 0
    while len(out) < size:
        if out and rng.random() < 0.10:
            # near-duplicate variant of a random earlier base term
            base_tokens, ent_type, base_group = out[rng.randrange(len(out))]
            surface = base_tokens + (rng.choice(_VARIANT_SUFFIXES),)
            if surface in seen:
                continue
            seen.add(surface)
            out.append((surface, ent_type, base_group))
            continue
        n = rng.choice([1, 2, 2, 3])
        toks = tuple(rng.choice(_SYLLABLES) for _ in range(n - 1)) + (
            rng.choice(_HEADS),
        )
        if toks in seen:
            continue
        seen.add(toks)
        ent_type = stable_hash("ent-type", " ".join(toks)) % NUM_ENT_TYPES
        out.append((toks, ent_type, group))
        group += 1
    return out


def gazetteer(seed: int = LEXICON_SEED, size: int = LEXICON_SIZE) -> dict[tuple[str, ...], int]:
    """surface tokens -> ent_type_id, longest-match lookup table."""
    return {toks: t for toks, t, _ in build_lexicon(seed, size)}

"""Typed entity markers (F7/F8, reference re_model.py:254-275) + the
code-complete ONNX relation-classifier seam (stub session)."""

import numpy as np
import pytest

from kgforge.core.markers import (
    insert_typed_markers,
    marker_id,
    strip_markers,
)
from kgforge.core.vocab import ENT_TYPES, NUM_ENT_TYPES
from kgforge.encode.rel_classifier import OnnxRelClassifier


def test_marker_insertion_layout():
    toks = "a b c d e".split()
    ments = [(1, 2, 0), (3, 5, 1)]
    marked, pos_ids, span_map = insert_typed_markers(toks, ments)
    assert marked == [
        "a", f"<E:{ENT_TYPES[0]}>", "b", f"</E:{ENT_TYPES[0]}>",
        "c", f"<E:{ENT_TYPES[1]}>", "d", "e", f"</E:{ENT_TYPES[1]}>",
    ]
    # marker slots duplicate boundary positions (re_model.py:261)
    assert pos_ids == [0, 1, 1, 1, 2, 3, 3, 4, 4]
    # span map points at entity TOKENS in marked space
    s, e = span_map[(1, 2)]
    assert marked[s:e] == ["b"]
    s, e = span_map[(3, 5)]
    assert marked[s:e] == ["d", "e"]
    assert strip_markers(marked) == toks


def test_marker_insertion_rejects_overlap():
    with pytest.raises(ValueError):
        insert_typed_markers("a b c".split(), [(0, 2, 0), (1, 3, 1)])


class _PairStub:
    """Reads the subject/object START-marker ids at pair_pos and returns a
    relation keyed on the marker TYPE pair — proving the classifier feeds
    the marked layout (not raw tokens) to the model."""

    def __init__(self, marker_base):
        self.base = marker_base

    def run(self, _out, feeds):
        ids, pos = feeds["input_ids"], feeds["pair_pos"]
        b = ids.shape[0]
        logits = np.zeros((b, 8), dtype=np.float32)
        for i in range(b):
            sub_t = ids[i, pos[i, 0]] - self.base
            obj_t = ids[i, pos[i, 1]] - self.base
            assert 0 <= sub_t < NUM_ENT_TYPES and 0 <= obj_t < NUM_ENT_TYPES
            # deterministic rule: same types -> NA, else rel = sub_t % 7 + 1
            logits[i, 0 if sub_t == obj_t else int(sub_t) % 7 + 1] = 1.0
        return [logits]


def test_rel_classifier_consumes_markers():
    vocab = {w: i + 2 for i, w in enumerate("a b c d e".split())}
    vocab["[PAD]"], vocab["[UNK]"] = 0, 1
    probe = OnnxRelClassifier(session=_PairStub(0), vocab=vocab)
    probe.session = _PairStub(probe.marker_base)  # stub reads real base
    toks = "a b c d e".split()
    ments = [(1, 2, 0), (3, 5, 1)]
    out = probe.classify_batch(
        [toks], [ments], pairs=[(0, 0, 1), (0, 1, 0), (0, 0, 0)]
    )
    assert out[0] == 0 % 7 + 1   # sub type 0, obj type 1
    assert out[1] == 1 % 7 + 1   # sub type 1, obj type 0
    assert out[2] == 0           # same mention types both sides -> NA


def test_marker_id_arithmetic():
    base = 100
    assert marker_id(2, False, base) == 102
    assert marker_id(2, True, base) == 102 + NUM_ENT_TYPES


from hypothesis import given, settings
from hypothesis import strategies as st


@st.composite
def _toks_and_mentions(draw):
    n = draw(st.integers(1, 30))
    toks = [draw(st.sampled_from(["a", "b", "c", "d"])) for _ in range(n)]
    ments, cursor = [], 0
    while cursor < n and len(ments) < 5:
        s = draw(st.integers(cursor, n - 1))
        e = draw(st.integers(s + 1, min(n, s + 3)))
        if draw(st.booleans()):
            ments.append((s, e, draw(st.integers(0, NUM_ENT_TYPES - 1))))
        cursor = e
    return toks, ments


@settings(max_examples=60, deadline=None)
@given(_toks_and_mentions())
def test_marker_roundtrip_property(tm):
    """strip(insert(x)) == x; pos_ids monotone per original token; span_map
    slices reproduce the mention tokens — for arbitrary disjoint mentions."""
    toks, ments = tm
    marked, pos_ids, span_map = insert_typed_markers(toks, ments)
    assert strip_markers(marked) == toks
    assert len(marked) == len(toks) + 2 * len(ments) == len(pos_ids)
    for (s, e), (ms, me) in span_map.items():
        assert marked[ms:me] == toks[s:e]
        assert marked[ms - 1].startswith("<E:") and marked[me].startswith("</E:")


def test_rel_classifier_clamps_truncated_pairs():
    """Pairs whose start marker falls past max_seq_len truncation are
    classified NA instead of gathering out of bounds; in-range pairs in
    the same batch still classify normally."""
    toks = [f"w{i}" for i in range(10)]
    vocab = {w: i + 2 for i, w in enumerate(toks)}
    vocab["[PAD]"], vocab["[UNK]"] = 0, 1
    probe = OnnxRelClassifier(session=_PairStub(0), vocab=vocab, max_seq_len=6)
    probe.session = _PairStub(probe.marker_base)
    ments = [(0, 1, 0), (2, 3, 1), (8, 9, 2)]
    out = probe.classify_batch(
        [toks], [ments],
        pairs=[(0, 0, 1), (0, 0, 2), (0, 2, 1)],
    )
    assert out[0] == 0 % 7 + 1  # both markers in range -> real label
    assert out[1] == 0          # obj marker truncated away -> NA
    assert out[2] == 0          # sub marker truncated away -> NA

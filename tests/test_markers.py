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


def test_rel_classifier_extend_mode_classifies_long_pairs():
    """length_mode='extend' (reference re_model.py:212, 364-366): the
    padded width grows to the batch's longest marked sequence, so the
    pairs clamp mode maps to NA get real labels."""
    toks = [f"w{i}" for i in range(10)]
    vocab = {w: i + 2 for i, w in enumerate(toks)}
    vocab["[PAD]"], vocab["[UNK]"] = 0, 1
    probe = OnnxRelClassifier(
        session=_PairStub(0), vocab=vocab, max_seq_len=6, length_mode="extend"
    )
    probe.session = _PairStub(probe.marker_base)
    ments = [(0, 1, 0), (2, 3, 1), (8, 9, 2)]
    out = probe.classify_batch(
        [toks], [ments],
        pairs=[(0, 0, 1), (0, 0, 2), (0, 2, 1)],
    )
    assert out[0] == 0 % 7 + 1  # unchanged vs clamp
    assert out[1] == 0 % 7 + 1  # sub type 0, obj type 2 -> real label now
    assert out[2] == 2 % 7 + 1  # sub type 2, obj type 1 -> real label now


def test_rel_classifier_invalid_length_mode():
    with pytest.raises(ValueError):
        OnnxRelClassifier(session=_PairStub(0), vocab={"[PAD]": 0}, length_mode="grow")


def test_pair_suffix_layout_parity_table():
    """r3 VERDICT #4 — both suffix layouts of re_model.py:401-412, pinned
    as a table: token order, slot indexes, and pos_ids order."""
    from kgforge.core.markers import MASK_TOKEN, pair_suffix, pair_suffix_pos_ids

    sub_t, obj_t = 0, 1
    s, o = f"<E:{ENT_TYPES[sub_t]}>", f"<E:{ENT_TYPES[obj_t]}>"
    #  layout   | tokens              | sub | obj | mask | pos_ids(5,9,m=2)
    table = {
        False: ([MASK_TOKEN, s, o], 1, 2, 0, [2, 5, 9]),
        True:  ([s, MASK_TOKEN, o], 0, 2, 1, [5, 2, 9]),
    }
    for refine, (toks, sub_slot, obj_slot, mask_slot, pos) in table.items():
        assert pair_suffix(sub_t, obj_t, refine=refine) == (
            toks, sub_slot, obj_slot, mask_slot
        )
        assert pair_suffix_pos_ids(5, 9, mask_pos=2, refine=refine) == pos
        # the slot indexes really address the tokens they claim to
        assert toks[sub_slot] == s and toks[obj_slot] == o
        assert toks[mask_slot] == MASK_TOKEN


def test_rel_classifier_suffix_layouts_classify_identically():
    """Both suffix layouts gather the same (sub, obj) marker ids through
    pair_pos, so a marker-driven head labels identically — while the fed
    input_ids genuinely differ in order (captured via a recording stub).
    Suffix rows are never truncated: pairs clamp mode NA'd get labels."""
    toks = [f"w{i}" for i in range(10)]
    vocab = {w: i + 3 for i, w in enumerate(toks)}
    vocab["[PAD]"], vocab["[UNK]"], vocab["[MASK]"] = 0, 1, 2
    ments = [(0, 1, 0), (2, 3, 1), (8, 9, 2)]
    pairs = [(0, 0, 1), (0, 0, 2), (0, 2, 1)]

    class _Recorder(_PairStub):
        def run(self, _out, feeds):
            self.fed = feeds["input_ids"].copy()
            return super().run(_out, feeds)

    outs, fed = {}, {}
    for layout in ("suffix", "suffix_refine"):
        probe = OnnxRelClassifier(
            session=_PairStub(0), vocab=vocab,
            max_seq_len=6, pair_layout=layout,
        )
        rec = _Recorder(probe.marker_base)
        probe.session = rec
        outs[layout] = probe.classify_batch([toks], [ments], pairs)
        fed[layout] = rec.fed
    assert outs["suffix"] == outs["suffix_refine"]
    assert outs["suffix"] == [0 % 7 + 1, 0 % 7 + 1, 2 % 7 + 1]  # no NA clamps
    # default: [..., MASK, sub, obj]; refine: [..., sub, MASK, obj]
    mask_id, base = 2, probe.marker_base
    assert fed["suffix"][0, -3:].tolist() == [mask_id, base + 0, base + 1]
    assert fed["suffix_refine"][0, -3:].tolist() == [base + 0, mask_id, base + 1]


def test_rel_classifier_invalid_pair_layout():
    with pytest.raises(ValueError):
        OnnxRelClassifier(
            session=_PairStub(0), vocab={"[PAD]": 0}, pair_layout="prefix"
        )


@settings(max_examples=40, deadline=None)
@given(_toks_and_mentions(), st.integers(4, 20))
def test_rel_classifier_clamp_subset_of_extend_property(tm, max_len):
    """Property (r3 VERDICT #3): for every pair, clamp-mode output is NA
    or equal to extend-mode output — clamping only ever LOSES triples,
    never changes a label."""
    toks, ments = tm
    if len(ments) < 2:
        return
    vocab = {w: i + 2 for i, w in enumerate(sorted(set(toks)))}
    vocab["[PAD]"], vocab["[UNK]"] = 0, 1
    pairs = [
        (0, i, j)
        for i in range(len(ments))
        for j in range(len(ments))
        if i != j
    ]
    outs = {}
    for mode in ("clamp", "extend"):
        probe = OnnxRelClassifier(
            session=_PairStub(0), vocab=vocab,
            max_seq_len=max_len, length_mode=mode,
        )
        probe.session = _PairStub(probe.marker_base)
        outs[mode] = probe.classify_batch([toks], [ments], pairs)
    for c, e in zip(outs["clamp"], outs["extend"]):
        assert c == 0 or c == e

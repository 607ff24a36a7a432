"""End-to-end ONNX-seam integration — SKIPPED where the onnx/onnxruntime
wheels are absent (this sandbox), so the seams (encode/encoder.py
OnnxEncoder, encode/rel_classifier.py OnnxRelClassifier) are exercised
against REAL InferenceSessions the day a wheel exists and cannot rot
silently.  The tiny models are generated here with onnx.helper and
implement the same deterministic rules the stub-session tests pin, so a
divergence between stub contract and real-session behavior fails loudly.
"""

import pytest

onnx = pytest.importorskip("onnx")
ort = pytest.importorskip("onnxruntime")  # noqa: F401 - gate only

import numpy as np  # noqa: E402
from onnx import TensorProto, helper  # noqa: E402

from kgforge.core.markers import insert_typed_markers, marker_id  # noqa: E402
from kgforge.core.vocab import ENT_TYPES, NUM_ENT_TYPES, REL_TYPES  # noqa: E402
from kgforge.encode.encoder import OnnxEncoder  # noqa: E402
from kgforge.encode.rel_classifier import OnnxRelClassifier  # noqa: E402


def _save(graph, path, opset=17):
    model = helper.make_model(
        graph, opset_imports=[helper.make_opsetid("", opset)]
    )
    onnx.checker.check_model(model)
    onnx.save(model, path)


def test_onnx_encoder_end_to_end(tmp_path):
    """Real session: token-id -> BIO-tag lookup table, one-hot logits.
    OnnxEncoder must pad/batch/forward/argmax/decode to the right spans."""
    vocab = {"alpha": 0, "beta": 1, "gamma": 2, "[PAD]": 3, "[UNK]": 4}
    depth = 2 * NUM_ENT_TYPES + 1
    # alpha = B-type0 (tag 1), beta = I-type0 (tag 1+T), everything else O
    table = np.zeros(5, dtype=np.int64)
    table[0] = 1
    table[1] = 1 + NUM_ENT_TYPES
    graph = helper.make_graph(
        [
            helper.make_node("Gather", ["table", "input_ids"], ["tags"], axis=0),
            helper.make_node(
                "OneHot", ["tags", "depth", "values"], ["logits"], axis=-1
            ),
        ],
        "tiny_tagger",
        [
            helper.make_tensor_value_info("input_ids", TensorProto.INT64, ["b", "s"]),
            helper.make_tensor_value_info(
                "attention_mask", TensorProto.INT64, ["b", "s"]
            ),
        ],
        [
            helper.make_tensor_value_info(
                "logits", TensorProto.FLOAT, ["b", "s", depth]
            )
        ],
        initializer=[
            helper.make_tensor("table", TensorProto.INT64, [5], table),
            helper.make_tensor("depth", TensorProto.INT64, [], [depth]),
            helper.make_tensor("values", TensorProto.FLOAT, [2], [0.0, 1.0]),
        ],
    )
    p = str(tmp_path / "tagger.onnx")
    _save(graph, p)

    enc = OnnxEncoder(model_path=p, vocab=vocab)
    out = enc.detect_batch([["alpha", "beta", "gamma"], ["gamma", "alpha"]])
    # ragged batch: row 0 pads row 1; padded tail must not leak mentions
    assert out == [[(0, 2, 0)], [(1, 2, 0)]]
    # OOV maps to [UNK] (tag O) instead of indexing past the table
    assert enc.detect_batch([["zzz", "alpha"]]) == [[(1, 2, 0)]]


def _rel_model(path, n_classes):
    """logits[b] = OneHot((ids[pair_pos[0]] + ids[pair_pos[1]]) % n_classes):
    depends on the MARKED-space ids at pair_pos, so the test proves the
    classifier feeds marker layout + positions to the session."""
    graph = helper.make_graph(
        [
            helper.make_node(
                "GatherElements", ["input_ids", "pair_pos"], ["pg"], axis=1
            ),
            helper.make_node("ReduceSum", ["pg", "axes"], ["ps"], keepdims=0),
            helper.make_node("Mod", ["ps", "nc"], ["lbl"]),
            helper.make_node(
                "OneHot", ["lbl", "depth", "values"], ["logits"], axis=-1
            ),
        ],
        "tiny_rel",
        [
            helper.make_tensor_value_info("input_ids", TensorProto.INT64, ["b", "s"]),
            helper.make_tensor_value_info(
                "attention_mask", TensorProto.INT64, ["b", "s"]
            ),
            helper.make_tensor_value_info("pair_pos", TensorProto.INT64, ["b", 2]),
        ],
        [
            helper.make_tensor_value_info(
                "logits", TensorProto.FLOAT, ["b", n_classes]
            )
        ],
        initializer=[
            helper.make_tensor("axes", TensorProto.INT64, [1], [1]),
            helper.make_tensor("nc", TensorProto.INT64, [], [n_classes]),
            helper.make_tensor("depth", TensorProto.INT64, [], [n_classes]),
            helper.make_tensor("values", TensorProto.FLOAT, [2], [0.0, 1.0]),
        ],
    )
    _save(graph, path)


def test_onnx_rel_classifier_end_to_end(tmp_path):
    n_classes = len(REL_TYPES) + 1
    p = str(tmp_path / "rel.onnx")
    _rel_model(p, n_classes)

    toks = "a b c d e".split()
    vocab = {w: i + 2 for i, w in enumerate(toks)}
    vocab["[PAD]"], vocab["[UNK]"] = 0, 1
    clf = OnnxRelClassifier(model_path=p, vocab=vocab)
    ments = [(1, 2, 0), (3, 5, 1)]
    got = clf.classify_batch([toks], [ments], pairs=[(0, 0, 1), (0, 1, 0)])

    # independent mirror of the marked-space id arithmetic
    marked, _pos, span_map = insert_typed_markers(toks, sorted(ments))
    ids = []
    for t in marked:
        if t.startswith("<E:") or t.startswith("</E:"):
            is_end = t.startswith("</")
            name = t.split(":", 1)[1].rstrip(">")
            ids.append(marker_id(ENT_TYPES.index(name), is_end, clf.marker_base))
        else:
            ids.append(vocab[t.lower()])
    pos = {se: span_map[se][0] - 1 for se in span_map}
    sm = sorted(ments)

    def expect(sub_ix, obj_ix):
        ps = pos[(sm[sub_ix][0], sm[sub_ix][1])]
        po = pos[(sm[obj_ix][0], sm[obj_ix][1])]
        return (ids[ps] + ids[po]) % n_classes

    assert got == [expect(0, 1), expect(1, 0)]


def test_onnx_rel_classifier_clamps_truncated_pairs_real_session(tmp_path):
    """Same clamp behavior as the stub test, against a real session: a
    pair whose start marker falls past max_seq_len is NA, in-range pairs
    in the same batch still classify."""
    n_classes = len(REL_TYPES) + 1
    p = str(tmp_path / "rel.onnx")
    _rel_model(p, n_classes)

    toks = [f"w{i}" for i in range(10)]
    vocab = {w: i + 2 for i, w in enumerate(toks)}
    vocab["[PAD]"], vocab["[UNK]"] = 0, 1
    clf = OnnxRelClassifier(model_path=p, vocab=vocab, max_seq_len=6)
    ments = [(0, 1, 0), (2, 3, 1), (8, 9, 2)]
    got = clf.classify_batch(
        [toks], [ments], pairs=[(0, 0, 1), (0, 0, 2), (0, 2, 1)]
    )
    assert got[1] == 0 and got[2] == 0  # truncated -> NA
    assert 0 <= got[0] < n_classes  # in-range pair ran the forward

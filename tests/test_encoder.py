"""Encoder seam: surrogate conformance + ONNX batching contract (session
stubbed — the wheel is absent here; the Spark side never changes)."""

import numpy as np
import pytest

from kgforge.core.model import get_model
from kgforge.core.surrogate import detect_mentions, tokenize
from kgforge.core.vocab import NUM_ENT_TYPES
from kgforge.encode.encoder import OnnxEncoder, SurrogateEncoder


def test_surrogate_encoder_matches_core():
    texts = ["key fast value", "the table", ""]
    enc = SurrogateEncoder("docs")
    model = get_model("docs")
    got = enc.detect_batch([tokenize(t) for t in texts])
    want = [detect_mentions(tokenize(t), model) for t in texts]
    assert got == want


def test_onnx_encoder_requires_runtime():
    with pytest.raises(NotImplementedError):
        OnnxEncoder(model_path="/nonexistent.onnx")


class _StubSession:
    """Stands in for onnxruntime.InferenceSession: tags token id 7 as B-0
    and id 8 as I-0, everything else O."""

    def run(self, _out, feeds):
        ids = feeds["input_ids"]
        mask = feeds["attention_mask"]
        b, s = ids.shape
        logits = np.zeros((b, s, 2 * NUM_ENT_TYPES + 1), dtype=np.float32)
        logits[..., 0] = 0.1
        logits[ids == 7, 1] = 1.0                    # B-0
        logits[ids == 8, 1 + NUM_ENT_TYPES] = 1.0    # I-0
        logits[mask == 0] = 0.0
        logits[mask == 0, 0] = 1.0                   # pad -> O
        return [logits]


def test_onnx_encoder_batching_and_decode():
    vocab = {"ent": 7, "cont": 8, "x": 3}
    enc = OnnxEncoder(session=_StubSession(), vocab=vocab)
    batch = [
        "ent cont cont x".split(),     # one 3-token entity
        "x x".split(),                 # none
        "ent x ent".split(),           # two singletons
        [],                            # empty
        "ent".split() * 5,             # consecutive B tags -> 5 entities
    ]
    out = enc.detect_batch(batch)
    assert out[0] == [(0, 3, 0)]
    assert out[1] == []
    assert out[2] == [(0, 1, 0), (2, 3, 0)]
    assert out[3] == []
    assert out[4] == [(i, i + 1, 0) for i in range(5)]


def test_onnx_encoder_truncates_to_budget():
    vocab = {"ent": 7}
    enc = OnnxEncoder(session=_StubSession(), vocab=vocab, max_seq_len=10)
    out = enc.detect_batch(["ent".split() * 50])
    assert max(e[1] for e in out[0]) <= 10


def test_onnx_encoder_reserved_ids():
    """PAD/UNK come from the vocab contract (reserved in-vocab ids); OOV
    tokens map to unk_id, never past the embedding table (ADVICE r1)."""
    vocab = {"ent": 7, "[PAD]": 0, "[UNK]": 1}
    enc = OnnxEncoder(session=_StubSession(), vocab=vocab)
    assert enc.pad_id == 0 and enc.unk_id == 1
    out = enc.detect_batch([["zzz-oov", "ent"]])
    assert out[0] == [(1, 2, 0)]
    # auto-reservation allocates ABOVE existing ids (no collision with 0)
    enc2 = OnnxEncoder(session=_StubSession(), vocab={"a": 0})
    assert enc2.pad_id == 1 and enc2.unk_id == 2
    assert enc2.embedding_rows == 3

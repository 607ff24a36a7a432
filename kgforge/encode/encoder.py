"""Encoder interface — the seam where a real PLM replaces the surrogate.

The reference encodes with a HuggingFace PLM (models/theta.py:284-303,
M1) and decodes mention spans from per-token logits (M2).  This sandbox
has no torch/transformers/onnxruntime and the reference ships no
checkpoint (SURVEY.md §7.0), so:

  * ``SurrogateEncoder`` — the deterministic gazetteer model
    (kgforge/core/surrogate.py) behind this interface; used everywhere.
  * ``OnnxEncoder`` — the REAL batched-inference path, code-complete:
    loads an ONNX BIO-tagger session, pads a token batch, runs one
    forward per Arrow micro-batch, argmax-decodes with the shared
    ``decode_bio``.  Import-gated: constructing it without onnxruntime
    raises a clear error; its batching/decoding contract is covered by
    shape tests that stub the session.

Both return the same ``list[list[(start, end, type)]]`` per batch, so the
Spark pipeline swaps encoders without touching any plan: pass
``encoder_factory`` where the UDF builders take a model name today.
"""

from __future__ import annotations

from abc import ABC, abstractmethod

from ..core.bio import decode_bio
from ..core.vocab import NUM_ENT_TYPES


class EncoderBase(ABC):
    """texts -> mention spans, batched (the M1+M2 contract)."""

    @abstractmethod
    def detect_batch(self, token_lists: list[list[str]]) -> list[list[tuple[int, int, int]]]:
        ...


class SurrogateEncoder(EncoderBase):
    def __init__(self, model_name: str = "repos"):
        from ..core.model import get_model

        self.model = get_model(model_name)

    def detect_batch(self, token_lists):
        from ..core.surrogate import detect_mentions

        return [detect_mentions(toks, self.model) for toks in token_lists]


class OnnxEncoder(EncoderBase):
    """Batched ONNX inference: tokenize -> pad -> one forward per batch ->
    argmax -> shared BIO decode.

    ``session`` must expose ``run(None, {"input_ids": int64[b, s],
    "attention_mask": int64[b, s]}) -> [logits float32[b, s, 2T+1]]`` —
    the standard export of a token-classification head.  ``vocab`` maps
    token -> id (whitespace-level; subword alignment would wrap this
    class, reference data/utils.py:74-79).
    """

    PAD_TOKEN = "[PAD]"
    UNK_TOKEN = "[UNK]"

    def __init__(self, model_path: str | None = None, vocab: dict[str, int] | None = None,
                 session=None, max_seq_len: int = 402):
        if session is None:
            try:
                import onnxruntime  # noqa: F401
            except ImportError as e:  # pragma: no cover - wheel absent here
                raise NotImplementedError(
                    "onnxruntime is not installed in this environment; "
                    "OnnxEncoder is code-complete but can only run where "
                    "the wheel exists. Use SurrogateEncoder instead."
                ) from e
            session = onnxruntime.InferenceSession(model_path)  # pragma: no cover
        self.session = session
        self.vocab = dict(vocab) if vocab else {}
        self.max_seq_len = max_seq_len  # reference budget, config.yaml:30
        # Reserved-id contract (ADVICE r1): PAD/UNK must be REAL in-vocab
        # ids — deriving unk as len(vocab)+1 indexes past the embedding
        # table on the first OOV token, and pad=0 collides with any real
        # token id 0.  Absent entries are auto-reserved ABOVE the existing
        # ids (the embedding table must then cover max(vocab)+1 rows,
        # asserted in detect_batch's id bound below).
        for tok in (self.PAD_TOKEN, self.UNK_TOKEN):
            if tok not in self.vocab:
                self.vocab[tok] = (max(self.vocab.values()) + 1) if self.vocab else len(self.vocab)
        self.pad_id = self.vocab[self.PAD_TOKEN]
        self.unk_id = self.vocab[self.UNK_TOKEN]
        self.embedding_rows = max(self.vocab.values()) + 1

    def _encode_ids(self, tokens: list[str]) -> list[int]:
        ids = [self.vocab.get(t.lower(), self.unk_id) for t in tokens[: self.max_seq_len]]
        assert all(i < self.embedding_rows for i in ids)
        return ids

    def detect_batch(self, token_lists):
        import numpy as np

        if not token_lists:
            return []
        ids = [self._encode_ids(t) for t in token_lists]
        width = max(len(x) for x in ids)
        input_ids = np.full((len(ids), width), self.pad_id, dtype=np.int64)
        mask = np.zeros((len(ids), width), dtype=np.int64)
        for i, x in enumerate(ids):
            input_ids[i, : len(x)] = x
            mask[i, : len(x)] = 1
        (logits,) = self.session.run(
            None, {"input_ids": input_ids, "attention_mask": mask}
        )
        tags = logits.argmax(axis=-1)  # [b, s] — W5 argmax decode
        out = []
        for i, toks in enumerate(token_lists):
            n = min(len(toks), width)
            out.append(decode_bio(tags[i, :n].tolist(), NUM_ENT_TYPES))
        return out

"""Relation-classifier seam (M4) — the REAL batched-inference path,
code-complete behind the same import gate as OnnxEncoder.

Mirrors the reference's second PLM pass (models/re_model.py:165-851):
the input sequence carries TYPED entity markers (core/markers.py), one
forward per Arrow micro-batch scores every candidate pair, argmax over
(rel_num + 1) classes with 0 = NA.  The session contract:

    run(None, {"input_ids": int64[b, s], "attention_mask": int64[b, s],
               "pair_pos": int64[b, 2]})
        -> [logits float32[b, rel_num + 1]]

where pair_pos holds the marked-space start positions of the subject and
object START markers (the reference pools marker embeddings for the pair
head).  No onnxruntime wheel ships in this sandbox, so the live pipeline
uses the surrogate; the batching/marker layout here is covered by
stub-session tests (tests/test_markers.py).
"""

from __future__ import annotations

from ..core.markers import insert_typed_markers
from ..core.vocab import NUM_ENT_TYPES

Mention = tuple[int, int, int]


class OnnxRelClassifier:
    PAD_TOKEN = "[PAD]"
    UNK_TOKEN = "[UNK]"
    MASK_TOKEN = "[MASK]"

    def __init__(
        self,
        model_path: str | None = None,
        vocab: dict[str, int] | None = None,
        session=None,
        max_seq_len: int = 402,
        length_mode: str = "clamp",
        pair_layout: str | None = None,
    ):
        # length_mode governs pairs whose markers land past max_seq_len:
        #   "clamp"  — truncate the marked sequence and emit NA for any
        #              pair whose start marker was cut (bounded memory;
        #              recall-lossy on long sentences);
        #   "extend" — the reference's TEST-TIME behavior
        #              (re_model.py:212, 364-366): grow the padded width
        #              to the batch's longest marked sequence instead of
        #              dropping pairs — no NA-clamping, memory scales
        #              with the batch's longest unit.
        # clamp-mode output is a pointwise subset of extend-mode output
        # (equal label or NA), pinned by tests/test_markers.py.
        if length_mode not in ("clamp", "extend"):
            raise ValueError(f"length_mode must be clamp|extend: {length_mode}")
        self.length_mode = length_mode
        # pair_layout selects where pair_pos gathers from:
        #   None            — the in-sentence start markers (default);
        #   "suffix"        — append the reference's per-pair triplet
        #                     [MASK, <E:sub>, <E:obj>] (re_model.py:407-412)
        #                     and gather its marker slots;
        #   "suffix_refine" — the use_rel_refine order
        #                     [<E:sub>, MASK, <E:obj>] (re_model.py:401-406).
        # Both suffix layouts classify every pair (the suffix is never
        # truncated) and produce identical labels for a marker-type-driven
        # head — pinned by tests/test_markers.py layout-parity tests.
        if pair_layout not in (None, "suffix", "suffix_refine"):
            raise ValueError(
                f"pair_layout must be None|suffix|suffix_refine: {pair_layout}"
            )
        self.pair_layout = pair_layout
        if session is None:
            try:
                import onnxruntime  # noqa: F401
            except ImportError as e:  # pragma: no cover - wheel absent here
                raise NotImplementedError(
                    "onnxruntime is not installed in this environment; "
                    "OnnxRelClassifier is code-complete but can only run "
                    "where the wheel exists. Use the surrogate instead."
                ) from e
            session = onnxruntime.InferenceSession(model_path)  # pragma: no cover
        self.session = session
        self.vocab = dict(vocab) if vocab else {}
        self.max_seq_len = max_seq_len
        # reserved ids (same contract as OnnxEncoder) + a marker block of
        # 2 * NUM_ENT_TYPES ids appended after the vocab
        for tok in (self.PAD_TOKEN, self.UNK_TOKEN, self.MASK_TOKEN):
            if tok not in self.vocab:
                self.vocab[tok] = (
                    max(self.vocab.values()) + 1 if self.vocab else len(self.vocab)
                )
        self.pad_id = self.vocab[self.PAD_TOKEN]
        self.unk_id = self.vocab[self.UNK_TOKEN]
        self.mask_id = self.vocab[self.MASK_TOKEN]
        self.marker_base = max(self.vocab.values()) + 1
        self.embedding_rows = self.marker_base + 2 * NUM_ENT_TYPES

    def _encode(self, marked: list[str]) -> list[int]:
        from ..core.markers import marker_id

        ids = []
        cut = marked[: self.max_seq_len] if self.length_mode == "clamp" else marked
        for t in cut:
            if t.startswith("<E:") or t.startswith("</E:"):
                from ..core.vocab import ENT_TYPES

                is_end = t.startswith("</")
                name = t.split(":", 1)[1].rstrip(">")
                ids.append(marker_id(ENT_TYPES.index(name), is_end, self.marker_base))
            else:
                ids.append(self.vocab.get(t.lower(), self.unk_id))
        assert all(i < self.embedding_rows for i in ids)
        return ids

    def _suffix_ids(self, toks: list[str]) -> list[int]:
        """Encode a pair_suffix triplet: MASK -> mask_id, markers -> the
        marker id block (start markers only appear in suffixes)."""
        from ..core.markers import MASK_TOKEN, marker_id
        from ..core.vocab import ENT_TYPES

        out = []
        for t in toks:
            if t == MASK_TOKEN:
                out.append(self.mask_id)
            else:
                is_end = t.startswith("</")
                name = t.split(":", 1)[1].rstrip(">")
                out.append(
                    marker_id(ENT_TYPES.index(name), is_end, self.marker_base)
                )
        return out

    def classify_batch(
        self,
        token_lists: list[list[str]],
        mention_lists: list[list[Mention]],
        pairs: list[tuple[int, int, int]],  # (unit_ix, sub_ix, obj_ix)
    ) -> list[int]:
        """Return rel_id + 1 per pair (0 = NA), one forward for the batch."""
        import numpy as np

        if not pairs:
            return []
        marked_ids, marker_pos = [], []
        for toks, ments in zip(token_lists, mention_lists):
            marked, _pos, span_map = insert_typed_markers(toks, sorted(ments))
            ids = self._encode(marked)
            # start-marker slot = entity token start - 1 in marked space
            pos = {
                (s, e): span_map[(s, e)][0] - 1 for (s, e) in span_map
            }
            marked_ids.append(ids)
            marker_pos.append(pos)
        # pair_pos indexes MARKED space.  In clamp mode _encode truncates
        # to max_seq_len, so a pair whose start marker fell past the cut
        # would gather out of bounds (or garbage) at inference time: emit
        # NA (0) for it and run the forward only over in-range pairs.  In
        # extend mode nothing is truncated, so this guard never fires and
        # every pair classifies (the reference's test-time behavior).
        results = [0] * len(pairs)
        rows, pair_pos, keep = [], [], []
        for out_ix, (unit_ix, sub_ix, obj_ix) in enumerate(pairs):
            ments = sorted(mention_lists[unit_ix])
            sub, obj = ments[sub_ix], ments[obj_ix]
            if self.pair_layout is not None:
                # per-pair suffix triplet: the row is the (possibly
                # truncated) unit plus the pair's own marker triplet, and
                # pair_pos gathers inside the suffix — never truncated,
                # so every pair classifies in either suffix layout
                from ..core.markers import pair_suffix

                toks, sub_slot, obj_slot, _mask_slot = pair_suffix(
                    sub[2], obj[2],
                    refine=(self.pair_layout == "suffix_refine"),
                )
                base = marked_ids[unit_ix]
                rows.append(base + self._suffix_ids(toks))
                pair_pos.append([len(base) + sub_slot, len(base) + obj_slot])
                keep.append(out_ix)
                continue
            ps = marker_pos[unit_ix][(sub[0], sub[1])]
            po = marker_pos[unit_ix][(obj[0], obj[1])]
            if ps >= len(marked_ids[unit_ix]) or po >= len(marked_ids[unit_ix]):
                continue  # marker truncated away -> NA
            rows.append(marked_ids[unit_ix])
            pair_pos.append([ps, po])
            keep.append(out_ix)
        if not rows:
            return results
        width = max(len(r) for r in rows)
        assert all(p < width for pp in pair_pos for p in pp)
        input_ids = np.full((len(rows), width), self.pad_id, dtype=np.int64)
        mask = np.zeros((len(rows), width), dtype=np.int64)
        for i, r in enumerate(rows):
            input_ids[i, : len(r)] = r
            mask[i, : len(r)] = 1
        (logits,) = self.session.run(
            None,
            {
                "input_ids": input_ids,
                "attention_mask": mask,
                "pair_pos": np.asarray(pair_pos, dtype=np.int64),
            },
        )
        for out_ix, lbl in zip(keep, logits.argmax(axis=-1).tolist()):
            results[out_ix] = lbl  # W5 argmax; 0 = NA
        return results

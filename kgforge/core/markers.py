"""Typed entity-marker injection (F7/F8) — the reference's relation-model
input construction (models/re_model.py:254-275, use_re_marker): every
entity in the sentence gets a TYPED start marker before its tokens and a
typed end marker after, position ids for the markers are DUPLICATED from
the entity's boundary tokens (so markers carry no positional novelty),
and the pair head later pools the marker positions.

This is pure sequence surgery — the machinery the r1 verdict listed as
'partial (surrogate replaces it)'.  It is now real and feeds the
code-complete ONNX relation-classifier seam
(kgforge/encode/rel_classifier.py); the surrogate path remains the live
default (no model checkpoint ships with the reference).
"""

from __future__ import annotations

from .vocab import ENT_TYPES, NUM_ENT_TYPES

Mention = tuple[int, int, int]  # (start, end, ent_type), half-open


def start_marker(ent_type: int) -> str:
    return f"<E:{ENT_TYPES[ent_type]}>"


def end_marker(ent_type: int) -> str:
    return f"</E:{ENT_TYPES[ent_type]}>"


def marker_id(ent_type: int, is_end: bool, base: int) -> int:
    """The reference's marker id arithmetic (re_model.py:260):
    start = ent_ids[type + 1], end = ent_ids[type + T + 1] — here relative
    to a caller-supplied ``base`` id of the marker block in the vocab."""
    return base + ent_type + (NUM_ENT_TYPES if is_end else 0)


def insert_typed_markers(
    tokens: list[str], mentions: list[Mention]
) -> tuple[list[str], list[int], dict[tuple[int, int], tuple[int, int]]]:
    """Return (marked_tokens, pos_ids, span_map).

    * marked_tokens — tokens with <E:type> ... </E:type> brackets around
      every mention (mentions must be sorted and non-overlapping — the
      decode_bio contract).
    * pos_ids — original token position per marked slot; marker slots
      DUPLICATE their entity's boundary position (re_model.py:261: start
      marker takes the first entity token's pos, end marker the last's).
    * span_map — (start, end) in original space -> (start, end) of the
      entity TOKENS in marked space (markers excluded), the start2idx /
      end2idx analog for downstream pooling.
    """
    prev_end = 0
    for s, e, _t in mentions:
        if s < prev_end:
            raise ValueError(f"overlapping mention at {s}")
        if not (0 <= s < e <= len(tokens)):
            raise ValueError(f"span ({s}, {e}) out of bounds")
        prev_end = e

    marked: list[str] = []
    pos_ids: list[int] = []
    span_map: dict[tuple[int, int], tuple[int, int]] = {}
    cursor = 0
    for s, e, t in mentions:
        marked.extend(tokens[cursor:s])
        pos_ids.extend(range(cursor, s))
        marked.append(start_marker(t))
        pos_ids.append(s)
        span_map[(s, e)] = (len(marked), len(marked) + (e - s))
        marked.extend(tokens[s:e])
        pos_ids.extend(range(s, e))
        marked.append(end_marker(t))
        pos_ids.append(e - 1)
        cursor = e
    marked.extend(tokens[cursor:])
    pos_ids.extend(range(cursor, len(tokens)))
    return marked, pos_ids, span_map


def strip_markers(marked: list[str]) -> list[str]:
    """Inverse of insertion (marker tokens removed)."""
    return [t for t in marked if not (t.startswith("<E:") or t.startswith("</E:"))]


# --- per-pair suffix triplet (reference re_model.py:364-366, 401-412) ------

MASK_TOKEN = "[MASK]"


def pair_suffix(
    sub_type: int, obj_type: int, refine: bool = False
) -> tuple[list[str], int, int, int]:
    """The reference's per-candidate-pair suffix triplet appended to the
    relation-stage sequence (re_model.py:401-412):

    * default (``use_rel_refine`` off): ``[MASK, <E:sub>, <E:obj>]``
    * refine  (``use_rel_refine`` on):  ``[<E:sub>, MASK, <E:obj>]``
      — the subject marker leads and the MASK sits between the pair.

    Returns ``(tokens, sub_slot, obj_slot, mask_slot)`` with slot indexes
    RELATIVE to the triplet, so a caller appending it at offset ``off``
    gathers at ``off + slot`` regardless of layout."""
    s, o = start_marker(sub_type), start_marker(obj_type)
    if refine:
        return [s, MASK_TOKEN, o], 0, 2, 1
    return [MASK_TOKEN, s, o], 1, 2, 0


def pair_suffix_pos_ids(
    sub_pos: int, obj_pos: int, mask_pos: int = 0, refine: bool = False
) -> list[int]:
    """Position ids for the suffix triplet, mirroring its token order
    (re_model.py:403-405 vs 409-411: the MASK slot carries ``mask_pos``,
    marker slots duplicate their entity's start position)."""
    if refine:
        return [sub_pos, mask_pos, obj_pos]
    return [mask_pos, sub_pos, obj_pos]

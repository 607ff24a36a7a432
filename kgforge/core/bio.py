"""BIO tag encoding/decoding with the reference's exact transition semantics.

Tag vocabulary (reference: /root/reference/data/utils.py:197-207):
    O = 0
    B-t = t + 1              for t in [0, num_types)
    I-t = t + 1 + num_types

Decode semantics (reference: /root/reference/models/ner_model.py:269-323,
``decode_entities``) — spans are half-open ``[start, end)``:
  * a tag in ``[1, num_types]`` opens a NEW entity of type ``tag - 1``
    (consecutive B tags each open their own single-token entity);
  * a tag ``> num_types`` (any I tag, its encoded type is IGNORED) extends
    the last entity IFF an entity is currently open;
  * a bare I with no open entity opens nothing; an O closes the run.

Pure-python/numpy; shared verbatim by the Spark pandas-UDF path and the
plain-python oracle so both decode identically.
"""

from __future__ import annotations

from collections.abc import Sequence


def encode_bio(
    n_tokens: int,
    mentions: Sequence[tuple[int, int, int]],
    num_types: int,
) -> list[int]:
    """Write B/I tag ids over half-open spans (data/utils.py:193-207 semantics).

    Later mentions overwrite earlier ones on overlap, matching the
    reference's in-place label-map writes.
    """
    tags = [0] * n_tokens
    for start, end, t in mentions:
        if start < 0 or end > n_tokens or start >= end:
            continue
        tags[start] = t + 1
        for i in range(start + 1, end):
            tags[i] = t + 1 + num_types
    return tags


def decode_bio(
    tags: Sequence[int],
    num_types: int,
    sent_start: int = 0,
    sent_end: int | None = None,
) -> list[tuple[int, int, int]]:
    """Decode tag ids into half-open ``(start, end, type)`` mentions.

    Exact port of the transition rules at
    /root/reference/models/ner_model.py:295-314 (see module docstring).
    """
    if sent_end is None:
        sent_end = len(tags)
    entities: list[list[int]] = []
    open_run = False
    for i in range(sent_start, sent_end):
        tag = tags[i]
        if 0 < tag <= num_types:
            open_run = True
            entities.append([i, i + 1, tag - 1])
        elif open_run and tag > num_types:
            entities[-1][1] = i + 1
        else:
            open_run = False
    return [(s, e, t) for s, e, t in entities]

"""Micro-P/R/F1 with the reference's exact set semantics.

Port of ``f1_score`` at /root/reference/utils/metrics.py:1-52: per-output
SET dedup of pred and gold tuples (the reference's own caveat at
metrics.py:11 — gold may contain duplicates and set() lowers scores — is
reproduced on purpose for parity), optional tuple ``slice``, global sums,
eps-guarded division.
"""

from __future__ import annotations

from collections.abc import Iterable, Sequence


def f1_score(
    outputs: Iterable[dict],
    pred_name: str,
    gold_name: str,
    slice: int | None = None,  # noqa: A002 — reference arg name
) -> tuple[float, float, float]:
    pred = gold = correct = 0
    for val_out in outputs:
        if slice is not None:
            pred_triples = {tuple(t[:slice]) for t in val_out[pred_name]}
            gold_triples = {tuple(t[:slice]) for t in val_out[gold_name]}
        else:
            pred_triples = {tuple(t) for t in val_out[pred_name]}
            gold_triples = {tuple(t) for t in val_out[gold_name]}
        pred += len(pred_triples)
        gold += len(gold_triples)
        correct += len(pred_triples & gold_triples)
    precision = correct / (pred + 1e-8)
    recall = correct / (gold + 1e-8)
    f1 = 2 * precision * recall / (precision + recall + 1e-8)
    return f1, precision, recall


def prf_counts(
    pred_rows: Sequence[tuple], gold_rows: Sequence[tuple]
) -> tuple[int, int, int]:
    """Global (pred, gold, correct) set counts — the DataFrame-side analog
    (semi-join J7 + agg A1)."""
    p, g = set(map(tuple, pred_rows)), set(map(tuple, gold_rows))
    return len(p), len(g), len(p & g)

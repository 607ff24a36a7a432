"""Registry rotation audit (r4 VERDICT #7): the docs/COVERAGE.md policy
says any registered query whose implementation changed in the current
round must hold a DRIVER slot in that round's snapshot — this test
enforces it mechanically instead of by checklist.

Mechanism: the round base is the most recent commit whose message starts
with "round N:" (the driver's end-of-round record commit).  The diff of
kgforge/queries.py from that base to the working tree is mapped onto
registered-query function spans; every changed registered query must be
in QUERIES (driver), not EXTRA_QUERIES.
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


def _changed_lines(base: str) -> set[int]:
    """New-file line numbers changed since base in kgforge/queries.py."""
    out = subprocess.run(
        ["git", "diff", "-U0", base, "--", "kgforge/queries.py"],
        cwd=REPO, capture_output=True, text=True, check=True,
    )
    lines: set[int] = set()
    for m in re.finditer(r"^@@ -\d+(?:,\d+)? \+(\d+)(?:,(\d+))? @@",
                         out.stdout, re.M):
        start = int(m.group(1))
        count = int(m.group(2)) if m.group(2) is not None else 1
        lines.update(range(start, start + max(count, 1)))
    return lines


def _query_spans() -> dict[str, tuple[int, int]]:
    """name -> (first_line, last_line) spanning the @register decorator
    through the end of the query function body."""
    src = (REPO / "kgforge" / "queries.py").read_text().splitlines()
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
    changed = _changed_lines(base)
    if not changed:
        pytest.skip("queries.py unchanged this round")

    from kgforge.queries import EXTRA_QUERIES, QUERIES

    # the rotation rule covers PRE-EXISTING queries whose implementation
    # changed; queries born this round may land in EXTRA when their
    # operator family already holds a driver slot (COVERAGE.md r4
    # precedent), so restrict to names registered at the round base
    base_src = subprocess.run(
        ["git", "show", f"{base}:kgforge/queries.py"],
        cwd=REPO, capture_output=True, text=True, check=True,
    ).stdout
    existed = set(re.findall(r'@register\(\s*\n?\s*"([^"]+)"', base_src))

    spans = _query_spans()
    changed_queries = {
        name
        for name, (lo, hi) in spans.items()
        if name in existed and any(lo <= ln <= hi for ln in changed)
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

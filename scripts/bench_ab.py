"""Paired A/B benchmark: a BASE commit (default: the previous round's
final code) vs the working tree, run ALTERNATED in one wall-clock
session (r2 VERDICT #5: single-shot suite numbers cannot prove
round-over-round deltas on this time-shared host — its wall swings
17-60s across identical runs, dwarfing real changes).

Methodology (same reasoning as scripts/bench_scaling.py):
  * The base code is checked out into a git worktree (.ab_worktree/base,
    gitignored); each side runs `python bench.py --skip-repos` in its own
    subprocess/JVM so both sides execute EXACTLY their own code.
  * Legs alternate A,B,A,B,... so slow host phases hit both sides
    equally; per-query best-of-N (min) is the noise-robust estimator.
  * One Spark JVM alive at a time (sequential legs) — concurrent JVMs
    time-share cores and poison every number.

Writes BENCH/ab_<tag>.json (+ a BENCH/ab_latest.json copy that
bench.py attaches to its one-line JSON as `paired_vs_base`) and
BENCH/AB_<tag>.md (the table).

Usage: python scripts/bench_ab.py [passes] [base_commit] [tag]
"""

from __future__ import annotations

import json
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
BASE_COMMIT = "d9dc731"  # r3 final
WORKTREE = REPO / ".ab_worktree" / "base"


def ensure_worktree(commit: str) -> Path:
    if not (WORKTREE / "bench.py").exists():
        WORKTREE.parent.mkdir(exist_ok=True)
        subprocess.run(
            ["git", "worktree", "add", "--detach", str(WORKTREE), commit],
            cwd=REPO, check=True,
        )
    return WORKTREE


def run_leg(cwd: Path, sf_dir: str, cores: str) -> dict:
    out = subprocess.run(
        [sys.executable, "bench.py", "--skip-repos",
         "--sf-dir", sf_dir, "--cores", cores],
        cwd=cwd, check=True, capture_output=True, text=True,
    )
    line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    passes = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    commit = sys.argv[2] if len(sys.argv) > 2 else BASE_COMMIT
    tag = sys.argv[3] if len(sys.argv) > 3 else "r3_r4"
    sf_dir = "/root/testdata/sf0.1"
    cores = "32"
    wt = ensure_worktree(commit)
    head = subprocess.run(
        ["git", "rev-parse", "--short", "HEAD"], cwd=REPO,
        capture_output=True, text=True, check=True,
    ).stdout.strip()

    legs: dict[str, list[dict]] = {"base": [], "head": []}
    for p in range(passes):
        for side, cwd in (("base", wt), ("head", REPO)):
            t0 = time.time()
            res = run_leg(cwd, sf_dir, cores)
            legs[side].append(res)
            print(
                f"pass {p + 1}/{passes} {side}: suite={res['value']}s "
                f"(leg wall {time.time() - t0:.0f}s)", file=sys.stderr,
            )

    def best(side: str) -> dict[str, float]:
        names = legs[side][0]["queries"].keys()
        return {
            n: min(leg["queries"][n] for leg in legs[side] if n in leg["queries"])
            for n in names
        }

    b2, bh = best("base"), best("head")
    common = [n for n in b2 if n in bh]
    summary = {
        "method": f"interleaved best-of-{passes}, alternating subprocess legs,"
                  " one JVM at a time, sf0.1 local[32], --skip-repos",
        "base_commit": commit,
        "head_commit": head,
        "suite_best_base": round(min(l["value"] for l in legs["base"]), 3),
        "suite_best_head": round(min(l["value"] for l in legs["head"]), 3),
        "queries": {
            n: {
                "base": b2[n], "head": bh[n],
                "ratio": round(bh[n] / b2[n], 3) if b2[n] else None,
            }
            for n in common
        },
    }
    # suite_ratio is computed over the COMMON query set only: each leg
    # runs its own commit's HEADLINE list, so whenever the head adds
    # queries the whole-leg walls compare different workloads — the
    # r6c head runs 16 queries the r5 base doesn't, and the raw wall
    # ratio (2.19) would read as a regression that isn't one.  The
    # whole-leg walls stay recorded above for context.
    summary["suite_ratio"] = round(
        sum(bh[n] for n in common) / sum(b2[n] for n in common), 3
    )
    summary["suite_ratio_note"] = (
        f"sum of per-query bests over the {len(common)} common queries; "
        "suite_best_* are whole-leg walls over each side's own "
        "(differently sized) headline list"
    )
    (REPO / "BENCH").mkdir(exist_ok=True)
    (REPO / "BENCH" / f"ab_{tag}.json").write_text(json.dumps(summary, indent=2))
    (REPO / "BENCH" / "ab_latest.json").write_text(json.dumps(summary, indent=2))

    lines = [
        f"# Paired benchmark {tag} (same-session, interleaved)",
        "",
        f"- method: {summary['method']}",
        f"- base = `{commit}`, head = `{head}`",
        f"- headline suite best-of-{passes}: base {summary['suite_best_base']}s, "
        f"head {summary['suite_best_head']}s, ratio "
        f"**{summary['suite_ratio']}** (head/base; <1 = faster)",
        "",
        "| query | base best (s) | head best (s) | ratio |",
        "|---|---|---|---|",
    ]
    for n in common:
        q = summary["queries"][n]
        lines.append(f"| {n} | {q['base']} | {q['head']} | {q['ratio']} |")
    (REPO / "BENCH" / f"AB_{tag}.md").write_text("\n".join(lines) + "\n")
    # leave no checkout behind: the worktree doubles the repo's on-disk
    # source tree (and any filesystem LoC count) if it lingers
    subprocess.run(
        ["git", "worktree", "remove", "--force", str(WORKTREE)],
        cwd=REPO, check=False,
    )
    print(json.dumps(summary))


if __name__ == "__main__":
    main()

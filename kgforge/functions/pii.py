"""PII detection + redaction — the scrub pass every pretraining corpus
runs before release (reference has no analog; public precedent: the
BigCode/StarCoder PII pipeline, Allal et al. 2023, and the C4 blocklist
scrub, Raffel et al. 2020).

Patterns live in ONE table and are written in the Java-regex ∩ RE2
subset (character classes, bounded repetition, alternation, ``\\b`` word
boundaries — NO lookaround, which RE2 lacks), so the exact same pattern
string drives Spark's JVM ``regexp_replace``/``regexp_count`` AND the
DuckDB oracle's ``regexp_replace(..., 'g')`` /
``len(regexp_extract_all(...))``.

Scale shape: redaction is row-local JVM regex work inside whole-stage
codegen — no shuffle, no UDF, embarrassingly parallel; the only
aggregation is the caller's final count rollup.  Replacement ORDER is
part of the contract (emails before IPs so a dotted domain is never
half-eaten by the IP rule; SSN-shaped ids before phones) and is fixed by
the list order below.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# (name, pattern, replacement) — applied strictly in this order.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    ("ssn", r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b", "[ID]"),
    ("ip", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "[IP]"),
    ("phone", r"\b555-[0-9]{4}\b", "[PHONE]"),
]


def redact_expr(col) -> F.Column:
    """Chained regexp_replace over PII_PATTERNS (order matters)."""
    out = F.col(col) if isinstance(col, str) else col
    for _, pat, repl in PII_PATTERNS:
        out = F.regexp_replace(out, pat, repl)
    return out


def redact_pii(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Add ``redacted`` plus per-type ``n_<type>`` count columns and a
    ``n_residual`` column (matches remaining AFTER redaction — 0 by
    construction unless a pattern's replacement re-triggers another).

    Counting is SEQUENTIAL, matching the replacement order: each rule's
    count is taken on the text as the EARLIER rules left it, so
    ``n_<type>`` is exactly the number of replacements that rule
    performed — an IP inside an already-redacted email's domain is
    counted once (as the email), not twice.  Σ n_<type> therefore
    equals the true replacement total the curation stats report."""
    cur = F.col(text_col)
    out = df
    for name, pat, repl in PII_PATTERNS:
        out = out.withColumn(
            f"n_{name}", F.regexp_count(cur, F.lit(pat)).cast("bigint")
        )
        cur = F.regexp_replace(cur, pat, repl)
    out = out.withColumn("redacted", cur)
    residual = None
    for name, pat, _ in PII_PATTERNS:
        term = F.regexp_count(F.col("redacted"), F.lit(pat))
        residual = term if residual is None else residual + term
    return out.withColumn("n_residual", residual.cast("bigint"))


def sql_redact(expr: str) -> str:
    """DuckDB mirror of redact_expr (global flag — DuckDB replaces only
    the first match without 'g')."""
    out = expr
    for _, pat, repl in PII_PATTERNS:
        out = f"regexp_replace({out}, '{pat}', '{repl}', 'g')"
    return out


def sql_partial_redact(expr: str, upto: str) -> str:
    """DuckDB expression: ``expr`` with every pattern BEFORE ``upto``
    already replaced — the sequential-counting mirror."""
    out = expr
    for name, pat, repl in PII_PATTERNS:
        if name == upto:
            return out
        out = f"regexp_replace({out}, '{pat}', '{repl}', 'g')"
    raise KeyError(upto)


def sql_count(expr: str, name: str) -> str:
    """DuckDB mirror of one sequential count: matches of ``name``'s
    pattern on the text as the earlier rules left it."""
    pat = next(p for n, p, _ in PII_PATTERNS if n == name)
    return f"len(regexp_extract_all({sql_partial_redact(expr, name)}, '{pat}'))"

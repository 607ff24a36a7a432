"""Stage 1 — extract natural-language units from source-file content.

The reference's analog is the ACE preprocessing pipeline (S10,
datasets/ace2005/*) + doc->sentence flatten (P1, data/utils.py:53-56): raw
documents become sentence units, the granularity every later stage works
at.  Here a "document" is one repo file's ``content`` (BASELINE.json
input_hint) and a "unit" is one sentence from its docstrings/comments.

Pure-python core (``extract_units_text``) + an Arrow-batched ``mapInPandas``
wrapper.  Exploding to unit granularity BEFORE the encoder UDF bounds Arrow
batch width by sentence length, not file length (SURVEY.md §7.4).
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    StringType,
    StructField,
    StructType,
)

_PY_DOCSTRING = re.compile(r'"""(.*?)"""|\'\'\'(.*?)\'\'\'', re.S)
_PY_COMMENT = re.compile(r"(?m)^\s*#\s?(.*)$")
_JAVA_BLOCK = re.compile(r"/\*+(.*?)\*/", re.S)
_JAVA_LINE = re.compile(r"(?m)^\s*//\s?(.*)$")
_SENT_SPLIT = re.compile(r"(?<=\.)\s+")


def _sentences(text: str) -> list[str]:
    out = []
    for chunk in text.replace("\n", " ").split("  "):
        for sent in _SENT_SPLIT.split(chunk):
            sent = " ".join(sent.split())
            if sent:
                out.append(sent)
    return out


def extract_units_text(content: str, lang: str) -> list[tuple[int, str, str]]:
    """Return ``[(unit_id, kind, text)]`` — deterministic order.

    kind in {docstring, comment, prose}.
    """
    blocks: list[tuple[str, str]] = []
    if lang == "python":
        for m in _PY_DOCSTRING.finditer(content):
            blocks.append(("docstring", m.group(1) or m.group(2) or ""))
        for m in _PY_COMMENT.finditer(content):
            blocks.append(("comment", m.group(1)))
    elif lang == "java":
        for m in _JAVA_BLOCK.finditer(content):
            blocks.append(("docstring", m.group(1).replace("*", " ")))
        for m in _JAVA_LINE.finditer(content):
            blocks.append(("comment", m.group(1)))
    else:  # markdown / plain prose
        for para in content.split("\n\n"):
            para = para.strip()
            if para and not para.startswith("#"):
                blocks.append(("prose", para))
            elif para.startswith("#"):
                blocks.append(("prose", para.lstrip("# ")))
    units: list[tuple[int, str, str]] = []
    uid = 0
    for kind, block in blocks:
        for sent in _sentences(block):
            units.append((uid, kind, sent))
            uid += 1
    return units


UNITS_SCHEMA = StructType(
    [
        StructField("repo", StringType()),
        StructField("path", StringType()),
        StructField("commit", StringType()),
        StructField("lang", StringType()),
        StructField("content_sha", StringType()),
        StructField("unit_id", IntegerType()),
        StructField("kind", StringType()),
        StructField("text", StringType()),
    ]
)


def extract_units(repos: DataFrame) -> DataFrame:
    """repos(repo, path, commit, lang, content) -> one row per unit.

    ``content_sha`` (sha2-256 of content, computed JVM-side BEFORE the UDF)
    is the per-row provenance invariant carried through every later stage
    (BASELINE.json input_hint; F14).
    """
    with_sha = repos.withColumn("content_sha", F.sha2(F.col("content"), 256))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                for uid, kind, text in extract_units_text(r.content or "", r.lang or ""):
                    rows.append(
                        (r.repo, r.path, r.commit, r.lang, r.content_sha, uid, kind, text)
                    )
            yield pd.DataFrame(
                rows, columns=[f.name for f in UNITS_SCHEMA.fields]
            )

    return with_sha.mapInPandas(gen, UNITS_SCHEMA)

"""Deterministic text normalization — the byte-identical contract.

Reproduces the reference normalization chain exactly:
lowercase → non-alphanumeric→space → squeeze runs of spaces → trim
(pandas: pipeline/data_loading.py:22-36; Spark twin:
distributed_er_pipeline.py:51-63).  Implemented as pure Catalyst
expressions (whole-stage codegen, no Python), with a matching ANSI-SQL
rendering used by the DuckDB oracles so both engines compute identical
bytes per row.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def normalize_text(col: Column | str) -> Column:
    """lower → [^a-z0-9]→' ' → ' +'→' ' → trim.

    Byte-identical to the reference chain (data_loading.py:23-36).
    """
    c = F.col(col) if isinstance(col, str) else col
    c = F.lower(c)
    c = F.regexp_replace(c, "[^a-z0-9]", " ")
    c = F.regexp_replace(c, " +", " ")
    return F.trim(c)


def normalize_text_sql(expr: str) -> str:
    """ANSI-SQL rendering of :func:`normalize_text` (DuckDB oracle twin)."""
    return (
        "trim(regexp_replace(regexp_replace(lower(" + expr + "), "
        "'[^a-z0-9]', ' ', 'g'), ' +', ' ', 'g'))"
    )


def squeeze_lower(col: Column | str) -> Column:
    """Venue-style light normalization: lower + squeeze + trim only
    (data_loading.py:31-34 applies this to `venue`, keeping punctuation)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.regexp_replace(F.lower(c), " +", " "))


def combined(title: Column | str, authors: Column | str, year: Column | str | None = None) -> Column:
    """`Combined` attribute: cleaned title + authors (+ year in the pandas
    path, data_loading.py:38-39).  `concat_ws` skips nulls, matching the
    reference's fillna("") + f-string."""
    cols = [F.col(c) if isinstance(c, str) else c for c in (title, authors)]
    if year is not None:
        y = F.col(year) if isinstance(year, str) else year
        cols.append(y.cast("string"))
    return F.concat_ws(" ", *cols)

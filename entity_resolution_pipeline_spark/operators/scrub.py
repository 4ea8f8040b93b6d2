"""PII detection and redaction for training corpora.

Web-scale training pipelines scrub personally identifiable information
before a corpus ships (C4 and The Pile both document regex-family
scrubbing passes); the reference has no analog (its corpus is
publication metadata), so this is part of the LLM-data-pipeline
surface the engine adds.

Spark-first shape: pure per-row ``regexp_count`` / ``regexp_replace``
column expressions — JVM-side, whole-stage-codegen'd, ZERO shuffle,
embarrassingly parallel at any scale.  Pattern dialect is restricted
to the RE2 ∩ java.util.regex common subset (character classes, bounded
repetition, alternation — no backreferences, no lookaround) so the
same pattern text runs identically in Spark and in the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: (kind, pattern, replacement) applied IN ORDER — order matters and is
#: part of the contract: emails first (their local part may contain
#: digits a later pattern could nibble), then IPv4 (dotted digits would
#: otherwise feed the phone pattern), then phones.
PII_RULES: tuple[tuple[str, str, str], ...] = (
    (
        "email",
        r"[A-Za-z0-9._%+-]+@[A-Za-z0-9-]+(\.[A-Za-z0-9-]+)+",
        "<EMAIL>",
    ),
    (
        "ipv4",
        r"\b(\d{1,3}\.){3}\d{1,3}\b",
        "<IP>",
    ),
    (
        # international-ish: +CC then 2-4 digit groups, space/dash
        # separated; deliberately conservative (a bare 10-digit run is
        # NOT matched — too many false positives on ids/timestamps)
        "phone",
        r"\+\d{1,3}([ -]?\d{2,4}){2,4}",
        "<PHONE>",
    ),
)


def _count(col: Column, pattern: str) -> Column:
    # group 0 explicitly: Spark's regexp_extract_all defaults to group 1
    return F.size(F.regexp_extract_all(col, F.lit(pattern), F.lit(0)))


def pii_scrub(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """→ (id, n_email, n_ipv4, n_phone, n_pii, scrubbed): per-document
    PII hit counts (on the ORIGINAL text) plus the redacted text with
    each hit replaced by its ``<KIND>`` sentinel, rules applied in
    :data:`PII_RULES` order on the successively-scrubbed string.

    Counts are auditable corpus-wide with one partial-aggregated
    groupBy over the output; the scrub itself never shuffles.
    """
    text = F.col(text_col)
    counts = [
        _count(text, pat).cast("long").alias(f"n_{kind}")
        for kind, pat, _ in PII_RULES
    ]
    scrubbed = text
    for _, pat, repl in PII_RULES:
        scrubbed = F.regexp_replace(scrubbed, pat, repl)
    out = df.select(F.col(id_col), *counts, scrubbed.alias("scrubbed"))
    total = None
    for kind, _, _ in PII_RULES:
        c = F.col(f"n_{kind}")
        total = c if total is None else total + c
    return out.withColumn("n_pii", total.cast("long"))

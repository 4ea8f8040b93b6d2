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
#: digits/hex a later pattern could nibble), then IPv6 before IPv4 (an
#: IPv4-mapped tail must not be nibbled out of a longer IPv6 run), then
#: IBAN/SSN (letter- and dash-anchored digit shapes), then phones.
#:
#: Documented precision (all patterns stay in the RE2 ∩ java.util.regex
#: subset — no lookaround, no backreferences):
#: - ipv6 matches colon-separated hex runs of ≥4 groups; it does NOT
#:   match ``::``-compressed forms, and it DOES match 6-group MAC
#:   addresses (also scrub-worthy; accepted over lookaround).
#: - iban is the shape check only (CC + 2 check digits + 11-30
#:   alphanumerics); no mod-97 validation, so random uppercase
#:   alnum runs of that shape are (rare) false positives.
#: - ssn matches any XXX-XX-XXXX digit shape; invalid SSN ranges
#:   (000/666/9xx areas) are NOT excluded — that needs lookahead.
PII_RULES: tuple[tuple[str, str, str], ...] = (
    (
        "email",
        r"[A-Za-z0-9._%+-]+@[A-Za-z0-9-]+(\.[A-Za-z0-9-]+)+",
        "<EMAIL>",
    ),
    (
        "ipv6",
        r"\b([0-9A-Fa-f]{1,4}:){3,7}[0-9A-Fa-f]{1,4}\b",
        "<IP6>",
    ),
    (
        "ipv4",
        r"\b(\d{1,3}\.){3}\d{1,3}\b",
        "<IP>",
    ),
    (
        "iban",
        r"\b[A-Z]{2}\d{2}[A-Z0-9]{11,30}\b",
        "<IBAN>",
    ),
    (
        "ssn",
        r"\b\d{3}-\d{2}-\d{4}\b",
        "<SSN>",
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
    """→ (id, n_<kind>..., n_pii, scrubbed): per-document PII hit
    counts plus the redacted text with each hit replaced by its
    ``<KIND>`` sentinel, rules applied in :data:`PII_RULES` order on
    the successively-scrubbed string.

    Each kind is counted on the SAME successively-scrubbed string its
    replacement runs on, so ``n_<kind>`` equals the number of
    ``<KIND>`` sentinels actually emitted and ``n_pii`` equals the
    total redaction count — a phone-shaped run inside an email local
    part is counted zero times, not once (ADVICE r4).  The extra
    regex passes this costs (count k sees k prior replaces inlined)
    are a small constant factor on an embarrassingly parallel,
    codegen'd, zero-shuffle projection.
    """
    cur = F.col(text_col)
    counts = []
    for kind, pat, repl in PII_RULES:
        counts.append(_count(cur, pat).cast("long").alias(f"n_{kind}"))
        cur = F.regexp_replace(cur, pat, repl)
    out = df.select(F.col(id_col), *counts, cur.alias("scrubbed"))
    total = None
    for kind, _, _ in PII_RULES:
        c = F.col(f"n_{kind}")
        total = c if total is None else total + c
    return out.withColumn("n_pii", total.cast("long"))

"""Stage 3 — pairwise matching (similarity scoring).

Reference lifecycle (pipeline/matching.py:33-67): positional double-join
pairs→records, ``np.vectorize`` similarity per attribute, year-equality
feature, weighted linear score, threshold filter.

Spark restatement: two hash equi-joins (the reference's own Spark path,
distributed_er_pipeline.py:105-106), then similarity as pure Catalyst
expressions (Levenshtein/Jaccard/trigram — whole-stage codegen) or an
Arrow-batched pandas UDF (Jaro-Winkler).  The weighted sum and the
θ-filter are column arithmetic (M8/M9).  Zero per-row Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import MatchingConfig
from ..functions.similarity import SIM_FUNCTIONS


def join_pair_records(
    pairs: DataFrame,
    records: DataFrame,
    id_col: str = "url",
    attrs: tuple[str, ...] = ("title_norm", "authors_norm", "lang"),
) -> DataFrame:
    """pairs(id1,id2) ⋈ records ⋈ records → wide pair rows
    ``(id1, id2, <attr>_1, <attr>_2, ...)`` (M2)."""
    r1 = records.select(
        F.col(id_col).alias("id1"), *[F.col(a).alias(f"{a}_1") for a in attrs]
    )
    r2 = records.select(
        F.col(id_col).alias("id2"), *[F.col(a).alias(f"{a}_2") for a in attrs]
    )
    return pairs.join(r1, "id1").join(r2, "id2")


def score_pairs(
    pairs: DataFrame,
    records: DataFrame,
    cfg: MatchingConfig | None = None,
    id_col: str = "url",
) -> DataFrame:
    """→ ``(id1, id2, title_sim, authors_sim, meta_eq, similarity)``.

    similarity = w0·title_sim + w1·authors_sim + w2·meta_eq
    (pipeline/matching.py:65).  ``meta_eq`` is the reference's
    year-equality feature (matching.py:63) transposed to our schema:
    language equality of the two pages.
    """
    cfg = cfg or MatchingConfig()
    sim = SIM_FUNCTIONS[cfg.method]
    authors_sim = SIM_FUNCTIONS[cfg.authors_method]
    wide = join_pair_records(pairs, records, id_col)
    w0, w1, w2 = cfg.weights
    scored = wide.select(
        "id1",
        "id2",
        sim(F.col("title_norm_1"), F.col("title_norm_2")).alias("title_sim"),
        authors_sim(F.col("authors_norm_1"), F.col("authors_norm_2")).alias("authors_sim"),
        (F.col("lang_1") == F.col("lang_2")).cast("int").alias("meta_eq"),
    )
    return scored.withColumn(
        "similarity",
        F.lit(w0) * F.col("title_sim")
        + F.lit(w1) * F.col("authors_sim")
        + F.lit(w2) * F.col("meta_eq"),
    )


def edit_distance_join(
    df: DataFrame,
    k: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    prefix_len: int = 40,
) -> DataFrame:
    """Edit-distance-bounded self-join: → (id1, id2, lev ≤ k) over the
    first ``prefix_len`` chars of normalized text.

    A *range* join (|len1 − len2| ≤ k) that Spark lacks natively,
    expressed as the classic bucketize-and-equi-join: the left side
    explodes its admissible partner lengths ``len−k … len+k`` and joins
    on an exact length — each qualifying pair meets exactly once, so no
    dedup pass is needed.  The length filter is the standard lossless
    prerequisite of edit distance (|len1−len2| ≤ lev), then the builtin
    ``levenshtein`` (with its max-distance short-circuit) verifies.
    """
    from ..functions.normalize import normalize_text

    s = df.select(
        F.col(id_col).alias("id"),
        F.substring(normalize_text(F.col(text_col)), 1, prefix_len).alias("t"),
    ).withColumn("len", F.length("t"))
    a = s.select(
        F.col("id").alias("id1"),
        F.col("t").alias("t1"),
        F.explode(
            F.sequence(
                F.greatest(F.col("len") - k, F.lit(0)), F.col("len") + k
            )
        ).alias("match_len"),
    )
    b = s.select(
        F.col("id").alias("id2"), F.col("t").alias("t2"), F.col("len").alias("match_len")
    )
    return (
        a.join(b, "match_len")
        .where(F.col("id1") < F.col("id2"))
        .select(
            "id1", "id2", F.levenshtein("t1", "t2").cast("long").alias("lev")
        )
        .where(F.col("lev") <= k)
    )


def matched_pairs(scored: DataFrame, cfg: MatchingConfig | None = None) -> DataFrame:
    """θ-filter (run_pipeline.py:30; distributed_er_pipeline.py:119)."""
    cfg = cfg or MatchingConfig()
    return scored.where(F.col("similarity") > cfg.threshold).select(
        "id1", "id2", "similarity"
    )

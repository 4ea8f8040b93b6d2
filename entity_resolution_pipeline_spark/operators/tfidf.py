"""M6 — TF-IDF cosine matching (reference: sklearn TfidfVectorizer fit
on the union corpus + dense cosine matrix, pipeline/data_loading.py:49-54
and pipeline/matching.py:70-81).

The reference materializes an O(n_docs × vocab) dense matrix on the
driver — impossible at scale.  Spark-native restatement: **sparse**
TF-IDF as plain DataFrames (no pyspark.ml, no driver data):

    term_weights(id, term, w)  — explode → count → idf join → weight
    norms(id, nrm)             — per-doc L2 norm
    cosine(pair)               — pairs ⋈ w1 ⋈ w2 on term → Σ w1·w2 / (n1·n2)

Formulas follow sklearn defaults so scores are comparable to the
reference: tf = raw count, idf = ln((1+N)/(1+df)) + 1, L2
normalization.  Every step is an equi-join / hash aggregate —
oracle-expressible in ANSI SQL and shuffle-keyed on term or pair id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.normalize import normalize_text
from ..functions.text import tokens


def term_counts(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """→ (id, term, tf): raw term frequency of normalized text."""
    return (
        df.select(
            F.col(id_col).alias("id"),
            F.explode(tokens(normalize_text(F.col(text_col)))).alias("term"),
        )
        .groupBy("id", "term")
        .agg(F.count("*").alias("tf"))
    )


def tfidf_weights(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """→ (id, term, w): sklearn-style smoothed-idf TF-IDF weights.

    idf = ln((1+N)/(1+df)) + 1 (TfidfVectorizer smooth_idf default).
    The doc-frequency table is aggregated from the term counts (one
    extra shuffle on term); N is a scalar broadcast via cross join of a
    1-row aggregate — no driver round trip in the lazy plan.
    """
    tc = term_counts(df, id_col, text_col)
    n_docs = df.select(F.count("*").alias("n_docs"))
    docfreq = tc.groupBy("term").agg(F.count("*").alias("df"))
    return (
        tc.join(docfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "id",
            "term",
            (
                F.col("tf")
                * (
                    F.log((1.0 + F.col("n_docs")) / (1.0 + F.col("df")))
                    + F.lit(1.0)
                )
            ).alias("w"),
        )
    )


def doc_norms(weights: DataFrame) -> DataFrame:
    """→ (id, nrm): L2 norm per document."""
    return weights.groupBy("id").agg(F.sqrt(F.sum(F.col("w") * F.col("w"))).alias("nrm"))


def tfidf_cosine_pairs(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """pairs(id1, id2) → (id1, id2, cosine): sparse TF-IDF cosine.

    Plan: pairs ⋈ weights(id1) on id1, ⋈ weights(id2) on (id2, term) —
    only shared terms survive the second join — then Σ w1·w2 per pair
    over the pair key, normalized.  Pairs with no shared term score 0
    (left join + coalesce), matching the dense-matrix semantics.
    """
    w = tfidf_weights(df, id_col, text_col)
    norms = doc_norms(w)
    w1 = w.select(F.col("id").alias("id1"), "term", F.col("w").alias("w1"))
    w2 = w.select(F.col("id").alias("id2"), "term", F.col("w").alias("w2"))
    dots = (
        pairs.join(w1, "id1")
        .join(w2, ["id2", "term"])
        .groupBy("id1", "id2")
        .agg(F.sum(F.col("w1") * F.col("w2")).alias("dot"))
    )
    return (
        pairs.join(dots, ["id1", "id2"], "left")
        .join(norms.select(F.col("id").alias("id1"), F.col("nrm").alias("n1")), "id1")
        .join(norms.select(F.col("id").alias("id2"), F.col("nrm").alias("n2")), "id2")
        .select(
            "id1",
            "id2",
            F.when(
                (F.col("n1") > 0) & (F.col("n2") > 0),
                F.coalesce(F.col("dot"), F.lit(0.0)) / (F.col("n1") * F.col("n2")),
            )
            .otherwise(F.lit(0.0))
            .alias("cosine"),
        )
    )

"""Stage 5 — pairwise evaluation (P/R/F1).

Exactly the reference protocol (evaluate_pipeline.py:24-32): TP = inner
join of predicted and gold pair sets on the canonical pair key; FP =
|pred| − TP; FN = |gold| − TP; zero-guarded precision/recall/F1.
Distributed: three counts, one join — no driver data.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class PairMetrics:
    tp: int
    fp: int
    fn: int
    precision: float
    recall: float
    f1: float


def _canonical(pairs: DataFrame) -> DataFrame:
    return pairs.select(
        F.least("id1", "id2").alias("id1"), F.greatest("id1", "id2").alias("id2")
    ).dropDuplicates(["id1", "id2"])


def pairwise_f1(predicted: DataFrame, gold: DataFrame) -> PairMetrics:
    """predicted(id1,id2), gold(id1,id2) → P/R/F1
    (evaluate_pipeline.py:24-32 semantics)."""
    p = _canonical(predicted)
    g = _canonical(gold)
    n_pred = p.count()
    n_gold = g.count()
    tp = p.join(g, ["id1", "id2"]).count()
    fp = n_pred - tp
    fn = n_gold - tp
    precision = tp / n_pred if n_pred else 0.0
    recall = tp / n_gold if n_gold else 0.0
    f1 = (
        2 * precision * recall / (precision + recall)
        if (precision + recall) > 0
        else 0.0
    )
    return PairMetrics(tp=tp, fp=fp, fn=fn, precision=precision, recall=recall, f1=f1)


def inspect_pairs(
    pairs: DataFrame,
    records: DataFrame,
    id_col: str = "url",
    text_col: str = "combined",
    limit: int = 20,
) -> DataFrame:
    """E4 — golden-pair inspection (utils.py:34-51): map matched id pairs
    back to human-readable record text for eyeballing.  Distributed
    joins; `limit` bounds what reaches the driver."""
    r1 = records.select(F.col(id_col).alias("id1"), F.col(text_col).alias("text1"))
    r2 = records.select(F.col(id_col).alias("id2"), F.col(text_col).alias("text2"))
    return pairs.join(r1, "id1").join(r2, "id2").limit(limit)


def threshold_sweep(
    scored: DataFrame, gold: DataFrame, thresholds=(0.5, 0.6, 0.7, 0.8, 0.9, 0.95)
) -> list[tuple[float, PairMetrics]]:
    """Reference threshold grid (evaluate_pipeline.py:14-21,60) over a
    cached scored-pairs DataFrame."""
    scored = scored.cache()
    try:
        return [
            (t, pairwise_f1(scored.where(F.col("similarity") > t), gold))
            for t in thresholds
        ]
    finally:
        scored.unpersist()

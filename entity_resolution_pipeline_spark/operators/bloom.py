"""Broadcast Bloom-filter prefilter for digest joins.

Spark's internal ``BloomFilterAggregate`` is not SQL-registered in
PySpark 4.1, so this builds the same structure with plain DataFrame
ops: a sparse bitmap (64-bit words keyed by word index) aggregated
with ``bit_or``, carried to the probe side as a SINGLE-ROW broadcast
map — the same carrier pattern as the IVF centroid broadcast
(`similarity_search.py`).  At 100 TB the point is shuffle avoidance:
a benchmark digest set of D entries costs ~32·D bytes to broadcast
raw, but the bitmap costs ``n_bits/8`` bytes total (~10 bits/entry at
1% FP), and the corpus-side probe is a pure codegen'd map lookup —
no shuffle, no join — that discards ~99% of corpus shingles map-side
before the exact verification join ships anything.

The filter is one-sided (false positives only), so callers that
follow it with the exact equi-join get EXACTLY the unfiltered
result; `flag_contamination(bloom_bits=...)` is equality-tested
against the exact path and shares its DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _probe_positions(col: Column, n_bits: int, k: int) -> list[Column]:
    """k independent bit positions per value: xxhash64 with the probe
    index as a second hashed column (seed-free, deterministic)."""
    return [
        F.pmod(F.xxhash64(col, F.lit(i)), F.lit(n_bits)) for i in range(k)
    ]


def bloom_bitmap(
    df: DataFrame, col: str, n_bits: int = 1 << 20, k: int = 4
) -> DataFrame:
    """One-row DataFrame ``(bm: map<long,long>)``: sparse Bloom bitmap
    over ``df[col]`` — word index → 64-bit word, zero words absent.

    Build plan: explode k positions per value → partial-aggregated
    ``groupBy(word).agg(bit_or(mask))`` (≤ ``n_bits/64`` groups however
    large the input), then one ``map_from_entries`` gather.  Size the
    bitmap so ``n_bits/8`` bytes is broadcastable; at the classic
    ~10 bits/entry that is 64× smaller than broadcasting 16-byte
    digests with join overhead.
    """
    pos = F.explode(F.array(*_probe_positions(F.col(col), n_bits, k)))
    words = (
        df.select(pos.alias("p"))
        .select(
            (F.col("p") / 64).cast("long").alias("w"),
            F.expr("shiftleft(1L, cast(p % 64 as int))").alias("m"),
        )
        .groupBy("w")
        .agg(F.expr("bit_or(m)").alias("bits"))
    )
    return words.agg(
        F.map_from_entries(
            F.array_sort(F.collect_list(F.struct("w", "bits")))
        ).alias("bm")
    )


def bloom_prefilter(
    df: DataFrame,
    col: str,
    bitmap: DataFrame,
    n_bits: int = 1 << 20,
    k: int = 4,
) -> DataFrame:
    """Rows of ``df`` whose ``col`` value passes all ``k`` Bloom probes
    against ``bitmap`` (from :func:`bloom_bitmap` with the SAME
    ``n_bits``/``k``).  Keeps every true member plus ~``fp_rate``
    false positives; zero shuffle (broadcast single-row cross join +
    codegen'd map lookups).
    """
    probed = df.crossJoin(F.broadcast(bitmap)).withColumns(
        {
            f"_bp{i}": p
            for i, p in enumerate(_probe_positions(F.col(col), n_bits, k))
        }
    )
    cond = None
    for i in range(k):
        w = (F.col(f"_bp{i}") / 64).cast("long")
        m = F.expr(f"shiftleft(1L, cast(pmod(_bp{i}, 64) as int))")
        hit = (
            F.coalesce(F.element_at(F.col("bm"), w), F.lit(0).cast("long"))
            .bitwiseAND(m)
            != 0
        )
        cond = hit if cond is None else cond & hit
    return probed.where(cond).drop("bm", *[f"_bp{i}" for i in range(k)])

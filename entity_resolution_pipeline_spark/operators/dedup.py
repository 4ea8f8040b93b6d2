"""Training-data deduplication operators over a documents table.

The reference dedups only exactly (``drop_duplicates`` at
extract_to_csv.py:58-61); a web-scale training-data pipeline needs the
near-dup family too.  All operators here are Spark-first compositions of
built-in exprs — explode/groupBy/join — with **portable hashing**
(``md5`` hex strings, identical in Spark and ANSI SQL/DuckDB) so every
operator has an exact SQL oracle.

Scale notes (the part that matters at 10^12 docs):

* MinHash signatures are one shuffle: explode shingles → groupBy(doc) with
  K min() aggregates (map-side partial, no arrays of postings).
* LSH banding turns all-pairs into an equi-join on (band_idx, band_key);
  per-bucket fan-out is bounded by a block-size cap exactly like
  ER blocking (reference precedent pipeline/utils.py:97-101).
* SimHash bit-bands (pigeonhole: hamming ≤ k → ≥1 of k+1 bands equal)
  replace the quadratic cross-join with an equi-join.
* Everything is whole-stage-codegen'd builtins; zero Python in the path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.normalize import normalize_text
from ..functions.text import distinct_tokens, word_ngrams

# ---------------------------------------------------------------------------
# Exact dedup (hash-groupBy)
# ---------------------------------------------------------------------------


def exact_dup_groups(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Groups of byte-identical normalized texts:
    → (content_hash, n_docs, keep_id) for groups with n_docs > 1."""
    h = F.md5(normalize_text(F.col(text_col))).alias("content_hash")
    return (
        df.select(h, F.col(id_col))
        .groupBy("content_hash")
        .agg(F.count("*").alias("n_docs"), F.min(id_col).alias("keep_id"))
        .where(F.col("n_docs") > 1)
    )


def dedup_exact(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep the min-id representative of each exact-content group.

    Distributed restatement of the reference's ``drop_duplicates``
    (extract_to_csv.py:60): groupBy(content hash) → min(id) → semi-join.
    """
    keep = (
        df.select(
            F.md5(normalize_text(F.col(text_col))).alias("content_hash"),
            F.col(id_col),
        )
        .groupBy("content_hash")
        .agg(F.min(id_col).alias(id_col))
        .select(id_col)
    )
    return df.join(keep, id_col, "left_semi")


# ---------------------------------------------------------------------------
# MinHash + LSH near-dup
# ---------------------------------------------------------------------------


def shingles(col: Column | str, n: int = 3) -> Column:
    """Distinct word n-gram shingles of normalized text."""
    return F.array_distinct(word_ngrams(normalize_text(F.col(col) if isinstance(col, str) else col), n))


def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 12,
    shingle_n: int = 3,
) -> DataFrame:
    """→ (id, sig_0..sig_{K-1}): K-permutation min-wise signature.

    Permutation *i* is the seeded hash ``md5(i || ':' || shingle)``;
    the signature element is the lexicographic min over the doc's
    shingle set — a valid min-wise scheme over the md5 value space and
    byte-portable to any SQL engine (the oracle).  One explode + one
    groupBy with K partial-min aggregates: a single shuffle whose rows
    are (id, shingle), never per-key posting lists.
    """
    sh = df.select(
        F.col(id_col).alias("id"),
        F.explode(shingles(text_col, shingle_n)).alias("shingle"),
    )
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"{i}:"), F.col("shingle")))).alias(f"sig_{i}")
        for i in range(num_hashes)
    ]
    return sh.groupBy("id").agg(*aggs)


def lsh_candidate_pairs(
    sigs: DataFrame, bands: int = 4, rows_per_band: int = 3
) -> DataFrame:
    """Band the signature and equi-join per band → (id1, id2), id1 < id2.

    Docs agreeing on all ``rows_per_band`` sig values of at least one
    band collide.  The join key is (band_idx, band_key) — pure shuffle
    equi-join, AQE-skew-splittable; no cross join anywhere.
    """
    band_structs = []
    for b in range(bands):
        cols = [F.col(f"sig_{b * rows_per_band + r}") for r in range(rows_per_band)]
        band_structs.append(
            F.struct(F.lit(b).alias("band_idx"), F.md5(F.concat_ws("|", *cols)).alias("band_key"))
        )
    banded = sigs.select(
        "id", F.explode(F.array(*band_structs)).alias("band")
    ).select("id", F.col("band.band_idx").alias("band_idx"), F.col("band.band_key").alias("band_key"))
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(b, ["band_idx", "band_key"])
        .where(F.col("a.id") < F.col("b.id"))
        .select(F.col("a.id").alias("id1"), F.col("b.id").alias("id2"))
        .dropDuplicates(["id1", "id2"])
    )


def shingle_jaccard(c1: Column, c2: Column) -> Column:
    """Jaccard over two shingle-array columns; 0 on empty union."""
    union = F.size(F.array_union(c1, c2))
    inter = F.size(F.array_intersect(c1, c2))
    return F.when(union > 0, inter / union).otherwise(F.lit(0.0))


def minhash_near_duplicates(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.5,
    num_hashes: int = 12,
    bands: int = 4,
    shingle_n: int = 3,
) -> DataFrame:
    """MinHash→LSH→verify pipeline: → (id1, id2, jaccard) above θ.

    Candidates from banding are *verified* with exact shingle Jaccard
    (join back to shingle sets), so LSH false positives never ship.
    """
    rows_per_band = num_hashes // bands
    sigs = minhash_signatures(df, id_col, text_col, num_hashes, shingle_n)
    cands = lsh_candidate_pairs(sigs, bands, rows_per_band)
    sh = df.select(F.col(id_col).alias("id"), shingles(text_col, shingle_n).alias("sh"))
    return (
        cands.join(sh.select(F.col("id").alias("id1"), F.col("sh").alias("sh1")), "id1")
        .join(sh.select(F.col("id").alias("id2"), F.col("sh").alias("sh2")), "id2")
        .select(
            "id1",
            "id2",
            F.round(shingle_jaccard(F.col("sh1"), F.col("sh2")), 6).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )


def prefix_filter_jaccard_duplicates(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.5,
    shingle_n: int = 3,
) -> DataFrame:
    """Prefix-filtered exact Jaccard self-join: → (id1, id2, jaccard ≥ θ)
    with **guaranteed full recall** (unlike the block-cap variant, which
    trades recall for cost).

    Classic set-similarity-join prefix filter (PPJoin/TokenJoin family):
    order all shingles globally by (document frequency asc, shingle);
    any two sets with J ≥ θ must share at least one shingle among each
    set's first ``⌊(1−θ)·|s|⌋+1`` under that order.  Joining only on
    prefix shingles — the *rarest* ones — keeps blocks tiny by
    construction (a frequency-ascending prefix is anti-skew), then exact
    Jaccard verifies.  All window/join/aggregate builtins.
    """
    from pyspark.sql import Window

    sh_sets = df.select(
        F.col(id_col).alias("id"), shingles(text_col, shingle_n).alias("sh")
    )
    posting = sh_sets.select("id", F.explode("sh").alias("key"))
    freq = posting.groupBy("key").agg(F.count("*").alias("freq"))
    w_rank = Window.partitionBy("id").orderBy("freq", "key")
    ranked = (
        posting.join(freq, "key")
        .withColumn("rn", F.row_number().over(w_rank))
        .withColumn("sz", F.count("*").over(Window.partitionBy("id")))
    )
    prefix = ranked.where(
        F.col("rn") <= F.floor((1.0 - threshold) * F.col("sz")) + 1
    )
    cands = (
        prefix.select("key", F.col("id").alias("id1"))
        .join(prefix.select("key", F.col("id").alias("id2")), "key")
        .where(F.col("id1") < F.col("id2"))
        .select("id1", "id2")
        .dropDuplicates(["id1", "id2"])
    )
    return (
        cands.join(sh_sets.select(F.col("id").alias("id1"), F.col("sh").alias("sh1")), "id1")
        .join(sh_sets.select(F.col("id").alias("id2"), F.col("sh").alias("sh2")), "id2")
        .select(
            "id1",
            "id2",
            F.round(shingle_jaccard(F.col("sh1"), F.col("sh2")), 6).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )


# ---------------------------------------------------------------------------
# SimHash near-dup
# ---------------------------------------------------------------------------

_HIGH_HEX = ("8", "9", "a", "b", "c", "d", "e", "f")


def simhash16(col: Column | str) -> Column:
    """16-bit SimHash of the distinct-token set of normalized text.

    Bit *j* is the sign of the (+1/−1) vote over tokens, where token
    *t* votes +1 iff the high bit of hex digit *j* of md5(t) is set —
    i.e. ``substr(md5(t), j+1, 1) ∈ [8-f]``.  Pure builtins, and the
    identical expression is writable in ANSI SQL (the oracle).
    """
    toks = distinct_tokens(normalize_text(F.col(col) if isinstance(col, str) else col))
    bits = []
    for j in range(16):
        # sum votes over the token array without exploding: aggregate()
        bit = (
            F.aggregate(
                toks,
                F.lit(0),
                lambda acc, t: acc
                + F.when(F.substring(F.md5(t), j + 1, 1).isin(*_HIGH_HEX), 1).otherwise(-1),
            )
            > 0
        ).cast("int") * F.lit(2**j)
        bits.append(bit)
    total = bits[0]
    for b in bits[1:]:
        total = total + b
    return total


def simhash_table(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """→ (id, sh): aggregate-route twin of :func:`simhash16`.

    The column expression evaluates 16 ``aggregate()`` higher-order
    functions per row — md5 of every token computed 16×, interpreted.
    Here: explode tokens, hash each ONCE, 16 conditional-sum aggregates
    in a single map-side-partial groupBy — whole-stage codegen, one
    shuffle, ~an order of magnitude faster and the shape that scales.
    ``explode_outer`` keeps empty docs (all-zero signature), matching
    the column expression exactly.
    """
    toks = df.select(
        F.col(id_col).alias("id"),
        F.explode_outer(
            distinct_tokens(normalize_text(F.col(text_col)))
        ).alias("t"),
    ).withColumn("h", F.md5("t"))
    aggs = []
    for j in range(16):
        vote = (
            F.when(F.substring("h", j + 1, 1).isin(*_HIGH_HEX), 1)
            .otherwise(-1)
            # null token (empty doc) votes -1: bit stays 0, same as the
            # column expression's empty-array fold
        )
        aggs.append(F.sum(vote).alias(f"b{j}"))
    g = toks.groupBy("id").agg(*aggs)
    total = None
    for j in range(16):
        bit = (F.col(f"b{j}") > 0).cast("int") * F.lit(2**j)
        total = bit if total is None else total + bit
    return g.select("id", total.alias("sh"))


def simhash_near_duplicates(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
) -> DataFrame:
    """→ (id1, id2, hamming) with hamming(simhash16) ≤ ``max_hamming``.

    Banding via pigeonhole: split the 16 bits into ``max_hamming + 1``
    bands; any pair within the hamming radius agrees exactly on ≥1 band,
    so candidates come from an equi-join on (band_idx, band_bits) — the
    cross join never happens.  Verification is ``bit_count(xor)``.
    """
    nbands = max_hamming + 1
    width = 16 // nbands  # 4 bands × 4 bits
    h = simhash_table(df, id_col, text_col)
    bandcols = [
        F.struct(
            F.lit(b).alias("band_idx"),
            F.shiftright(F.col("sh"), b * width).bitwiseAND(F.lit(2**width - 1)).alias("band_bits"),
        )
        for b in range(nbands)
    ]
    banded = h.select(
        "id", "sh", F.explode(F.array(*bandcols)).alias("band")
    ).select("id", "sh", F.col("band.band_idx").alias("band_idx"), F.col("band.band_bits").alias("band_bits"))
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(b, ["band_idx", "band_bits"])
        .where(F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id1"),
            F.col("b.id").alias("id2"),
            F.bit_count(F.col("a.sh").bitwiseXOR(F.col("b.sh"))).alias("hamming"),
        )
        .where(F.col("hamming") <= max_hamming)
        .dropDuplicates(["id1", "id2"])
    )


# ---------------------------------------------------------------------------
# N-gram Jaccard near-dup (blocked, no LSH)
# ---------------------------------------------------------------------------


def ngram_jaccard_duplicates(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.5,
    shingle_n: int = 3,
    max_block_size: int = 200,
) -> DataFrame:
    """Shingle-blocked exact Jaccard near-dup: → (id1, id2, jaccard) ≥ θ.

    Pairs sharing ≥1 (capped) shingle block are scored with exact
    shingle Jaccard.  Because θ-Jaccard pairs share ≥1 shingle by
    definition, blocking loses only pairs whose every common shingle is
    over the cap — the same recall/cost trade the reference's block cap
    makes (utils.py:97-101).
    """
    sh = df.select(F.col(id_col).alias("id"), shingles(text_col, shingle_n).alias("sh"))
    posting = sh.select("id", F.explode("sh").alias("key"))
    small = (
        posting.groupBy("key")
        .agg(F.count("*").alias("n"))
        .where((F.col("n") > 1) & (F.col("n") <= max_block_size))
    )
    capped = posting.join(small.select("key"), "key")
    pairs = (
        capped.select("key", F.col("id").alias("id1"))
        .join(capped.select("key", F.col("id").alias("id2")), "key")
        .where(F.col("id1") < F.col("id2"))
        .select("id1", "id2")
        .dropDuplicates(["id1", "id2"])
    )
    return (
        pairs.join(sh.select(F.col("id").alias("id1"), F.col("sh").alias("sh1")), "id1")
        .join(sh.select(F.col("id").alias("id2"), F.col("sh").alias("sh2")), "id2")
        .select(
            "id1",
            "id2",
            F.round(shingle_jaccard(F.col("sh1"), F.col("sh2")), 6).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )

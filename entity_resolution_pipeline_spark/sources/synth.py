"""Deterministic synthetic Common-Crawl-style pages generator.

Replaces the reference's random replication scaler
(scalability_test.py:9-31, which perturbs rows with ``random.randint``)
with a fully deterministic, Spark-native generator: every value is a
pure function of the row id via ``xxhash64`` arithmetic — no Python RNG,
no ``monotonically_increasing_id`` (SURVEY §2 P9: non-deterministic ids
break checkpoint/resume).  Scales to any row count without driver data:
the plan is ``range → project``, embarrassingly parallel, no shuffle.

Output schema (BASELINE.json input_hint):
    url:string, warc_ts:timestamp, html:binary, text:string(NULL),
    lang:string
plus a hidden ``entity_id`` ground-truth column consumed only by
:func:`labeled_pairs` (the evaluation gold standard, FIXTURES.md F3).

Planted duplicates: entities have group size 1-5 (~30% of pages are
non-singletons), group members are perturbed copies (case flips,
punctuation, dropped words, reordered authors) mirroring the ACM/DBLP
overlap that yields the reference's 1,698 matched pairs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

# Deterministic vocab pools (module constants → Catalyst literals).
WORDS = (
    "query optimization distributed stream processing adaptive index join "
    "partition shuffle vector column storage transaction consensus replica "
    "latency throughput cache memory graph cluster entity resolution match "
    "schema parallel engine kernel batch window watermark state snapshot "
    "log compaction encoding compression sketch sample filter bloom hash "
    "sort merge scan pushdown pruning codegen arrow parquet iceberg lake "
    "crawl page corpus dedup shingle signature similarity threshold block "
    "candidate pair score weight learning model feature token language "
    "quality ratio analysis fingerprint rolling neural embedding cosine "
    "nearest neighbor search approximate recall precision measure metric"
).split()

FIRST_NAMES = (
    "alice bob carol david erin frank grace heidi ivan judy kevin laura "
    "mallory niaj olivia peggy quentin rupert sybil trent ursula victor "
    "wendy xavier yolanda zach"
).split()

LAST_NAMES = (
    "smith johnson lee brown garcia miller davis wilson anderson thomas "
    "taylor moore martin jackson thompson white lopez gonzalez harris clark"
).split()

# Group-size distribution: 8 slots → sizes (1,1,1,1,1,2,2,3,5); mean
# ≈ 2.1 pages/entity with ~30% of entities non-singleton (FIXTURES.md F1).
_SIZE_SLOTS = (1, 1, 1, 1, 1, 2, 2, 3, 5)

_BOILER = (
    "home about contact subscribe newsletter privacy policy terms of "
    "service all rights reserved copyright follow us on social media"
)


def _h(*cols: Column | str | int) -> Column:
    """Deterministic 64-bit hash of the given columns/literals."""
    lits = [F.lit(c) if isinstance(c, (str, int)) else c for c in cols]
    return F.xxhash64(*lits)


def _pick(pool: tuple[str, ...], *seed: Column | str | int) -> Column:
    """Deterministically pick one word from a literal pool."""
    arr = F.array(*[F.lit(w) for w in pool])
    return F.element_at(arr, (F.pmod(_h(*seed), F.lit(len(pool))) + 1).cast("int"))


def _word_seq(pool: tuple[str, ...], count: Column, tag: str, ent: Column) -> Column:
    """Array of `count` deterministic picks from `pool` for entity `ent`."""
    arr = F.array(*[F.lit(w) for w in pool])
    return F.transform(
        F.sequence(F.lit(1), count),
        lambda i: F.element_at(arr, (F.pmod(_h(tag, ent, i), F.lit(len(pool))) + 1).cast("int")),
    )


def _zipf_word_seq(
    pool: tuple[str, ...], count: Column, tag: str, ent: Column, vocab: int
) -> Column:
    """Open-vocabulary word sequence: half the positions draw from the
    closed common-word pool, half from a synthetic rare vocabulary of
    ``vocab`` hash-derived tokens (``w<k>``).

    Mirrors the Zipfian head/tail split of real crawl text — closed
    vocab made every word n-gram a hot blocking key (pair explosion
    O(n²/|V|) regardless of cap), which is an artifact no real corpus
    has.  Rare-token n-grams keep blocks small and candidate growth
    ~linear in corpus size."""
    arr = F.array(*[F.lit(w) for w in pool])
    return F.transform(
        F.sequence(F.lit(1), count),
        lambda i: F.when(
            F.pmod(_h(tag + "?", ent, i), 2) == 0,
            F.element_at(arr, (F.pmod(_h(tag, ent, i), F.lit(len(pool))) + 1).cast("int")),
        ).otherwise(
            F.concat(F.lit("w"), F.pmod(_h(tag + "!", ent, i), F.lit(vocab)).cast("string"))
        ),
    )


def synth_pages(
    spark: SparkSession, num_entities: int = 1000, partitions: int | None = None
) -> DataFrame:
    """Generate the pages table with planted duplicate clusters.

    Column-for-column deterministic: re-running yields byte-identical
    rows (resume-safety contract, SURVEY §7 'Determinism').
    """
    ents = spark.range(num_entities).withColumnRenamed("id", "entity_id")
    if partitions:
        ents = ents.repartition(partitions)

    size_arr = F.array(*[F.lit(s) for s in _SIZE_SLOTS])
    ents = ents.withColumn(
        "group_size",
        F.element_at(size_arr, (F.pmod(_h("sz", F.col("entity_id")), F.lit(len(_SIZE_SLOTS))) + 1).cast("int")),
    )

    e = F.col("entity_id")
    # Entity-level canonical attributes.  Title vocabulary grows with
    # corpus size (Zipf tail) so blocking-key selectivity matches real
    # web text at every scale.
    vocab = max(1000, num_entities // 2)
    n_title = (F.pmod(_h("tl", e), F.lit(5)) + 5).cast("int")  # 5..9 words
    n_auth = (F.pmod(_h("al", e), F.lit(3)) + 2).cast("int")  # 2..4 authors
    ents = (
        ents.withColumn("title_words", _zipf_word_seq(WORDS, n_title, "tw", e, vocab))
        .withColumn(
            "authors_arr",
            # surnames get the same Zipf head/tail split as title words
            # (a closed 20-surname pool made every author n-gram a
            # ~100-doc blocking key at 10^5 pages — real surname
            # distributions are heavy-tailed)
            F.transform(
                F.sequence(F.lit(1), n_auth),
                lambda i: F.concat_ws(
                    " ",
                    _pick(FIRST_NAMES, "fn", e, i),
                    F.when(
                        F.pmod(_h("ln?", e, i), 2) == 0,
                        _pick(LAST_NAMES, "ln", e, i),
                    ).otherwise(
                        F.concat(
                            F.lit("nm"),
                            F.pmod(_h("ln!", e, i), F.lit(vocab)).cast("string"),
                        )
                    ),
                ),
            ),
        )
        .withColumn("lang", F.when(F.pmod(_h("lg", e), 20) == 0, "de").otherwise("en"))
    )

    # One row per group member.
    pages = ents.select(
        "entity_id",
        "title_words",
        "authors_arr",
        "lang",
        F.explode(F.sequence(F.lit(1), F.col("group_size"))).alias("member"),
    )

    m = F.col("member")
    variant = F.pmod(_h("v", e, m), F.lit(4))

    # Perturbations (deterministic per member; member 1 = canonical):
    #   v0 → UPPERCASE title (erased by normalization)
    #   v1 → drop last title word
    #   v2 → extra punctuation/spacing (erased by normalization)
    #   v3 → reversed author order
    title_words = F.col("title_words")
    title_words = F.when(
        (m > 1) & (variant == 1) & (F.size(title_words) > 4),
        F.slice(title_words, 1, F.size(title_words) - 1),
    ).otherwise(title_words)

    title = F.concat_ws(" ", title_words)
    title = F.when((m > 1) & (variant == 0), F.upper(title)).otherwise(title)
    title = F.when((m > 1) & (variant == 2), F.concat(title, F.lit(" -- "))).otherwise(title)

    authors_arr = F.col("authors_arr")
    authors_arr = F.when((m > 1) & (variant == 3), F.reverse(authors_arr)).otherwise(authors_arr)
    authors = F.concat_ws(", ", authors_arr)

    url = F.concat(
        F.lit("https://site"),
        F.pmod(_h("st", e, m), 20).cast("string"),
        F.lit(".example/"),
        F.lpad(e.cast("string"), 8, "0"),
        F.lit("-"),
        m.cast("string"),
    )
    warc_ts = F.timestamp_seconds(F.lit(1700000000) + F.pmod(_h("ts", e, m), 86400 * 30))

    html = F.concat(
        F.lit("<html><head><title>"),
        title,
        F.lit("</title><script>var x=1;</script></head><body><h1>"),
        title,
        F.lit('</h1><p class="byline">'),
        authors,
        F.lit("</p><div>"),
        F.lit(_BOILER),
        F.lit("</div></body></html>"),
    )

    return pages.select(
        url.alias("url"),
        warc_ts.alias("warc_ts"),
        F.encode(html, "UTF-8").alias("html"),
        F.lit(None).cast("string").alias("text"),
        F.col("lang"),
        F.col("entity_id"),
    )


def labeled_pairs(pages: DataFrame) -> DataFrame:
    """Gold standard from planted entity groups (FIXTURES.md F3):
    all intra-group pairs, canonical order url1 < url2.

    Spark-native self-join on entity_id — tiny blocks (≤5), no skew.
    """
    a = pages.select(F.col("entity_id"), F.col("url").alias("url1"))
    b = pages.select(F.col("entity_id"), F.col("url").alias("url2"))
    return (
        a.join(b, "entity_id")
        .where(F.col("url1") < F.col("url2"))
        .select("url1", "url2")
        .withColumn("is_match", F.lit(1))
    )

"""Unit tests: normalization, tokenization, n-grams, similarity — each
Spark column function vs the reference formulas (driver-side oracles in
helpers.py) and, where an oracle-parity contract exists, vs DuckDB.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from entity_resolution_pipeline_spark.functions.normalize import (
    normalize_text,
    normalize_text_sql,
)
from entity_resolution_pipeline_spark.functions.similarity import (
    jaccard_sim,
    jaro_winkler_py,
    levenshtein_sim,
    trigram_sim,
)
from entity_resolution_pipeline_spark.functions.text import (
    char_ngrams,
    token_count,
    word_ngrams,
)

from .helpers import (
    char_ngrams_py,
    jaccard_sim_py,
    levenshtein_sim_py,
    normalize_py,
    trigram_sim_py,
    word_ngrams_py,
)

CASES = [
    "Entity Resolution: A Survey!",
    "  J. Smith, A. Jones & B. Lee  ",
    "ÜBER-cool TITLE (2024)",
    "",
    "a",
    "The    quick   brown. FOX!!",
    "123 abc 456",
]

PAIRS = [
    ("entity resolution survey", "entity resolution a survey"),
    ("abc", "abd"),
    ("same string", "same string"),
    ("", ""),
    ("", "nonempty"),
    ("kitten", "sitting"),
    ("data cleaning at scale", "scale at cleaning data"),
]


def _one_col(spark, values, expr, alias="v"):
    df = spark.createDataFrame([(v,) for v in values], ["s"])
    return [r[alias] for r in df.select(expr.alias(alias)).collect()]


def test_normalize_matches_reference_chain(spark):
    got = _one_col(spark, CASES, normalize_text("s"))
    assert got == [normalize_py(c) for c in CASES]


def test_normalize_sql_twin_matches_duckdb(spark):
    """The SQL rendering used by the DuckDB oracles computes identical
    bytes to the Spark column expression."""
    got_spark = _one_col(spark, CASES, normalize_text("s"))
    con = duckdb.connect()
    got_duck = [
        con.execute(f"select {normalize_text_sql('?')}", [c]).fetchone()[0]
        for c in CASES
    ]
    assert got_spark == got_duck


def test_word_ngrams(spark):
    texts = ["a b c d e", "a b", "a b c", ""]
    got = _one_col(spark, texts, word_ngrams("s", 3))
    assert got == [word_ngrams_py(t, 3) for t in texts]


def test_char_ngrams(spark):
    texts = ["abc", "ab", "", "hello world"]
    got = _one_col(spark, texts, char_ngrams("s", 3))
    assert [set(g) for g in got] == [char_ngrams_py(t, 3) for t in texts]


def test_token_count(spark):
    texts = ["a b  c", "", "   ", "one"]
    got = _one_col(spark, texts, token_count("s"))
    assert got == [3, 0, 0, 1]


@pytest.fixture(scope="module")
def pair_df(spark):
    return spark.createDataFrame(PAIRS, ["s1", "s2"]).cache()


def test_levenshtein_sim(spark, pair_df):
    got = [r.v for r in pair_df.select(levenshtein_sim("s1", "s2").alias("v")).collect()]
    exp = [levenshtein_sim_py(a, b) for a, b in PAIRS]
    assert got == pytest.approx(exp)


def test_jaccard_sim(spark, pair_df):
    got = [r.v for r in pair_df.select(jaccard_sim("s1", "s2").alias("v")).collect()]
    exp = [jaccard_sim_py(a, b) for a, b in PAIRS]
    assert got == pytest.approx(exp)


def test_trigram_sim(spark, pair_df):
    got = [r.v for r in pair_df.select(trigram_sim("s1", "s2").alias("v")).collect()]
    exp = [trigram_sim_py(a, b) for a, b in PAIRS]
    assert got == pytest.approx(exp)


def test_jaro_winkler_matches_duckdb():
    """Oracle-parity contract: our JW kernel == DuckDB's
    jaro_winkler_similarity (so query/oracle hashes agree)."""
    con = duckdb.connect()
    cases = PAIRS + [
        ("martha", "marhta"),
        ("dixon", "dicksonx"),
        ("jellyfish", "smellyfish"),
        ("duane", "dwayne"),
        ("ab", "ba"),
        ("x", "y"),
    ]
    for a, b in cases:
        exp = con.execute("select jaro_winkler_similarity(?, ?)", [a, b]).fetchone()[0]
        assert jaro_winkler_py(a, b) == pytest.approx(exp, abs=1e-12), (a, b)


def test_jaro_winkler_udf(spark, pair_df):
    from entity_resolution_pipeline_spark.functions.similarity import jaro_winkler_sim

    got = [r.v for r in pair_df.select(jaro_winkler_sim("s1", "s2").alias("v")).collect()]
    exp = [jaro_winkler_py(a, b) for a, b in PAIRS]
    assert got == pytest.approx(exp)


def test_jaro_winkler_kernels_agree_property():
    """All three kernels — scalar oracle, bit-parallel numpy, lazily
    compiled C — produce identical values over randomized strings
    (incl. empties, repeats, multi-64-char and non-ASCII)."""
    import random

    from entity_resolution_pipeline_spark.functions import _jw_native
    from entity_resolution_pipeline_spark.functions.similarity import (
        jaro_winkler_np,
        jaro_winkler_py,
    )

    rng = random.Random(1234)
    alph = "abc d€1"
    cases = [
        (
            "".join(rng.choice(alph) for _ in range(rng.randint(0, 140))),
            "".join(rng.choice(alph) for _ in range(rng.randint(0, 140))),
        )
        for _ in range(3000)
    ]
    cases += [("", ""), ("a", ""), ("", "a"), ("abab", "baba"), ("x" * 80, "x" * 80)]
    a = [c[0] for c in cases]
    b = [c[1] for c in cases]
    exp = [jaro_winkler_py(x, y) for x, y in cases]
    got_np = jaro_winkler_np(a, b)
    assert all(abs(e - g) < 1e-12 for e, g in zip(exp, got_np))
    got_c = _jw_native.jw_batch(a, b)
    if got_c is not None:  # no system compiler → numpy path already checked
        assert all(abs(e - g) < 1e-12 for e, g in zip(exp, got_c))


def test_jaro_winkler_np_chunks_under_memory_budget(monkeypatch):
    """ADVICE r2: the bit-parallel kernel's pm tensor is (n, V, W) —
    a wide-vocab batch must be row-chunked, with identical results."""
    import numpy as np

    from entity_resolution_pipeline_spark.functions import similarity as sim

    # multilingual-ish vocab: many distinct codepoints across the batch
    # 600 rows > the 256-row chunk floor, so the budget=1 monkeypatch
    # below actually exercises the chunked path
    a = [chr(0x4E00 + (7 * i) % 500) * 3 + "abc" for i in range(600)]
    b = [chr(0x4E00 + (11 * i) % 500) * 2 + "abd" for i in range(600)]
    full = sim.jaro_winkler_np(a, b)
    monkeypatch.setattr(sim, "_PM_BUDGET_BYTES", 1)  # force chunking
    chunked = sim.jaro_winkler_np(a, b)
    assert np.array_equal(full, chunked)
    exp = [sim.jaro_winkler_py(x, y) for x, y in zip(a, b)]
    assert np.allclose(chunked, exp, atol=1e-12)

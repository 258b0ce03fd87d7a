"""Column-level text functions (JVM-side expressions)."""

import pytest
from pyspark.sql import functions as F

from pysatl_cpd_spark.functions.text import (
    fingerprint,
    lang_id,
    punct_ratio,
    quality_score,
    stopword_ratio,
    token_count,
)


@pytest.fixture()
def docs(spark):
    rows = [
        (1, "the cat and the dog"),
        (2, "  spaced   out   text  "),
        (3, ""),
        (4, "der Hund und die Katze ist gut und der Baum"),
        (5, "le chat et le chien et les oiseaux des bois"),
        (6, "Hello, world! How are you? Fine; thanks."),
        (7, "zz qq xx"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _one(df, col, doc_id):
    return df.filter(F.col("doc_id") == doc_id).select(col).collect()[0][0]


def test_token_count(spark, docs):
    out = docs.select("doc_id", token_count(F.col("text")).alias("n"))
    got = {r["doc_id"]: r["n"] for r in out.collect()}
    assert got == {1: 5, 2: 3, 3: 0, 4: 10, 5: 10, 6: 7, 7: 3}


def test_punct_ratio(spark, docs):
    r = _one(docs, punct_ratio(F.col("text")).alias("r"), 6)
    assert r == pytest.approx(5 / 40)


def test_stopword_ratio(spark, docs):
    r = _one(docs, stopword_ratio(F.col("text")).alias("r"), 1)
    assert r == pytest.approx(3 / 5)  # the, and, the
    assert _one(docs, stopword_ratio(F.col("text")).alias("r"), 7) == 0.0


def test_lang_id(spark, docs):
    out = {r["doc_id"]: r["lang"] for r in docs.select("doc_id", lang_id(F.col("text")).alias("lang")).collect()}
    assert out[1] == "en"
    assert out[4] == "de"
    assert out[5] == "fr"
    assert out[7] == "und"


def test_fingerprint_normalizes(spark):
    df = spark.createDataFrame(
        [(1, "A  b c"), (2, "a b  C "), (3, "a b d")], "doc_id long, text string"
    )
    fps = [r["fp"] for r in df.select(fingerprint(F.col("text")).alias("fp")).collect()]
    assert fps[0] == fps[1] != fps[2]


def test_quality_score_bounds(spark, docs):
    out = docs.select(quality_score(F.col("text")).alias("q")).collect()
    assert all(0.0 <= r["q"] <= 1.0 for r in out)


def test_bpe_token_count(spark):
    from pysatl_cpd_spark.functions.text import bpe_token_count

    df = spark.createDataFrame(
        [(1, "it's a test-case with 42 tokens, isn't it?"), (2, ""), (3, "hello")],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.n for r in df.select("doc_id", bpe_token_count(F.col("text")).alias("n")).collect()}
    assert got[1] == 14 and got[2] == 0 and got[3] == 1


def test_winnow_shared_substring_guarantee(spark):
    """Winnowing law (Schleimer et al. 2003): documents sharing a substring
    of length >= k + w - 1 share at least one fingerprint."""
    from pysatl_cpd_spark.operators.dedup import winnow_fingerprints

    shared = "the quick brown fox jumps over the lazy dog"  # len 43 >= 8+4-1
    docs = spark.createDataFrame(
        [
            (1, "PREFIX one " + shared + " SUFFIX alpha"),
            (2, "totally different opener " + shared + " and closer"),
            (3, "no overlap here at all, nothing in common whatsoever xyz"),
        ],
        "doc_id long, text string",
    )
    fps = winnow_fingerprints(docs, k=8, w=4).collect()
    by_doc = {}
    for r in fps:
        by_doc.setdefault(r.doc_id, set()).add(r.fingerprint)
    assert by_doc[1] & by_doc[2], "shared substring must produce a shared fingerprint"
    # doc 3 shares far less with doc 1 than the planted pair does
    assert len(by_doc[1] & by_doc[3]) < len(by_doc[1] & by_doc[2])

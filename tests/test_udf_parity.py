"""Byte-identical invariant (BASELINE.json input_hint): the vectorized
Arrow UDFs must produce byte-for-byte the same strings as the pure-Python
reference chain, including Unicode (Python ``\\W`` is Unicode-aware — the
reason this stays in Python re, SURVEY.md §7.4 item 1)."""

from __future__ import annotations

import pyspark.sql.functions as F

from knowledgegraphgenerator_spark.core.lemmatize import noun_lemma
from knowledgegraphgenerator_spark.core.textnorm import normalize_text, tokenize
from knowledgegraphgenerator_spark.functions.udfs import (
    lemmatize_sentence_udf,
    normalize_text_udf,
)
from tests.fixtures import FAQ_QUESTIONS

UNICODE_CASES = [
    "Café déjà-vu — naïve façade?",
    "I can't pay my café bill",
    "túi tiền ở đâu?",
    "Ħello — ŵorld's end",
    "数字もある 123 テスト",
    "mixed ASCII and 中文 words can't won't",
    "'''", "don't'", "  spaces   and\ttabs ",
    "", "no-apostrophes-here plain words",
]


def test_normalize_udf_byte_identical(spark):
    texts = FAQ_QUESTIONS + UNICODE_CASES
    rows = [(i, t, "en") for i, t in enumerate(texts)] + [
        (1000 + i, t, "fr") for i, t in enumerate(UNICODE_CASES)
    ]
    df = spark.createDataFrame(rows, "i long, text string, lang string")
    got = {
        r["i"]: r["norm"]
        for r in df.select(
            "i", normalize_text_udf("text", "lang").alias("norm")
        ).collect()
    }
    for i, t, lang in rows:
        assert got[i] == normalize_text(t, lang), (lang, t)


def test_lemmatize_udf_byte_identical(spark):
    texts = [normalize_text(q) for q in FAQ_QUESTIONS]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "i long, text string")
    got = {
        r["i"]: r["lem"]
        for r in df.select(
            "i", lemmatize_sentence_udf("text").alias("lem")
        ).collect()
    }
    for i, t in enumerate(texts):
        # tokenize = whitespace + Treebank splits (cannot -> can not, ...)
        assert got[i] == " ".join(noun_lemma(x) for x in tokenize(t))


def test_normalize_udf_partitioning_invariant(spark):
    rows = [(i, q, "en") for i, q in enumerate(FAQ_QUESTIONS)]
    a = {
        r["i"]: r["n"]
        for r in spark.createDataFrame(rows, "i long, text string, lang string")
        .repartition(1)
        .select("i", normalize_text_udf("text", "lang").alias("n")).collect()
    }
    b = {
        r["i"]: r["n"]
        for r in spark.createDataFrame(rows, "i long, text string, lang string")
        .repartition(13)
        .select("i", normalize_text_udf("text", "lang").alias("n")).collect()
    }
    assert a == b

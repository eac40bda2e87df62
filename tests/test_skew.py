"""Salted-aggregation equivalence tests: salted results must equal the
plain single-phase results exactly (salting changes the shuffle shape,
never the answer)."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from knowledgegraphgenerator_spark.operators import skew


@pytest.fixture(scope="module")
def skewed(spark):
    # Zipf-ish: key 'hot' carries ~80% of rows
    rows = []
    for i in range(2000):
        key = "hot" if i % 5 != 0 else f"cold{i % 37}"
        rows.append((key, i, float(i % 101)))
    return spark.createDataFrame(rows, "key string, v long, score double")


def test_salted_collect_set_equals_plain(skewed):
    plain = {
        r["key"]: set(r["s"])
        for r in skewed.groupBy("key")
        .agg(F.collect_set("v").alias("s")).collect()
    }
    salted = {
        r["key"]: set(r["v_set"])
        for r in skew.salted_collect_set(skewed, ["key"], "v").collect()
    }
    assert salted == plain


def test_salted_topk_equals_plain(skewed):
    order = [F.desc("score"), F.asc("v")]
    w = Window.partitionBy("key").orderBy(*order)
    plain = {
        (r["key"], r["rnk"]): r["v"]
        for r in skewed.withColumn(
            "rnk", F.row_number().over(w).cast("long")
        ).where("rnk <= 5").collect()
    }
    salted = {
        (r["key"], r["rnk"]): r["v"]
        for r in skew.salted_topk_per_key(
            skewed, ["key"], order, k=5
        ).collect()
    }
    assert salted == plain


def test_salted_two_phase_count(skewed):
    plain = {
        r["key"]: r["n"]
        for r in skewed.groupBy("key").agg(F.count("*").alias("n")).collect()
    }
    two = {
        r["key"]: r["n"]
        for r in skew.salted_two_phase(
            skewed, ["key"],
            [F.count(F.lit(1)).alias("_c")],
            [F.sum("_c").alias("n")],
        ).collect()
    }
    assert two == plain


def test_cooccurrence_counts(spark):
    rows = [
        (1, "a"), (1, "b"), (1, "c"),
        (2, "a"), (2, "b"),
        (3, "a"), (3, "b"),
        (4, "c"), (4, "d"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, term string")
    got = {
        (r["ta"], r["tb"]): r["cnt"]
        for r in skew.cooccurrence_counts(df, min_count=2).collect()
    }
    assert got == {("a", "b"): 3}

"""Skew-neutralizing aggregation patterns (north rule: "partitioning /
shuffle / skew handled explicitly").

WHEN to salt — and when not to: algebraic aggregates (count/sum/min/max)
get map-side partial aggregation from Spark's hash aggregate, so head-key
skew collapses before the exchange and salting only doubles the shuffle
(tests/test_plans.py pins the two-HashAggregate shape). Salting pays off
for aggregations WITHOUT cheap partial merge — collect_list/collect_set
over Zipfian keys, exact large-cardinality distinct per key, or grouped
UDF work — where a single reducer otherwise receives the whole head key.

``salted_two_phase``: phase 1 groups by (key, salt) — the head key's rows
spread over ``n_salts`` reducers; phase 2 merges the per-salt partials by
key. The merge function must be associative over the partial type.

``salted_topk_per_key``: the north_star's "salted groupBy + window
ranking" — per-key top-k where phase 1 ranks within (key, salt) and
prunes to k, phase 2 re-ranks k*n_salts survivors per key. Exact for any
monotone ranking (top-k of a union = top-k of per-part top-ks).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def with_salt(df: DataFrame, n_salts: int = 16) -> DataFrame:
    """Deterministic salt: hash of the whole row spread over n_salts —
    reproducible across retries (rand() is not)."""
    return df.withColumn(
        "_salt", F.pmod(F.xxhash64(*df.columns), F.lit(n_salts)).cast("int")
    )


def salted_two_phase(
    df: DataFrame,
    key_cols: list[str],
    partial_aggs: list[Column],
    merge_aggs: list[Column],
    n_salts: int = 16,
) -> DataFrame:
    """groupBy(key, salt).agg(partial) → groupBy(key).agg(merge)."""
    salted = with_salt(df, n_salts)
    partial = salted.groupBy(*key_cols, "_salt").agg(*partial_aggs)
    return partial.groupBy(*key_cols).agg(*merge_aggs)


def salted_collect_set(
    df: DataFrame, key_cols: list[str], value_col: str, n_salts: int = 16
) -> DataFrame:
    """collect_set with head-key skew neutralized: per-salt sets merged
    with flatten+distinct (associative)."""
    return salted_two_phase(
        df,
        key_cols,
        [F.collect_set(value_col).alias("_part")],
        [
            F.array_distinct(
                F.flatten(F.collect_list("_part"))
            ).alias(f"{value_col}_set")
        ],
        n_salts,
    )


def salted_topk_per_key(
    df: DataFrame,
    key_cols: list[str],
    order_by: list[Column],
    k: int,
    n_salts: int = 16,
) -> DataFrame:
    """Exact per-key top-k via salted pre-ranking (monotone ranking)."""
    salted = with_salt(df, n_salts)
    w1 = Window.partitionBy(*key_cols, "_salt").orderBy(*order_by)
    pruned = (
        salted.withColumn("_r1", F.row_number().over(w1))
        .where(F.col("_r1") <= k)
        .drop("_r1", "_salt")
    )
    w2 = Window.partitionBy(*key_cols).orderBy(*order_by)
    return (
        pruned.withColumn("rnk", F.row_number().over(w2).cast("long"))
        .where(F.col("rnk") <= k)
    )


def cooccurrence_counts(
    doc_terms: DataFrame,
    id_col: str = "doc_id",
    term_col: str = "term",
    min_count: int = 2,
) -> DataFrame:
    """Term co-occurrence (subsumption/hierarchy statistics): distinct
    unordered term pairs per doc → corpus counts. The pair explosion is
    the skew risk (a doc with t terms emits t²/2 pairs; head terms appear
    in most pairs) — the count itself is algebraic so partial aggregation
    handles the reduce side; the MAP side is bounded by filtering to
    dictionary terms before pairing."""
    a = doc_terms.select(F.col(id_col).alias("d"), F.col(term_col).alias("ta"))
    b = doc_terms.select(F.col(id_col).alias("d"), F.col(term_col).alias("tb"))
    pairs = a.join(b, "d").where(F.col("ta") < F.col("tb"))
    return (
        pairs.groupBy("ta", "tb")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .where(F.col("cnt") >= min_count)
    )

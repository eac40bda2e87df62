"""Training-shard materialization (operators/shards.py): deterministic
MINSTD shard assignment + concat-and-chunk sequence packing. The
driver-gated twin is the `training_shards` query (same scramble +
cumsum window in DuckDB)."""

from __future__ import annotations

import pytest

from knowledgegraphgenerator_spark.operators.shards import (
    assign_shards,
    pack_sequences,
)


def test_assign_shards_deterministic_and_uniform(spark):
    df = spark.range(4000).withColumnRenamed("id", "doc_id")
    out = assign_shards(df, 8)
    a = {r.doc_id: r.shard for r in out.collect()}
    b = {r.doc_id: r.shard for r in assign_shards(df, 8).collect()}
    assert a == b  # no RNG state
    assert set(a.values()) <= set(range(8))
    counts = [list(a.values()).count(s) for s in range(8)]
    # uniform-ish: each shard within 2x of the mean
    assert min(counts) > 4000 / 8 / 2 and max(counts) < 4000 / 8 * 2
    # matches the explicit-pmod reference arithmetic exactly
    for i in list(a)[:100]:
        assert a[i] == ((i % 1_000_000_007) * 48271) % 8
    with pytest.raises(ValueError):
        assign_shards(df, 0)


def test_assign_shards_negative_ids(spark):
    ids = [-(2**63), -1, 0, 2**63 - 1, -987_654_321_987_654_321]
    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    got = {r.doc_id: r.shard for r in assign_shards(df, 8).collect()}
    p = 1_000_000_007
    for i in ids:
        assert got[i] == ((((i % p) + p) % p) * 48271) % 8
        assert 0 <= got[i] < 8


def test_pack_sequences_crafted(spark):
    """One shard, budget 10: docs of 4/5/3/10/2 tokens in doc_id order
    -> start offsets 0,4,9,12,22 -> packs 0,0,0,1,2. The 3-token doc
    STARTS inside pack 0 (offset 9) even though it overruns the budget
    — offset-based concat-and-chunk semantics. Zero-token docs drop."""
    rows = [
        (1, "a b c d"),
        (2, "e f g h i"),
        (3, "j k l"),
        (4, " ".join(f"m{i}" for i in range(10))),
        (5, "x y"),
        (6, ""),
        (7, "   "),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    df = df.withColumn("shard", df.doc_id * 0)
    out = {
        r.doc_id: r
        for r in pack_sequences(df, 10, shard_col="shard").collect()
    }
    assert set(out) == {1, 2, 3, 4, 5}
    assert [out[i].start_offset for i in (1, 2, 3, 4, 5)] == [0, 4, 9, 12, 22]
    assert [out[i].pack_id for i in (1, 2, 3, 4, 5)] == [0, 0, 0, 1, 2]
    assert out[4].n_tokens == 10
    with pytest.raises(ValueError):
        pack_sequences(df, 0)


def test_pack_sequences_per_shard_independent(spark):
    """Offsets restart per shard: identical doc streams in two shards
    pack identically and never see each other's tokens."""
    rows = [(s * 100 + i, "t1 t2 t3 t4 t5", s) for s in (0, 1) for i in range(4)]
    df = spark.createDataFrame(rows, "doc_id long, text string, shard long")
    out = pack_sequences(df, 10)
    got = {}
    for r in out.collect():
        got.setdefault(r.shard, []).append((r.doc_id % 100, r.start_offset, r.pack_id))
    assert sorted(got[0]) == sorted(got[1]) == [
        (0, 0, 0), (1, 5, 0), (2, 10, 1), (3, 15, 1)
    ]


def test_pack_sequences_single_shuffle_plan(spark):
    """Scale pin: packing adds exactly one shuffle (the shard key);
    everything else — token counts, cumsum, pack assignment — rides
    that partitioning."""
    from pyspark.sql import functions as F

    df = spark.range(1000).select(
        F.col("id").alias("doc_id"),
        F.lit("tok tok tok").alias("text"),
    )
    plan = (
        pack_sequences(assign_shards(df, 8), 256)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange") - plan.count("BroadcastExchange") == 1, plan

"""Connected-components (large-star/small-star) tests."""

from __future__ import annotations

from knowledgegraphgenerator_spark.operators.components import (
    connected_components,
)


def _labels(spark, edges):
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    return {
        r["id"]: r["component"]
        for r in connected_components(df).collect()
    }


def test_two_components(spark):
    labels = _labels(spark, [(1, 2), (2, 3), (10, 11)])
    assert labels[1] == labels[2] == labels[3] == 1
    assert labels[10] == labels[11] == 10


def test_chain_converges_to_min(spark):
    edges = [(i, i + 1) for i in range(1, 30)]
    labels = _labels(spark, edges)
    assert set(labels.values()) == {1}
    assert len(labels) == 30


def test_star_and_cycle(spark):
    edges = [(100, i) for i in range(101, 106)] + [(7, 8), (8, 9), (9, 7)]
    labels = _labels(spark, edges)
    assert all(labels[i] == 100 for i in range(100, 106))
    assert labels[7] == labels[8] == labels[9] == 7


def test_deterministic_under_partitioning(spark):
    edges = [(i, (i * 7) % 40 + 40) for i in range(40)]
    df1 = spark.createDataFrame(edges, "id_a long, id_b long").repartition(1)
    df2 = spark.createDataFrame(edges, "id_a long, id_b long").repartition(7)
    l1 = {r["id"]: r["component"] for r in connected_components(df1).collect()}
    l2 = {r["id"]: r["component"] for r in connected_components(df2).collect()}
    assert l1 == l2

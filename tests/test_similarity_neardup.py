"""Embedding-cosine near-dup pairs (IVF-blocked similarity join)."""

from __future__ import annotations

import math

import pytest

from knowledgegraphgenerator_spark.operators.similarity import (
    cosine_near_dup_pairs,
)


@pytest.fixture(scope="module")
def clustered_vectors(spark):
    """3 tight clusters + noise vectors; near-dups exist within clusters."""
    rows = []
    base = {
        0: [1.0, 0.0, 0.0, 0.0],
        1: [0.0, 1.0, 0.0, 0.0],
        2: [0.0, 0.0, 1.0, 0.0],
    }
    vid = 0
    for c, center in base.items():
        for j in range(4):
            eps = 0.02 * j
            vec = [x + (eps if i == (c + 1) % 4 else 0.0)
                   for i, x in enumerate(center)]
            rows.append((vid, vec, c))
            vid += 1
    # one far-out vector
    rows.append((vid, [0.5, 0.5, 0.5, 0.5], 9))
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )


def test_near_dup_pairs_within_clusters(clustered_vectors):
    pairs = cosine_near_dup_pairs(
        clustered_vectors, threshold=0.99, n_cells=4, n_probe=2
    ).collect()
    labels = {r["vec_id"]: r["label"]
              for r in clustered_vectors.collect()}
    assert pairs, "expected within-cluster near-dups"
    for r in pairs:
        assert labels[r["id_a"]] == labels[r["id_b"]], (
            f"cross-cluster pair {r}"
        )
        assert r["sim"] >= 0.99 - 1e-9


def test_near_dup_exhaustive_probe_matches_bruteforce(clustered_vectors):
    rows = clustered_vectors.collect()
    vecs = {r["vec_id"]: r["embedding"] for r in rows}

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return d / (na * nb)

    expected = {
        (i, j)
        for i in vecs for j in vecs
        if i < j and cos(vecs[i], vecs[j]) >= 0.99
    }
    got = {
        (r["id_a"], r["id_b"])
        for r in cosine_near_dup_pairs(
            clustered_vectors, threshold=0.99, n_cells=4, n_probe=4
        ).collect()
    }
    assert got == expected  # n_probe == n_cells -> exhaustive

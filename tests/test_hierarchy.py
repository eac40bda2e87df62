"""Optimiser G1/G2 unit tests vs the sequential oracle on constructed
tag_term_maps (SURVEY.md §2.9 / Appendix A.9 edge cases)."""

from __future__ import annotations

import copy

import pytest

from knowledgegraphgenerator_spark.operators.hierarchy import optimise_graph
from tests.ref_impl.pipeline import optimise_graph as ref_optimise

ROOT = "Auto Ontology"


def _run_both(spark, ttm, primary_ids):
    rows = [
        (qid, obj["question"], list(obj["terms"]), list(obj["tags"]))
        for qid, obj in ttm.items()
    ]
    onto = spark.createDataFrame(
        rows,
        "doc_id long, question string, terms array<string>, "
        "tags array<string>",
    )
    primaries = spark.createDataFrame(
        [(q,) for q in primary_ids], "doc_id long"
    )
    got = {
        r["doc_id"]: (list(r["terms"]), list(r["tags"]))
        for r in optimise_graph(onto, primaries).collect()
    }
    expected = ref_optimise(copy.deepcopy(ttm), primary_ids)
    exp = {
        qid: (obj["terms"], obj["tags"]) for qid, obj in expected.items()
    }
    return got, exp


def test_g1_demotes_empty_ancestor(spark):
    # path (ROOT, b, a): prefix (ROOT, b) has no questions -> demote b
    ttm = {
        1: {"question": "q1", "terms": ["a", "b", ROOT], "tags": []},
        2: {"question": "q2", "terms": ["c", ROOT], "tags": ["t"]},
        3: {"question": "q3", "terms": ["d", "c", ROOT], "tags": []},
    }
    got, exp = _run_both(spark, ttm, [1, 2, 3])
    assert got == exp
    # G1 demotes b -> path (ROOT, a) now has 1 question -> G2 collapses
    # it too: terms [ROOT], tags pick up b then a (recompute ordering,
    # Optmiser.py:56-62)
    assert got[1] == ([ROOT], ["b", "a"])
    # (ROOT, c) IS populated (q2) -> no demotion for q3
    assert got[3][0] == ["d", "c", ROOT]


def test_g2_collapses_sparse_level1_node(spark):
    # exactly-one-question path of length 2 -> collapse to root
    ttm = {
        1: {"question": "q1", "terms": ["only", ROOT], "tags": []},
        2: {"question": "q2", "terms": ["shared", ROOT], "tags": []},
        3: {"question": "q3", "terms": ["shared", ROOT], "tags": ["x"]},
    }
    got, exp = _run_both(spark, ttm, [1, 2, 3])
    assert got == exp
    assert got[1] == ([ROOT], ["only"])          # collapsed
    assert got[2][0] == ["shared", ROOT]          # 2 questions -> kept
    assert got[3][0] == ["shared", ROOT]


def test_g1_feeds_g2_recomputed_paths(spark):
    # After G1 demotes 'mid', qid 1's path becomes length 2 with a single
    # question -> G2 collapses it too (Optmiser.py:56-62 ordering).
    ttm = {
        1: {"question": "q1", "terms": ["leaf", "mid", ROOT], "tags": []},
        2: {"question": "q2", "terms": ["other", ROOT], "tags": []},
        3: {"question": "q3", "terms": ["other", ROOT], "tags": []},
    }
    got, exp = _run_both(spark, ttm, [1, 2, 3])
    assert got == exp
    assert got[1] == ([ROOT], ["mid", "leaf"])


def test_alternates_not_optimised(spark):
    ttm = {
        1: {"question": "p", "terms": ["x", "y", ROOT], "tags": []},
        2: {"question": "alt", "terms": ["x", "y", ROOT], "tags": []},
    }
    got, exp = _run_both(spark, ttm, [1])  # qid 2 is an alternate
    assert got == exp
    # primary demoted+collapsed; alternate untouched
    assert got[2] == (["x", "y", ROOT], [])


def test_root_only_paths_pass_through(spark):
    ttm = {
        1: {"question": "q", "terms": [ROOT], "tags": ["t"]},
        2: {"question": "q2", "terms": [ROOT], "tags": []},
    }
    got, exp = _run_both(spark, ttm, [1, 2])
    assert got == exp
    assert got[1] == ([ROOT], ["t"])


@pytest.mark.parametrize("n_partitions", [1, 5])
def test_partitioning_invariance(spark, n_partitions):
    ttm = {
        i: {
            "question": f"q{i}",
            "terms": [f"leaf{i % 4}", f"mid{i % 2}", ROOT],
            "tags": [],
        }
        for i in range(1, 21)
    }
    rows = [
        (qid, o["question"], o["terms"], o["tags"]) for qid, o in ttm.items()
    ]
    onto = spark.createDataFrame(
        rows,
        "doc_id long, question string, terms array<string>, "
        "tags array<string>",
    ).repartition(n_partitions)
    got = {
        r["doc_id"]: (list(r["terms"]), list(r["tags"]))
        for r in optimise_graph(onto).collect()
    }
    expected = ref_optimise(copy.deepcopy(ttm), list(ttm.keys()))
    assert got == {
        qid: (o["terms"], o["tags"]) for qid, o in expected.items()
    }


def test_fused_equals_two_pass(spark):
    """Differential: fused single-corpus-pass optimiser == the
    reference-shaped two-pass formulation on a mixed workload."""
    from knowledgegraphgenerator_spark.operators.hierarchy import (
        optimise_graph_two_pass,
    )

    ttm = {}
    qid = 1
    for leaf in ("l1", "l2", "l3"):
        for mid in ("m1", "m2"):
            ttm[qid] = {"question": f"q{qid}",
                        "terms": [leaf, mid, ROOT], "tags": []}
            qid += 1
    ttm[qid] = {"question": "solo", "terms": ["only", ROOT], "tags": ["t"]}
    qid += 1
    ttm[qid] = {"question": "rooty", "terms": [ROOT], "tags": []}
    rows = [
        (k, o["question"], o["terms"], o["tags"]) for k, o in ttm.items()
    ]
    onto = spark.createDataFrame(
        rows,
        "doc_id long, question string, terms array<string>, "
        "tags array<string>",
    )
    fused = {
        r["doc_id"]: (list(r["terms"]), list(r["tags"]))
        for r in optimise_graph(onto).collect()
    }
    twopass = {
        r["doc_id"]: (list(r["terms"]), list(r["tags"]))
        for r in optimise_graph_two_pass(onto).collect()
    }
    assert fused == twopass

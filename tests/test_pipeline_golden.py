"""Golden end-to-end parity: Spark pipeline == sequential oracle.

The distributed engine (set-semantics dedup joins, token-prefiltered
masked matching, DataFrame optimiser passes) must reproduce the sequential
reference semantics exactly — terms/tags per document and the derived
triple set (P/R == 1.0, stricter than the BASELINE.json >=0.95 gate).
Also asserts repartition-invariance (SURVEY.md §5.2 item 3).
"""

from __future__ import annotations

import pytest

from knowledgegraphgenerator_spark.core.stopwords import get_stop_words
from knowledgegraphgenerator_spark.pipeline import run_pipeline
from tests.fixtures import FAQ_QUESTIONS
from tests.ref_impl.pipeline import run_reference_pipeline


@pytest.fixture(scope="module")
def golden():
    stops = get_stop_words("en")
    ttm, triples = run_reference_pipeline(FAQ_QUESTIONS, stops)
    return ttm, triples


def _corpus_df(spark, n_partitions):
    rows = [
        (10001 + i, q, "en") for i, q in enumerate(FAQ_QUESTIONS)
    ]
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string"
    ).repartition(n_partitions)


@pytest.mark.parametrize("n_partitions", [1, 7])
def test_spark_matches_oracle(spark, golden, n_partitions):
    ttm, ref_triples = golden
    result = run_pipeline(_corpus_df(spark, n_partitions))

    got = {
        r["doc_id"]: (list(r["terms"]), list(r["tags"]))
        for r in result.ontology.collect()
    }
    assert set(got) == set(ttm)
    for qid, obj in ttm.items():
        assert got[qid][0] == obj["terms"], (
            f"terms mismatch qid={qid} q={obj['question']!r}: "
            f"{got[qid][0]} != {obj['terms']}"
        )
        assert got[qid][1] == obj["tags"], (
            f"tags mismatch qid={qid}: {got[qid][1]} != {obj['tags']}"
        )

    got_triples = {
        (r["subj"], r["pred"], r["obj"]) for r in result.triples.collect()
    }
    inter = got_triples & ref_triples
    precision = len(inter) / len(got_triples)
    recall = len(inter) / len(ref_triples)
    assert precision == 1.0 and recall == 1.0, (
        f"P={precision} R={recall}; "
        f"ours-only={sorted(got_triples - ref_triples)[:5]} "
        f"ref-only={sorted(ref_triples - got_triples)[:5]}"
    )


def test_dictionary_crosses_thresholds(spark, golden):
    result = run_pipeline(_corpus_df(spark, 4))
    sizes = result.dictionary_sizes
    assert sizes["phrases"] >= 4
    assert sizes["unigrams"] >= 4
    assert sizes["verbs"] >= 5

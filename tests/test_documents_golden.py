"""Golden parity on the DRIVER'S OWN documents table (sf0.001): the
Spark pipeline must match the sequential oracle on the exact data the
driver smoke-checks — word-salad text, mixed languages, 31-token
adversarial vocabulary (the kg_triples/kg_ontology driver entries are
rows-only; this test is their value-level gate)."""

from __future__ import annotations

import duckdb
import pytest

from knowledgegraphgenerator_spark.core.stopwords import resolve_stop_words
from knowledgegraphgenerator_spark.core.textnorm import normalize_text
from knowledgegraphgenerator_spark.pipeline import run_pipeline
from tests.ref_impl import pipeline as ref

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def golden():
    rows = duckdb.connect().execute(
        f"SELECT doc_id, text, lang FROM "
        f"read_parquet('{SF_DIR}/documents.parquet') ORDER BY doc_id"
    ).fetchall()
    stops = resolve_stop_words("en", None)
    question_map = {
        doc_id: (text, normalize_text(text, lang))
        for doc_id, text, lang in rows
    }
    ttm = ref.generate_graph(question_map, stops)
    ttm = ref.optimise_graph(ttm, list(question_map.keys()))
    return ttm, ref.derive_triples(ttm)


def test_documents_pipeline_matches_oracle(spark, golden):
    ttm, ref_triples = golden
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text", "lang"
    )
    result = run_pipeline(docs)
    got = {
        r["doc_id"]: (list(r["terms"]), list(r["tags"]))
        for r in result.ontology.collect()
    }
    assert set(got) == set(ttm)
    mismatches = [
        (qid, got[qid], (obj["terms"], obj["tags"]))
        for qid, obj in ttm.items()
        if got[qid] != (obj["terms"], obj["tags"])
    ]
    assert not mismatches, f"first diffs: {mismatches[:3]}"

    got_triples = {
        (r["subj"], r["pred"], r["obj"]) for r in result.triples.collect()
    }
    inter = got_triples & ref_triples
    precision = len(inter) / len(got_triples)
    recall = len(inter) / len(ref_triples)
    assert precision == 1.0 and recall == 1.0, (
        f"P={precision} R={recall} "
        f"ours-only={sorted(got_triples - ref_triples)[:3]} "
        f"ref-only={sorted(ref_triples - got_triples)[:3]}"
    )

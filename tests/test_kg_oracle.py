"""kg_triples / kg_ontology DuckDB oracle vs the sequential reference.

The driver gate runs the Spark queries against these oracles at sf0.01;
this test pins the oracle itself against tests/ref_impl (the literal
sequential re-expression of the reference pipeline) on a bounded slice of
the driver's documents table, so an oracle regression is caught without a
SparkSession. Spark == ref_impl is covered by test_documents_golden; with
oracle == ref_impl here, Spark == oracle follows transitively (and is
checked directly by the driver every round).
"""

from __future__ import annotations

import duckdb
import pytest

from knowledgegraphgenerator_spark.core.stopwords import resolve_stop_words
from knowledgegraphgenerator_spark.core.textnorm import normalize_text
from knowledgegraphgenerator_spark.oracles_kg import (
    kg_ontology_oracle_sql,
    kg_triples_oracle_sql,
)

SF_DIR = "/root/testdata/sf0.001"
N_DOCS = 150  # bounded so the O(Q x dict) sequential oracle stays fast


@pytest.fixture(scope="module")
def ref_and_con():
    from tests.ref_impl.pipeline import (
        derive_triples,
        generate_graph,
        optimise_graph,
    )

    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM"
        f" '{SF_DIR}/documents.parquet'"
        f" WHERE doc_id < {N_DOCS}"
    )
    rows = con.sql(
        "SELECT doc_id, text, lang FROM documents ORDER BY doc_id"
    ).fetchall()
    assert len(rows) > 50
    stops = resolve_stop_words("en", None)
    qmap = {r[0]: (r[1], normalize_text(r[1], r[2])) for r in rows}
    ttm = generate_graph(qmap, stops)
    ttm = optimise_graph(ttm, list(qmap.keys()))
    return ttm, derive_triples(ttm), con


def test_triples_oracle_equals_sequential_reference(ref_and_con):
    _, ref_triples, con = ref_and_con
    got = set(map(tuple, con.sql(kg_triples_oracle_sql()).fetchall()))
    assert got == ref_triples


def test_ontology_oracle_equals_sequential_reference(ref_and_con):
    ttm, _, con = ref_and_con
    expected = {
        k: ("|".join(v["terms"]), "|".join(v["tags"])) for k, v in ttm.items()
    }
    got = {
        r[0]: (r[1], r[2])
        for r in con.sql(kg_ontology_oracle_sql()).fetchall()
    }
    assert got == expected


def test_oracle_handles_fallback_and_empty_docs():
    """Docs below every threshold: terms = [root]; single-content-word
    fallback tag from the raw question; empty docs survive."""
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM (VALUES"
        " (0, 'please describe my billing?', 'en'),"
        " (1, '', 'en'),"
        " (2, 'what is this', 'en')"
        ") t(doc_id, text, lang)"
    )
    rows = con.sql(kg_ontology_oracle_sql()).fetchall()
    got = {r[0]: (r[1], r[2]) for r in rows}
    assert got[0] == ("Auto Ontology", "billing")
    assert got[1] == ("Auto Ontology", "")
    # 'what', 'is', 'this' are all stop words -> zero content words, no tag
    assert got[2] == ("Auto Ontology", "")

    # D2 corpus-scale twin: root-only docs WITHOUT tags are flagged
    # (ontology_analyzer.py:144-158) — doc 0 has a tag, docs 1/2 do not
    from knowledgegraphgenerator_spark.oracles_kg import (
        kg_docs_at_root_oracle_sql,
    )

    at_root = sorted(
        r[0] for r in con.sql(kg_docs_at_root_oracle_sql()).fetchall()
    )
    # the oracle unions the deterministic DOCS_AT_ROOT_SEEDS (round 5:
    # pure-stopword docs that provably land at the bare root, keeping
    # the driver row discriminating at every sf) — they must appear
    # here alongside the corpus's own root-only docs
    from knowledgegraphgenerator_spark.oracles_kg import DOCS_AT_ROOT_SEEDS

    assert at_root == [1, 2] + [i for i, _, _ in DOCS_AT_ROOT_SEEDS]

    # D1 corpus-scale twin: zero-content docs are unflagged at 100
    from knowledgegraphgenerator_spark.oracles_kg import (
        kg_path_coverage_oracle_sql,
    )

    cov = {
        r[0]: (r[1], r[2])
        for r in con.sql(kg_path_coverage_oracle_sql()).fetchall()
    }
    assert cov[1] == (100, 0) and cov[2] == (100, 0)
    # doc 0: content = {'billing'}; 'billing' IS a question unigram -> 100
    assert cov[0] == (100, 0)

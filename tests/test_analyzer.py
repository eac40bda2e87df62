"""Analyzer D1-D3 tests over a constructed export document."""

from __future__ import annotations

import pytest

from knowledgegraphgenerator_spark.operators import analyzer

EXPORT = {
    "faqs": [
        {
            "question": "How do I transfer money with the neft service?",
            "terms": ["neft service", "Auto Ontology"],
            "tags": ["transfer"],
            "alternateQuestions": [],
        },
        {
            "question": "What is the weather in paris today?",  # unreachable
            "terms": ["neft service", "Auto Ontology"],
            "tags": [],
            "alternateQuestions": [
                {"question": "|| hidden alt", "tags": []},
            ],
        },
        {
            "question": "Tagless root question?",  # at root, no tags
            "terms": ["Auto Ontology"],
            "tags": [],
            "alternateQuestions": [],
        },
        {
            "question": "Check my credit card balance",
            "terms": ["**credit card/cc/plastic", "Auto Ontology"],
            "tags": [],
            "alternateQuestions": [],
        },
    ],
    "synonyms": {"neft service": ["national electronic funds transfer"]},
    "kgParams": {},
}


def test_parse_term_syntax():
    # trait split happens FIRST on the whole raw term — anything after
    # ':' (including synonyms) is discarded (ontology_analyzer.py:54)
    _, term_t, syns_t, _ = analyzer.parse_term("plain:trait/ignored")
    assert term_t == "plain" and syns_t == []
    raw, term, syns, usage = analyzer.parse_term(
        "**credit card/cc/plastic:trait", {"credit card": ["charge card"]}
    )
    assert raw == "**credit card"
    assert term == "credit card"
    assert set(syns) == {"cc", "plastic", "charge card"}
    assert usage == "mandatory"
    assert analyzer.parse_term("!!org node")[3] == "organizer"
    assert analyzer.parse_term("plain")[3] == "default"


def test_valid_root():
    name, ok = analyzer.valid_root(EXPORT["faqs"])
    assert ok and name == "Auto Ontology"
    name2, ok2 = analyzer.valid_root(
        [{"terms": ["a", "r1"]}, {"terms": ["b", "r2"]}]
    )
    assert not ok2 and name2 == "Auntology"


def test_nodes_edges(spark):
    nodes, edges, root = analyzer.build_nodes_edges(
        spark, EXPORT["faqs"], EXPORT["synonyms"]
    )
    n = {r["path_str"]: r for r in nodes.collect()}
    assert root == "Auto Ontology"
    assert "Auto Ontology" in n
    assert "Auto Ontology/neft service" in n
    assert n["Auto Ontology/**credit card"]["usage"] == "mandatory"
    assert edges.count() == len(n) - 1  # tree


def test_nodes_edges_unmappedpath(spark):
    """Reference ontology_analyzer.py:88-89: 'unmappedpath' entries (term
    paths with no question) join the tree walk, create has_faq=False
    nodes, and never vote on root validity."""
    unmapped = [{"terms": ["orphan topic", "Auto Ontology"]},
                {"terms": ["deep orphan", "orphan topic", "Auto Ontology"]}]
    nodes, edges, root = analyzer.build_nodes_edges(
        spark, EXPORT["faqs"], EXPORT["synonyms"], unmapped=unmapped
    )
    n = {r["path_str"]: r for r in nodes.collect()}
    assert root == "Auto Ontology"  # unmapped terms did not break the root
    assert n["Auto Ontology/orphan topic"]["has_faq"] is False
    assert n["Auto Ontology/orphan topic/deep orphan"]["has_faq"] is False
    # faq-backed nodes keep has_faq=True
    assert n["Auto Ontology/neft service"]["has_faq"] is True
    assert edges.count() == len(n) - 1  # still a tree
    # root validity is computed over faqs ONLY: an unmapped path with a
    # different last term must not flip the root to 'Auntology'
    _, _, root2 = analyzer.build_nodes_edges(
        spark, EXPORT["faqs"], EXPORT["synonyms"],
        unmapped=[{"terms": ["x", "some other root"]}],
    )
    assert root2 == "Auto Ontology"


def test_unreachable_questions(spark):
    flagged = analyzer.unreachable_questions(
        spark, EXPORT["faqs"], EXPORT["synonyms"]
    )
    rows = flagged.collect()
    qs = {r["question"] for r in rows}
    assert "What is the weather in paris today?" in qs
    assert "How do I transfer money with the neft service?" not in qs
    assert not any(q.startswith("||") for q in qs)


def test_questions_at_root(spark):
    rows = analyzer.questions_at_root(spark, EXPORT["faqs"]).collect()
    assert {r["question"] for r in rows} == {"Tagless root question?"}


def test_run_diagnostics_report(spark, tmp_path):
    path = str(tmp_path / "report.csv")
    resp = analyzer.run_diagnostics(spark, EXPORT, report_csv_path=path)
    assert resp["no_of_errors"] == 1
    assert resp["no_of_suggestions"] == 1
    assert resp["total_no_of_issues"] == 2
    import csv

    with open(path) as f:
        rows = list(csv.reader(f))
    assert rows[0] == ["timestamp", "language", "error_type", "question",
                       "path", "tags"]
    assert any("unreachable_questions" in r for r in rows[1:])


def test_coverage_threshold_boundary(spark):
    # question containing the single path term verbatim -> 100% coverage
    faqs = [{
        "question": "alpha beta gamma",
        "terms": ["alpha beta", "Root"],
        "tags": [],
        "alternateQuestions": [],
    }, {
        "question": "totally different words here",
        "terms": ["alpha beta", "Root"],
        "tags": [],
        "alternateQuestions": [],
    }]
    rows = analyzer.unreachable_questions(spark, faqs).collect()
    qs = {r["question"] for r in rows}
    assert qs == {"totally different words here"}
    pct = {r["question"]: r["coverage_pct"] for r in rows}
    assert pct["totally different words here"] == 0


def test_subpath_utilities():
    assert analyzer.is_subpath([2, 3], [1, 2, 3, 4])
    assert not analyzer.is_subpath([3, 2], [1, 2, 3, 4])
    assert analyzer.is_subpath([1], [1])
    assert analyzer.path_is_not_subset([1, 2], [[3, 4, 5]])
    assert not analyzer.path_is_not_subset([1, 2], [[1, 2, 3]])
    assert not analyzer.path_is_not_subset([1, 2, 3], [[2, 3]])

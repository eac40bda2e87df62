"""FAQ-format golden tests: parsers S5-S7 + export emitter vs the
sequential oracle (interleaved id order, alternate binding, stop-word
override, synonym merge, alt-tag set difference)."""

from __future__ import annotations

import os

import pytest

from knowledgegraphgenerator_spark.core.stopwords import ENGLISH_QUESTION_WORDS
from knowledgegraphgenerator_spark.core.textnorm import normalize_text
from knowledgegraphgenerator_spark.pipeline import run_faq_pipeline
from knowledgegraphgenerator_spark.sources import faq as faq_src
from tests.fixtures import FAQ_ALTERNATES, FAQ_QUESTIONS
from tests.ref_impl import pipeline as ref

FILES = os.path.join(os.path.dirname(__file__), "fixtures", "files")


def _expected_maps(parsed):
    """Build {qid: (raw, norm)} + altq map from canonical parser rows."""
    qmap, altq = {}, {}
    for row in parsed.rows:
        qid, question, norm = row[0], row[1], row[2]
        qmap[qid] = (question, norm)
        if row[6]:  # is_primary
            altq[qid] = []
        else:
            altq[row[7]].append(qid)
    return qmap, altq


def test_csv_parser_ids_and_normalization():
    parsed = faq_src.parse_csv(f"{FILES}/faq.csv")
    assert len(parsed.rows) == len(FAQ_QUESTIONS)
    assert parsed.rows[0][0] == 10001
    assert parsed.rows[0][1] == FAQ_QUESTIONS[0]
    assert parsed.rows[0][2] == normalize_text(FAQ_QUESTIONS[0])
    assert all(r[6] for r in parsed.rows)  # all primary
    assert parsed.rows[0][3] == [("Answer text for question 0.", "basic", "default")]


def test_json_export_parser_interleaved_ids():
    parsed = faq_src.parse_json_export(f"{FILES}/faq_export.json")
    # primary 10001 has one alternate -> alternate gets 10002,
    # next primary gets 10003 (JSONExportParser.py:65-74)
    assert parsed.rows[0][0] == 10001 and parsed.rows[0][6]
    assert parsed.rows[1][0] == 10002 and not parsed.rows[1][6]
    assert parsed.rows[1][7] == 10001
    assert parsed.rows[2][0] == 10003 and parsed.rows[2][6]
    # empty kgParams.stopWords -> built-in defaults
    assert "the" in parsed.stop_words
    assert parsed.synonyms["rtgs"] == ["real time gross settlement"]


def test_json_export_synonym_merge():
    parsed = faq_src.parse_json_export(
        f"{FILES}/faq_export.json", synonyms_csv_path=f"{FILES}/synonyms.csv"
    )
    assert parsed.synonyms["neft service"] == [
        "national electronic funds transfer", "neft",
        "electronic transfer service",
    ]
    assert parsed.synonyms["credit card"] == ["plastic card", "charge card"]
    # defaultdict semantics: empty synonym col still creates the key
    # (JSONExportParser.py:90-99)
    assert parsed.synonyms["mobile app"] == []


def test_csv_export_parser_statefulness_and_stopwords():
    parsed = faq_src.parse_csv_export(f"{FILES}/faq_export.csv")
    qmap, altq = _expected_maps(parsed)
    # alternates bound to most recent primary
    alt_rows = [r for r in parsed.rows if not r[6]]
    assert len(alt_rows) == len(FAQ_ALTERNATES)
    by_question = {r[1]: r for r in parsed.rows}
    for idx, alt_q in FAQ_ALTERNATES:
        primary_row = by_question[FAQ_QUESTIONS[idx]]
        assert by_question[alt_q][7] == primary_row[0]
    # kgParams row stop words + en question words
    assert "between" in parsed.stop_words
    assert ENGLISH_QUESTION_WORDS <= parsed.stop_words


@pytest.mark.parametrize("request_type,path", [
    ("csv", "faq.csv"),
    ("json_export", "faq_export.json"),
    ("csv_export", "faq_export.csv"),
])
def test_faq_pipeline_matches_oracle(spark, tmp_path, request_type, path):
    parser = faq_src.get_input_parser(request_type)
    parsed = parser(f"{FILES}/{path}")
    qmap, altq = _expected_maps(parsed)
    expected_ttm = ref.run_reference_faq(qmap, altq, parsed.stop_words)

    out_json = str(tmp_path / "ao_output.json")
    export_df, result = run_faq_pipeline(
        spark, f"{FILES}/{path}", request_type, output_json_path=out_json
    )

    got = {
        r["doc_id"]: (list(r["terms"]), list(r["tags"]))
        for r in result.ontology.collect()
    }
    for qid, obj in expected_ttm.items():
        assert got[qid][0] == obj["terms"], f"terms qid={qid}"
        assert got[qid][1] == obj["tags"], f"tags qid={qid}"

    # export doc equality (alt tags compared as sets — reference
    # set-difference order is hash-dependent, SURVEY.md Appendix A.6)
    import json

    answers = {
        r[0]: [{"text": a[0], "type": a[1], "channel": a[2]} for a in r[3]]
        for r in parsed.rows
    }
    sub_answers = {
        r[0]: [
            [{"text": a[0], "type": a[1], "channel": a[2]} for a in alt]
            for alt in r[4]
        ]
        for r in parsed.rows
    }
    response_types = {r[0]: r[5] for r in parsed.rows}
    expected_resp = ref.create_response(
        qmap, altq, expected_ttm, answers=answers, sub_answers=sub_answers,
        response_types=response_types, synonyms=parsed.synonyms,
    )
    with open(out_json) as f:
        got_resp = json.load(f)
    assert len(got_resp["faqs"]) == len(expected_resp["faqs"])
    assert got_resp["synonyms"] == expected_resp["synonyms"]
    for g, e in zip(got_resp["faqs"], expected_resp["faqs"]):
        assert g["question"] == e["question"]
        assert g["terms"] == e["terms"]
        assert g["tags"] == e["tags"]
        assert g["answer"] == e["answer"]
        assert g["alternateAnswers"] == e["alternateAnswers"]
        assert (g["responseType"] or "") == (e["responseType"] or "")
        assert len(g["alternateQuestions"]) == len(e["alternateQuestions"])
        for ga, ea in zip(g["alternateQuestions"], e["alternateQuestions"]):
            assert ga["question"] == ea["question"]
            assert ga["terms"] == ea["terms"]
            assert set(ga["tags"]) == set(ea["tags"])
        assert ("dialogRefId" in g) == ("dialogRefId" in e)

    # triple set P/R vs oracle derivation
    altq_edges = [
        (qmap[a][0], qmap[p][0]) for p, alist in altq.items() for a in alist
    ]
    ref_triples = ref.derive_triples(expected_ttm, parsed.synonyms, altq_edges)
    got_triples = {
        (r["subj"], r["pred"], r["obj"]) for r in result.triples.collect()
    }
    assert got_triples == ref_triples

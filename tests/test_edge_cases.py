"""Pipeline edge cases: empty/degenerate corpora must not crash and must
match the sequential oracle's behavior."""

from __future__ import annotations

from knowledgegraphgenerator_spark.config import BOT_NAME
from knowledgegraphgenerator_spark.core.stopwords import get_stop_words
from knowledgegraphgenerator_spark.pipeline import run_pipeline
from tests.ref_impl.pipeline import run_reference_pipeline


def _df(spark, texts, lang="en"):
    rows = [(10001 + i, t, lang) for i, t in enumerate(texts)]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_empty_corpus(spark):
    df = _df(spark, []).limit(0)
    result = run_pipeline(df)
    assert result.ontology.count() == 0
    assert result.triples.count() == 0


def test_below_threshold_corpus(spark):
    """Nothing crosses the frequency thresholds -> every doc gets only the
    root (plus the single-word fallback tag where applicable)."""
    texts = ["alpha beta?", "gamma delta", "epsilon zeta"]
    result = run_pipeline(_df(spark, texts))
    got = {r["doc_id"]: (list(r["terms"]), list(r["tags"]))
           for r in result.ontology.collect()}
    ttm, _ = run_reference_pipeline(texts, get_stop_words("en"))
    for qid, obj in ttm.items():
        assert got[qid] == (obj["terms"], obj["tags"])
    assert all(t == [BOT_NAME] for t, _ in got.values())


def test_all_stopword_docs(spark):
    texts = ["the and of to", "is are was were", "what?"]
    result = run_pipeline(_df(spark, texts))
    got = {r["doc_id"]: (list(r["terms"]), list(r["tags"]))
           for r in result.ontology.collect()}
    ttm, ref_triples = run_reference_pipeline(texts, get_stop_words("en"))
    for qid, obj in ttm.items():
        assert got[qid] == (obj["terms"], obj["tags"])
    got_triples = {(r["subj"], r["pred"], r["obj"])
                   for r in result.triples.collect()}
    assert got_triples == ref_triples


def test_null_and_empty_text(spark):
    rows = [(1, None, "en"), (2, "", "en"), (3, "real question here?", "en")]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    result = run_pipeline(df)
    got = {r["doc_id"]: list(r["terms"]) for r in result.ontology.collect()}
    assert set(got) == {1, 2, 3}
    assert all(ts[-1] == BOT_NAME for ts in got.values())


def test_degenerate_corpus_new_queries(spark, tmp_path):
    """Round-3 queries on a degenerate 2-doc corpus (below every
    threshold, docs too short for shingles): graph/dedup queries return
    EMPTY (not crash — the empty-graph guard in kg_pagerank, empty
    edge-set CC, no shingles), scalar stats still produce rows."""
    from knowledgegraphgenerator_spark.queries import QUERIES

    sf = str(tmp_path)
    rows = [
        (1, "alpha beta", "en", "s", 10),
        (2, "gamma delta", "en", "s", 11),
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string,"
        " n_chars long"
    ).write.parquet(f"{sf}/documents.parquet")

    for name in ("kg_pagerank", "kg_two_hop", "neardup_components",
                 "dup_ngram_fraction"):
        assert QUERIES[name](spark, sf).count() == 0, name
    # runs without error; only fallback tags / root rows exist
    QUERIES["kg_entity_degree"](spark, sf).collect()
    assert QUERIES["doc_length_quantiles"](spark, sf).count() == 1


def test_mixed_language_gate(spark):
    rows = [
        (1, "How do I transfer money?", "en"),
        (2, "C'EST UNE QUESTION!", "fr"),  # lowercased only, no \W strip
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    result = run_pipeline(df)
    norm = {
        r["doc_id"]: r["norm_text"]
        for r in __import__(
            "knowledgegraphgenerator_spark.pipeline", fromlist=["normalize_corpus"]
        ).normalize_corpus(df).collect()
    }
    assert norm[1] == "how do i transfer money "
    assert norm[2] == "c'est une question!"

"""Synthetic web_pages corpus + byte-identical extractor invariant
(BASELINE.json input_hint: 'byte-identical extracted text per url')."""

from __future__ import annotations

from knowledgegraphgenerator_spark.core.html import extract_text
from knowledgegraphgenerator_spark.core.textnorm import normalize_text
from knowledgegraphgenerator_spark.sources.webpages import synthetic_web_pages


def test_corpus_schema_and_determinism(spark):
    df = synthetic_web_pages(spark, 100, n_partitions=3)
    assert [f.name for f in df.schema.fields] == [
        "url", "warc_ts", "html", "text", "lang", "doc_id"
    ]
    a = {r["doc_id"]: (r["url"], r["text"], bytes(r["html"]))
         for r in df.collect()}
    b = {r["doc_id"]: (r["url"], r["text"], bytes(r["html"]))
         for r in synthetic_web_pages(spark, 100, n_partitions=11).collect()}
    assert a == b
    assert len({v[0] for v in a.values()}) == 100  # urls unique


def test_extract_text_byte_identical_per_url(spark):
    """Same html bytes -> same extracted text, across runs and
    partitionings; extracted text contains the embedded question."""
    df = synthetic_web_pages(spark, 50, n_partitions=2)
    rows = df.collect()
    for r in rows:
        t1 = extract_text(bytes(r["html"]))
        t2 = extract_text(bytes(r["html"]))
        assert t1 == t2
        assert r["text"] in t1
        assert "var x=1" not in t1      # script stripped
        assert "Example Bank" not in t1  # footer stripped


def test_extract_text_edge_cases():
    assert extract_text(None) == ""
    assert extract_text(b"") == ""
    assert extract_text(b"plain text no tags") == "plain text no tags"
    assert extract_text("<p>a&amp;b &lt;c&gt; &#8364;</p>".encode()) == "a&b <c> €"
    assert extract_text(b"<div>a<script>x</script>b</div>") == "a\nb" or \
        extract_text(b"<div>a<script>x</script>b</div>") == "a b"


def test_pipeline_over_html_column(spark):
    """extract -> normalize -> full KG run using the html column only."""
    from knowledgegraphgenerator_spark.pipeline import run_pipeline

    df = synthetic_web_pages(spark, 300, n_partitions=4).drop("text")
    result = run_pipeline(df, html_col="html", text_col="text")
    assert result.triples.count() > 0
    assert result.dictionary_sizes["phrases"] >= 1


def test_normalize_over_extracted_is_deterministic(spark):
    df = synthetic_web_pages(spark, 30, n_partitions=2)
    for r in df.collect():
        norm1 = normalize_text(extract_text(bytes(r["html"])), "en")
        norm2 = normalize_text(extract_text(bytes(r["html"])), "en")
        assert norm1 == norm2

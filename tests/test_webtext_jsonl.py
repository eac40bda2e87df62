"""JSONL crawl-extract source: schema, corrupt-line handling, binary
html decode, deterministic ids."""

from __future__ import annotations

import base64

from pyspark.sql import functions as F

from knowledgegraphgenerator_spark.sources.webtext import read_jsonl_corpus

_HTML = b"<html><body><p>hello graph</p></body></html>"


def _write_fixture(tmp_path):
    b64 = base64.b64encode(_HTML).decode()
    lines = [
        '{"url": "https://a.example/x", "warc_ts": "2026-01-02T03:04:05",'
        f' "html_b64": "{b64}", "text": "hello graph", "lang": "en"}}',
        '{"url": "https://b.example/y", "warc_ts": "2026-01-02T03:04:06",'
        ' "html_b64": null, "text": "second doc", "lang": "fr"}',
        # malformed JSON -> dropped by the reader, not job-fatal
        '{"url": "https://c.example/z", "warc_ts": broken',
        # no url -> no deterministic identity -> dropped
        '{"warc_ts": "2026-01-02T03:04:07", "text": "orphan", "lang": "en"}',
    ]
    p = tmp_path / "crawl.jsonl"
    p.write_text("\n".join(lines) + "\n")
    return str(p)


def test_jsonl_corpus_shape_and_decode(spark, tmp_path):
    path = _write_fixture(tmp_path)
    df = read_jsonl_corpus(spark, path)
    assert [f.name for f in df.schema.fields] == [
        "doc_id", "url", "warc_ts", "html", "text", "lang",
    ]
    rows = {r["url"]: r for r in df.collect()}
    assert set(rows) == {"https://a.example/x", "https://b.example/y"}
    a = rows["https://a.example/x"]
    assert bytes(a["html"]) == _HTML
    assert a["warc_ts"].year == 2026 and a["warc_ts"].second == 5
    assert rows["https://b.example/y"]["html"] is None


def test_jsonl_doc_id_deterministic(spark, tmp_path):
    path = _write_fixture(tmp_path)
    ids1 = dict(
        read_jsonl_corpus(spark, path).select("url", "doc_id").collect()
    )
    ids2 = dict(
        read_jsonl_corpus(spark, path)
        .repartition(7)
        .select("url", "doc_id")
        .collect()
    )
    assert ids1 == ids2
    # identical to xxhash64 of the url literal (the published contract)
    expect = dict(
        spark.createDataFrame(
            [(u,) for u in ids1], "url string"
        ).select("url", F.xxhash64("url").alias("h")).collect()
    )
    assert ids1 == expect


def test_jsonl_wide_id_independent_second_hash(spark, tmp_path):
    """wide_id=True appends doc_id2 — an independent second hash so the
    (doc_id, doc_id2) pair is an effectively 128-bit identity at the
    10^12-doc design point (ADVICE r3 #5)."""
    path = _write_fixture(tmp_path)
    df = read_jsonl_corpus(spark, path, wide_id=True)
    assert [f.name for f in df.schema.fields] == [
        "doc_id", "doc_id2", "url", "warc_ts", "html", "text", "lang",
    ]
    rows = df.select("doc_id", "doc_id2").collect()
    assert len(rows) == 2
    # the two hashes never agree (independent families) and both are
    # deterministic across re-reads
    assert all(r["doc_id"] != r["doc_id2"] for r in rows)
    again = read_jsonl_corpus(spark, path, wide_id=True).select(
        "doc_id", "doc_id2"
    ).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))

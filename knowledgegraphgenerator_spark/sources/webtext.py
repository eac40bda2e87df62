"""JSONL web-corpus source (Common-Crawl-extract shape).

Newline-delimited JSON is the interchange format crawl extracts ship in
(one document object per line). This reader lands them in the canonical
web_pages schema (BASELINE.json input_hint):

    (doc_id long, url string, warc_ts timestamp, html binary,
     text string, lang string)

with ``doc_id = xxhash64(url)`` — deterministic at any parallelism, no
global id assignment.

Scale posture:
- EXPLICIT schema: ``spark.read.json`` without one runs a schema-
  inference scan over the whole input before the real read — 2x IO at
  100 TB. The schema here is fixed by the input contract.
- ``mode=DROPMALFORMED``: a trillion-line crawl always contains some
  malformed lines; they must be dropped, not job-fatal, and without
  caching the raw frame (the ``_corrupt_record`` filter pattern
  requires a cache — wrong at corpus scale). Dropped-line counts come
  from the runner's observe-based lineage (input vs output rows).
- ``html`` arrives base64 (JSON cannot carry binary); decoded with
  ``unbase64`` to the binary column the extract stage expects.
- JSONL splits on line boundaries, so byte-range parallelism works with
  the stock text datasource — no custom input format.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

JSONL_SCHEMA = (
    "url string, warc_ts timestamp, html_b64 string, "
    "text string, lang string"
)


def read_jsonl_corpus(spark: SparkSession, path: str) -> DataFrame:
    """Read a JSONL crawl extract into the canonical web_pages shape.

    Rows without a ``url`` are dropped (no stable identity → no
    deterministic doc_id); malformed JSON lines are dropped by the
    reader itself.
    """
    raw = (
        spark.read.schema(JSONL_SCHEMA)
        .option("mode", "DROPMALFORMED")
        .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss")
        .json(path)
    )
    return (
        raw.where(F.col("url").isNotNull())
        .select(
            F.xxhash64("url").alias("doc_id"),
            "url",
            "warc_ts",
            F.unbase64(F.col("html_b64")).alias("html"),
            "text",
            "lang",
        )
    )

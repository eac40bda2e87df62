"""JSONL web-corpus source (Common-Crawl-extract shape).

Newline-delimited JSON is the interchange format crawl extracts ship in
(one document object per line). This reader lands them in the canonical
web_pages schema (BASELINE.json input_hint):

    (doc_id long, url string, warc_ts timestamp, html binary,
     text string, lang string)

with ``doc_id = xxhash64(url)`` — deterministic at any parallelism, no
global id assignment.

Id-collision bound (ADVICE r3 #5): a 64-bit id over n distinct urls
expects ~n²/2⁶⁵ birthday collisions — negligible at the 10⁸-doc
benchmark slice (~3e-4 expected) but ~3e4 at the 10¹²-doc design point,
each silently merging two documents' features under one id. For
corpus-scale ingest pass ``wide_id=True``: ``doc_id`` stays the 64-bit
join/bucket key (cheap shuffles, bucketed layout unchanged) and a second
independent hash ``doc_id2 = xxhash64(url, 0x9E3779B9)`` (the constant
mixed in as a second hashed value) rides
along, so (doc_id, doc_id2) is an effectively 128-bit identity
(expected collisions ~n²/2¹²⁹ ≈ 1e-15 at 10¹² docs). Stages that merge
per-doc state compare both columns; everything keyed only on doc_id is
unaffected.

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


#: second-hash seed for the wide (128-bit) identity; any constant other
#: than xxhash64's default seed (42) gives an independent hash family
WIDE_ID_SEED = 0x9E3779B9


def read_jsonl_corpus(
    spark: SparkSession, path: str, wide_id: bool = False
) -> DataFrame:
    """Read a JSONL crawl extract into the canonical web_pages shape.

    Rows without a ``url`` are dropped (no stable identity → no
    deterministic doc_id); malformed JSON lines are dropped by the
    reader itself. ``wide_id`` appends the independent second hash
    column ``doc_id2`` for 128-bit identity at the 10¹²-doc design
    point (collision bound in the module docstring).
    """
    raw = (
        spark.read.schema(JSONL_SCHEMA)
        .option("mode", "DROPMALFORMED")
        .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss")
        .json(path)
    )
    cols = [
        F.xxhash64("url").alias("doc_id"),
        F.col("url"),
        F.col("warc_ts"),
        F.unbase64(F.col("html_b64")).alias("html"),
        F.col("text"),
        F.col("lang"),
    ]
    if wide_id:
        cols.insert(
            1, F.xxhash64("url", F.lit(WIDE_ID_SEED)).alias("doc_id2")
        )
    return raw.where(F.col("url").isNotNull()).select(*cols)

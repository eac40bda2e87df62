"""Skew-fallback measurements for BENCH/SKEW_FALLBACKS.md (round 5).

Two fixtures per operator:
  * uniform: realistic shingle/key distribution (synthetic web corpus)
  * hot:     one pathological key (a boilerplate shingle / domain) that
             a window plan serializes onto a single task
Each timing is min-of-2 (host slow-phase guard).
"""
import os, sys, time, json
sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
from pyspark.sql import functions as F
from knowledgegraphgenerator_spark.session import get_spark
from knowledgegraphgenerator_spark.sources.webpages import synthetic_web_pages
from knowledgegraphgenerator_spark.operators.curation import (
    remove_duplicate_spans, cap_per_key,
)

spark = get_spark(master="local[32]", shuffle_partitions=32,
                  extra_conf={"spark.driver.memory": "24g"})
spark.sparkContext.setLogLevel("ERROR")

def timed(fn):
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        n = fn()
        best = min(best, time.perf_counter() - t0)
    return round(best, 2), n

results = {}

# ---- remove_duplicate_spans ------------------------------------
N = 200_000
uniform = synthetic_web_pages(spark, n_docs=N, sentences_per_doc=4) \
    .select("doc_id", "text").persist()
uniform.count()
# hot: every doc carries the same 8-token boilerplate -> several
# shingles with N occurrences each
hot = uniform.select(
    "doc_id",
    F.concat(F.col("text"), F.lit(
        " all rights reserved worldwide by the site operator"
    )).alias("text"),
).persist()
hot.count()

for label, df in (("uniform", uniform), ("hot", hot)):
    for variant in ("window", "groupby"):
        sec, n = timed(lambda: remove_duplicate_spans(
            df, "text", "doc_id", variant=variant).count())
        results[f"spans_{label}_{variant}"] = sec
        print(f"spans {label} {variant}: {sec}s ({n} rows)", flush=True)

uniform.unpersist(); hot.unpersist()

# ---- cap_per_key ----------------------------------------------
M = 20_000_000
skew = spark.range(M).select(
    F.col("id").alias("doc_id"),
    F.when(F.col("id") % 4 != 0, F.lit("hot.example.com")).otherwise(
        F.concat(F.lit("d"), (F.col("id") % 5000).cast("string"))
    ).alias("source"),
).persist()
skew.count()  # 15M rows on one key, 5k keys with ~1k rows
for variant in ("window", "salted"):
    sec, n = timed(lambda: cap_per_key(
        skew, "source", "doc_id", 20, variant=variant).count())
    results[f"cap_hot_{variant}"] = sec
    print(f"cap hot {variant}: {sec}s ({n} rows)", flush=True)
skew.unpersist()


# ===== phase 2: pathological-scale fixtures =====
"""Pathological-scale skew fixtures: hot keys big enough that the
window form's single-task serialization is visible on local[32]."""



# spans: 4M docs, every doc is one unique token + the same 8-token
# boilerplate -> 6 shingle values with 4M occurrences EACH; the window
# form puts each in ONE partition (count+row_number over 4M rows per
# task), the groupby form collapses them map-side.
hot = spark.range(4_000_000).select(
    F.col("id").alias("doc_id"),
    F.concat(
        F.concat(F.lit("u"), F.col("id").cast("string")),
        F.lit(" all rights reserved worldwide by the site operator"),
    ).alias("text"),
).persist()
hot.count()
for variant in ("groupby", "window"):
    sec, n = timed(lambda: remove_duplicate_spans(
        hot, "text", "doc_id", variant=variant).count())
    results[f"spans_hot4M_{variant}"] = sec
    print(f"spans hot4M {variant}: {sec}s ({n})", flush=True)
hot.unpersist()

# cap: 80M rows, 75% on ONE domain -> the window sorts a 60M-row
# partition on one task; salted splits it over 32 salts.
M = 80_000_000
skew = spark.range(M).select(
    F.col("id").alias("doc_id"),
    F.when(F.col("id") % 4 != 0, F.lit("hot.example.com")).otherwise(
        F.concat(F.lit("d"), (F.col("id") % 5000).cast("string"))
    ).alias("source"),
).persist()
skew.count()
for variant in ("salted", "window"):
    sec, n = timed(lambda: cap_per_key(
        skew, "source", "doc_id", 20, variant=variant).count())
    results[f"cap_hot60M_{variant}"] = sec
    print(f"cap hot60M {variant}: {sec}s ({n})", flush=True)
skew.unpersist()

print(json.dumps(results))
spark.stop()

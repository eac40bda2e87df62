"""Cluster submission example (north rule: spark-submit --py-files).

    scripts/package.sh
    spark-submit --master yarn --deploy-mode cluster \
        --py-files dist/kg_spark.zip \
        --conf spark.sql.adaptive.enabled=true \
        --conf spark.sql.execution.arrow.pyspark.enabled=true \
        examples/run_kg.py \
        --input s3://bucket/web_pages/ --output s3://bucket/kg/ \
        --resume-root s3://bucket/kg_stages/

The script builds its own SparkSession from the cluster config (no
local-mode assumptions) and runs the resumable pipeline; rerunning after
a failure resumes from the last committed stage. The resume root may be
a CLUSTER filesystem path (s3a://, hdfs://) — stage markers go through
the Hadoop FileSystem API and per-partition lineage counts fall back to
a one-job readback there (plans/runner.py). ``--dedup chain`` runs
crawl-order dedup (exact hash, then MinHash near-dedup) before the
pipeline — the order is structural; see operators/dedup.py:crawl_dedup.
"""

from __future__ import annotations

import argparse

from pyspark.sql import SparkSession


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--resume-root", required=True)
    ap.add_argument("--language", default="en")
    ap.add_argument("--buckets", type=int, default=256)
    ap.add_argument("--linking", default="auto",
                    choices=["auto", "broadcast", "blocked"])
    ap.add_argument("--dedup", default="none",
                    choices=["none", "exact", "chain"])
    args = ap.parse_args()

    spark = (
        SparkSession.builder.appName("kg-construct")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    from knowledgegraphgenerator_spark.operators.triples import write_triples
    from knowledgegraphgenerator_spark.plans.runner import (
        run_resumable_pipeline,
    )

    corpus = spark.read.parquet(args.input)
    if args.dedup != "none":
        from knowledgegraphgenerator_spark.operators.dedup import (
            crawl_dedup,
            exact_dedup,
        )

        corpus = (
            exact_dedup(corpus, "text", "doc_id")
            if args.dedup == "exact"
            else crawl_dedup(corpus, "text", "doc_id")
        )
    triples = run_resumable_pipeline(
        spark, corpus, args.resume_root, args.language,
        linking_strategy=args.linking,
    )
    write_triples(triples, args.output, n_buckets=args.buckets)
    spark.stop()


if __name__ == "__main__":
    main()

"""One scaling-run: full KG pipeline on the synthetic web_pages corpus.

Usage: python BENCH/scaling_job.py --cpus 8 --corpus /tmp/kg_corpus --docs 120000

Prints one JSON line: {"cpus": N, "sec": T, "docs": D, "docs_per_sec": R,
"triples": K, "triples_per_sec": R2}. Timing excludes session startup and
a warmup pass (JVM/Arrow/python-worker spinup), so the number measures the
pipeline, not process bootstrap — the sandbox stand-in for N vs 4N
executors per the BASELINE.json scaling criterion.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from knowledgegraphgenerator_spark.pipeline import run_pipeline  # noqa: E402
from knowledgegraphgenerator_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int, required=True)
    ap.add_argument("--corpus", required=True)
    ap.add_argument("--linking", default="auto",
                    choices=["auto", "broadcast", "blocked"])
    args = ap.parse_args()

    spark = get_spark(
        app_name=f"kg-scaling-{args.cpus}",
        master=f"local[{args.cpus}]",
        shuffle_partitions=max(args.cpus * 2, 16),
    )
    spark.sparkContext.setLogLevel("ERROR")

    corpus = spark.read.parquet(args.corpus)
    n_docs = corpus.count()

    # warmup: a sampled slice REPARTITIONED to the worker count so every
    # python worker + codegen path is hot before the timed run (limit()
    # would collapse to one partition and warm one worker)
    warm = corpus.sample(0.02, seed=1).repartition(args.cpus)
    run_pipeline(warm, text_col="text", id_col="doc_id",
                 linking=args.linking).triples.count()

    t0 = time.perf_counter()
    result = run_pipeline(corpus, text_col="text", id_col="doc_id",
                          linking=args.linking)
    n_triples = result.triples.count()
    sec = time.perf_counter() - t0

    print(
        json.dumps(
            {
                "cpus": args.cpus,
                "linking": args.linking,
                "sec": round(sec, 3),
                "docs": n_docs,
                "docs_per_sec": round(n_docs / sec, 1),
                "triples": n_triples,
                "triples_per_sec": round(n_triples / sec, 1),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()

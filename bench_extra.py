"""Focused per-query benchmark + plan capture (guide §1.4/§1.5).

NOT the driver-timed bench (bench.py is frozen for measurement) — this
is the optimization-round instrument: time any subset of declared
queries at any sf dir with the noop sink, optionally dumping
``explain("formatted")`` to a plans dir, using the same session config
as bench.py so numbers are comparable.

Usage:
  python bench_extra.py --sf-dir /root/testdata/sf1.0 \
      --queries neardup_components dedup_chain --repeats 2 \
      --plans-dir plans/r06 --plans-suffix _before
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from knowledgegraphgenerator_spark.queries import BENCH_EXTRA, QUERIES  # noqa: E402
from knowledgegraphgenerator_spark.session import get_spark  # noqa: E402

ALL = {**QUERIES, **BENCH_EXTRA}


def _run(df) -> None:
    try:
        df.write.format("noop").mode("overwrite").save()
    except Exception:
        df.count()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--queries", nargs="+", required=True)
    ap.add_argument("--repeats", type=int, default=2)
    ap.add_argument("--plans-dir", default=None)
    ap.add_argument("--plans-suffix", default="")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name=f"kg-bench-extra-{cpus}",
        master=f"local[{cpus}]",
        shuffle_partitions=max(8, int(cpus)),
        extra_conf={
            "spark.driver.memory": os.environ.get(
                "SPARK_DRIVER_MEMORY", "24g"
            )
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    # warmup: JVM + Arrow + python workers + parquet reader
    QUERIES["kg_triples"](spark, "/root/testdata/sf0.001").count()

    results: dict[str, dict] = {}
    for name in args.queries:
        fn = ALL[name]
        if args.plans_dir:
            os.makedirs(args.plans_dir, exist_ok=True)
            df = fn(spark, args.sf_dir)
            txt = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
            with open(
                os.path.join(
                    args.plans_dir, f"{name}{args.plans_suffix}.txt"
                ),
                "w",
            ) as f:
                f.write(txt)
        samples = []
        for _ in range(args.repeats):
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            t0 = time.perf_counter()
            _run(fn(spark, args.sf_dir))
            samples.append(round(time.perf_counter() - t0, 3))
            spark.sparkContext.setJobDescription(None)
        results[name] = {
            "min": min(samples) if samples else None,
            "samples": samples,
        }
        print(f"{name}: {results[name]}", flush=True)

    payload = {
        "sf_dir": args.sf_dir,
        "cpus": int(cpus),
        "results": results,
    }
    if args.out:
        with open(args.out, "w") as f:
            json.dump(payload, f, indent=1)
            f.write("\n")
    print(json.dumps(payload))
    spark.stop()


if __name__ == "__main__":
    main()

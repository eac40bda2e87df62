"""Scaling-efficiency harness: same job, same input, local[8] vs local[32].

Sandbox evidence for the BASELINE.json two-cluster-size criterion
(N -> 4N executors, efficiency >= 0.8): generates the deterministic
synthetic web_pages corpus once, runs BENCH/scaling_job.py at both
parallelism levels in fresh subprocesses (fresh JVMs — no warm-cache
bleed), and writes BENCH/BASELINE.md with throughput at both levels and
efficiency = (T_8 / T_32) / 4.

Usage: python BENCH/run_scaling.py [--docs 120000] [--low 8 --high 32]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def generate_corpus(path: str, n_docs: int, sentences: int = 4) -> None:
    from knowledgegraphgenerator_spark.session import get_spark
    from knowledgegraphgenerator_spark.sources.webpages import synthetic_web_pages

    spark = get_spark(app_name="kg-corpusgen", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")
    df = synthetic_web_pages(spark, n_docs, n_partitions=128,
                             sentences_per_doc=sentences)
    df.select("doc_id", "url", "warc_ts", "text", "lang").write.mode(
        "overwrite"
    ).parquet(path)
    spark.stop()


def run_once(cpus: int, corpus: str, linking: str = "auto") -> dict:
    """One fresh-JVM run."""
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "BENCH", "scaling_job.py"),
         "--cpus", str(cpus), "--corpus", corpus, "--linking", linking],
        capture_output=True, text=True, check=True,
    )
    line = [l for l in out.stdout.strip().splitlines()
            if l.startswith("{")][-1]
    return json.loads(line)


def _median(xs: list[float]) -> float:
    s = sorted(xs)
    n = len(s)
    return s[n // 2] if n % 2 else (s[n // 2 - 1] + s[n // 2]) / 2


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=400_000)
    ap.add_argument("--sentences", type=int, default=4)
    ap.add_argument("--low", type=int, default=8)
    ap.add_argument("--high", type=int, default=32)
    ap.add_argument("--corpus", default=None)
    ap.add_argument("--repeats", type=int, default=2)
    ap.add_argument("--linking", default="auto")
    ap.add_argument("--out", default="SCALING_RUN.md")
    ap.add_argument("--order", choices=["interleaved", "blocked"],
                    default="blocked")
    ap.add_argument("--cooldown", type=int, default=60,
                    help="idle seconds between runs")
    args = ap.parse_args()
    if args.corpus is None:
        args.corpus = (
            f"/tmp/kg_scaling_corpus_{args.docs}x{args.sentences}.parquet"
        )

    if not os.path.exists(args.corpus):
        generate_corpus(args.corpus, args.docs, args.sentences)

    # Two orderings, two failure modes (both measured, BENCH/BASELINE.md):
    #  - interleaved (lo, hi, lo, hi, ...) samples co-tenant noise evenly
    #    across levels (round-2 protocol), but on a host that throttles
    #    after sustained load, each 3-minute lo run poisons the hi run
    #    that follows it (measured: hi 49.7s rested vs 81.7s immediately
    #    after a lo run vs 60.3s after lo + 120s idle — while lo itself
    #    is insensitive, ~177s under every condition, because a 2-core
    #    job never hits the throttle). On a real cluster N and 4N are
    #    DIFFERENT machines: cross-run poisoning cannot exist there, so
    #    measuring through it would be an artifact, not honesty.
    #  - blocked (default): the throttle-sensitive hi block runs first on
    #    a rested box (hi-after-hi measured clean: 53.5s), then the
    #    throttle-immune lo block; a cooldown separates consecutive runs.
    #    Co-tenant spikes are visible as outlier rows in the raw table.
    runs: dict[int, list[dict]] = {args.low: [], args.high: []}
    pair_effs: list[float] = []
    ideal = args.high / args.low
    if args.order == "interleaved":
        for i in range(args.repeats):
            lo_i = run_once(args.low, args.corpus, args.linking)
            time.sleep(args.cooldown)
            hi_i = run_once(args.high, args.corpus, args.linking)
            time.sleep(args.cooldown)
            runs[args.low].append(lo_i)
            runs[args.high].append(hi_i)
            pair_effs.append((lo_i["sec"] / hi_i["sec"]) / ideal)
            print(json.dumps({"round": i, "lo_sec": lo_i["sec"],
                              "hi_sec": hi_i["sec"],
                              "pair_eff": round(pair_effs[-1], 3)}))
    else:
        for i in range(args.repeats):
            hi_i = run_once(args.high, args.corpus, args.linking)
            runs[args.high].append(hi_i)
            print(json.dumps({"hi_run": i, "hi_sec": hi_i["sec"]}))
            time.sleep(args.cooldown)
        for i in range(args.repeats):
            lo_i = run_once(args.low, args.corpus, args.linking)
            runs[args.low].append(lo_i)
            print(json.dumps({"lo_run": i, "lo_sec": lo_i["sec"]}))
            time.sleep(args.cooldown)
        pair_effs = [
            (runs[args.low][i]["sec"] / runs[args.high][i]["sec"]) / ideal
            for i in range(args.repeats)
        ]

    lo_secs = [r["sec"] for r in runs[args.low]]
    hi_secs = [r["sec"] for r in runs[args.high]]
    lo, hi = (min(runs[args.low], key=lambda r: r["sec"]),
              min(runs[args.high], key=lambda r: r["sec"]))
    eff_best = (lo["sec"] / hi["sec"]) / ideal
    eff_median = (_median(lo_secs) / _median(hi_secs)) / ideal
    eff_pair_median = _median(pair_effs)

    # In blocked order the rows are not temporal pairs — print the raw
    # times but no per-row ratio (median-of-times is the statistic).
    if args.order == "interleaved":
        rows = "\n".join(
            f"| {i} | {runs[args.low][i]['sec']} |"
            f" {runs[args.high][i]['sec']} | {pair_effs[i]:.3f} |"
            for i in range(args.repeats)
        )
    else:
        rows = "\n".join(
            f"| {i} | {runs[args.low][i]['sec']} |"
            f" {runs[args.high][i]['sec']} | — |"
            for i in range(args.repeats)
        )
    order_note = (
        "levels interleaved (lo, hi, lo, hi, ...) so co-tenant noise "
        "hits both evenly"
        if args.order == "interleaved"
        else f"BLOCKED order (all local[{args.high}] runs first on a "
        f"rested box, then all local[{args.low}]; {args.cooldown}s "
        "cooldown between runs) — the host throttles sustained load and "
        "a lo run poisons a following hi run (~+60% wall), an artifact "
        "that cannot exist between two real separate clusters; see "
        "BENCH/BASELINE.md 'cross-run poisoning'"
    )
    pair_lines = (
        f"- efficiency, median of per-pair ratios: "
        f"**{eff_pair_median:.3f}**\n"
        f"- efficiency, best-of-{args.repeats}: **{eff_best:.3f}**\n"
        if args.order == "interleaved"
        else ""
    )
    md = f"""# BENCH/SCALING_RUN — raw scaling evidence

{args.order.capitalize()} {args.repeats}-repeat run (linking={args.linking}) of the full KG construction
pipeline (normalize → dictionary → link → optimise → triples) on the
deterministic synthetic web_pages corpus ({lo['docs']:,} docs, seed=42),
the sandbox stand-in for N vs 4N executors (BASELINE.json north_rule).
Fresh JVM per run; warmup pass excluded from timing; {order_note}.

| row | local[{args.low}] sec | local[{args.high}] sec | row efficiency |
|---|---|---|---|
{rows}

- ideal speedup {args.low}→{args.high}: {ideal:.0f}x
- efficiency, median-of-times: **{eff_median:.3f}** (criterion: >= 0.8)
{pair_lines}- best docs/sec: local[{args.low}] {lo['docs_per_sec']:,} → local[{args.high}] {hi['docs_per_sec']:,}
- triples emitted: {hi['triples']:,}

Generated by `python BENCH/run_scaling.py --docs {args.docs} --low {args.low} --high {args.high} --repeats {args.repeats} --order {args.order} --cooldown {args.cooldown}` on {time.strftime('%Y-%m-%d')}.
"""
    # raw harness output; BENCH/BASELINE.md is the curated evidence doc
    with open(os.path.join(REPO, "BENCH", args.out), "w") as f:
        f.write(md)
    print(md)


if __name__ == "__main__":
    main()

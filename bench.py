"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR.

Output contract (VERDICT r4 "What's wrong" #1 — the r4 driver artifact
had ``parsed: null`` because the single JSON line, with its embedded
prose basis, overflowed the driver's output-tail capture window and got
truncated mid-JSON):

  1. the FULL payload (queries map + big_point + prose basis) is
     WRITTEN to $SPARK_GRAFT_BENCH_OUT (default
     BENCH/BENCH_LOCAL_latest.json next to this file) — the durable
     machine-readable artifact;
  2. the full payload is also printed FIRST, before spark.stop(), so
     even a truncated capture contains its head;
  3. the LAST line printed is ONE COMPACT JSON line (prose basis
     replaced by a pointer to the file) small enough to fit a tail
     capture window — this is the line a driver should parse.

Timing protocol: a small warmup run (sf0.001 flagship) first so JVM/
Arrow/Python-worker startup is not attributed to the first timed query;
each query is then executed with a noop-style full materialization
(write to noop sink when available, else count). Sub-2s queries report
median-of-3; larger ones min-of-2; the 10^6-doc big point is min-of-2
per section as well (VERDICT r4 #5).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from knowledgegraphgenerator_spark.queries import BENCH_EXTRA, QUERIES  # noqa: E402
from knowledgegraphgenerator_spark.session import get_spark  # noqa: E402

ALL = {**QUERIES, **BENCH_EXTRA}

# kg_triples_blocked is driver-gated for correctness (same oracle as
# kg_triples) but NOT timed here: token-block linking is the
# dictionary-beyond-broadcast strategy, and the driver corpus's 31-token
# vocabulary is its degenerate regime (every lead pair matches ~30
# dictionary trigrams -> candidate blow-up the auto threshold exists to
# avoid). Timing it at sf0.1 would benchmark a strategy the engine would
# never pick at this dictionary size.
HEADLINE = [
    "kg_triples",
    "term_count_threshold",
    "bigram_count",
    "substring_dedup",
    "doc_terms_ranked",
    "path_edges",
    "minhash_signatures",
    "lsh_candidate_pairs",
    "jaccard_pairs",
    "simhash16",
    # real sketch operators (xxhash64, no dense-id parity window) — these
    # are the shapes a 100 TB run uses; the dense-id twins above exist for
    # DuckDB value parity (VERDICT r1 'What's wrong' #5)
    "neardup_pairs_scale",
    # near-dup clusters (CC over the verified pairs) + the cross-doc
    # duplicated-span diagnostic (round 3); the KG-consumption queries
    # (kg_entity_degree/kg_two_hop) are NOT timed — they re-run the
    # whole pipeline, which kg_triples already times
    "neardup_components",
    "dup_ngram_fraction",
    # round 4: C4-style duplicated-span REMOVAL (the drop twin of the
    # diagnostic above) + the one-operator crawl-order dedup chain
    "dup_span_removal",
    # round 5: the hot-shingle groupby fallback timed alongside its
    # window default so the skew variant's cost is tracked per round
    "dup_span_removal_hot",
    "dedup_chain",
    "minhash_scale",
    "simhash64_scale",
    "winnow_scale",
    "embedding_topk",
    "embedding_topk_ivf",
    "winnow_fingerprint",
    "tfidf_top_terms",
    "rake_keywords",
    "term_cooccurrence",
    "salted_term_stats",
    "lang_id_heuristic",
    "dedup_exact",
    "quality_score",
    "doc_length_quantiles",
    "quantiles_scale",
    # curation ops (round 3): PII redaction, Gopher-style repetition
    # cuts, token-budget chunking — all zero-shuffle narrow plans
    "pii_scrub",
    "repetition_signals",
    "chunk_by_tokens",
    # round 5: eval-benchmark decontamination (broadcast membership
    # probe) + uniform-mixture rebalance (rate derivation + MINSTD keep)
    "benchmark_overlap",
    "domain_mixture_rebalance",
    "training_shards",
    # round 5 (late): recrawl collapse (canonicalize -> one combinable
    # max-over-struct groupBy(url)), retention-policy dedup (the
    # neardup chain -> keep best-quality member per cluster),
    # incremental-crawl snapshot diff, and web link-graph construction
    "latest_crawl",
    "neardup_keep_best",
    "crawl_delta",
    "host_link_graph",
    "host_pagerank",
    # round 5 (final): BM25 retrieval over the token stream, integer
    # HITS on the host graph, per-host anchor-text surface forms, and
    # the BPE merge-pair statistic (dictionary-sized agg + top-k)
    "bm25_topk",
    # the store-then-serve twin: its timing INCLUDES writing the
    # bucketed postings/doclen catalog tables (store cost is the point)
    "bm25_served",
    # append-vs-rebuild maintenance: build store from half the corpus,
    # append the other half, serve — times the incremental index loop
    "bm25_incremental",
    "host_hits",
    "anchor_text_profile",
    "bpe_merge_pairs",
    # post-round-5: CCNet bigram-LM quality scoring (one bigram-key
    # shuffle join), RefinedWeb in-doc line dedup (zero-shuffle narrow
    # map), and HITS served off the bucketBy(src) edge store (timing
    # includes writing the store, like bm25_served)
    "lm_doc_score",
    "lm_heldout_score",
    "lm_ppl_buckets",
    "line_dedup",
    "host_hits_served",
    "pricing_summary",
    "top_orders_per_cust",
    "sessionize",
    "hourly_event_counts",
]


def _run(df) -> int:
    """Materialize fully; returns row count."""
    try:
        df.write.format("noop").mode("overwrite").save()
        return -1
    except Exception:
        return df.count()


def _host_probe() -> dict:
    """Spark-free fixed-work probe (BENCH/cpu_probe.py's integer loop
    at 8 concurrent workers, one repeat, ~4s): the absolute per-worker
    wall is a round-over-round comparable measure of host phase. Read
    suite deltas against it before blaming code — the box shows
    multi-minute slow phases up to ~2x wall on identical work
    (BENCH/BASELINE.md 'host phase noise'). Taken at both ends of the
    run because phases drift within a single bench."""
    import multiprocessing as mp

    from BENCH.cpu_probe import _burn, _median

    with mp.Pool(8) as pool:
        walls = pool.map(_burn, [20_000_000] * 8)
    return {"w8_wall_sec": round(_median(walls), 3), "work": 20_000_000}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark(
        app_name=f"kg-bench-{cpus}",
        master=f"local[{cpus}]",
        shuffle_partitions=max(8, int(cpus)),
        # the 10^6-doc big point at 32 threads needs headroom past the
        # 8g default (observed GCLocker allocation-retry death at 8g on
        # a co-tenant phase); the box has 128 GiB
        extra_conf={
            "spark.driver.memory": os.environ.get(
                "SPARK_DRIVER_MEMORY", "24g"
            )
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    probe_start = _host_probe()

    # warmup: JVM + Arrow + python workers + parquet reader
    QUERIES["kg_triples"](spark, "/root/testdata/sf0.001").count()

    timings: dict[str, float] = {}
    rows: dict[str, int] = {}
    for name in HEADLINE:
        t0 = time.perf_counter()
        n = _run(ALL[name](spark, sf_dir))
        first = time.perf_counter() - t0
        rows[name] = n
        # sub-2s queries are scheduler-latency-bound and noisy on a
        # co-tenant box: report the median of 3 runs for those.
        # Larger queries get a second run and the MIN: the host has
        # multi-minute slow phases (up to 2x wall on identical work —
        # BENCH/BASELINE.md "host phase noise"), and min-of-2 halves
        # the odds a phase is reported as a code regression.
        if first < 2.0:
            samples = [first]
            for _ in range(2):
                t0 = time.perf_counter()
                _run(ALL[name](spark, sf_dir))
                samples.append(time.perf_counter() - t0)
            samples.sort()
            timings[name] = round(samples[1], 3)
        else:
            t0 = time.perf_counter()
            _run(ALL[name](spark, sf_dir))
            second = time.perf_counter() - t0
            timings[name] = round(min(first, second), 3)

    # throughput on the flagship: docs/sec and triples/sec
    import pyspark.sql.functions as F  # noqa: N812

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_docs = docs.count()
    t0 = time.perf_counter()
    triples_df = QUERIES["kg_triples"](spark, sf_dir)
    n_triples = triples_df.count()
    kg_sec = time.perf_counter() - t0
    _ = F

    # ---- larger corpus point (round 4, VERDICT r3 #7): the per-query
    # timings above run at sf0.1 (5,000 docs) where AQE stage-scheduling
    # latency dominates; this one row times the flagship chain
    # (kg_triples pipeline, then the near-dedup sweep) on a ~10^6-doc
    # deterministic synthetic web corpus so round-over-round deltas
    # reflect throughput, not the latency floor. Same generator + seed
    # as the scaling runs (sources/webpages.synthetic_web_pages).
    big: dict = {}
    big_docs = int(os.environ.get("SPARK_GRAFT_BIGDOCS", "1000000"))
    if big_docs > 0:
        from knowledgegraphgenerator_spark.operators.dedup import near_dedup
        from knowledgegraphgenerator_spark.pipeline import run_pipeline
        from knowledgegraphgenerator_spark.sources.webpages import (
            synthetic_web_pages,
        )

        big_path = f"/tmp/kg_bigpoint_corpus_{big_docs}x4.parquet"
        if not os.path.exists(big_path):
            synthetic_web_pages(
                spark, n_docs=big_docs, sentences_per_doc=4
            ).write.mode("overwrite").parquet(big_path)
        corpus = spark.read.parquet(big_path)
        # min-of-2 on every big-point section (VERDICT r4 #5): the big
        # point is the headline round-over-round metric, so it gets the
        # same host-slow-phase guard as the suite's large queries
        big_kg_sec = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            big_result = run_pipeline(
                corpus, text_col="text", id_col="doc_id"
            )
            big_triples = big_result.triples.count()
            big_kg_sec = min(big_kg_sec, time.perf_counter() - t0)
            big_result.close()
        # dedup point, textbook crawl order: EXACT dedup first (this
        # corpus is ~94% exact clones — a heavy-crawl regime; hash
        # groupBy collapses clone families in one shuffle), THEN MinHash
        # near-dedup over the survivors with the steep LSH S-curve
        # (k=32, rows_per_band=4 -> band-collision prob ~1.5% at J=0.25
        # vs ~40% for 2-row bands). Running fuzzy dedup BEFORE exact on
        # a clone-saturated corpus is the known anti-pattern: every
        # clone family is a quadratic candidate clique (measured here:
        # >60 GB shuffle spill at 400k docs; after exact dedup the same
        # sweep is seconds) — C4/RefinedWeb order exists for a reason.
        from knowledgegraphgenerator_spark.operators.dedup import (
            exact_dedup,
        )

        big_exact_sec = float("inf")
        uniq = None
        for _ in range(2):
            if uniq is not None:
                uniq.unpersist()
            t0 = time.perf_counter()
            uniq = exact_dedup(
                corpus.select("doc_id", "text"), "text", "doc_id"
            ).persist()
            big_exact_kept = uniq.count()
            big_exact_sec = min(big_exact_sec, time.perf_counter() - t0)
        big_nd_sec = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            big_kept = near_dedup(
                uniq, "text", "doc_id", k=32, rows_per_band=4
            ).count()
            big_nd_sec = min(big_nd_sec, time.perf_counter() - t0)
        uniq.unpersist()
        # decontamination at corpus scale (round 5): benchmark = the
        # 8-gram shingles of a ~1/1009 doc carve-out (broadcast-sized,
        # like a real eval suite; 8-grams for specificity — GPT-3-style
        # long-n-gram overlap, so only genuine clones of carved docs
        # trip the threshold, not vocabulary-level 3-gram noise); timed
        # as the full drop filter over all 10^6 docs — the broadcast
        # membership probe + anti-join shape that never shuffles the
        # corpus.
        from knowledgegraphgenerator_spark.operators.curation import (
            drop_contaminated,
        )
        from knowledgegraphgenerator_spark.operators.dedup import (
            token_shingles,
        )
        import pyspark.sql.functions as _F

        bench_sh = token_shingles(
            corpus.where(_F.pmod(_F.col("doc_id"), _F.lit(1009)) == 0)
            .select("doc_id", "text"),
            "text", "doc_id", 8,
        ).select("shingle").distinct().persist()
        n_bench = bench_sh.count()
        big_decon_sec = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            big_decon_kept = drop_contaminated(
                corpus.select("doc_id", "text"), bench_sh, k=8
            ).count()
            big_decon_sec = min(big_decon_sec, time.perf_counter() - t0)
        bench_sh.unpersist()
        big = {
            "docs": big_docs,
            "kg_sec": round(big_kg_sec, 3),
            "kg_docs_per_sec": round(big_docs / big_kg_sec, 1),
            "kg_triples": big_triples,
            "exact_dedup_sec": round(big_exact_sec, 3),
            "exact_dedup_docs_per_sec": round(
                big_docs / big_exact_sec, 1
            ),
            "exact_kept": big_exact_kept,
            "neardup_sec": round(big_nd_sec, 3),
            "neardup_input_docs": big_exact_kept,
            "neardup_kept": big_kept,
            "decon_bench_shingles": n_bench,
            "decon_sec": round(big_decon_sec, 3),
            "decon_docs_per_sec": round(big_docs / big_decon_sec, 1),
            "decon_kept": big_decon_kept,
            "basis": (
                "min-of-2 per section (kg pipeline / exact dedup / "
                "near-dedup sweep — host slow-phase guard, r5), "
                "deterministic synthetic_web_pages(seed fixed) corpus, "
                "same session/cpus as the suite; dedup chain = exact "
                "(full corpus) then near-dedup k=32/rows_per_band=4 "
                "over the exact survivors (~94% exact-clone corpus); "
                "decon drop-rate is corpus-specific (exact clones of "
                "the 1/1009 carve-out share ALL 8-grams, so the "
                "clone-saturated corpus drops almost everything) — the "
                "metric is the filter's throughput shape: broadcast "
                "membership probe + anti-join, corpus never shuffled"
            ),
        }

    # ---- multimodal decode-plumbing point (round 5, TODO r4 'possible
    # depth'): times the byte-budget-re-chunked mapInPandas path on
    # binary payloads synthesized JVM-side from the sf corpus (payload =
    # text repeated 50x cast to binary, ~100 KB/doc at sf0.1 — large
    # enough that the 64 MB batch budget actually re-chunks). The codec
    # is the disclosed deterministic fake; what this measures is the
    # Arrow transfer + re-chunk + per-batch Python cost that a real
    # decoder would ride.
    mm_docs = docs.select(
        "doc_id",
        F.expr("cast(repeat(text, 50) as binary)").alias("payload"),
    )
    mm_bytes = mm_docs.agg(
        F.sum(F.length("payload")).alias("b")
    ).first()["b"]
    from knowledgegraphgenerator_spark.operators.multimodal import (
        decode_and_featurize,
    )

    mm_sec = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        mm_rows = decode_and_featurize(
            mm_docs, deterministic_fake=True
        ).count()
        mm_sec = min(mm_sec, time.perf_counter() - t0)
    multimodal = {
        "docs": mm_rows,
        "payload_bytes": int(mm_bytes),
        "decode_sec": round(mm_sec, 3),
        "payload_mb_per_sec": round(mm_bytes / mm_sec / (1 << 20), 1),
        "basis": (
            "min-of-2; deterministic-fake codec (disclosed stub) over "
            "byte-budget-re-chunked mapInPandas; payload = sf text "
            "repeated 50x as binary"
        ),
    }

    total = round(sum(timings.values()), 3)
    core = {
        "metric": "kg_construct_suite_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "cpus": int(cpus),
        "docs": n_docs,
        "triples": n_triples,
        "docs_per_sec": round(n_docs / kg_sec, 1),
        "triples_per_sec": round(n_triples / kg_sec, 1),
        "big_point": big,
        "multimodal": multimodal,
        # host-phase context: fixed-work per-worker wall at run start
        # and end — compare THESE across rounds before reading a suite
        # delta as a code change (BENCH/BASELINE.md 'host phase noise')
        "host_probe": {"start": probe_start, "end": _host_probe()},
    }
    # headline basis, pinned so round-over-round numbers are comparable
    # without forensics (VERDICT r2 'What's wrong' #4); lives in the
    # FULL payload only — embedding it in the final line is what
    # overflowed the r4 driver's tail-capture window (VERDICT r4 #1)
    full = dict(core)
    full["basis"] = {
        "value": "sum of per-query timings below",
        "docs_per_sec": (
            "n_docs / wall of ONE standalone kg_triples pipeline run "
            "(count action) at sf_dir, timed after the suite"
        ),
        "protocol": (
            "one sf0.001 warmup; queries <2s report median-of-3, "
            "others min-of-2 (host slow-phase guard, r3); big point "
            "min-of-2 per section (r5); host_probe = fixed-work "
            "per-worker wall at 8 procs taken at run start+end — "
            "normalize suite deltas by it across rounds (r5)"
        ),
        "semantics_rev": (
            "r2 extraction semantics (reference-verbatim stop sets + "
            "Treebank splits); triple counts comparable to BENCH_r02+"
        ),
    }
    out_path = os.environ.get(
        "SPARK_GRAFT_BENCH_OUT",
        os.path.join(
            os.path.dirname(os.path.abspath(__file__)),
            "BENCH", "BENCH_LOCAL_latest.json",
        ),
    )
    artifact_written = True
    try:
        with open(out_path, "w") as f:
            json.dump(full, f, indent=1)
            f.write("\n")
    except OSError:
        # read-only checkout: stdout still carries both payloads; the
        # compact line must NOT point at a file that was never written
        # (it could be stale from a previous round)
        artifact_written = False
    # full payload FIRST (head survives even a truncated capture) ...
    print(json.dumps(full), flush=True)
    # ... then stop (JVM GC/unified-logging lines land on stdout here
    # and must not trail the final line) ...
    spark.stop()
    # ... and the LAST line is the compact parse target
    compact = dict(core)
    compact["big_point"] = {k: v for k, v in big.items() if k != "basis"}
    # strip EVERY embedded prose basis, not just big_point's — the
    # compact line exists because prose pushed r4's final line past the
    # driver's tail-capture window (parsed: null)
    if isinstance(compact.get("multimodal"), dict):
        compact["multimodal"] = {
            k: v for k, v in compact["multimodal"].items() if k != "basis"
        }
    compact["basis"] = (
        f"see {os.path.basename(out_path)}"
        if artifact_written
        else "see full payload line above (artifact write failed)"
    )
    print(json.dumps(compact))


if __name__ == "__main__":
    main()

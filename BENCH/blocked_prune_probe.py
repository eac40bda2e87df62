"""Shuffle-diet probe for the blocked-linking doc-key prune
(VERDICT r2 'Next round' #4).

Measures, on the same deterministic 400k-doc synthetic corpus the scaling
runs use:
  * exploded doc block keys BEFORE the prune (what r2 shuffled into the
    dictionary equi-join);
  * doc block keys AFTER the broadcast xxhash64 semi-join prune (what r3
    shuffles);
  * end-to-end blocked-pipeline wall time with the prune on vs off,
    and the triple counts of both (must be identical).

Writes BENCH/BLOCKED_PRUNE.md. Usage:
  python BENCH/blocked_prune_probe.py [--docs 400000] [--cpus 32]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=400_000)
    ap.add_argument("--sentences", type=int, default=4)
    ap.add_argument("--cpus", type=int, default=32)
    args = ap.parse_args()

    from BENCH.run_scaling import generate_corpus
    from knowledgegraphgenerator_spark.core.stopwords import resolve_stop_words
    from knowledgegraphgenerator_spark.functions.udfs import match_tokens_udf
    from knowledgegraphgenerator_spark.operators import linking, phrases
    from knowledgegraphgenerator_spark.pipeline import (
        normalize_corpus,
        run_pipeline,
    )
    from knowledgegraphgenerator_spark.session import get_spark

    import pyspark.sql.functions as F

    corpus_path = (
        f"/tmp/kg_scaling_corpus_{args.docs}x{args.sentences}.parquet"
    )
    if not os.path.exists(corpus_path):
        generate_corpus(corpus_path, args.docs, args.sentences)

    spark = get_spark(
        app_name="kg-prune-probe",
        master=f"local[{args.cpus}]",
        shuffle_partitions=max(args.cpus * 2, 16),
    )
    spark.sparkContext.setLogLevel("ERROR")
    corpus = spark.read.parquet(corpus_path)

    # ---- key-count measurement (exactly the operator's key builder) ----
    stops = resolve_stop_words("en", None)
    normalized = normalize_corpus(corpus).persist()
    features = phrases.extract_doc_features(
        normalized, stops, id_col="doc_id", text_col="norm_text"
    )
    frames = phrases.term_counts(features)
    frames["phrases"] = phrases.dedup_equal_count_phrases(frames["phrases"])

    docs = normalized.select(
        "doc_id", match_tokens_udf(F.col("norm_text")).alias("ltoks")
    )
    doc_keys = linking.doc_block_keys(docs).persist()
    total_keys = doc_keys.count()

    dict_df = linking._dictionary_df(frames)
    n_dict = dict_df.count()
    key_hashes = dict_df.select(
        F.xxhash64("block_key").alias("_kh")
    ).distinct()
    n_dict_keys = key_hashes.count()
    pruned = doc_keys.withColumn("_kh", F.xxhash64("block_key")).join(
        F.broadcast(key_hashes), "_kh", "left_semi"
    )
    kept_keys = pruned.count()
    doc_keys.unpersist()
    normalized.unpersist()

    # ---- end-to-end wall time, prune off vs on (interleaved 2x) -------
    def timed(prune: bool) -> tuple[float, int]:
        t0 = time.perf_counter()
        r = run_pipeline(corpus, linking="blocked", blocked_prune=prune)
        n = r.triples.count()
        return time.perf_counter() - t0, n

    timed(True)  # warmup (workers + codegen)
    runs = {True: [], False: []}
    triples = {}
    for _ in range(2):
        for prune in (False, True):
            sec, n = timed(prune)
            runs[prune].append(sec)
            triples[prune] = n

    md = f"""# BENCH/BLOCKED_PRUNE — blocked-linking shuffle diet

Broadcast xxhash64 block-key semi-join prune ahead of the dictionary
equi-join (operators/linking.py:link_terms_blocked, prune_doc_keys=True,
the default). Corpus: deterministic synthetic web_pages,
{args.docs:,} docs, local[{args.cpus}].

| measure | value |
|---|---|
| dictionary rows | {n_dict:,} |
| distinct dictionary block keys (broadcast, 8 B each) | {n_dict_keys:,} |
| exploded doc keys, NO prune (rows into the equi-join shuffle) | {total_keys:,} |
| doc keys after prune | {kept_keys:,} |
| shuffle-row reduction | {(1 - kept_keys / total_keys) * 100:.1f}% |
| blocked pipeline sec, prune OFF (2 runs) | {', '.join(f'{s:.1f}' for s in runs[False])} |
| blocked pipeline sec, prune ON (2 runs) | {', '.join(f'{s:.1f}' for s in runs[True])} |
| triples, prune OFF / ON | {triples[False]:,} / {triples[True]:,} |

Output identity: triples counts above must match; value-level identity is
driver-gated (kg_triples_blocked / kg_triples_auto share the kg_triples
DuckDB oracle) and differentially tested (tests/test_linking_blocked.py).

Interpretation: the win is SHUFFLE ROWS/BYTES, not local wall-clock — on
this single-memory-bus box with a toy-sized synthetic dictionary the
equi-join was never the bottleneck, so ON vs OFF times sit inside run
noise. On a multi-host cluster the pruned rows are bytes that never cross
the network (the blocked path's dominant cost, per
BENCH/SCALING_RUN_BLOCKED.md's shuffle-bound 2→8 efficiency), which is
exactly the regime the fallback exists for.

Generated by `python BENCH/blocked_prune_probe.py --docs {args.docs}` on
{time.strftime('%Y-%m-%d')}.
"""
    with open(os.path.join(REPO, "BENCH", "BLOCKED_PRUNE.md"), "w") as f:
        f.write(md)
    print(md)
    spark.stop()


if __name__ == "__main__":
    main()

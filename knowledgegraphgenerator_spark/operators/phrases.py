"""Corpus term-dictionary construction (SURVEY.md §2.3 N4-N6, §2.4 A1-A5).

Stage layout (every boundary a shuffle we either need or eliminate):

  1. ``extract_doc_features`` — one fused Arrow pass per document emitting
     the phrase/unigram/verb feature arrays in in-document emission order
     (the reference runs spaCy TWICE per question, phrase_finder.py:54,68;
     we run the chunker once). mapInPandas, no shuffle.
  2. ``term_counts`` — posexplode + groupBy(term). Spark's hash aggregate
     does map-side partial aggregation, so head-term skew collapses before
     the exchange — the classic reason NOT to salt a count(): each mapper
     emits at most |vocab| rows per term. min(struct(doc_id, pos)) rides
     the same aggregate and materializes the Counter-insertion-order
     tiebreaker (SURVEY.md Appendix A.4).
  3. thresholds — strict ``>`` filters (phrase_finder.py:33-34).
  4. ``dedup_equal_count_phrases`` — the A3 equal-count substring drop as a
     self-join on the count key + containment predicate + left_anti
     (set-difference semantics proven equivalent to the reference's
     remove-first-occurrence loop, phrase_finder.py:35-44). The join key
     (cnt) bounds the quadratic blow-up to within-count groups; the
     dictionary is already thresholded and tiny relative to the corpus.
  5. ``collect_ranked_dictionary`` — sort by (cnt desc, first_seen asc) =
     Counter.most_common parity, collect to driver, broadcast. The
     dictionary is corpus-derived and vocabulary-bounded (≪ corpus); if it
     ever outgrows broadcast, the fallback is the token-block equi-join in
     operators/linking.py docstring.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from knowledgegraphgenerator_spark.config import (
    PHRASES_FREQ_THRESHOLD,
    UNIGRAM_FREQ_THRESHOLD,
)
from knowledgegraphgenerator_spark.core.extraction import extract_features
from knowledgegraphgenerator_spark.core.matching import RankedDictionary

_FEATURES_SCHEMA = (
    "doc_id long, phrases array<string>, unigrams array<string>, "
    "verbs array<string>"
)


def extract_doc_features(
    df: DataFrame,
    stop_tokens: frozenset[str],
    id_col: str = "doc_id",
    text_col: str = "norm_text",
) -> DataFrame:
    """(doc_id, norm_text) -> (doc_id, phrases, unigrams, verbs).

    One chunker pass per doc inside mapInPandas; arrays preserve emission
    order (trigrams before bigrams per chunk, phrase_finder.py:61-62).
    """
    src = df.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("t"))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [extract_features(t or "", stop_tokens) for t in pdf["t"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "phrases": [f[0] for f in feats],
                    "unigrams": [f[1] for f in feats],
                    "verbs": [f[2] for f in feats],
                }
            )

    return src.mapInPandas(gen, schema=_FEATURES_SCHEMA)


def unified_term_counts(features: DataFrame) -> DataFrame:
    """(kind, term, cnt, first_seen) for all three dictionary sections in
    ONE pass: one explode over a kind-tagged concat of the feature
    arrays, one (kind, term) shuffle — instead of three explode+shuffle
    passes over the features (round-2 shape; shuffle bytes are identical
    since the sections are disjoint, the saving is the 2 extra corpus/
    cache passes). The output is vocabulary-bounded — tiny relative to
    the corpus — so the hot paths MATERIALIZE it once (pipeline: persist;
    stage runner: its own committed stage) and every section/filter/
    self-join downstream reads the materialization. Deriving sections
    straight from this plan without materializing re-explodes per
    section (Catalyst pushes the kind filter below the aggregate —
    kind is a grouping key), which is why term_counts() below is only
    the convenience form.

    first_seen = lexicographic min of (doc_id, pos) — deterministic
    Counter-insertion-order stand-in (corpus order = doc_id ascending,
    within-doc order = emission position)."""
    tagged = (
        "explode(concat("
        "transform(phrases, (x, i) ->"
        " struct('phrases' AS kind, i AS pos, x AS term)), "
        "transform(unigrams, (x, i) ->"
        " struct('unigrams' AS kind, i AS pos, x AS term)), "
        "transform(verbs, (x, i) ->"
        " struct('verbs' AS kind, i AS pos, x AS term))"
        ")) AS e"
    )
    return (
        features.select("doc_id", F.expr(tagged))
        .select("doc_id", "e.kind", "e.pos", "e.term")
        .groupBy("kind", "term")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.min(F.struct("doc_id", "pos")).alias("first_seen"),
        )
    )


def sections_from_counted(counted: DataFrame) -> dict[str, DataFrame]:
    """Threshold-filtered sections of a (materialized) unified count
    frame (strict >, phrase_finder.py:33-34); verbs unthresholded at
    corpus stage (assignment breaks at cnt==1, so cnt>=2 prefilter is
    applied at collect time — SURVEY.md §2.6 O5)."""

    def section(kind: str) -> DataFrame:
        return counted.where(F.col("kind") == kind).drop("kind")

    return {
        "phrases": section("phrases").filter(
            F.col("cnt") > PHRASES_FREQ_THRESHOLD
        ),
        "unigrams": section("unigrams").filter(
            F.col("cnt") > UNIGRAM_FREQ_THRESHOLD
        ),
        "verbs": section("verbs"),
    }


def term_counts(features: DataFrame) -> dict[str, DataFrame]:
    """-> {'phrases': df, 'unigrams': df, 'verbs': df}; convenience form
    of unified_term_counts → sections_from_counted (callers on a hot
    path should materialize the unified frame themselves — see
    unified_term_counts)."""
    return sections_from_counted(unified_term_counts(features))


def dedup_equal_count_phrases(phrases: DataFrame) -> DataFrame:
    """Drop phrase B when ∃A: B substring of A, cnt(B)==cnt(A), A≠B
    (phrase_finder.py:35-44). Self-join blocked on cnt, then left_anti."""
    a = phrases.select(
        F.col("term").alias("b_term"), F.col("cnt").alias("cnt")
    )
    b = phrases.select(
        F.col("term").alias("a_term"), F.col("cnt").alias("cnt")
    )
    dropped = (
        a.join(b, "cnt")
        .filter(
            (F.col("a_term") != F.col("b_term"))
            & (F.instr(F.col("a_term"), F.col("b_term")) > 0)
        )
        .select(F.col("b_term").alias("term"))
        .distinct()
    )
    return phrases.join(dropped, "term", "left_anti")


def build_dictionary_frames(
    df: DataFrame,
    stop_tokens: frozenset[str],
    id_col: str = "doc_id",
    text_col: str = "norm_text",
) -> dict[str, DataFrame]:
    feats = extract_doc_features(df, stop_tokens, id_col, text_col)
    out = term_counts(feats)
    out["phrases"] = dedup_equal_count_phrases(out["phrases"])
    return out


def collect_ranked_dictionary(
    frames: dict[str, DataFrame], stop_tokens: frozenset[str]
) -> RankedDictionary:
    """Driver-side collect in most_common order → RankedDictionary.

    Verbs stay UNthresholded: cnt==1 verbs can never match (the assignment
    loop breaks at cnt==1, NGramStrategy.py:93-94) but they still
    participate in the merged-count overwrite (NGramStrategy.py:52-55) — a
    cnt-1 verb lemma that collides with a phrase/unigram term rewrites that
    term's sort key.
    """

    # ONE collect job for all three sections (three separate orderBy
    # collects tripled the latency-bound small-stage overhead); the
    # most_common sort runs on the driver over the already-aggregated
    # dictionary (vocabulary-bounded, ≪ corpus).
    rows = union_dictionary_frames(frames).collect()
    return ranked_dictionary_from_rows(rows, stop_tokens)


def union_dictionary_frames(frames: dict[str, DataFrame]) -> DataFrame:
    """All three sections as one (kind, term, cnt, fs_doc, fs_pos) frame
    — the single-job shape shared by the collect path and the auto
    strategy probe (pipeline.run_pipeline)."""
    unioned = None
    for kind, df in frames.items():
        part = df.select(
            F.lit(kind).alias("kind"), "term", "cnt",
            F.col("first_seen.doc_id").alias("fs_doc"),
            F.col("first_seen.pos").alias("fs_pos"),
        )
        unioned = part if unioned is None else unioned.unionByName(part)
    return unioned


def ranked_dictionary_from_rows(
    rows, stop_tokens: frozenset[str]
) -> RankedDictionary:
    """Driver-side most_common ranking over pre-collected dictionary rows
    (kind, term, cnt, fs_doc, fs_pos)."""
    by_kind: dict[str, list[tuple[str, int, int, int]]] = {
        "phrases": [], "unigrams": [], "verbs": []
    }
    for r in rows:
        by_kind[r["kind"]].append(
            (r["term"], r["cnt"], r["fs_doc"], r["fs_pos"])
        )

    def ranked(rows: list[tuple[str, int, int, int]]) -> list[tuple[str, int]]:
        rows.sort(key=lambda x: (-x[1], x[2], x[3]))
        return [(t, c) for t, c, _, _ in rows]

    return RankedDictionary(
        phrases=ranked(by_kind["phrases"]),
        unigrams=ranked(by_kind["unigrams"]),
        verbs=ranked(by_kind["verbs"]),
        stop_tokens=stop_tokens,
    )


def save_dictionary(frames: dict[str, DataFrame], path: str) -> None:
    """Persist the dictionary sections as one parquet table
    (kind, term, cnt, fs_doc, fs_pos) — the production vocabulary
    artifact: the periodic batch refresh writes it, enrichment jobs
    (streaming/incremental.py:incremental_kg_triples) load it. The
    ranking keys (cnt + first-seen position) are stored, not the rank,
    so a load reproduces most_common order exactly."""
    union_dictionary_frames(frames).write.mode("overwrite").parquet(path)


def load_ranked_dictionary(
    spark, path: str, stop_tokens: frozenset[str]
) -> "RankedDictionary":
    """Load a save_dictionary() artifact into the broadcastable ranked
    form. The collect is vocabulary-bounded (same regime as the
    broadcast linking path)."""
    return ranked_dictionary_from_rows(
        spark.read.parquet(path).collect(), stop_tokens
    )


def load_dictionary_frames(spark, path: str) -> dict[str, DataFrame]:
    """Load a save_dictionary() artifact back into section DataFrames —
    the CLUSTER-side form the token-block linking fallback consumes
    when the dictionary is beyond broadcast (no driver collect)."""
    df = spark.read.parquet(path)
    out: dict[str, DataFrame] = {}
    for kind in ("phrases", "unigrams", "verbs"):
        out[kind] = df.where(F.col("kind") == kind).select(
            "term",
            "cnt",
            F.struct(
                F.col("fs_doc").alias("doc_id"),
                F.col("fs_pos").alias("pos"),
            ).alias("first_seen"),
        )
    return out

"""Term canonicalization: surface-form variant merging at corpus scale.

North-star stage (SURVEY.md §7.2 item 10): the reference's equal-count
substring dedup (A3) and per-question substring filter collapse trivial
variants; at web scale the dictionary holds millions of near-identical
surface forms ("neft service" / "neft services" / "the neft service")
that substring containment alone cannot group. This module is the scale
path:

  1. character-n-gram shingles per term (pure SQL transform — short
     strings, no UDF);
  2. MinHash signatures + LSH banding (operators/dedup.py) → candidate
     variant pairs without the O(|dict|²) comparison;
  3. integer-exact Jaccard verify on candidates;
  4. connected components (large-star/small-star, operators/components)
     → variant clusters; canonical form = the cluster member with the
     highest corpus count (ties: lexicographically smallest) — the most
     frequent surface form is what the reference's most_common ordering
     would have preferred anyway.

Returns a mapping table (term, canonical_term) — identity for
un-clustered terms — that composes with the dictionary by joining before
ranking, and with the triple tables by rewriting subj/obj.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from knowledgegraphgenerator_spark.operators.components import (
    connected_components,
)
from knowledgegraphgenerator_spark.operators.dedup import (
    lsh_candidate_pairs,
    minhash_signatures,
    verify_jaccard,
)


def char_shingles(
    terms: DataFrame, term_col: str = "term", n: int = 3
) -> DataFrame:
    """Distinct (term_id, shingle) character n-grams, space-padded so
    word boundaries participate."""
    padded = terms.withColumn(
        "_padded", F.concat(F.lit(" "), F.col(term_col), F.lit(" "))
    )
    return (
        padded.where(F.length("_padded") >= n)
        .select(
            "term_id",
            F.explode(
                F.expr(
                    f"transform(sequence(1, length(_padded) - {n - 1}),"
                    f" i -> substring(_padded, i, {n}))"
                )
            ).alias("shingle"),
        )
        .distinct()
    )


def canonicalize_surface_forms(
    terms: DataFrame,
    term_col: str = "term",
    count_col: str | None = "cnt",
    shingle_n: int = 3,
    k: int = 16,
    rows_per_band: int = 2,
    threshold_num: int = 6,
    threshold_den: int = 10,
) -> DataFrame:
    """(term[, cnt]) -> (term, canonical_term).

    rows_per_band=2 with k=16 gives 8 bands: candidate recall at the
    J=0.6 verify threshold is 1-(1-J²)^8 ≈ 0.97 (≈0.996 at J=0.77) —
    short strings need the gentler band exponent; the Jaccard verify
    keeps precision exact.
    """
    # Content-hash ids, NOT row_number over a global Window: a global
    # orderBy window funnels the whole dictionary through ONE partition —
    # a scale-killer on a 10^7-term dictionary (VERDICT r1). xxhash64 is
    # deterministic, join-stable across stages/retries, and collision-safe
    # at dictionary cardinalities (~(10^7)²/2^65 ≈ 3e-6 expected
    # collisions). tests/test_canonicalize.py pins the plan to zero
    # single-partition exchanges.
    with_id = terms.withColumn("term_id", F.xxhash64(term_col)).persist()
    sh = char_shingles(with_id, term_col, shingle_n)
    sigs = minhash_signatures(sh, "term_id", k)
    pairs = lsh_candidate_pairs(sigs, "term_id", rows_per_band)
    dups = verify_jaccard(pairs, sh, "term_id", threshold_num, threshold_den)
    labels = connected_components(
        dups.select("id_a", "id_b"), "id_a", "id_b"
    )
    clustered = with_id.join(
        labels, with_id.term_id == labels.id, "left"
    ).select(
        term_col, "term_id",
        F.coalesce("component", "term_id").alias("cluster"),
        *( [count_col] if count_col and count_col in terms.columns else [] ),
    )
    order = (
        [F.desc(count_col), F.asc(term_col)]
        if count_col and count_col in terms.columns
        else [F.asc(term_col)]
    )
    wc = Window.partitionBy("cluster").orderBy(*order)
    canon = (
        clustered.withColumn("_r", F.row_number().over(wc))
        .where("_r = 1")
        .select(F.col("cluster"), F.col(term_col).alias("canonical_term"))
    )
    return clustered.join(canon, "cluster").select(
        term_col, "canonical_term"
    )

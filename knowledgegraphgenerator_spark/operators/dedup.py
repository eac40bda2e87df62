"""Deduplication operators for training-data pipelines.

All pure DataFrame ops (JVM-side, no Python in the hot path):

  * exact_dedup          hash-groupBy on content, keep min-id row
  * shingle sets         token n-gram shingles via slice-transform SQL
  * minhash_signatures   k universal-hash minima over xxhash64 shingles
  * lsh_candidate_pairs  band-bucket equi-join
  * verify_jaccard       integer-exact Jaccard verify on candidates
  * simhash64            weighted bitwise majority over token hashes
  * near_dedup           the full MinHash-LSH → verify → keep-min chain

Scale notes (the reason this layout): shingling+minhash are narrow maps;
the only shuffles are the signature groupBy and the band join. The band
join's value is bounding the candidate space — the O(n²) pair join never
materializes; bucket skew (a hot band) is handled by AQE skew-join plus
the optional ``max_bucket`` guard that drops degenerate buckets (a bucket
with B docs contributes B² pairs; dropping buckets larger than the guard
only loses pairs that other, more selective bands almost surely recover).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MINHASH_P = 2147483647  # Mersenne prime 2^31-1: a*h+b stays < 2^63 (ANSI)


def exact_dedup(df: DataFrame, content_col: str, id_col: str) -> DataFrame:
    """Keep one row id per distinct content value (P12 dropDuplicates with
    deterministic keep-min, /root/reference/synonym_generator/
    synonym_generator.py:33-39)."""
    keep = df.groupBy(content_col).agg(F.min(id_col).alias(id_col))
    return df.join(keep, [content_col, id_col], "semi")


def token_shingles(
    df: DataFrame, text_col: str, id_col: str, n: int = 3
) -> DataFrame:
    """Distinct (id, shingle) token n-grams — pure SQL, no UDF."""
    return (
        df.select(F.col(id_col), F.split(text_col, r"\s+").alias("toks"))
        .where(F.size("toks") >= n)
        .select(
            id_col,
            F.explode(
                F.expr(
                    f"transform(slice(toks, 1, greatest(size(toks)-{n-1}, 0)),"
                    f" (x, i) -> concat_ws(' ', slice(toks, i+1, {n})))"
                )
            ).alias("shingle"),
        )
        .distinct()
    )


def minhash_signatures(
    shingles: DataFrame, id_col: str, k: int = 16
) -> DataFrame:
    """(id, j, mh): k permutation minima over xxhash64(shingle).

    Fixed odd multipliers (2j+3) and offsets over a Mersenne-prime field;
    xxhash64 gives the base uniformity, the affine maps decorrelate the k
    minima. Map-side partial agg collapses each doc's shingles before the
    shuffle.
    """
    h = F.pmod(F.xxhash64("shingle"), F.lit(MINHASH_P))
    base = shingles.withColumn("h", h)
    perms = shingles.sparkSession.createDataFrame(
        [(j, 2 * j + 3, 104729 * (j + 1)) for j in range(k)],
        "j int, a long, b long",
    )
    return (
        base.crossJoin(F.broadcast(perms))
        .groupBy(id_col, "j")
        .agg(
            F.min(F.pmod(F.col("a") * F.col("h") + F.col("b"), F.lit(MINHASH_P)))
            .alias("mh")
        )
    )


def lsh_candidate_pairs(
    signatures: DataFrame,
    id_col: str,
    rows_per_band: int = 2,
    max_bucket: int | None = 1000,
) -> DataFrame:
    """Band signatures → equi-join on (band, band_sig) → (id_a, id_b)."""
    banded = (
        signatures.withColumn(
            "band", (F.col("j") / rows_per_band).cast("int")
        )
        .groupBy(id_col, "band")
        .agg(
            F.concat_ws(
                "-", F.expr("transform(sort_array(collect_list(struct(j, mh))), x -> x.mh)")
            ).alias("sig")
        )
    )
    if max_bucket is not None:
        sizes = banded.groupBy("band", "sig").agg(
            F.count(F.lit(1)).alias("bn")
        ).where(F.col("bn") <= max_bucket)
        banded = banded.join(sizes.select("band", "sig"), ["band", "sig"], "semi")
    a = banded.select(F.col(id_col).alias("id_a"), "band", "sig")
    b = banded.select(F.col(id_col).alias("id_b"), "band", "sig")
    return (
        a.join(b, ["band", "sig"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def verify_jaccard(
    pairs: DataFrame,
    shingles: DataFrame,
    id_col: str,
    threshold_num: int = 8,
    threshold_den: int = 10,
) -> DataFrame:
    """Integer-exact Jaccard on candidates:
    keep pairs with inter/union >= num/den (no floats)."""
    sizes = shingles.groupBy(id_col).agg(F.count(F.lit(1)).alias("n"))
    sa = shingles.select(F.col(id_col).alias("id_a"), "shingle")
    sb = shingles.select(F.col(id_col).alias("id_b"), "shingle")
    inter = (
        pairs.join(sa, "id_a")
        .join(sb, ["id_b", "shingle"])
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    na = sizes.select(F.col(id_col).alias("id_a"), F.col("n").alias("na"))
    nb = sizes.select(F.col(id_col).alias("id_b"), F.col("n").alias("nb"))
    return (
        inter.join(na, "id_a").join(nb, "id_b")
        .withColumn("union_n", F.col("na") + F.col("nb") - F.col("inter"))
        .where(
            F.col("inter") * threshold_den >= F.col("union_n") * threshold_num
        )
        .select("id_a", "id_b", "inter", "union_n")
    )


def simhash64(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """64-bit SimHash: weighted per-bit majority over xxhash64(token)."""
    toks = (
        df.select(F.col(id_col), F.explode(F.split(text_col, r"\s+")).alias("tok"))
        .where(F.col("tok") != "")
        .groupBy(id_col, "tok")
        .agg(F.count(F.lit(1)).alias("w"))
        .withColumn("h", F.xxhash64("tok"))
    )
    bits = df.sparkSession.range(64).select(F.col("id").cast("int").alias("bit"))
    return (
        toks.crossJoin(F.broadcast(bits))
        .withColumn(
            "contrib",
            F.when(F.expr("(h >> bit) & 1") == 1, F.col("w"))
            .otherwise(-F.col("w")),
        )
        .groupBy(id_col, "bit")
        .agg(F.sum("contrib").alias("s"))
        .groupBy(id_col)
        .agg(
            F.sum(
                F.when(F.col("s") > 0, F.expr("shiftleft(1L, bit)")).otherwise(0)
            ).alias("simhash")
        )
    )


def near_dedup(
    df: DataFrame,
    text_col: str,
    id_col: str,
    shingle_n: int = 3,
    k: int = 16,
    rows_per_band: int = 2,
    threshold_num: int = 8,
    threshold_den: int = 10,
) -> DataFrame:
    """Full near-dup chain → df minus non-canonical members.

    Canonical = min id within each verified duplicate pair's star; full
    transitive closure (connected components) lives in
    operators/components.py — pairwise-min is the cheap 1-hop
    approximation appropriate for one dedup sweep.
    """
    sh = token_shingles(df, text_col, id_col, shingle_n)
    sigs = minhash_signatures(sh, id_col, k)
    pairs = lsh_candidate_pairs(sigs, id_col, rows_per_band)
    dups = verify_jaccard(pairs, sh, id_col, threshold_num, threshold_den)
    drop = dups.select(F.col("id_b").alias(id_col)).distinct()
    return df.join(drop, id_col, "anti")

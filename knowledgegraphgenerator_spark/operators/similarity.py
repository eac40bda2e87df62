"""Similarity search over embedding columns (array<float>).

Two paths, one semantic:

  * ``brute_force_topk`` — exact cosine top-k. Vectors are posexploded
    and dot products run as JVM hash aggregates: no Python, whole-stage
    codegen end-to-end. Cost O(|Q|·|N|·dim) — the correctness baseline
    and the right choice when |Q| is small.
  * ``ivf_topk`` — IVF-style approximate top-k: k-means-lite centroids
    (deterministic seed) assign every vector to a cell; queries probe the
    ``n_probe`` nearest cells only. The candidate join shrinks by the
    cell fan-out (~n_cells/n_probe×) which is the 100 TB play: the
    centroid table is broadcast, the per-cell join is an equi-join on
    cell id, and recall is tunable with n_probe.

Both return (query_id, rnk, neighbor_id, sim).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _exploded(df: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    return df.select(
        F.col(id_col).alias("vid"),
        F.posexplode(F.col(vec_col).cast("array<double>")).alias("pos", "v"),
    )


def _norms(e: DataFrame) -> DataFrame:
    return e.groupBy("vid").agg(F.sqrt(F.sum(F.col("v") * F.col("v"))).alias("nrm"))


def brute_force_topk(
    vectors: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
) -> DataFrame:
    e = _exploded(vectors, id_col, vec_col)
    q = _exploded(queries, id_col, vec_col).withColumnRenamed("vid", "qid") \
        .withColumnRenamed("v", "qv")
    norms = _norms(e)
    qnorms = _norms(_exploded(queries, id_col, vec_col)).withColumnRenamed(
        "vid", "qid").withColumnRenamed("nrm", "qn")
    dots = (
        q.join(e, "pos")
        .where(F.col("vid") != F.col("qid"))
        .groupBy("qid", "vid")
        .agg(F.sum(F.col("qv") * F.col("v")).alias("dot"))
    )
    sims = (
        dots.join(qnorms, "qid").join(norms, "vid")
        .withColumn("sim", F.col("dot") / (F.col("qn") * F.col("nrm")))
    )
    w = Window.partitionBy("qid").orderBy(F.desc("sim"), F.asc("vid"))
    return (
        sims.withColumn("rnk", F.row_number().over(w).cast("long"))
        .where(F.col("rnk") <= k)
        .select(
            F.col("qid").alias("query_id"), "rnk",
            F.col("vid").alias("neighbor_id"), "sim",
        )
    )


def _assign_cells(
    e: DataFrame, centroids: DataFrame, n_probe: int
) -> DataFrame:
    """(vid, cell, cos-to-centroid rank<=n_probe) via broadcast join."""
    c = centroids.select(
        F.col("cell"), F.posexplode("centroid").alias("pos", "cv")
    )
    dots = (
        e.join(F.broadcast(c), "pos")
        .groupBy("vid", "cell")
        .agg(F.sum(F.col("v") * F.col("cv")).alias("dot"))
    )
    w = Window.partitionBy("vid").orderBy(F.desc("dot"), F.asc("cell"))
    return (
        dots.withColumn("crnk", F.row_number().over(w))
        .where(F.col("crnk") <= n_probe)
        .select("vid", "cell")
    )


def train_centroids(
    vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int = 16,
    n_iter: int = 3,
) -> DataFrame:
    """Deterministic k-means-lite: seed centroids = the n_cells vectors
    with the smallest ids (stable across partitioning), then n_iter
    Lloyd rounds of assign + mean, all as DataFrame aggregates."""
    dim_row = vectors.select(F.size(vec_col).alias("d")).first()
    dim = dim_row["d"]
    seeds = (
        vectors.orderBy(id_col).limit(n_cells)
        .select(F.col(vec_col).cast("array<double>").alias("centroid"))
        .withColumn("cell", F.row_number().over(Window.orderBy(F.lit(1))).cast("int"))
        .select("cell", "centroid")
    )
    e = _exploded(vectors, id_col, vec_col)
    centroids = seeds
    for _ in range(n_iter):
        assign = _assign_cells(e, centroids, n_probe=1)
        means = (
            e.join(assign, "vid")
            .groupBy("cell", "pos")
            .agg(F.avg("v").alias("m"))
            .groupBy("cell")
            .agg(
                F.expr(
                    "transform(sort_array(collect_list(struct(pos, m))),"
                    " x -> x.m)"
                ).alias("centroid")
            )
        )
        # iterative DataFrame loop: cut lineage per round (same pattern
        # as operators/components.py) — without this each Lloyd round
        # re-plans and re-evaluates every previous round's joins
        centroids = means.localCheckpoint(eager=True)
    assert dim  # schema sanity
    return centroids


def cosine_near_dup_pairs(
    vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.9,
    n_cells: int = 16,
    n_probe: int = 2,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id_a < id_b, sim >= t).

    Blocked through the IVF cells so the pair space is per-cell, not
    global: vectors land in their nearest cell(s) (n_probe > 1 catches
    boundary pairs), pairs form within a cell only. Exact for pairs whose
    members share a probed cell — the standard recall/cost dial.
    """
    centroids = train_centroids(vectors, id_col, vec_col, n_cells).cache()
    e = _exploded(vectors, id_col, vec_col)
    cells = _assign_cells(e, centroids, n_probe=n_probe)
    a = cells.withColumnRenamed("vid", "id_a")
    b = cells.withColumnRenamed("vid", "id_b")
    cand = (
        a.join(b, "cell")
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    ea = e.select(F.col("vid").alias("id_a"), "pos", F.col("v").alias("va"))
    eb = e.select(F.col("vid").alias("id_b"), "pos", F.col("v").alias("vb"))
    dots = (
        cand.join(ea, "id_a")
        .join(eb, ["id_b", "pos"])
        .groupBy("id_a", "id_b")
        .agg(F.sum(F.col("va") * F.col("vb")).alias("dot"))
    )
    norms = _norms(e)
    na = norms.select(F.col("vid").alias("id_a"), F.col("nrm").alias("na"))
    nb = norms.select(F.col("vid").alias("id_b"), F.col("nrm").alias("nb"))
    return (
        dots.join(na, "id_a").join(nb, "id_b")
        .withColumn("sim", F.col("dot") / (F.col("na") * F.col("nb")))
        .where(F.col("sim") >= threshold)
        .select("id_a", "id_b", "sim")
    )


def ivf_topk(
    vectors: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    n_cells: int = 16,
    n_probe: int = 4,
) -> DataFrame:
    """IVF approximate top-k: probe the n_probe best cells per query."""
    centroids = train_centroids(vectors, id_col, vec_col, n_cells).cache()
    e = _exploded(vectors, id_col, vec_col)
    qe = _exploded(queries, id_col, vec_col)
    data_cells = _assign_cells(e, centroids, n_probe=1)
    query_cells = _assign_cells(qe, centroids, n_probe=n_probe) \
        .withColumnRenamed("vid", "qid")
    # candidates: query joins only its probed cells
    cands = query_cells.join(data_cells, "cell").select("qid", "vid").distinct()
    q = qe.withColumnRenamed("vid", "qid").withColumnRenamed("v", "qv")
    dots = (
        cands.join(q, "qid")
        .join(e, ["vid", "pos"])
        .where(F.col("vid") != F.col("qid"))
        .groupBy("qid", "vid")
        .agg(F.sum(F.col("qv") * F.col("v")).alias("dot"))
    )
    norms = _norms(e)
    qnorms = _norms(qe).withColumnRenamed("vid", "qid") \
        .withColumnRenamed("nrm", "qn")
    sims = (
        dots.join(qnorms, "qid").join(norms, "vid")
        .withColumn("sim", F.col("dot") / (F.col("qn") * F.col("nrm")))
    )
    w = Window.partitionBy("qid").orderBy(F.desc("sim"), F.asc("vid"))
    return (
        sims.withColumn("rnk", F.row_number().over(w).cast("long"))
        .where(F.col("rnk") <= k)
        .select(
            F.col("qid").alias("query_id"), "rnk",
            F.col("vid").alias("neighbor_id"), "sim",
        )
    )

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


def _arr(df: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    return df.select(
        F.col(id_col).alias("vid"),
        F.col(vec_col).cast("array<double>").alias("vec"),
    )


def _assign_cells(
    arr: DataFrame, centroids: DataFrame, n_probe: int
) -> DataFrame:
    """(vid, cell) for each vector's n_probe best cells.

    r6 shape: the vector stays an ARRAY row and the dot against each
    broadcast centroid is a narrow ``zip_with``/``aggregate`` fold —
    |vectors| x n_cells rows total, where the r5 exploded join
    generated |vectors| x dim x n_cells rows and hash-aggregated them
    back (guide §4.1 higher-order functions / §2.3). (A NumPy
    mapInPandas form was also measured and was NOT faster here — the
    JVM fold wins once the per-batch Python dispatch and the loss of
    stats on the assignment frame are priced in; see
    OPTIMIZATION_r06.md.) Assignment feeds candidate generation only
    (never the reported similarity), so the summation-order change is
    invisible to results: ranks flip only on exact dot ties, which the
    cell-asc tie-break resolves identically in both forms."""
    dots = arr.crossJoin(F.broadcast(centroids)).select(
        "vid",
        "cell",
        F.expr(
            "aggregate(zip_with(vec, centroid, (x, y) -> x * y),"
            " 0D, (a, x) -> a + x)"
        ).alias("dot"),
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
    Lloyd rounds of assign + mean.

    r6 shape (the standard distributed k-means loop, e.g. Spark MLlib's
    own): the centroid matrix is CONFIG-SIZED (n_cells x dim — a few
    KB here, a few MB at production n_cells), so each round ships it to
    executors in the task closure, a ``mapInPandas`` pass accumulates
    per-partition per-cell sums/counts with one NumPy matmul per Arrow
    batch (guide §4.2 — vectorized native code beats interpreted
    higher-order JVM expressions; measured 2.6 s/round -> sub-second),
    and the config-sized partials (n_partitions x n_cells x dim rows)
    come back in ONE job per round instead of the r5 round's
    assign-window + join + two aggregations + eager checkpoint.
    Assignment ties (exact dot equality) break toward the lowest cell
    id in both forms (np.argmax takes the first maximum; rows are
    ordered by cell). Cells that lose all members drop out of the
    table, as the old groupBy form's inner join did. Nothing here is a
    data-sized collect: only centroid-shaped state crosses the driver
    boundary, exactly like the dictionary probe (pipeline.py)."""
    import numpy as np

    spark = vectors.sparkSession
    seed_rows = (
        vectors.orderBy(id_col).limit(n_cells)
        .select(F.col(vec_col).cast("array<double>").alias("centroid"))
        .collect()
    )
    if not seed_rows:
        return spark.createDataFrame([], "cell int, centroid array<double>")
    cent = np.array([r["centroid"] for r in seed_rows], dtype=np.float64)
    cell_ids = list(range(1, cent.shape[0] + 1))
    arr = vectors.select(F.col(vec_col).cast("array<double>").alias("vec"))

    for _ in range(n_iter):

        def part(batches, C=cent):
            import numpy as np
            import pandas as pd

            sums = np.zeros_like(C)
            cnts = np.zeros(C.shape[0], dtype=np.int64)
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                m = np.array(pdf["vec"].tolist(), dtype=np.float64)
                best = (m @ C.T).argmax(axis=1)
                np.add.at(sums, best, m)
                np.add.at(cnts, best, 1)
            k, d = C.shape
            yield pd.DataFrame(
                {
                    "idx": np.repeat(np.arange(k, dtype=np.int32), d),
                    "pos": np.tile(np.arange(d, dtype=np.int32), k),
                    "s": sums.ravel(),
                    "n": np.repeat(cnts, d),
                }
            )

        # merge the per-partition partials INSIDE Spark first (k x d
        # rows reach the driver regardless of partition count), then
        # scatter them into the centroid matrix with vectorized NumPy
        # indexing — no per-row Python loop (r6 review finding: at
        # production n_cells x dim the raw partial set is
        # n_partitions x k x d rows and a row-at-a-time merge would
        # dominate or OOM the driver)
        merged = (
            arr.mapInPandas(part, "idx int, pos int, s double, n long")
            .groupBy("idx", "pos")
            .agg(F.sum("s").alias("s"), F.sum("n").alias("n"))
            .toPandas()
        )
        k, d = cent.shape
        sums = np.zeros((k, d))
        cnts = np.zeros(k, dtype=np.int64)
        idx = merged["idx"].to_numpy()
        pos = merged["pos"].to_numpy()
        sums[idx, pos] = merged["s"].to_numpy()
        at0 = pos == 0
        cnts[idx[at0]] = merged["n"].to_numpy()[at0]
        alive = cnts > 0
        cent = sums[alive] / cnts[alive, None]
        cell_ids = [c for c, a in zip(cell_ids, alive) if a]

    return spark.createDataFrame(
        [(c, [float(x) for x in row]) for c, row in zip(cell_ids, cent)],
        "cell int, centroid array<double>",
    )


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
    cells = _assign_cells(
        _arr(vectors, id_col, vec_col), centroids, n_probe=n_probe
    )
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
    data_cells = _assign_cells(
        _arr(vectors, id_col, vec_col), centroids, n_probe=1
    )
    query_cells = _assign_cells(
        _arr(queries, id_col, vec_col), centroids, n_probe=n_probe
    ).withColumnRenamed("vid", "qid")
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

"""Inverted-index construction and BM25 top-k retrieval over the
document corpus — the serving-side complement of the KG build.

The reference ranks ontology terms by corpus frequency and associates
documents to term paths (/root/reference/strategy/phrase_finder.py:29-45,
strategy/NGramStrategy.py:56-108); a web-scale corpus additionally needs
the classic IR consumption path over the same token stream: term
postings with per-document frequencies, document-length statistics, and
a BM25-scored top-k query. Okapi BM25 is the public Robertson/Spärck
Jones formulation (k1/b defaults 1.2/0.75, Lucene-style
``ln(1 + (N - df + 0.5)/(df + 0.5))`` idf).

Scale shape:
  * ``build_postings`` / ``doc_lengths`` are each ONE combinable
    groupBy over the token stream (map-side partial counts) — the same
    shuffle discipline as the term dictionary (operators/phrases.py).
    At 100 TB the postings table is the thing you bucket by ``term``
    (exactly like the triple store buckets by ``subj``,
    operators/triples.py:133) so query-time term lookups are
    partition-pruned scans, not shuffles.
  * ``bm25_topk`` filters the token stream to the query's terms BEFORE
    any shuffle — the tf aggregation runs over only matching tokens, so
    its cost is proportional to the posting lists touched, not the
    corpus. The per-term df/idf frame is a handful of rows and is
    broadcast; the only corpus-wide aggregation is ``doc_lengths``
    (reusable across queries — pass a precomputed frame).
  * the global top-k is ``orderBy(...).limit(k)`` — Spark plans
    TakeOrderedAndProject (per-partition heaps + driver merge of k·P
    rows), NOT a single-partition global sort; the rank column is then
    a window over the k surviving rows only.

Determinism contract (for the DuckDB value oracle): every per-term
score is one double expression — written with the SAME association on
both engines, constants pre-folded (k1+1 = 2.2, k1·(1-b) = 0.3,
k1·b = 0.9) — rounded ONCE to 1e-4 units and cast to BIGINT; the
per-document score is then an ORDER-FREE integer sum of those units, so
float summation order can never flip a rank across engines (same
discipline as the integer PageRank, operators/components.py).
"""

from __future__ import annotations

from typing import Iterable, Optional

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def tokenize_whitespace(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, term) whitespace tokens — THE tokenization every
    retrieval-store producer must share (the `index` CLI, the ingest
    stream's --index path, ad-hoc bm25_topk callers): a store built by
    one and appended by another diverges silently if they ever
    tokenize differently, so the expression lives here once."""
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(text_col, " ")).alias("term"),
    ).where(F.col("term") != "")


def doc_lengths(tokens: DataFrame) -> DataFrame:
    """(doc_id, dl) — token count per document; one combinable groupBy.

    Documents with zero tokens have no rows here and are out of BM25
    scope by construction (they can match no term)."""
    return tokens.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))


def build_postings(tokens: DataFrame) -> DataFrame:
    """(term, doc_id, tf) posting entries — ONE combinable groupBy.

    Write ``.bucketBy(N, "term")`` when persisting as a serving table
    so per-term reads are partition-pruned (triples.py:133 pattern)."""
    return tokens.groupBy("term", "doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("tf")
    )


def _empty_result(src: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Empty top-k frame whose doc_id dtype MATCHES the source corpus
    (ADVICE r5: the hardcoded ``doc_id long`` schema broke downstream
    unions/joins for string-id corpora on the empty edge case)."""
    from pyspark.sql.types import LongType, StructField, StructType

    return src.sparkSession.createDataFrame(
        [],
        StructType(
            [
                StructField("doc_id", src.schema[id_col].dataType),
                StructField("rnk", LongType()),
                StructField("score_i4", LongType()),
                StructField("n_hit", LongType()),
            ]
        ),
    )


def _dl_stats(dl: DataFrame) -> tuple:
    """(n_docs, avgdl) from a doc-length frame — the corpus scalars
    both BM25 paths need; one aggregation job. n_docs == 0 means an
    empty corpus (callers return the empty result frame)."""
    stats = dl.agg(
        F.count(F.lit(1)).alias("n"), F.sum("dl").alias("total")
    ).collect()[0]
    n_docs = int(stats["n"] or 0)
    if n_docs == 0:
        return 0, 0.0
    return n_docs, int(stats["total"]) / n_docs  # exact IEEE division


def _score_rank(
    tf: DataFrame,
    dl: DataFrame,
    n_docs: int,
    avgdl: float,
    k: int,
    k1: float,
    b: float,
) -> DataFrame:
    """Shared scoring tail of the from-tokens and served BM25 paths:
    (doc_id, term, tf) x (doc_id, dl) -> ranked top-k. One double
    expression per (doc, term) — identical shape to the oracle SQL —
    rounded once to integer 1e-4 units, then an order-free integer
    sum per doc; top-k = TakeOrderedAndProject, rank window over the
    k survivors only."""
    c1 = round(k1 + 1.0, 10)
    c2 = round(k1 * (1.0 - b), 10)
    c3 = round(k1 * b, 10)
    dfq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    # every float constant is CAST to DOUBLE explicitly (ADVICE r5,
    # high): a bare literal like 52.411859999999998 parses as DECIMAL,
    # dragging `dl / avgdl` into decimal(38,6) quantization that can
    # diverge from the oracle's IEEE doubles by one 1e-4 unit and flip
    # a rank; the decimal literal holds repr()'s <=17 significant
    # digits exactly, so the cast reproduces the original double
    # bit-for-bit on both engines
    score_i4 = F.expr(
        f"CAST(round(ln((CAST({n_docs} AS DOUBLE) - df + 0.5)"
        " / (df + 0.5) + 1.0)"
        f" * ((tf * CAST({c1!r} AS DOUBLE))"
        f" / (tf + (CAST({c2!r} AS DOUBLE) + CAST({c3!r} AS DOUBLE)"
        f" * (dl / CAST({avgdl!r} AS DOUBLE))))) * 10000) AS BIGINT)"
    )
    scored = (
        tf.join(F.broadcast(dfq), "term")
        .join(dl, "doc_id")
        .select("doc_id", score_i4.alias("s"))
    )
    doc_scores = scored.groupBy("doc_id").agg(
        F.sum("s").alias("score_i4"),
        F.count(F.lit(1)).cast("long").alias("n_hit"),
    )
    topk = doc_scores.orderBy(
        F.desc("score_i4"), F.asc("doc_id")
    ).limit(k)
    w = Window.orderBy(F.desc("score_i4"), F.asc("doc_id"))
    return topk.select(
        "doc_id",
        F.row_number().over(w).cast("long").alias("rnk"),
        "score_i4",
        "n_hit",
    )


def bm25_topk(
    tokens: DataFrame,
    query_terms: Iterable[str],
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
    dl: Optional[DataFrame] = None,
) -> DataFrame:
    """Top-``k`` documents for a bag-of-terms query under Okapi BM25.

    Returns (doc_id, rnk, score_i4, n_hit): ``score_i4`` is the BM25
    score in integer 1e-4 units (see module docstring), ``n_hit`` the
    number of distinct query terms present in the document, ``rnk`` the
    dense 1..k position (ties broken by ascending doc_id).

    ``dl`` may be a precomputed ``doc_lengths(tokens)`` frame (the one
    corpus-wide aggregation here — amortize it across queries).
    """
    terms = sorted(set(query_terms))
    if not terms:
        raise ValueError("bm25_topk: empty query")
    # corpus scalars in ONE aggregation job; a caller-supplied dl frame
    # (the amortized path — possibly the caller's persisted cache or a
    # bucketed catalog table) is read for stats but never
    # persisted/unpersisted here, and the lazily returned plan reads it
    # as-is
    if dl is None:
        stats = tokens.agg(
            F.countDistinct("doc_id").alias("n"),
            F.count(F.lit(1)).alias("total"),
        ).collect()[0]
        n_docs = int(stats["n"] or 0)
        avgdl = int(stats["total"]) / n_docs if n_docs else 0.0
        dl = doc_lengths(tokens)
    else:
        n_docs, avgdl = _dl_stats(dl)
    if n_docs == 0:
        return _empty_result(tokens)
    tf = (
        tokens.where(F.col("term").isin(terms))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    return _score_rank(tf, dl, n_docs, avgdl, k, k1, b)


def write_retrieval_tables(
    tokens: DataFrame,
    postings_table: str = "bm25_postings",
    dl_table: str = "bm25_doclen",
    n_buckets: int = 8,
) -> None:
    """Materialize the retrieval store as Spark-native bucketed catalog
    tables: postings ``bucketBy(N, term)`` (query-time per-term lookups
    and the df aggregation ride the bucket layout — zero Exchange,
    pinned in test_retrieval) and doc lengths ``bucketBy(N, doc_id)``.
    Same writer/safety contract as the triple store
    (operators/triples.write_bucketed_table)."""
    from knowledgegraphgenerator_spark.operators.triples import (
        write_bucketed_table,
    )

    write_bucketed_table(
        build_postings(tokens), postings_table, "term", n_buckets
    )
    # doc length == sum(tf) per doc over the postings JUST written —
    # identical values to doc_lengths(tokens), computed over |postings|
    # rows instead of a second full pass over the token stream
    dl = (
        tokens.sparkSession.table(postings_table)
        .groupBy("doc_id")
        .agg(F.sum("tf").alias("dl"))
    )
    write_bucketed_table(dl, dl_table, "doc_id", n_buckets)


def append_retrieval_tables(
    tokens: DataFrame,
    postings_table: str = "bm25_postings",
    dl_table: str = "bm25_doclen",
    n_buckets: int = 8,
) -> None:
    """Incremental index maintenance: append a NEWLY ADMITTED batch's
    postings and doc lengths to an existing store — the indexing step
    of the admit-only-novel ingestion loop (streaming/incremental.py),
    where re-building the store per batch would re-scan the whole
    corpus.

    Correctness contract: the batch's doc_ids must be DISJOINT from
    the store's (exactly what admit-only-novel ingestion guarantees;
    a doc already present in the doc-length table is filtered out
    here, so replaying a fully applied batch is a no-op rather than a
    silent double-append). Postings rows are per (term, doc_id) and
    both df and the corpus scalars are derived at query time, so with
    disjoint doc sets append == full rebuild VALUE-FOR-VALUE (gated
    by bm25_incremental answering to the same DuckDB oracle as
    bm25_topk). The bucket spec must match the store's; each append
    adds AT MOST one file per bucket per table (the batch is
    repartitioned onto the bucket key), and
    operators/triples.compact_bucketed_table rewrites an accumulated
    store back to one file set per bucket.

    Failure handling: the two appends are not one transaction on
    parquet tables. On ANY append failure run
    ``repair_retrieval_store`` (rebuilds doclen from postings) BEFORE
    retrying the batch — the retry's guard then skips exactly the
    committed part; see repair_retrieval_store for the crash-point
    case analysis.

    Cost: one batch-sized shuffle (the postings groupBy); the batch
    postings frame is persisted across the two writes so the token
    stream is read once."""
    from knowledgegraphgenerator_spark.operators.triples import (
        table_bucket_spec,
        write_bucketed_table,
    )

    spark = tokens.sparkSession
    # the STORE owns its bucket spec: when the postings table exists,
    # its catalog spec overrides the caller's n_buckets — otherwise a
    # mere flag mismatch (index CLI defaults 32, ingest --index-buckets
    # defaults 8) makes every append die on an AnalysisException
    if spark.catalog.tableExists(postings_table):
        _, n_buckets = table_bucket_spec(spark, postings_table)
    # idempotence guard: drop batch docs the doc-length table already
    # holds. A doclen entry implies the doc's postings committed (the
    # postings append precedes the doclen append below), so a FULL
    # replay of an already-applied batch — the foreachBatch retry case
    # — is a no-op instead of a silent double-append that would
    # double-count tf and df. The probe is a batch-sized left_anti
    # against the doc_id-bucketed table. SOUNDNESS depends on doclen
    # not lagging the committed postings: after a crash between the
    # two appends the caller must run repair_retrieval_store before
    # retrying — in-process failures do it in their handler, and a
    # NEW process must do it once before its first append (the ingest
    # stream does; see streaming/incremental.py).
    if spark.catalog.tableExists(dl_table):
        seen = spark.table(dl_table).select("doc_id")
        tokens = tokens.join(seen, "doc_id", "left_anti")
    post = (
        build_postings(tokens)
        .repartition(n_buckets, F.col("term"))
        .persist()
    )
    # repartition on each table's bucket key: the hash matches the
    # bucket assignment, so every append adds AT MOST one file per
    # bucket — without it each of the P shuffle tasks emits its own
    # per-bucket files (P x N per micro-batch, the fragmentation
    # compact_bucketed_table exists to undo)
    try:
        write_bucketed_table(
            post, postings_table, "term", n_buckets, mode="append"
        )
        dl = (
            post.groupBy("doc_id")
            .agg(F.sum("tf").alias("dl"))
            .repartition(n_buckets, F.col("doc_id"))
        )
        write_bucketed_table(
            dl, dl_table, "doc_id", n_buckets, mode="append"
        )
    finally:
        post.unpersist()


def repair_retrieval_store(
    spark,
    postings_table: str = "bm25_postings",
    dl_table: str = "bm25_doclen",
) -> None:
    """Restore append_retrieval_tables' two-table invariant after a
    crash BETWEEN its postings and doclen appends (parquet tables give
    no cross-table transaction; Iceberg would).

    Doc lengths are a pure function of postings (dl == sum(tf) per
    doc), so the repair REBUILDS the doclen table from the postings
    table — postings-sized aggregation, no corpus scan. Run it before
    retrying a failed append: the rebuilt doclen then contains every
    doc whose postings committed, so the retry's idempotence guard
    filters exactly the committed part and re-appends only what is
    missing. Every crash point is covered: before the postings commit
    (repair is a no-op, retry re-does the batch), between the appends
    (repair adds the batch to doclen, retry is a no-op), after both
    (retry is a no-op)."""
    from knowledgegraphgenerator_spark.operators.triples import (
        table_bucket_spec,
        write_bucketed_table,
    )

    # bucket count from the POSTINGS table's catalog spec — trusting a
    # caller argument would let a mere flag mismatch rewrite doclen
    # with a spec incoherent with the store it serves
    _, n_buckets = table_bucket_spec(spark, postings_table)
    dl = (
        spark.table(postings_table)
        .groupBy("doc_id")
        .agg(F.sum("tf").alias("dl"))
        .repartition(n_buckets, F.col("doc_id"))
    )
    write_bucketed_table(dl, dl_table, "doc_id", n_buckets)


def _table_or_warehouse(spark, table: str) -> DataFrame:
    """Resolve a serving table: the catalog entry when this session
    knows it (the bucketed zero-Exchange path — on a cluster a shared
    metastore makes this the norm), else the managed-table parquet
    files under the warehouse dir (the cross-process CLI path on the
    default in-memory catalog, where ``saveAsTable`` data outlives the
    session but the catalog entry does not; values are identical, the
    plan just loses the bucket-layout guarantee)."""
    from knowledgegraphgenerator_spark.operators.triples import (
        managed_table_location,
    )

    if spark.catalog.tableExists(table):
        return spark.table(table)
    return spark.read.parquet(managed_table_location(spark, table))


def bm25_topk_served(
    spark,
    query_terms: Iterable[str],
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
    postings_table: str = "bm25_postings",
    dl_table: str = "bm25_doclen",
) -> DataFrame:
    """``bm25_topk`` off the materialized retrieval store — how a
    100 TB deployment serves queries without re-tokenizing the corpus.

    The tf side is the postings CATALOG table filtered to the query's
    terms (the ``In`` filter reaches the parquet scan; the term-keyed
    df aggregation plans with zero Exchange on the bucketed layout);
    corpus scalars come from one aggregation over the doc-length
    table. Values must equal the from-tokens path exactly — gated by
    the same DuckDB oracle and a served==plain differential."""
    terms = sorted(set(query_terms))
    if not terms:
        raise ValueError("bm25_topk_served: empty query")
    post = _table_or_warehouse(spark, postings_table)
    dl = _table_or_warehouse(spark, dl_table)
    n_docs, avgdl = _dl_stats(dl)
    if n_docs == 0:
        return _empty_result(post)
    tf = post.where(F.col("term").isin(terms)).select(
        "doc_id", "term", "tf"
    )
    return _score_rank(tf, dl, n_docs, avgdl, k, k1, b)


def bm25_oracle_sql(
    tokens_sql: str,
    query_terms: Iterable[str],
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
) -> str:
    """DuckDB oracle for ``bm25_topk``: the same integer-unit scoring
    over the same token stream, N/avgdl as subqueries (exact integer
    inputs to the same IEEE double ops)."""
    terms = sorted(set(query_terms))
    c1 = round(k1 + 1.0, 10)
    c2 = round(k1 * (1.0 - b), 10)
    c3 = round(k1 * b, 10)
    in_list = ", ".join("'" + t.replace("'", "''") + "'" for t in terms)
    return (
        f"WITH toks AS ({tokens_sql}), "
        "dl AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS dl FROM toks"
        " GROUP BY doc_id), "
        "st AS (SELECT CAST(count(*) AS BIGINT) AS n,"
        " CAST(sum(dl) AS BIGINT) AS total FROM dl), "
        f"tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf"
        f" FROM toks WHERE term IN ({in_list}) GROUP BY doc_id, term), "
        "dfq AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf"
        " GROUP BY term), "
        "scored AS (SELECT doc_id,"
        " CAST(round(ln((CAST((SELECT n FROM st) AS DOUBLE) - df + 0.5)"
        " / (df + 0.5) + 1.0)"
        f" * ((tf * {c1!r}) / (tf + ({c2!r} + {c3!r}"
        " * (dl / (CAST((SELECT total FROM st) AS DOUBLE)"
        " / (SELECT n FROM st)))))) * 10000) AS BIGINT) AS s"
        " FROM tf JOIN dfq USING (term) JOIN dl USING (doc_id)), "
        "ds AS (SELECT doc_id, CAST(sum(s) AS BIGINT) AS score_i4,"
        " CAST(count(*) AS BIGINT) AS n_hit FROM scored GROUP BY doc_id), "
        "ranked AS (SELECT doc_id, CAST(row_number() OVER ("
        " ORDER BY score_i4 DESC, doc_id) AS BIGINT) AS rnk,"
        " score_i4, n_hit FROM ds) "
        f"SELECT doc_id, rnk, score_i4, n_hit FROM ranked WHERE rnk <= {k}"
    )

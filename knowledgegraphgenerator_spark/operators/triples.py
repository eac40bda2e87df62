"""Triple materialization (SURVEY.md Appendix A.10).

Canonical (subj, pred, obj) derivation applied identically to the
reference's output and the rebuild's output for P/R scoring:

  * (question, 'has_term', term)          per term except the root
  * (question, 'has_tag', tag)            per tag
  * (path[i+1], 'narrower_than', path[i]) per adjacent root→leaf pair,
                                          deduplicated
  * (term, 'has_synonym', syn)            per synonyms-map entry
  * (alt_question, 'alternate_of', primary_question) per altq edge

Scale notes: the narrower_than set is bounded by the hierarchy (tiny);
has_term/has_tag dominate and stay embarrassingly parallel (explode, no
shuffle until the final distinct). The output is written partitioned by
``pmod(xxhash64(subj), N)`` buckets — subject-hash bucketing per the north
rule, so downstream per-subject joins co-locate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from knowledgegraphgenerator_spark.config import BOT_NAME

TRIPLE_SCHEMA = "subj string, pred string, obj string"


def ontology_triples(
    onto: DataFrame, row_local_dedup: bool = False
) -> DataFrame:
    """(doc_id, question, terms, tags) -> has_term/has_tag/narrower_than.

    ``row_local_dedup`` (ADVICE r3 #3): the default corpus-global
    ``.distinct()`` on the narrower_than branch is correct for batch but
    becomes a stateful ``Deduplicate`` with UNBOUNDED cross-batch state
    inside a streaming query. Streaming callers set True: edges are
    deduplicated WITHIN each row via ``array_distinct`` (zero state, the
    plan stays map-only), and the cross-document dedup is deferred to the
    consumer / the periodic batch vocabulary refresh, which rewrites the
    graph anyway. The emitted triple SET is identical; only the
    narrower_than multiplicity differs."""
    has_term = onto.select(
        F.col("question").alias("subj"),
        F.lit("has_term").alias("pred"),
        F.explode(
            F.filter("terms", lambda t: t != F.lit(BOT_NAME))
        ).alias("obj"),
    )
    has_tag = onto.select(
        F.col("question").alias("subj"),
        F.lit("has_tag").alias("pred"),
        F.explode("tags").alias("obj"),
    )
    # sequence(1, 0) counts DOWN in Spark — guard the single-node (root
    # only) path explicitly.
    edges = F.expr(
        "transform(sequence(1, size(terms) - 1), i -> "
        "struct(reverse(terms)[i] as child,"
        " reverse(terms)[i - 1] as parent))"
    )
    if row_local_dedup:
        edges = F.array_distinct(edges)
    narrower = (
        onto.filter(F.size("terms") >= 2)
        .select(F.explode(edges).alias("e"))
        .select(
            F.col("e.child").alias("subj"),
            F.lit("narrower_than").alias("pred"),
            F.col("e.parent").alias("obj"),
        )
    )
    if not row_local_dedup:
        narrower = narrower.distinct()
    return has_term.unionByName(has_tag).unionByName(narrower)


def synonym_triples(synonyms: DataFrame) -> DataFrame:
    """(term, synonyms:array<string>) or (term, synonym) -> has_synonym."""
    if "synonyms" in synonyms.columns:
        synonyms = synonyms.select(
            "term", F.explode("synonyms").alias("synonym")
        )
    return synonyms.select(
        F.col("term").alias("subj"),
        F.lit("has_synonym").alias("pred"),
        F.col("synonym").alias("obj"),
    )


def altq_triples(altq: DataFrame) -> DataFrame:
    """(primary_question, alt_question) -> alternate_of."""
    return altq.select(
        F.col("alt_question").alias("subj"),
        F.lit("alternate_of").alias("pred"),
        F.col("primary_question").alias("obj"),
    )


def build_triples(
    onto: DataFrame,
    synonyms: DataFrame | None = None,
    altq: DataFrame | None = None,
) -> DataFrame:
    out = ontology_triples(onto)
    if synonyms is not None:
        out = out.unionByName(synonym_triples(synonyms))
    if altq is not None:
        out = out.unionByName(altq_triples(altq))
    return out.distinct()


def write_triples(
    triples: DataFrame, path: str, n_buckets: int = 32
) -> None:
    """Materialize with subject-hash bucketing (north rule): physical
    layout co-locates all facts of one subject. On an Iceberg catalog this
    is ``bucket(N, subj)`` partitioning; on plain parquet we persist the
    bucket id as a partition column with identical layout semantics."""
    (
        triples.withColumn(
            "subj_bucket", F.pmod(F.xxhash64("subj"), F.lit(n_buckets))
        )
        .repartition("subj_bucket")
        .write.mode("overwrite")
        .partitionBy("subj_bucket")
        .parquet(path)
    )


def write_triples_bucketed_table(
    triples: DataFrame, table: str, n_buckets: int = 32
) -> None:
    """The triple store: ``write_bucketed_table`` on the ``subj`` key.
    At 100 TB the triple store is joined against itself (path
    expansion) and against entity tables keyed by subj every query —
    pre-bucketing converts those from full shuffles into local
    sort-merge joins (zero-Exchange subj joins pinned in
    ``test_plans``). See ``write_bucketed_table`` for the layout and
    deletion-safety contract."""
    write_bucketed_table(triples, table, "subj", n_buckets)


def _managed_table_info(spark, table: str) -> dict:
    """Validated catalog info for an unqualified managed-table name:
    the shared preamble of every destructive table operation here
    (overwrite, compact) — one place for the name rule and the
    DESCRIBE EXTENDED fetch, so safety checks cannot drift apart."""
    import re

    if not re.fullmatch(r"[a-z_][a-z0-9_]*", table):
        raise ValueError(
            "bucketed-table operations require an unqualified "
            f"lowercase table name, got {table!r}"
        )
    if not spark.catalog.tableExists(table):
        return {}
    return {
        row.col_name: row.data_type
        for row in spark.sql(
            f"DESCRIBE TABLE EXTENDED {table}"
        ).collect()
    }


def table_bucket_spec(spark, table: str) -> tuple:
    """(bucket_col, n_buckets) of an existing bucketed catalog table —
    the catalog is the source of truth for maintenance operations
    (compact, repair); trusting caller arguments instead lets a flag
    mismatch rewrite a store with an incoherent spec."""
    info = _managed_table_info(spark, table)
    if not info:
        raise ValueError(f"no catalog table {table!r}")
    n_buckets = int(info["Num Buckets"])
    cols = [
        c.strip().strip("`")
        for c in info["Bucket Columns"].strip("[]").split(",")
    ]
    if len(cols) != 1:
        raise ValueError(
            f"single-column bucket specs only, got {cols!r} "
            f"for {table!r}"
        )
    return cols[0], n_buckets


def compact_bucketed_table(spark, table: str) -> None:
    """Rewrite an append-accumulated bucketed table into one file set
    per bucket — the maintenance step the append mode's docstring
    promises ("compact periodically"). Each ``mode='append'`` write
    adds a full file set per bucket; after many micro-batches the
    per-bucket file count (and the per-task open/seek cost of every
    bucket-riding join) grows linearly, so stores on an ingest cadence
    compact on a slower cadence, exactly like Iceberg's rewrite-files
    maintenance.

    Production-shaped swap, not an in-place overwrite (Spark cannot
    overwrite a table from a plan that reads the same table): write a
    fresh bucketed table under ``<table>__compact``, then DROP the old
    table and ALTER .. RENAME the new one into place. The bucket spec
    travels with the catalog entry through the rename (pinned in
    test_retrieval: the zero-Exchange bucket-key plan survives
    compaction). The swap window is not atomic on the in-memory
    catalog — run it inside the same maintenance lock that gates
    appends (an ingest loop is sequential anyway); on Iceberg the
    equivalent rewrite commits atomically."""
    # the bucket spec comes from the CATALOG, never from arguments: a
    # caller-supplied count that differs from the store's would make
    # the rewrite FRAGMENT the table (old-bucket tasks x new buckets
    # files) and leave a spec future appends reject. Same source of
    # truth exposes the table type: an EXTERNAL table is refused for
    # the same deletion-safety contract as the overwrite path — the
    # swap would orphan the shared external location and serve a
    # managed copy in its place.
    info = _managed_table_info(spark, table)
    if not info:
        # crash-window recovery (ADVICE r5): the swap below is
        # DROP TABLE then ALTER .. RENAME, and a crash between the two
        # leaves the serving table absent with the fully-written
        # compacted data stranded under <table>__compact. Detect that
        # exact state and rename the compacted table back into place —
        # the store is then already compacted, so return.
        leftover = f"{table}__compact"
        if _managed_table_info(spark, leftover):
            spark.sql(f"ALTER TABLE {leftover} RENAME TO {table}")
            return
        raise ValueError(
            f"compact requires an existing catalog table {table!r} "
            f"(and no recoverable {leftover!r} from an interrupted "
            "swap was found)"
        )
    if info.get("Type", "").upper() == "EXTERNAL":
        raise ValueError(
            f"refusing to compact EXTERNAL table {table!r}: the "
            "drop-and-rename swap would orphan its shared location"
        )
    bucket_col, n_buckets = table_bucket_spec(spark, table)
    tmp = f"{table}__compact"
    # ZERO-shuffle rewrite, ONE file per bucket: force the BUCKETED
    # scan for the read. The scan's bucket layout makes any explicit
    # repartition on the bucket key "redundant" to the optimizer
    # (scan outputPartitioning = HashPartitioning(bucket_col, N)), but
    # AQE's autoBucketedScan then decides no join needs the layout and
    # silently falls back to per-file scan partitions — each of which
    # writes its own per-bucket file set, leaving the "compacted"
    # store as fragmented as before (observed: 5 -> 5 files).
    # Disabling autoBucketedScan for the rewrite keeps one scan task
    # per bucket, so the write emits exactly one file per non-empty
    # bucket with no exchange anywhere (observed: 8 -> 2 files).
    key = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
    prev = spark.conf.get(key)
    spark.conf.set(key, "false")
    try:
        write_bucketed_table(
            spark.table(table), tmp, bucket_col, n_buckets
        )
    finally:
        spark.conf.set(key, prev)
    spark.sql(f"DROP TABLE {table}")
    spark.sql(f"ALTER TABLE {tmp} RENAME TO {table}")


def managed_table_location(spark, table: str) -> str:
    """The warehouse path a managed table named ``table`` lives at in
    the CURRENT database — the single place the layout rule
    (``<warehouse>/<tbl>`` vs ``<warehouse>/<db>.db/<tbl>``) is
    encoded; the bucketed-table writer's orphan cleanup and the
    cross-process read fallback (operators/retrieval.py) both use
    it so the two sides can never diverge."""
    warehouse = spark.conf.get("spark.sql.warehouse.dir")
    db = spark.catalog.currentDatabase()
    return (
        f"{warehouse.rstrip('/')}/{table}"
        if db == "default"
        else f"{warehouse.rstrip('/')}/{db}.db/{table}"
    )


def write_bucketed_table(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 32,
    mode: str = "overwrite",
) -> None:
    """Spark-NATIVE bucketed table (``bucketBy(N, bucket_col)
    .sortBy(bucket_col)`` + ``saveAsTable``): unlike a partition-column
    layout, the bucket spec lives in the catalog, so every downstream
    equi-join or aggregation on ``bucket_col`` between tables bucketed
    with the same N plans with ZERO Exchange on the bucketed sides,
    and filters on the bucket key push to the scan. This is the
    parquet twin of the Iceberg ``bucket(N, col)`` table spec
    (SURVEY.md §7.4). Serving stores built on it: the triple store
    (``write_triples_bucketed_table``, subj) and the retrieval store
    (``operators/retrieval.write_retrieval_tables``, term / doc_id).

    Idempotent across SESSIONS, not just runs: a fresh metastore does
    not know about a previous session's managed-table directory, and
    ``mode("overwrite")`` then fails with LOCATION_ALREADY_EXISTS — so
    any orphaned location is removed (via the Hadoop FileSystem API,
    which also covers non-local warehouses) after the DROP.

    Deletion safety (ADVICE r4 #3): the helper accepts only
    UNQUALIFIED lowercase table names in the CURRENT database — a
    qualified ``db.tbl`` would make the guessed ``<warehouse>/<name>``
    path wrong (the real layout is ``<warehouse>/<db>.db/<tbl>``) and
    could delete an unrelated directory sharing the name. When the
    table is still registered, its type and REAL location are
    resolved from the catalog (``DESCRIBE TABLE EXTENDED``) before the
    drop: an EXTERNAL table is REFUSED outright — DROP deliberately
    preserves external data and this helper must never recursively
    delete a shared location — while a managed table's resolved
    location is deleted. The warehouse-derived path (current-database
    aware) is only the fallback for the orphaned-directory case where
    no catalog entry exists to consult."""
    from knowledgegraphgenerator_spark.plans.runner import hadoop_fs

    spark = df.sparkSession
    info = _managed_table_info(spark, table)
    if mode == "append":
        # append rides the EXISTING table's bucket spec; the layout
        # below is the one place the spec is encoded, so an append
        # written here can never diverge from the store it extends.
        # A missing catalog entry is an error, not a CREATE: with the
        # default in-memory catalog a previous session's warehouse
        # files outlive the entry, and CREATE-over-nonempty-location
        # would throw (or, on an empty dir, silently fork a store
        # holding only this batch) — re-index with a full write, or
        # deploy with a shared metastore for cross-process appends.
        if not info:
            raise ValueError(
                f"append requires an existing catalog table {table!r}; "
                "this session's catalog does not know it (in-memory "
                "catalogs do not persist across processes) — rebuild "
                "the store with a full write or use a shared metastore"
            )
        (
            df.write.mode("append")
            .format("parquet")
            .bucketBy(n_buckets, bucket_col)
            .sortBy(bucket_col)
            .saveAsTable(table)
        )
        # a same-session READ of the table before this append (the
        # repair's postings scan, the idempotence guard's doclen probe)
        # caches the relation's FILE LISTING, and saveAsTable(append)
        # does not invalidate it — without an explicit refresh the next
        # read silently misses the appended files (observed: postings
        # append "lost" after a restart-time repair had read the table)
        spark.catalog.refreshTable(table)
        return
    if mode != "overwrite":
        raise ValueError(f"unsupported mode {mode!r}")
    location = None
    if info:
        if info.get("Type", "").upper() == "EXTERNAL":
            raise ValueError(
                f"refusing to overwrite EXTERNAL table {table!r}: its "
                "location may be shared data that DROP TABLE "
                "deliberately preserves — drop/relocate it explicitly "
                "or pass a different table name"
            )
        location = info.get("Location")
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    if location is None:
        location = managed_table_location(spark, table)
    fs, loc = hadoop_fs(spark, location)
    if fs.exists(loc):
        fs.delete(loc, True)
    (
        df.write.mode("overwrite")
        .format("parquet")
        .bucketBy(n_buckets, bucket_col)
        .sortBy(bucket_col)
        .saveAsTable(table)
    )

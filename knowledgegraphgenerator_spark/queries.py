"""Driver-verifiable query suite: one entry per operator family.

Each ``QUERIES[name]`` is ``(spark, sf_dir) -> DataFrame`` and (except the
rows-only KG-pipeline entries) has a matching ANSI-SQL oracle in
``ORACLES[name]`` that DuckDB runs on the same parquet tables. Every
computed column is aliased identically on both sides, and every value is
integer/string (or rounded once, identically) so the order-insensitive
value-hash comparison is deterministic across engines.

Coverage map to SURVEY.md §2 (reference file:line cited per query):
  scans S1-S7        parquet scans everywhere; column pruning via select
  A1/A2              term_count_threshold, bigram_count, trigram_count
  A3                 substring_dedup
  A5                 dict_merge_priority
  A4/O1-O3           doc_terms_ranked (window top-k ordering)
  G3/A.10            path_edges
  J5/G1              path_prefix_antijoin
  J2/J3 joins        top_orders_per_cust, region_supplier_counts
  left_anti          cust_no_orders
  S7 window state    last_signup_propagation, sessionize
  windowed agg       hourly_event_counts
  TPC-H-style agg    pricing_summary
  dedup (rebuild)    dedup_exact, minhash_signatures, lsh_candidate_pairs,
                     jaccard_pairs, simhash16
  similarity         embedding_topk (brute-force cosine top-k)
  text analysis      lang_id_heuristic, quality_score, token_stats,
                     token_stats_bpe, winnow_fingerprint,
                     doc_length_quantiles (exact type-7 percentiles)
  curation           pii_scrub (sequential redaction + counts),
                     repetition_signals (Gopher-style token-fraction
                     repetition cuts), domain_cap (per-source top-K),
                     stratified_sample (deterministic mod-sampling)
  term scoring       tfidf_top_terms, rake_keywords (north_star
                     TF-IDF/RAKE), term_cooccurrence (hierarchy stats)
  scale sketches     neardup_pairs_scale (xxhash minhash → 16x1 LSH →
                     exact verify; decision-level brute-force oracle);
                     neardup_components (the same chain → connected
                     components; recursive-CTE min-label oracle);
                     dup_ngram_fraction (cross-doc duplicated-span
                     diagnostic, integer per-mille);
                     BENCH_EXTRA: minhash_scale / simhash64_scale /
                     winnow_scale (bench-only — values engine-specific)
  KG pipeline        kg_triples, kg_triples_blocked, kg_ontology — FULL
                     DuckDB oracles (oracles_kg.py: the whole pipeline
                     incl. recursive-CTE masked matching and the G1/G2
                     optimiser in SQL), value-hash gated at sf0.01
  KG consumption     kg_entity_degree ((obj, pred) degree stats),
                     kg_two_hop (narrower_than self-join traversal),
                     kg_pagerank (integer-arithmetic fixed-k power
                     iteration, bit-exact cross-engine) — all gated by
                     the pipeline oracle chain extended with the same
                     aggregation/join/iteration in SQL
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from knowledgegraphgenerator_spark.operators.curation import (
    EMAIL_RE as _EMAIL_RE,
    IPV4_RE as _IPV4_RE,
    PHONE_RE as _PHONE_RE,
)
from knowledgegraphgenerator_spark.operators.retrieval import (
    bm25_oracle_sql as _bm25_oracle_sql,
)

# ---------------------------------------------------------------- helpers

DOC_STOPWORDS = ("the", "a")
VERBISH = ("scan", "sort", "merge", "join", "filter", "group", "stream",
           "hash")
MINHASH_A = (7, 11, 13, 17, 19, 23, 29, 31)
MINHASH_B = (3, 5, 7, 11, 13, 17, 19, 23)
MINHASH_P = 2147483647
SIMHASH_MULT = 2654435761
FP_MOD = 1048573


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _tokens(spark, sf_dir):
    """(doc_id, pos, term) — posexploded whitespace tokens."""
    return (
        _t(spark, sf_dir, "documents")
        .select("doc_id", F.posexplode(F.split("text", " ")).alias("pos", "term"))
        .where(F.col("term") != "")
    )


_TOKENS_SQL = (
    "SELECT * FROM ("
    "SELECT doc_id, unnest(generate_series(1, len(string_split(text,' ')))) AS pos,"
    " unnest(string_split(text,' ')) AS term FROM documents"
    ") WHERE term <> ''"
)


def _unigram_dict(spark, sf_dir):
    """Unigram dictionary: cnt > 5 (strict >, common.py:19)."""
    return (
        _tokens(spark, sf_dir)
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .where(F.col("cnt") > 5)
    )


_UNIGRAM_SQL = (
    f"SELECT term, CAST(count(*) AS BIGINT) AS cnt FROM ({_TOKENS_SQL}) "
    "GROUP BY term HAVING count(*) > 5"
)


def _bigrams(spark, sf_dir):
    """(doc_id, bigram) in document order (N6 SQL n-grams,
    phrase_finder.py:78-79 re-expressed without a UDF)."""
    return (
        _t(spark, sf_dir, "documents")
        .select("doc_id", F.split("text", " ").alias("toks"))
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(slice(toks, 1, greatest(size(toks)-1, 0)),"
                    " (x, i) -> concat(x, ' ', toks[i+1]))"
                )
            ).alias("bigram"),
        )
    )


_BIGRAMS_SQL = (
    "SELECT doc_id, unnest(list_transform("
    "list_zip(s[1:len(s)-1], s[2:]), x -> x[1] || ' ' || x[2])) AS bigram "
    "FROM (SELECT doc_id, string_split(text,' ') AS s FROM documents) "
    "WHERE len(s) >= 2"
)


def _bigram_dict(spark, sf_dir):
    return (
        _bigrams(spark, sf_dir)
        .groupBy(F.col("bigram").alias("term"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .where(F.col("cnt") > 2)
    )


_BIGRAM_DICT_SQL = (
    f"SELECT bigram AS term, CAST(count(*) AS BIGINT) AS cnt "
    f"FROM ({_BIGRAMS_SQL}) GROUP BY bigram HAVING count(*) > 2"
)


def _shingles(spark, sf_dir):
    """Distinct (doc_id, shingle) token 3-gram shingles.

    Persisted (r6): five queries derive from this exact plan
    (jaccard_pairs, trigram_count, dup_ngram_fraction, and the
    dense-id minhash family via _shingle_ids) and the distinct is a
    full shuffle of the exploded shingle set — Spark's cache manager
    dedups by canonicalized plan, so all of them share ONE entry and
    only the first action pays the materialization (the same pattern
    the r5 neardup chain queries already used).

    Distinctness is per document, so it rides ``array_distinct`` on
    the in-row shingle array — zero shuffle — instead of a row-level
    ``.distinct()`` Exchange (r6, same change as
    operators/dedup.token_shingles)."""
    return (
        _t(spark, sf_dir, "documents")
        .select("doc_id", F.split("text", " ").alias("toks"))
        .where(F.size("toks") >= 3)
        .select(
            "doc_id",
            F.explode(
                F.array_distinct(
                    F.expr(
                        "transform(slice(toks, 1, greatest(size(toks)-2, 0)),"
                        " (x, i) -> concat(x, ' ', toks[i+1], ' ', toks[i+2]))"
                    )
                )
            ).alias("shingle"),
        )
        .persist()
    )


_SHINGLES_SQL = (
    "SELECT DISTINCT doc_id, unnest(list_transform("
    "list_zip(s[1:len(s)-2], s[2:len(s)-1], s[3:]),"
    " x -> x[1] || ' ' || x[2] || ' ' || x[3])) AS shingle "
    "FROM (SELECT doc_id, string_split(text,' ') AS s FROM documents) "
    "WHERE len(s) >= 3"
)


def _shingle_ids(spark, sf_dir):
    """(doc_id, sid) — dense shingle ids, row_number over sorted shingles.

    Dense ids make every downstream hash pure integer arithmetic that
    DuckDB reproduces bit-for-bit (cross-engine hash functions differ).
    At web scale the dictionary window would be replaced by
    ``xxhash64(shingle)`` — oracle parity is why ids are used here.
    """
    sh = _shingles(spark, sf_dir)
    ids = (
        sh.select("shingle")
        .distinct()
        .withColumn(
            "sid",
            F.row_number().over(Window.orderBy("shingle")).cast("long"),
        )
    )
    return sh.join(ids, "shingle").select("doc_id", "sid")


_SHINGLE_IDS_SQL = (
    f"WITH sh AS ({_SHINGLES_SQL}), "
    "ids AS (SELECT shingle, CAST(row_number() OVER (ORDER BY shingle) AS BIGINT)"
    " AS sid FROM (SELECT DISTINCT shingle FROM sh)) "
    "SELECT sh.doc_id, ids.sid FROM sh JOIN ids USING (shingle)"
)


def _minhash_wide(spark, sf_dir):
    """(doc_id, mh0..mh7) — 8 permutation minhashes over shingle ids in
    ONE hash aggregate (guide §2.3): the 8 minima are 8 ``min`` agg
    expressions over one pass instead of an 8-way crossJoin row
    explosion + (doc_id, j) shuffle. Values identical to the historical
    long form (same ``(a*sid + b) % P`` maps)."""
    ids = _shingle_ids(spark, sf_dir)
    return ids.groupBy("doc_id").agg(
        *[
            F.min(
                (
                    F.lit(MINHASH_A[j]).cast("long") * F.col("sid")
                    + F.lit(MINHASH_B[j]).cast("long")
                )
                % MINHASH_P
            ).alias(f"mh{j}")
            for j in range(8)
        ]
    )


def _minhash(spark, sf_dir):
    """(doc_id, j, mh) — narrow posexplode of :func:`_minhash_wide`."""
    return _minhash_wide(spark, sf_dir).select(
        "doc_id",
        F.posexplode(
            F.array(*[F.col(f"mh{j}") for j in range(8)])
        ).alias("j", "mh"),
    )


_MINHASH_PARAMS_SQL = ", ".join(
    f"({j}, {MINHASH_A[j]}, {MINHASH_B[j]})" for j in range(8)
)
_MINHASH_SQL = (
    f"WITH sids AS ({_SHINGLE_IDS_SQL}), "
    f"params(j, a, b) AS (VALUES {_MINHASH_PARAMS_SQL}) "
    f"SELECT doc_id, j, min((a * sid + b) % {MINHASH_P}) AS mh "
    "FROM sids CROSS JOIN params GROUP BY doc_id, j"
)


# ---------------------------------------------------------------- queries


def q_term_count_threshold(spark, sf_dir):
    """A1/A2: corpus term counting + strict-> threshold
    (/root/reference/strategy/phrase_finder.py:21-34)."""
    return _unigram_dict(spark, sf_dir)


def q_bigram_count(spark, sf_dir):
    """N6+A1: SQL n-grams + counting (phrase_finder.py:61-65,78-79)."""
    return _bigram_dict(spark, sf_dir)


def q_trigram_count(spark, sf_dir):
    """N6 trigrams (phrase_finder.py:61)."""
    return (
        _shingles(spark, sf_dir)  # distinct per doc
        .groupBy(F.col("shingle").alias("term"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .where(F.col("cnt") > 2)
    )


def q_substring_dedup(spark, sf_dir):
    """A3: equal-count substring dedup as blocked self-join + left_anti
    (phrase_finder.py:35-44)."""
    b = _bigram_dict(spark, sf_dir)
    sub = b.select(F.col("term").alias("b_term"), "cnt")
    sup = b.select(F.col("term").alias("a_term"), "cnt")
    dropped = (
        sub.join(sup, "cnt")
        .where(
            (F.col("a_term") != F.col("b_term"))
            & (F.instr(F.col("a_term"), F.col("b_term")) > 0)
        )
        .select(F.col("b_term").alias("term"))
        .distinct()
    )
    return b.join(dropped, "term", "left_anti")


def q_dict_merge_priority(spark, sf_dir):
    """A5: dict.update overwrite merge — verbs over unigrams over phrases
    (NGramStrategy.py:52-55) as full-outer coalesce."""
    big = _bigram_dict(spark, sf_dir).select("term", F.col("cnt").alias("b_cnt"))
    uni = _unigram_dict(spark, sf_dir).select("term", F.col("cnt").alias("u_cnt"))
    verb = (
        _tokens(spark, sf_dir)
        .where(F.col("term").isin(*VERBISH))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("v_cnt"))
        .where(F.col("v_cnt") >= 2)
    )
    return (
        big.join(uni, "term", "full")
        .join(verb, "term", "full")
        .select(
            "term",
            F.coalesce("v_cnt", "u_cnt", "b_cnt").alias("merged_cnt"),
        )
    )


def _ranked(spark, sf_dir):
    """(doc_id, term, cnt, rnk): per-doc dictionary terms ranked ascending
    by corpus count (O1 — rarest first = deepest, NGramStrategy.py:105).

    Persisted (r6): path_edges references this frame four times in one
    plan (parent/child self-join + root extraction) and three queries
    (doc_terms_ranked, path_edges, path_prefix_antijoin) share the
    exact plan — one cache entry serves them all, same discipline as
    _shingles."""
    toks = _tokens(spark, sf_dir).select("doc_id", "term").distinct()
    u = _unigram_dict(spark, sf_dir)
    w = Window.partitionBy("doc_id").orderBy(F.asc("cnt"), F.asc("term"))
    return (
        toks.join(u, "term")
        .select(
            "doc_id", "term", "cnt",
            F.row_number().over(w).cast("long").alias("rnk"),
        )
        .persist()
    )


_RANKED_SQL = (
    f"WITH toks AS (SELECT DISTINCT doc_id, term FROM ({_TOKENS_SQL})), "
    f"u AS ({_UNIGRAM_SQL}) "
    "SELECT doc_id, term, cnt, CAST(row_number() OVER "
    "(PARTITION BY doc_id ORDER BY cnt ASC, term ASC) AS BIGINT) AS rnk "
    "FROM toks JOIN u USING (term)"
)


def q_doc_terms_ranked(spark, sf_dir):
    """O1/A4: per-doc term ordering by corpus frequency (window ranking)."""
    return _ranked(spark, sf_dir)


def q_path_edges(spark, sf_dir):
    """G3/A.10: root→leaf adjacency from per-doc ranked term paths
    (root = most frequent; ontology_analyzer.py:74-111 re-expressed)."""
    r = _ranked(spark, sf_dir)
    n = r.groupBy("doc_id").agg(F.max("rnk").alias("n"))
    parent = r.select("doc_id", F.col("term").alias("parent"),
                      F.col("rnk").alias("prnk"))
    child = r.select("doc_id", F.col("term").alias("child"),
                     F.col("rnk").alias("crnk"))
    inner = (
        parent.join(child, "doc_id")
        .where(F.col("prnk") == F.col("crnk") + 1)  # parent = next-more-frequent
        .select("parent", "child")
    )
    roots = (
        r.join(n, "doc_id")
        .where(F.col("rnk") == F.col("n"))  # most frequent term
        .select(F.lit("Auto Ontology").alias("parent"),
                F.col("term").alias("child"))
    )
    return inner.unionByName(roots).distinct()


def q_path_prefix_antijoin(spark, sf_dir):
    """J5/G1: paths whose parent prefix has no documents — the demotion
    anti-join (Optmiser.py:30-42)."""
    r = _ranked(spark, sf_dir)
    paths = (
        r.groupBy("doc_id")
        .agg(
            F.expr(
                "transform(sort_array(collect_list(struct(-cnt AS nc,"
                " term))), x -> x.term)"
            ).alias("path")
        )
        .select(F.concat_ws("/", "path").alias("path_str"),
                F.col("path"))
        .distinct()
    )
    with_prefix = paths.where(F.size("path") >= 2).select(
        "path_str",
        F.concat_ws("/", F.slice("path", 1, F.size("path") - 1)).alias("prefix_str"),
        F.element_at("path", -1).alias("demoted"),
    )
    return (
        with_prefix.join(
            paths.select(F.col("path_str").alias("prefix_str")),
            "prefix_str",
            "left_anti",
        ).select("path_str", "demoted")
    )


def q_dedup_exact(spark, sf_dir):
    """Exact dedup: hash-groupBy on content, keep min id."""
    return (
        _t(spark, sf_dir, "documents")
        .groupBy("text")
        .agg(
            F.min("doc_id").alias("keep_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
        .select("keep_id", "n_copies")
    )


def q_minhash_signatures(spark, sf_dir):
    """MinHash signatures (8 perms) over token-3-gram shingles."""
    return _minhash(spark, sf_dir)


def q_lsh_candidate_pairs(spark, sf_dir):
    """LSH banding (4 bands x 2 rows) → candidate near-dup pairs.

    r6 shape: bands derive NARROWLY from the wide minhash row (the r5
    even/odd split + self-join recomputed the minhash chain — and its
    global shingle-id window — four times per action), and the band
    self-join is replaced by groupBy(band, h0, h1) + in-bucket pair
    expansion (guide §2.4). Output pairs identical."""
    wide = _minhash_wide(spark, sf_dir)
    bands = wide.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).cast("int").alias("band"),
                        F.col(f"mh{2 * b}").alias("h0"),
                        F.col(f"mh{2 * b + 1}").alias("h1"),
                    )
                    for b in range(4)
                ]
            )
        ).alias("e"),
    ).select("doc_id", "e.band", "e.h0", "e.h1")
    buckets = bands.groupBy("band", "h0", "h1").agg(
        F.collect_list("doc_id").alias("ids")
    )
    from knowledgegraphgenerator_spark.operators.dedup import (
        in_bucket_pair_expr,
    )

    pair_expr = in_bucket_pair_expr("doc_a", "doc_b")
    return (
        buckets.where(F.size("ids") >= 2)
        .select(F.explode(F.expr(pair_expr)).alias("p"))
        .select("p.doc_a", "p.doc_b")
        .distinct()
    )


def q_jaccard_pairs(spark, sf_dir):
    """n-gram Jaccard near-dup pairs, all-integer (>= 0.8 as 10*i >= 8*u).

    r6 shape (output identical): the shingle self-join is replaced by
    groupBy(shingle) + in-bucket pair expansion (one shuffle of the
    shingle set instead of two + the join), the shingle frame is
    persisted (it fed three derivations), and generated pair rows are
    prefiltered by the SOUND size-compatibility bound
    ``10 * min(na, nb) >= 8 * max(na, nb)`` (inter <= min, union >=
    max, so incompatible pairs cannot pass the final threshold) via a
    broadcast of the per-doc size table BEFORE the pair-count shuffle
    (guide §2.3 / §3.2)."""
    sh = _shingles(spark, sf_dir)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    na = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na"))
    nb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"))
    sized = sh.join(sizes, "doc_id").select("doc_id", "shingle", "n")
    from knowledgegraphgenerator_spark.operators.dedup import (
        in_bucket_pair_expr,
    )

    pair_expr = in_bucket_pair_expr(
        "doc_a", "doc_b", elem_id="doc_id", compat=(8, 10)
    )
    inter = (
        sized.groupBy("shingle")
        .agg(F.collect_list(F.struct("doc_id", "n")).alias("ids"))
        .where(F.size("ids") >= 2)
        .select(F.explode(F.expr(pair_expr)).alias("p"))
        .groupBy("p.doc_a", "p.doc_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    return (
        inter.join(na, "doc_a").join(nb, "doc_b")
        .withColumn("union_n", F.col("na") + F.col("nb") - F.col("inter"))
        .where(F.col("inter") * 10 >= F.col("union_n") * 8)
        .select("doc_a", "doc_b", "inter", "union_n")
    )


def q_simhash16(spark, sf_dir):
    """16-bit SimHash from dense token ids, token-frequency weighted.

    r6 shape (output identical): the 16 per-bit contribution sums are
    16 ``sum`` agg expressions in ONE groupBy(doc_id) instead of a
    16-way crossJoin row explosion + two stacked shuffles
    ((doc_id, bit) then doc_id) — contributions are linear in the
    weight, so summing ±w per bit in one pass is exactly the old
    bit-exploded sum (guide §2.3 'aggregate before you shuffle')."""
    toks = _tokens(spark, sf_dir)
    ids = (
        toks.select("term").distinct()
        .withColumn(
            "tid", F.row_number().over(Window.orderBy("term")).cast("long")
        )
    )
    weighted = (
        toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("w"))
        .join(ids, "term")
        .withColumn("h", (F.col("tid") * SIMHASH_MULT) % 65536)
    )
    per_bit = weighted.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(
                    F.expr(f"(h >> {b}) & 1") == 1, F.col("w")
                ).otherwise(-F.col("w"))
            ).alias(f"s{b}")
            for b in range(16)
        ]
    )
    simhash = None
    for b in range(16):
        term = F.when(
            F.col(f"s{b}") > 0, F.lit(1 << b).cast("long")
        ).otherwise(F.lit(0).cast("long"))
        simhash = term if simhash is None else simhash + term
    return per_bit.select("doc_id", simhash.alias("simhash"))


def q_neardup_pairs_scale(spark, sf_dir):
    """The REAL near-dup operator chain at scale shape (VERDICT r1 #6):
    xxhash64-based MinHash (operators/dedup.py) → 16 one-row LSH bands →
    integer-exact Jaccard verify (>= 0.8). The OUTPUT is hash-function
    independent — verify is exact and banding recall at J >= 0.8 is
    1-(1-J)^16 >= 1-2.6e-12 per pair — so the brute-force DuckDB oracle
    gates the whole chain value-for-value even though the minhash values
    themselves are engine-specific."""
    from knowledgegraphgenerator_spark.operators.dedup import (
        lsh_candidate_pairs_from_wide,
        minhash_wide,
        token_shingles,
        verify_jaccard_cooccur,
    )

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    sh = token_shingles(docs, "text", "doc_id", n=3).persist()
    wide = minhash_wide(sh, "doc_id", k=16)
    # rows_per_band=1: recall-max banding; bucket guard off because the
    # oracle needs exact recall (the guard is a scale safety valve for
    # adversarial hot buckets, tested separately). compat only drops
    # pairs the 8/10 verify must reject (sound bound) inside the
    # expansion lambda, before the candidate distinct.
    pairs = lsh_candidate_pairs_from_wide(
        wide, "doc_id", rows_per_band=1, k=16, max_bucket=None,
        compat=(8, 10),
    )
    # recall-max banding over a hot vocabulary -> the co-occurrence
    # verify form (see operators/dedup.verify_jaccard_cooccur docstring).
    # NOT persisted: this frame IS the query's result — caching it would
    # make the bench's second timed run a no-op. (neardup_components /
    # neardup_keep_best persist the same frame as their INTERMEDIATE —
    # their own CC/survivor work still runs per action.)
    return verify_jaccard_cooccur(pairs, sh, "doc_id", 8, 10)


def q_dedup_chain(spark, sf_dir):
    """The full crawl-order dedup chain as ONE operator: exact hash
    dedup, then MinHash near-dedup over the survivors
    (operators/dedup.py:crawl_dedup — the ordering is structural; see
    its docstring for the measured 10^6-doc evidence). Recall-max
    banding + guard off so the brute-force DuckDB oracle gates the
    chain's kept-set value-for-value (same gating argument as
    neardup_pairs_scale: verify is exact, band recall at J >= 0.8 is
    1-(1-J)^16 per pair)."""
    from knowledgegraphgenerator_spark.operators.dedup import crawl_dedup

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return crawl_dedup(
        docs, "text", "doc_id", k=16, rows_per_band=1, max_bucket=None,
        verify_variant="cooccur",
    )


def q_incremental_neardup(spark, sf_dir):
    """Incremental dedup: the daily-ingest shape — near-dup pairs of a
    NEW batch (doc_id % 4 == 0) against the EXISTING corpus (the rest).
    New×new and old×old pairs never materialize (asymmetric band join,
    operators/dedup.py:incremental_neardup_pairs). Bucket guard off so
    the brute-force oracle gates exact recall (1-(1-J)^16 at J >= 0.8)."""
    from knowledgegraphgenerator_spark.operators.dedup import (
        incremental_neardup_pairs,
    )

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    new = docs.where(F.col("doc_id") % 4 == 0)
    old = docs.where(F.col("doc_id") % 4 != 0)
    return incremental_neardup_pairs(
        new, old, "text", "doc_id", rows_per_band=1, max_bucket=None
    )


def q_neardup_components(spark, sf_dir):
    """Near-dup CLUSTERS, not just pairs: the real sketch chain (xxhash64
    MinHash → 16x1 LSH bands → integer-exact Jaccard verify) feeds
    large-star/small-star connected components
    (operators/components.py — Kiveris et al. SOCC'14), giving each doc
    its dedup-group id (= min doc_id in the group). This puts a DuckDB
    VALUE oracle on the CC operator itself (previously unit-only): the
    oracle recomputes the same pairs brute-force and labels them with a
    recursive-CTE min-label propagation. At 100 TB this is exactly the
    keep-one-per-cluster step of fuzzy dedup; CC is shuffle-bounded
    (2 aggs/round) with per-round localCheckpoint lineage cuts."""
    from knowledgegraphgenerator_spark.operators.components import (
        connected_components,
    )
    from knowledgegraphgenerator_spark.operators.dedup import (
        lsh_candidate_pairs_from_wide,
        minhash_wide,
        token_shingles,
        verify_jaccard_cooccur,
    )

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    sh = token_shingles(docs, "text", "doc_id", n=3).persist()
    wide = minhash_wide(sh, "doc_id", k=16)
    pairs = lsh_candidate_pairs_from_wide(
        wide, "doc_id", rows_per_band=1, k=16, max_bucket=None,
        compat=(8, 10),
    )
    verified = verify_jaccard_cooccur(pairs, sh, "doc_id", 8, 10).persist()
    return connected_components(verified, "id_a", "id_b").select(
        "id", "component"
    )


def q_dup_ngram_fraction(spark, sf_dir):
    """Cross-doc duplicated-span diagnostic (RefinedWeb/Gopher-style
    'fraction of the document covered by n-grams seen elsewhere'): for
    each doc, its distinct 3-gram shingle count, how many of those
    shingles occur in >= 2 docs, and the integer per-mille dup fraction.
    The document frequency rides a count-over-window partitioned by
    shingle instead of a groupBy + join-back: ONE pass over the shingle
    set and 2 exchanges total (shingle window, doc agg) vs 5 for the
    join form, because the join form derives the exploded shingle frame
    twice. No all-pairs work, so it scales where pairwise Jaccard
    cannot; integer division keeps the oracle float-free."""
    sh = _shingles(spark, sf_dir)
    return (
        sh.withColumn(
            "df",
            F.count(F.lit(1)).over(Window.partitionBy("shingle")),
        )
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum(F.when(F.col("df") >= 2, 1).otherwise(0))
            .cast("long").alias("n_dup"),
        )
        .withColumn(
            "dup_permille",
            F.expr("(n_dup * 1000) div n_shingles").cast("long"),
        )
    )


def q_dup_span_removal(spark, sf_dir):
    """Curation: corpus-wide duplicated-span REMOVAL (C4-style drop of
    every non-canonical occurrence of a repeated 3-token span) — the
    *removal* twin of the dup_ngram_fraction diagnostic. Decision-level
    output (cleaned text + per-doc bytes removed) is value-gated; the
    operator docstring (operators/curation.py:remove_duplicate_spans)
    carries the scale shape (shingle groupBy + equi-join, no all-pairs).
    """
    from knowledgegraphgenerator_spark.operators.curation import (
        remove_duplicate_spans,
    )

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return remove_duplicate_spans(d, "text", "doc_id", k=3, min_repeats=2)


def q_dup_span_removal_hot(spark, sf_dir):
    """Curation: the HOT-SHINGLE fallback of dup_span_removal (VERDICT
    r4 #3a) — groupBy(shingle) + join-back instead of the shingle
    window, so a ~10^9-occurrence boilerplate shingle is collapsed
    map-side and AQE skew-splits the join instead of serializing one
    window partition. Row-identical to the default (differential in
    test_curation) and gated against the SAME DuckDB oracle."""
    from knowledgegraphgenerator_spark.operators.curation import (
        remove_duplicate_spans,
    )

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return remove_duplicate_spans(
        d, "text", "doc_id", k=3, min_repeats=2, variant="groupby"
    )


def q_minhash_scale(spark, sf_dir):
    """Bench-only: the xxhash64 minhash operator itself (k=16), no
    dense-id parity window (values are engine-specific -> no oracle)."""
    from knowledgegraphgenerator_spark.operators.dedup import (
        minhash_signatures as minhash_op,
        token_shingles,
    )

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return minhash_op(token_shingles(docs, "text", "doc_id", 3), "doc_id", 16)


def q_simhash64_scale(spark, sf_dir):
    """Bench-only: 64-bit xxhash64 SimHash operator (JVM-only plan)."""
    from knowledgegraphgenerator_spark.operators.dedup import simhash64

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return simhash64(docs, "text", "doc_id")


def q_winnow_scale(spark, sf_dir):
    """Bench-only: rolling 4-gram fingerprint from xxhash64 token ids —
    the winnow operator without the dense-id dictionary sort the oracle
    variant pays for DuckDB integer parity."""
    toks = _tokens(spark, sf_dir)
    w = Window.partitionBy("doc_id").orderBy("pos")
    seq = toks.withColumn("tid", F.pmod(F.xxhash64("term"), F.lit(FP_MOD)))
    grams = (
        seq.withColumn("t1", F.lead("tid", 1).over(w))
        .withColumn("t2", F.lead("tid", 2).over(w))
        .withColumn("t3", F.lead("tid", 3).over(w))
        .where(F.col("t3").isNotNull())
        .withColumn(
            "h",
            (((F.col("tid") * 31 + F.col("t1")) % FP_MOD * 31
              + F.col("t2")) % FP_MOD * 31 + F.col("t3")) % FP_MOD,
        )
    )
    return grams.groupBy("doc_id").agg(
        F.min("h").alias("fingerprint"),
        F.countDistinct("h").alias("n_shingles"),
    )


def q_embedding_topk(spark, sf_dir):
    """Brute-force cosine top-3 neighbors for query vectors (vec_id < 10).

    JVM-side posexplode + hash-agg dot products — no Python in the loop;
    the IVF/LSH-bucketed scale path lives in operators/similarity.py.
    """
    e = (
        _t(spark, sf_dir, "embeddings")
        .select(
            "vec_id",
            F.posexplode(F.col("embedding").cast("array<double>"))
            .alias("pos", "v"),
        )
    )
    norms = e.groupBy("vec_id").agg(
        F.sqrt(F.sum(F.col("v") * F.col("v"))).alias("nrm")
    )
    q = e.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "pos", F.col("v").alias("qv")
    )
    dots = (
        q.join(e, "pos")
        .where(F.col("vec_id") != F.col("query_id"))
        .groupBy("query_id", "vec_id")
        .agg(F.sum(F.col("qv") * F.col("v")).alias("dot"))
    )
    qn = norms.select(F.col("vec_id").alias("query_id"), F.col("nrm").alias("qn"))
    sims = (
        dots.join(qn, "query_id")
        .join(norms, "vec_id")
        .withColumn("sim", F.col("dot") / (F.col("qn") * F.col("nrm")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("vec_id"))
    return (
        sims.withColumn("rnk", F.row_number().over(w).cast("long"))
        .where(F.col("rnk") <= 3)
        .select("query_id", "rnk", F.col("vec_id").alias("neighbor_id"))
    )


def q_embedding_topk_ivf(spark, sf_dir):
    """The IVF operator (operators/similarity.py:ivf_topk) driven with
    n_probe == n_cells: every cell is probed, so the candidate set is
    exhaustive and the output EXACTLY equals brute force regardless of
    centroid placement — which lets the approximate-path CODE (centroid
    training, cell assignment, probed join) share embedding_topk's
    brute-force oracle value-for-value. The recall/speed trade-off with
    n_probe < n_cells is unit-tested (test_dedup_similarity)."""
    from knowledgegraphgenerator_spark.operators.similarity import ivf_topk

    vecs = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    queries = vecs.where(F.col("vec_id") < 10)
    return ivf_topk(
        vecs, queries, "vec_id", "embedding", k=3, n_cells=8, n_probe=8
    ).select("query_id", "rnk", "neighbor_id")


def q_lang_id_heuristic(spark, sf_dir):
    """Stop-word-ratio language gate (rebuild text-analysis op)."""
    toks = _tokens(spark, sf_dir)
    agg = toks.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum(
            F.when(F.col("term").isin(*DOC_STOPWORDS), 1).otherwise(0)
        ).alias("hits"),
    )
    return agg.select(
        "doc_id", "hits", "n_tokens",
        F.when(F.col("hits") * 10 >= F.col("n_tokens"), F.lit("en_like"))
        .otherwise(F.lit("other")).alias("pred"),
    )


def q_quality_score(spark, sf_dir):
    """Length/stopword/diversity quality scoring, all-integer."""
    toks = _tokens(spark, sf_dir)
    agg = toks.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.countDistinct("term").alias("n_distinct"),
        F.sum(
            F.when(F.col("term").isin(*DOC_STOPWORDS), 1).otherwise(0)
        ).alias("n_stop"),
        F.sum(F.length("term")).alias("sum_len"),
    )
    return agg.select(
        "doc_id", "n_tokens",
        F.expr("sum_len * 100 div n_tokens").alias("mean_len_x100"),
        F.expr("n_distinct * 1000 div n_tokens").alias("distinct_x1000"),
        F.expr("n_stop * 1000 div n_tokens").alias("stop_x1000"),
        F.when(
            (F.col("n_tokens") >= 20)
            & (F.expr("n_stop * 1000 div n_tokens") < 300)
            & (F.expr("n_distinct * 1000 div n_tokens") >= 200),
            F.lit("keep"),
        ).otherwise(F.lit("drop")).alias("verdict"),
    )


def q_token_stats(spark, sf_dir):
    """Token counting (whitespace tokenizer)."""
    d = _t(spark, sf_dir, "documents")
    toks = _tokens(spark, sf_dir)
    agg = toks.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.countDistinct("term").alias("n_distinct"),
    )
    return d.select("doc_id", F.length("text").alias("n_chars")).join(
        agg, "doc_id"
    )


def q_pii_scrub(spark, sf_dir):
    """Curation: PII redaction. The synthetic corpus carries no PII, so
    the query deterministically injects one email / phone / IPv4 per
    id-residue class first (same expression on the oracle side), making
    the counts and the scrubbed text non-trivial at every sf."""
    from knowledgegraphgenerator_spark.operators.curation import scrub_pii

    d = _t(spark, sf_dir, "documents")
    injected = d.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(
                F.col("doc_id") % 5 == 0,
                F.concat(
                    F.lit(" contact user"),
                    F.col("doc_id").cast("string"),
                    F.lit("@example.com"),
                ),
            ).otherwise(F.lit("")),
            F.when(F.col("doc_id") % 7 == 0, F.lit(" call +555 123 4567"))
            .otherwise(F.lit("")),
            F.when(F.col("doc_id") % 11 == 0, F.lit(" from 10.0.0.1"))
            .otherwise(F.lit("")),
        ).alias("text"),
    )
    return scrub_pii(injected).select(
        "doc_id",
        F.col("n_emails").cast("long").alias("n_emails"),
        F.col("n_ips").cast("long").alias("n_ips"),
        F.col("n_phones").cast("long").alias("n_phones"),
        "scrubbed",
    )


def q_repetition_signals(spark, sf_dir):
    """Curation: Gopher-style repetition metrics + keep/drop verdict."""
    from knowledgegraphgenerator_spark.operators.curation import (
        repetition_signals,
    )

    return repetition_signals(_t(spark, sf_dir, "documents"))


def q_domain_cap(spark, sf_dir):
    """Curation: per-source document cap (keep lowest 20 doc_ids)."""
    from knowledgegraphgenerator_spark.operators.curation import cap_per_key

    d = _t(spark, sf_dir, "documents").select("doc_id", "source")
    return cap_per_key(d, "source", "doc_id", 20)


def q_domain_cap_salted(spark, sf_dir):
    """Curation: the skew-proof salted two-pass form of the per-source
    cap (VERDICT r4 #3b) — local top-k within (key, salt) bounds any
    hot domain to n_salts*k survivors before the final rank.
    Row-identical to the window default (differential in
    test_curation) and gated against the SAME DuckDB oracle."""
    from knowledgegraphgenerator_spark.operators.curation import cap_per_key

    d = _t(spark, sf_dir, "documents").select("doc_id", "source")
    return cap_per_key(d, "source", "doc_id", 20, variant="salted")


def q_stratified_sample(spark, sf_dir):
    """Curation: deterministic per-language mod-sampling (downsample the
    head language, keep more of the tail)."""
    from knowledgegraphgenerator_spark.operators.curation import (
        mod_stratified_sample,
    )

    d = _t(spark, sf_dir, "documents").select("doc_id", "lang", "source")
    return mod_stratified_sample(
        d, "doc_id", "lang", {"en": 200, "zh": 500}, default_permille=700
    )


def q_chunk_by_tokens(spark, sf_dir):
    """Curation: token-budget chunking for training shards (40-token
    windows, 10-token overlap — small enough to split the synthetic
    10-99-token docs into 1-4 chunks each)."""
    from knowledgegraphgenerator_spark.operators.curation import (
        chunk_by_tokens,
    )

    return chunk_by_tokens(
        _t(spark, sf_dir, "documents"), max_tokens=40, overlap=10
    )


def q_canonical_urls(spark, sf_dir):
    """Curation: URL canonicalization over deterministically synthesized
    crawl URLs (the documents table carries no URL column — both sides
    build the same mixed-case/ported/tracked URLs from doc_id/source/
    lang, covering every normalization branch)."""
    from knowledgegraphgenerator_spark.operators.curation import (
        canonical_urls,
    )

    d = _t(spark, sf_dir, "documents")
    sid = F.col("doc_id").cast("string")
    url = (
        F.when(
            F.col("doc_id") % 4 == 0,
            F.concat(
                F.lit("HTTPS://WWW."), F.col("source"),
                F.lit(".Example.COM:443/"), F.col("lang"),
                F.lit("/page"), sid, F.lit("?utm_source=feed&b=2&a=1"),
            ),
        )
        .when(
            F.col("doc_id") % 4 == 1,
            F.concat(
                F.lit("http://"), F.col("source"),
                F.lit(".shop.co.uk:80/item/"), sid,
                F.lit("?id="), sid, F.lit("&fbclid=xyz"),
            ),
        )
        .when(
            F.col("doc_id") % 4 == 2,
            F.concat(
                F.lit("https://"), F.col("source"), F.lit(".org/docs/"),
                sid,
            ),
        )
        .otherwise(
            F.concat(
                F.lit("https://News."), F.col("source"),
                F.lit(".net/a?z=1&y=2&utm_campaign=x"),
            )
        )
    )
    return canonical_urls(
        d.select("doc_id", url.alias("url"))
    ).select("doc_id", "host", "registered_domain", "canonical_url")


def q_winnow_fingerprint(spark, sf_dir):
    """Rolling-hash 4-gram document fingerprint (winnowing-style min)."""
    toks = _tokens(spark, sf_dir)
    ids = (
        toks.select("term").distinct()
        .withColumn(
            "tid", F.row_number().over(Window.orderBy("term")).cast("long")
        )
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    seq = toks.join(ids, "term").select("doc_id", "pos", "tid")
    grams = (
        seq.withColumn("t1", F.lead("tid", 1).over(w))
        .withColumn("t2", F.lead("tid", 2).over(w))
        .withColumn("t3", F.lead("tid", 3).over(w))
        .where(F.col("t3").isNotNull())
        .withColumn(
            "h",
            (((F.col("tid") * 31 + F.col("t1")) % FP_MOD * 31
              + F.col("t2")) % FP_MOD * 31 + F.col("t3")) % FP_MOD,
        )
    )
    return grams.groupBy("doc_id").agg(
        F.min("h").alias("fingerprint"),
        F.countDistinct("h").alias("n_shingles"),
    )


def q_pricing_summary(spark, sf_dir):
    """TPC-H-Q1-style aggregation in exact integer cents."""
    l = _t(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") <= F.to_timestamp(F.lit("1998-09-01"))
    )
    prepared = l.select(
        "l_returnflag", "l_linestatus",
        F.round("l_quantity").cast("long").alias("qty"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("cents"),
        F.round(F.col("l_discount") * 100).cast("long").alias("disc_pct"),
        F.round(F.col("l_tax") * 100).cast("long").alias("tax_pct"),
    )
    return prepared.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum("qty").alias("sum_qty"),
        F.sum("cents").alias("sum_base_cents"),
        F.sum(F.col("cents") * (100 - F.col("disc_pct"))).alias("sum_disc_x100"),
        F.sum(
            F.col("cents") * (100 - F.col("disc_pct")) * (100 + F.col("tax_pct"))
        ).alias("sum_charge_x10000"),
        F.count(F.lit(1)).alias("count_order"),
    )


def q_top_orders_per_cust(spark, sf_dir):
    """Join + per-group top-k window (O3/A10 pattern)."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    top = (
        o.withColumn("rnk", F.row_number().over(w).cast("long"))
        .where(F.col("rnk") <= 3)
    )
    return top.join(c, top.o_custkey == c.c_custkey).select(
        "c_custkey", "c_name", "rnk", "o_orderkey",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("price_cents"),
    )


def q_cust_no_orders(spark, sf_dir):
    """left_anti join family (A3/J5 pattern)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return c.join(
        o, c.c_custkey == o.o_custkey, "left_anti"
    ).select("c_custkey", "c_name")


def q_region_supplier_counts(spark, sf_dir):
    """Multi-way broadcast join + aggregation."""
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.count(F.lit(1)).alias("n_suppliers"),
            F.sum(F.round(F.col("s_acctbal") * 100).cast("long"))
            .alias("acctbal_cents"),
        )
    )


def q_last_signup_propagation(spark, sf_dir):
    """S7 prev-primary propagation pattern: last non-null carried forward
    (CSVExportParser.py:43-76 re-expressed as a window)."""
    e = _t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return e.select(
        "event_id", "user_id",
        F.last(
            F.when(F.col("event_type") == "signup", F.col("event_id")),
            ignorenulls=True,
        ).over(w).alias("last_signup_event"),
    )


def q_hourly_event_counts(spark, sf_dir):
    """Tumbling-window aggregation (streaming-shaped, batch-executed)."""
    e = _t(spark, sf_dir, "events")
    return (
        e.select(
            F.unix_timestamp(F.date_trunc("hour", "ts")).alias("hour_epoch"),
            "event_type",
        )
        .groupBy("hour_epoch", "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def q_sessionize(spark, sf_dir):
    """Gap-based sessionization (30 min) via window cumsum."""
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wc = (
        Window.partitionBy("user_id")
        .orderBy("ts_epoch", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    with_gap = e.select(
        "user_id", "event_id",
        F.unix_timestamp("ts").alias("ts_epoch"),
        F.lag(F.unix_timestamp("ts")).over(w).alias("prev_epoch"),
    ).withColumn(
        "new_sess",
        F.when(
            F.col("prev_epoch").isNull()
            | (F.col("ts_epoch") - F.col("prev_epoch") > 1800),
            1,
        ).otherwise(0),
    )
    sess = with_gap.withColumn(
        "session_id", F.sum("new_sess").over(wc).cast("long")
    )
    return sess.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts_epoch").alias("start_epoch"),
        F.max("ts_epoch").alias("end_epoch"),
    )


def q_tfidf_top_terms(spark, sf_dir):
    """TF-IDF term scoring (north_star: 'TF-IDF/RAKE term scoring per
    partition') — top-5 terms per doc by tf·ln(N/df)."""
    toks = _tokens(spark, sf_dir)
    n_docs = _t(spark, sf_dir, "documents").count()
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scored = (
        tf.join(df_, "term")
        .withColumn("tfidf", F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df")))
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("tfidf"), F.asc("term")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("long"))
        .where(F.col("rnk") <= 5)
        .select("doc_id", "rnk", "term", "tf", "df",
                F.round("tfidf", 4).alias("tfidf"))
    )


def q_rake_keywords(spark, sf_dir):
    """RAKE keyword scoring (public Rose et al. 2010 algorithm):
    stopword-delimited chunks; word score = degree/freq within the doc;
    phrase score = sum of word scores. Top-3 phrases per doc."""
    toks = _tokens(spark, sf_dir).withColumn(
        "is_stop", F.col("term").isin(*DOC_STOPWORDS).cast("int")
    )
    w_doc = Window.partitionBy("doc_id").orderBy("pos") \
        .rowsBetween(Window.unboundedPreceding, 0)
    with_chunk = toks.withColumn("chunk_id", F.sum("is_stop").over(w_doc))
    words = with_chunk.where("is_stop = 0")
    chunk_len = words.groupBy("doc_id", "chunk_id").agg(
        F.count(F.lit(1)).alias("clen")
    )
    occ = words.join(chunk_len, ["doc_id", "chunk_id"])
    word_scores = occ.groupBy("doc_id", "term").agg(
        (F.sum("clen") / F.count(F.lit(1))).alias("wscore")
    )
    phrases_df = (
        words.groupBy("doc_id", "chunk_id")
        .agg(
            F.expr(
                "concat_ws(' ', transform(sort_array(collect_list("
                "struct(pos, term))), x -> x.term))"
            ).alias("phrase")
        )
    )
    phrase_scores = (
        words.join(word_scores, ["doc_id", "term"])
        .groupBy("doc_id", "chunk_id")
        .agg(F.sum("wscore").alias("score"))
        .join(phrases_df, ["doc_id", "chunk_id"])
        .select("doc_id", "phrase", "score")
        .distinct()
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("phrase"))
    return (
        phrase_scores.withColumn("rnk", F.row_number().over(w).cast("long"))
        .where(F.col("rnk") <= 3)
        .select("doc_id", "rnk", "phrase", F.round("score", 4).alias("score"))
    )


def q_token_stats_bpe(spark, sf_dir):
    """Token counting, BPE-ish: words vs punctuation-split subtokens.

    ``\\w+`` word tokens and single non-space-non-word marks — the
    pre-tokenization regex shape BPE tokenizers use (GPT-2-style
    pretokenizer simplified to its ASCII core; counts only, no merges).
    """
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.size(F.split(F.col("text"), r"\s+")).cast("long").alias("ws_tokens"),
        F.size(F.expr(r"regexp_extract_all(text, '\\w+', 0)"))
        .cast("long").alias("word_tokens"),
        F.size(F.expr(r"regexp_extract_all(text, '[^\\w\\s]', 0)"))
        .cast("long").alias("punct_tokens"),
    )


def q_term_cooccurrence(spark, sf_dir):
    """Co-occurrence aggregation for hierarchy statistics (north_star:
    subsumption/co-occurrence aggregation; skew notes in
    operators/skew.py:cooccurrence_counts)."""
    from knowledgegraphgenerator_spark.operators.skew import (
        cooccurrence_counts,
    )

    toks = _tokens(spark, sf_dir).select("doc_id", "term").distinct()
    dict_terms = toks.join(_unigram_dict(spark, sf_dir), "term", "semi")
    return cooccurrence_counts(dict_terms, min_count=5).select(
        "ta", "tb", "cnt"
    )


def q_salted_term_stats(spark, sf_dir):
    """The skew machinery under the driver gate: salted two-phase
    aggregation (operators/skew.py — north_star 'salted groupBy') is
    EXACT for algebraic aggregates, so plain GROUP BY SQL is its oracle.
    Output: per-token corpus count + distinct-doc count for tokens with
    cnt > 50 (the Zipf head — the keys salting exists for)."""
    from knowledgegraphgenerator_spark.operators.skew import salted_two_phase

    toks = _tokens(spark, sf_dir)
    out = salted_two_phase(
        toks.select("term", "doc_id"),
        key_cols=["term"],
        partial_aggs=[
            F.count(F.lit(1)).alias("_n"),
            F.collect_set("doc_id").alias("_docs"),
        ],
        merge_aggs=[
            F.sum("_n").alias("cnt"),
            F.size(F.array_distinct(F.flatten(F.collect_list("_docs"))))
            .cast("long").alias("n_docs"),
        ],
        n_salts=16,
    )
    return out.where(F.col("cnt") > 50).select("term", "cnt", "n_docs")


def q_parts_rollup(spark, sf_dir):
    """Grouping-sets family (SURVEY.md §2.4 'absent in reference,
    built-in if needed'): ROLLUP over (brand, type) with subtotal rows."""
    p = _t(spark, sf_dir, "part")
    return (
        p.rollup("p_brand", "p_type")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.sum(F.col("p_size").cast("long")).alias("sum_size"),
        )
        # subtotal NULLs -> explicit sentinel: keeps the cross-engine
        # value comparison free of NULL-ordering semantics
        .select(
            F.coalesce("p_brand", F.lit("(all)")).alias("brand"),
            F.coalesce("p_type", F.lit("(all)")).alias("ptype"),
            "n_parts", "sum_size",
        )
    )


def q_kg_triples(spark, sf_dir):
    """Flagship: full KG construction over the documents table
    (rows-only driver check; golden-tested in tests/test_pipeline_golden)."""
    from knowledgegraphgenerator_spark.pipeline import run_pipeline

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text", "lang")
    return run_pipeline(docs).triples


def q_kg_triples_blocked(spark, sf_dir):
    """Flagship via the token-block linking fallback (no driver collect,
    no Python broadcast of the dictionary — operators/linking.py:
    link_terms_blocked): must equal kg_triples value-for-value, gated by
    the same full-pipeline DuckDB oracle."""
    from knowledgegraphgenerator_spark.pipeline import run_pipeline

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text", "lang")
    return run_pipeline(docs, linking="blocked").triples


def q_kg_triples_auto(spark, sf_dir):
    """Flagship via linking='auto' with a deliberately tiny
    broadcast_term_limit: the auto probe (pipeline.py — collect
    limit+1 dictionary rows in ONE job) must observe the overflow and
    switch itself to the token-block path. This gates the THRESHOLD
    SWITCH end-to-end, not just the two endpoint strategies (VERDICT r2
    'Next round' #2): the result must still equal kg_triples
    value-for-value under the same full-pipeline DuckDB oracle."""
    from knowledgegraphgenerator_spark.pipeline import run_pipeline

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text", "lang")
    return run_pipeline(
        docs, linking="auto", broadcast_term_limit=8
    ).triples


def q_doc_path_coverage(spark, sf_dir):
    """Corpus-scale D1 diagnostics (analyzer.doc_path_coverage) over the
    full pipeline ontology — removes the 'analyzer is fenced to
    config-scale exports' caveat (VERDICT r1 'What's wrong' #4): the
    coverage check runs as one Arrow pass over the corpus ontology and
    is value-hash gated by the full-pipeline oracle chain."""
    from knowledgegraphgenerator_spark.operators.analyzer import (
        doc_path_coverage,
    )
    from knowledgegraphgenerator_spark.pipeline import run_pipeline

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text", "lang")
    onto = run_pipeline(docs).ontology
    return doc_path_coverage(onto)


def q_docs_at_root(spark, sf_dir):
    """Corpus-scale D2 (ontology_analyzer.py:144-158): documents
    attached directly to the synthetic root with no tags — pure
    DataFrame filter over the pipeline ontology, gated by the
    full-pipeline oracle chain. The corpus is unioned with the
    deterministic pure-stopword DOCS_AT_ROOT_SEEDS (mirrored as VALUES
    in the DuckDB oracle) so the gate's expected output is non-empty —
    at sf0.01 the synthetic docs all match some dictionary term and
    the row was trivially green on 0-vs-0 rows (VERDICT r4 #4)."""
    from knowledgegraphgenerator_spark.config import BOT_NAME
    from knowledgegraphgenerator_spark.oracles_kg import DOCS_AT_ROOT_SEEDS
    from knowledgegraphgenerator_spark.pipeline import run_pipeline

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text", "lang")
    seeds = spark.createDataFrame(
        DOCS_AT_ROOT_SEEDS, "doc_id long, text string, lang string"
    )
    onto = run_pipeline(docs.unionByName(seeds)).ontology
    return onto.where(
        (F.size("terms") == 1)
        & (F.element_at("terms", 1) == BOT_NAME)
        & (F.size("tags") == 0)
    ).select("doc_id")


def q_kg_ontology(spark, sf_dir):
    """KG ontology rows (terms/tags per doc), arrays flattened to strings
    for a stable driver-side schema (rows-only check)."""
    from knowledgegraphgenerator_spark.pipeline import run_pipeline

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text", "lang")
    onto = run_pipeline(docs).ontology
    return onto.select(
        "doc_id",
        F.concat_ws("|", "terms").alias("terms_str"),
        F.concat_ws("|", "tags").alias("tags_str"),
    )


def q_kg_entity_degree(spark, sf_dir):
    """KG consumer query #1: per (object entity, predicate) fact count +
    distinct-subject count over the full-pipeline triple set — the
    degree distribution a KG consumer checks first. One shuffle on
    (obj, pred) after the pipeline; gated by the full-pipeline DuckDB
    oracle chain extended with the same aggregation
    (oracles_kg.kg_entity_degree_oracle_sql). At 100 TB this runs off
    the bucketed triple table (operators/triples.py:
    write_triples_bucketed_table) without re-running construction."""
    from knowledgegraphgenerator_spark.pipeline import run_pipeline

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text", "lang")
    trip = run_pipeline(docs).triples
    return trip.groupBy(F.col("obj").alias("entity"), "pred").agg(
        F.count(F.lit(1)).alias("n_facts"),
        F.countDistinct("subj").alias("n_subjects"),
    )


def q_kg_two_hop(spark, sf_dir):
    """KG consumer query #2: two-hop ancestor traversal — the
    narrower_than edge set self-joined on the shared mid node
    (grandchild → parent → grandparent), distinct. The join key is the
    triple SUBJECT, so on the bucketed triple tables (bucketBy(N, subj))
    the probe side plans with zero Exchange (test_plans pins that); here
    it runs off the in-memory pipeline output and is gated by the
    full-pipeline oracle + the same self-join in SQL."""
    from knowledgegraphgenerator_spark.pipeline import run_pipeline

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text", "lang")
    nt = (
        run_pipeline(docs)
        .triples.where(F.col("pred") == "narrower_than")
        .select("subj", "obj")
    )
    a = nt.select(F.col("subj").alias("descendant"), F.col("obj").alias("mid"))
    b = nt.select(F.col("subj").alias("mid"), F.col("obj").alias("ancestor"))
    return (
        a.join(b, "mid")
        .select("descendant", "mid", "ancestor")
        .distinct()
    )


def q_kg_two_hop_served(spark, sf_dir):
    """Store-then-serve: the pipeline's triples are MATERIALIZED as a
    Spark-native bucketed table (bucketBy(8, subj) + sortBy, the parquet
    twin of Iceberg bucket(N, subj)) and the two-hop traversal then runs
    off the CATALOG table — exactly how a 100 TB consumer serves KG
    queries without re-running construction. The b side of the self-join
    keys on subj (the bucket key) and plans with NO Exchange; the a side
    keys on obj and pays the single remaining shuffle
    (test_plans.test_two_hop_on_bucketed_table_single_exchange pins
    both). Values are gated against the same full-pipeline oracle as the
    in-memory kg_two_hop — store-then-serve must be lossless."""
    from knowledgegraphgenerator_spark.operators.triples import (
        write_triples_bucketed_table,
    )
    from knowledgegraphgenerator_spark.pipeline import run_pipeline

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text", "lang")
    result = run_pipeline(docs)
    write_triples_bucketed_table(
        result.triples, "kg_triples_served_gate", n_buckets=8
    )
    result.close()
    nt = (
        spark.table("kg_triples_served_gate")
        .where(F.col("pred") == "narrower_than")
        .select("subj", "obj")
    )
    a = nt.select(F.col("subj").alias("descendant"), F.col("obj").alias("mid"))
    b = nt.select(F.col("subj").alias("mid"), F.col("obj").alias("ancestor"))
    return (
        a.join(b, "mid")
        .select("descendant", "mid", "ancestor")
        .distinct()
    )


def q_kg_ancestor_closure(spark, sf_dir):
    """KG consumer query: FULL transitive ancestor closure of the
    narrower_than hierarchy with min-hop depth — the generalization of
    kg_two_hop to arbitrary depth (reference twin: the per-node anytree
    parent walk, analyzer/ontology_analyzer.py:175-188). Iterative
    frontier BFS with per-round localCheckpoint
    (operators/components.py:ancestor_closure); oracled by a recursive
    CTE with the identical depth cap."""
    from knowledgegraphgenerator_spark.operators.components import (
        ancestor_closure,
    )
    from knowledgegraphgenerator_spark.pipeline import run_pipeline

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text", "lang")
    nt = (
        run_pipeline(docs)
        .triples.where(F.col("pred") == "narrower_than")
        .select("subj", "obj")
    )
    return ancestor_closure(nt)


def q_kg_closure_served(spark, sf_dir):
    """Store-then-serve for the ITERATIVE consumer op (round 5, TODO r4
    'possible depth'): triples materialized as the bucketBy(8, subj)
    catalog table, then the full min-hop ancestor closure runs off the
    STORED table with ``assume_distinct=True`` — the defensive dedup
    would insert an Exchange that re-partitions the edges and defeats
    the bucket layout the per-round hop join uses (single per-round
    Exchange pinned in test_plans). Gated against the SAME recursive-
    CTE oracle as the in-memory kg_ancestor_closure: serving the
    closure off the store must be lossless, which also certifies the
    stored narrower_than edge set is distinct (a duplicate row would
    surface as a duplicated closure row and fail the hash)."""
    from knowledgegraphgenerator_spark.operators.components import (
        ancestor_closure,
    )
    from knowledgegraphgenerator_spark.operators.triples import (
        write_triples_bucketed_table,
    )
    from knowledgegraphgenerator_spark.pipeline import run_pipeline

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text", "lang")
    result = run_pipeline(docs)
    write_triples_bucketed_table(
        result.triples, "kg_triples_closure_gate", n_buckets=8
    )
    result.close()
    nt = (
        spark.table("kg_triples_closure_gate")
        .where(F.col("pred") == "narrower_than")
        .select("subj", "obj")
    )
    return ancestor_closure(nt, assume_distinct=True)


def q_doc_length_quantiles(spark, sf_dir):
    """Corpus length-distribution check (the first gate a training-data
    pipeline runs before fixing token budgets): per-language doc count +
    exact interpolated p50/p90/p99 of document length. Spark
    ``percentile`` and DuckDB ``quantile_cont`` both implement the
    type-7 interpolated quantile, so the values agree to float
    round-off; rounded once to 4dp on both sides. Exact percentile is a
    full sort per group — at 100 TB swap in approx_percentile (t-digest)
    and drop the oracle to a tolerance check; the GROUPED exact form
    here shuffles only (lang, n_chars) pairs, not documents."""
    d = _t(spark, sf_dir, "documents")
    return d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.expr("percentile(n_chars, 0.5D)"), 4).alias("p50"),
        F.round(F.expr("percentile(n_chars, 0.9D)"), 4).alias("p90"),
        F.round(F.expr("percentile(n_chars, 0.99D)"), 4).alias("p99"),
    )


def q_quantiles_scale(spark, sf_dir):
    """Bench-only: the 100 TB path for doc_length_quantiles —
    ``approx_percentile`` (mergeable quantile sketch, combines in
    partial aggregates, no per-group sort). Approximate values →
    no cross-engine oracle; the exact twin above is the oracled one."""
    d = _t(spark, sf_dir, "documents")
    return d.groupBy("lang").agg(
        F.expr(
            "approx_percentile(n_chars, array(0.5D, 0.9D, 0.99D), 10000)"
        ).alias("pcts"),
        F.count(F.lit(1)).alias("n_docs"),
    )


def q_kg_pagerank(spark, sf_dir):
    """KG consumer query #3: entity importance by PageRank over the
    narrower_than graph (child → parent, so mass accumulates at
    ancestors), 3 power iterations. All arithmetic is INTEGER
    (micro-units, total mass 10^6; teleport 0.15; dangling mass
    dropped): both engines use only nonnegative integer div, so the
    DuckDB oracle (the same 3 iterations unrolled as CTEs) matches
    bit-for-bit — no float-summation-order hazard. Algorithm lives in
    operators/components.integer_pagerank (shared with the served
    variant below); each iteration is one equi-join + one aggregation,
    localCheckpointed so lineage stays bounded at 100 TB node counts."""
    from knowledgegraphgenerator_spark.operators.components import (
        integer_pagerank,
    )
    from knowledgegraphgenerator_spark.pipeline import run_pipeline

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text", "lang")
    nt = (
        run_pipeline(docs)
        .triples.where(F.col("pred") == "narrower_than")
        .select(F.col("subj").alias("src"), F.col("obj").alias("dst"))
    )
    return integer_pagerank(nt)


def q_kg_pagerank_served(spark, sf_dir):
    """Store-then-serve for the POWER-ITERATION consumer op (round-5
    depth, TODO r5 queue): triples materialized as the bucketBy(8,
    subj) catalog table, then integer PageRank runs off the STORED
    table with ``assume_distinct=True`` / ``persist=False`` — the
    defensive dedup would re-partition the edges and a persist would
    hide the bucketed scan, either way defeating the bucket layout
    that lets the per-iteration contrib join and the out-degree
    aggregation ride shuffle-free on the edge side (exactly TWO
    Exchanges per iteration, pinned in test_plans). Gated against the
    SAME unrolled-CTE oracle as the in-memory kg_pagerank: serving the
    ranks off the store must be bit-identical, which also certifies
    the stored narrower_than edge projection is distinct (a duplicate
    edge would shift integer mass and fail the hash)."""
    from knowledgegraphgenerator_spark.operators.components import (
        integer_pagerank,
    )
    from knowledgegraphgenerator_spark.operators.triples import (
        write_triples_bucketed_table,
    )
    from knowledgegraphgenerator_spark.pipeline import run_pipeline

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text", "lang")
    result = run_pipeline(docs)
    write_triples_bucketed_table(
        result.triples, "kg_triples_pr_gate", n_buckets=8
    )
    result.close()
    nt = (
        spark.table("kg_triples_pr_gate")
        .where(F.col("pred") == "narrower_than")
        .select(F.col("subj").alias("src"), F.col("obj").alias("dst"))
    )
    return integer_pagerank(nt, assume_distinct=True, persist=False)


def q_benchmark_overlap(spark, sf_dir):
    """Eval-benchmark decontamination gate: the 'benchmark suite' is a
    deterministic carve-out of the corpus itself — the distinct 3-gram
    shingles of every document with pmod(doc_id, 37) == 0 (~2.7% of
    docs, so the carved docs self-report ~full contamination and their
    near-duplicates report partial overlap — discriminating output at
    every sf). Operator: curation.benchmark_overlap — broadcast
    membership probe, one pass over the shingle set, single Exchange
    (the per-doc agg). Oracle mirrors the carve-out and the integer
    per-mille arithmetic exactly."""
    from knowledgegraphgenerator_spark.operators.curation import (
        benchmark_overlap,
    )

    sh = _shingles(spark, sf_dir)
    bench = sh.where(F.pmod(F.col("doc_id"), F.lit(37)) == 0).select(
        "shingle"
    )
    return benchmark_overlap(sh, bench, threshold_permille=200)


def q_domain_mixture_rebalance(spark, sf_dir):
    """Uniform-mixture rebalance over the source/domain axis at a 500‰
    corpus budget: head domains are clamped to the uniform share, tail
    domains keep everything. Operator: curation.domain_mixture_rebalance
    — one domain-key aggregation, broadcast rate join back, corpus never
    shuffled; keep decision is the overflow-free MINSTD scramble shared
    with mod_stratified_sample, so the DuckDB oracle reproduces the
    exact keep set."""
    from knowledgegraphgenerator_spark.operators.curation import (
        domain_mixture_rebalance,
    )

    docs = _t(spark, sf_dir, "documents").select("doc_id", "source", "lang")
    return domain_mixture_rebalance(
        docs, id_col="doc_id", domain_col="source", budget_permille=500
    ).select("doc_id", "source", "lang")


def q_training_shards(spark, sf_dir):
    """Training-shard materialization summary: deterministic MINSTD
    shard assignment (8 shards) + concat-and-chunk sequence packing
    (budget 256 tokens; a doc's pack is the fixed window containing its
    first token), aggregated to per-(shard, pack) doc and token counts.
    Operators: shards.assign_shards / shards.pack_sequences — one
    shuffle on the shard key, the per-shard layout window IS the shard
    file order. Oracle mirrors the scramble (explicit pmod) and the
    cumsum window exactly."""
    from knowledgegraphgenerator_spark.operators.shards import (
        assign_shards,
        pack_sequences,
    )

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    packed = pack_sequences(assign_shards(docs, 8), 256)
    return packed.groupBy("shard", "pack_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("n_tokens"),
    )


def q_latest_crawl(spark, sf_dir):
    """Recrawl collapse: three crawl snapshots of each page (doc_id div
    3 = the page; the three variants differ only in case, default port,
    leading www, and tracking params) canonicalize to ONE url, and
    latest_snapshot_per_url keeps the newest warc_ts, ties by min
    doc_id. Exercises the canonical_urls -> snapshot-selection chain a
    Common-Crawl corpus runs before any dedup; the oracle constructs
    the known canonical form directly (canonicalization itself is gated
    by the canonical_urls query) and mirrors the keep rule as a window.
    Timestamps are a deterministic MINSTD scramble mod 1009, so ~1/1009
    of snapshot pairs genuinely tie and the id tie-break is exercised.
    Scale shape: ONE combinable max-over-struct groupBy(url) — a hot
    clone-farm URL collapses map-side (operator docstring,
    operators/curation.py:latest_snapshot_per_url)."""
    from knowledgegraphgenerator_spark.operators.curation import (
        canonical_urls,
        latest_snapshot_per_url,
    )

    d = _t(spark, sf_dir, "documents")
    gid = F.expr("CAST(doc_id div 3 AS STRING)")
    # host derives from the PAGE id (doc_id div 3), not the per-doc
    # source column, so the three snapshots of a page genuinely share a
    # canonical url and the collapse is non-trivial (~n/3 output rows)
    site = F.expr("CAST((doc_id div 3) % 7 AS STRING)")
    url = (
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat(
                F.lit("HTTPS://WWW.Site"), site,
                F.lit(".Example.COM/p/"), gid,
                F.lit("?utm_source=crawl"),
            ),
        )
        .when(
            F.col("doc_id") % 3 == 1,
            F.concat(
                F.lit("https://site"), site,
                F.lit(".example.com:443/p/"), gid,
            ),
        )
        .otherwise(
            F.concat(
                F.lit("https://www.site"), site,
                F.lit(".example.com/p/"), gid, F.lit("?fbclid=zz"),
            )
        )
    )
    snaps = canonical_urls(
        d.select(
            "doc_id",
            "lang",
            url.alias("url"),
            (
                F.lit(1700000000)
                + F.pmod(
                    F.pmod(F.col("doc_id"), F.lit(1_000_000_007))
                    * F.lit(48271),
                    F.lit(1009),
                )
            ).cast("long").alias("warc_ts_s"),
        )
    )
    return latest_snapshot_per_url(
        snaps.select("canonical_url", "warc_ts_s", "doc_id", "lang"),
        url_col="canonical_url",
        ts_col="warc_ts_s",
        id_col="doc_id",
        payload_cols=("lang",),
    )


def q_neardup_keep_best(spark, sf_dir):
    """Retention-policy dedup: the neardup_components sketch chain
    (xxhash64 MinHash -> 16x1 LSH -> integer-exact Jaccard verify ->
    large-star/small-star CC) feeds keep_best_per_cluster — each
    near-dup cluster keeps its HIGHEST-token-count member (ties min
    doc_id), the RefinedWeb-style 'survivor is the best copy' policy
    rather than exact_dedup's first-seen keep. Oracle: the same
    recursive-CTE min-label components joined to token counts with the
    keep rule as a window. Scale shape: everything banded/blocked as in
    neardup_components plus one combinable max-over-struct agg
    (operators/components.py:keep_best_per_cluster)."""
    from knowledgegraphgenerator_spark.operators.components import (
        connected_components,
        keep_best_per_cluster,
    )
    from knowledgegraphgenerator_spark.operators.dedup import (
        lsh_candidate_pairs_from_wide,
        minhash_wide,
        token_shingles,
        verify_jaccard_cooccur,
    )

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    sh = token_shingles(docs, "text", "doc_id", n=3).persist()
    wide = minhash_wide(sh, "doc_id", k=16)
    pairs = lsh_candidate_pairs_from_wide(
        wide, "doc_id", rows_per_band=1, k=16, max_bucket=None,
        compat=(8, 10),
    )
    verified = verify_jaccard_cooccur(pairs, sh, "doc_id", 8, 10).persist()
    labels = connected_components(verified, "id_a", "id_b")
    scores = docs.select(
        F.col("doc_id").alias("id"),
        F.expr(
            "CAST(size(filter(split(text, ' '), x -> x != '')) AS BIGINT)"
        ).alias("n_tokens"),
    )
    return keep_best_per_cluster(
        labels, scores, id_col="id", comp_col="component",
        score_col="n_tokens",
    )


def q_crawl_delta(spark, sf_dir):
    """Incremental-crawl snapshot diff: two crawl cycles synthesized
    from the documents table (cycle boundaries and the changed-content
    marker are deterministic doc_id residues, mirrored verbatim in the
    oracle), diffed by md5 content hash into
    added/removed/changed/unchanged. doc_id % 5 == 4 pages exist only
    in the old crawl (removed), % 5 == 0 only in the new (added),
    % 3 == 0 survivors get ' v2' appended (changed). Exercises every
    status branch at every sf. Scale shape: one full-outer equi-join on
    the unique page key (operators/curation.py:crawl_delta)."""
    from knowledgegraphgenerator_spark.operators.curation import (
        crawl_delta,
    )

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    old = d.where(F.col("doc_id") % 5 != 0).select(
        F.col("doc_id").alias("page_id"),
        F.md5("text").alias("content_hash"),
    )
    new = d.where(F.col("doc_id") % 5 != 4).select(
        F.col("doc_id").alias("page_id"),
        F.md5(
            F.when(
                F.col("doc_id") % 3 == 0, F.concat("text", F.lit(" v2"))
            ).otherwise(F.col("text"))
        ).alias("content_hash"),
    )
    return crawl_delta(old, new, "page_id", "content_hash")


def q_host_link_graph(spark, sf_dir):
    """Web link-graph construction: deterministic HTML synthesized per
    document (double- AND single-quoted absolute links with
    case/default-port/www noise, plus a relative link on
    doc_id % 3 == 0 that extraction must DROP), then
    href extraction (regexp, zero shuffle) and host-level edge
    aggregation — the link-structure half of web-scale KG construction
    (operators/webgraph.py). The oracle mirrors the synthesis and the
    extraction with DuckDB's regexp_extract_all + the same host
    normalization."""
    from knowledgegraphgenerator_spark.operators.webgraph import (
        extract_links,
        host_link_graph,
    )

    return host_link_graph(
        extract_links(_host_pages(spark, sf_dir), "html", "url")
    )


def _host_pages(spark, sf_dir):
    """The deterministic page synthesis shared by host_link_graph and
    host_pagerank (url + html from doc_id residues)."""
    d = _t(spark, sf_dir, "documents")
    s = lambda e: F.expr(f"CAST({e} AS STRING)")  # noqa: E731
    html = F.concat(
        F.lit('<html><body><p>page</p><a href="https://site'),
        s("(doc_id * 31) % 7"),
        F.lit(".example.com/p/"),
        s("(doc_id * 31) % 211"),
        F.lit('">a</a><a href="HTTP://WWW.Site'),
        s("(doc_id + 1) % 7"),
        F.lit('.Example.COM:80/q">b</a>'),
        F.when(
            F.col("doc_id") % 3 == 0, F.lit('<a href="/rel/x">c</a>')
        ).otherwise(F.lit("")),
        F.when(
            F.col("doc_id") % 2 == 0,
            F.concat(
                F.lit("<a href='https://site"),
                s("(doc_id * 17) % 7"),
                F.lit(".example.com/s'>d</a>"),
            ),
        ).otherwise(F.lit("")),
        F.lit("</body></html>"),
    )
    url = F.concat(
        F.lit("https://site"), s("doc_id % 7"),
        F.lit(".example.com/p/"), s("doc_id"),
    )
    return d.select(url.alias("url"), html.alias("html"))


def q_host_pagerank(spark, sf_dir):
    """Web-graph authority scoring: the extracted host link graph
    (q_host_link_graph's edges, self-loops included) fed to the SAME
    integer power iteration as kg_pagerank — construct-then-consume on
    the WEB graph, not just the term KG. host_link_graph's groupBy
    output is distinct per (src, dst), so ``assume_distinct=True``
    skips the defensive dedup Exchange. Oracle: the link-graph CTE
    chain + the unrolled integer iteration (bit-exact, no floats)."""
    from knowledgegraphgenerator_spark.operators.components import (
        integer_pagerank,
    )
    from knowledgegraphgenerator_spark.operators.webgraph import (
        extract_links,
        host_link_graph,
    )

    g = host_link_graph(
        extract_links(_host_pages(spark, sf_dir), "html", "url")
    )
    nt = g.select(
        F.col("src_host").alias("src"), F.col("dst_host").alias("dst")
    )
    return integer_pagerank(nt, assume_distinct=True)


def q_host_hits(spark, sf_dir):
    """Integer HITS hubs & authorities over the same extracted host
    link graph as host_pagerank — the second classic authority score a
    crawl prioritizer runs on the web graph
    (operators/components.integer_hits). host_link_graph output is
    distinct per (src, dst) so ``assume_distinct=True`` skips the
    defensive dedup Exchange. Oracle: the link-graph CTE chain + the
    same fixed-k integer iteration unrolled (nonnegative integer
    division only — bit-exact, no floats)."""
    from knowledgegraphgenerator_spark.operators.components import (
        integer_hits,
    )
    from knowledgegraphgenerator_spark.operators.webgraph import (
        extract_links,
        host_link_graph,
    )

    g = host_link_graph(
        extract_links(_host_pages(spark, sf_dir), "html", "url")
    )
    nt = g.select(
        F.col("src_host").alias("src"), F.col("dst_host").alias("dst")
    )
    return integer_hits(nt, n_iters=2, assume_distinct=True)


# BM25 retrieval: fixed bag-of-terms query over the corpus token
# stream. Terms chosen for df spread at every sf: 'dup' is ~20x rarer
# than the rest of the vocabulary, so idf actually discriminates.
_BM25_QUERY_TERMS = ("customer", "dup", "spark", "window")


def q_bm25_topk(spark, sf_dir):
    """Okapi BM25 top-20 documents for a fixed 4-term query
    (operators/retrieval.bm25_topk): postings/df/dl built from the
    shared token stream; per-term scores in integer 1e-4 units so the
    per-doc sum is order-free (see retrieval.py module docstring);
    global top-k via TakeOrderedAndProject, rank window over the 20
    survivors only."""
    from knowledgegraphgenerator_spark.operators.retrieval import (
        bm25_topk,
    )

    return bm25_topk(
        _tokens(spark, sf_dir).select("doc_id", "term"),
        _BM25_QUERY_TERMS,
        k=20,
    )


def q_bm25_served(spark, sf_dir):
    """Store-then-serve retrieval: the postings and doc-length tables
    are MATERIALIZED as Spark-native bucketed catalog tables
    (bucketBy(8, term) / bucketBy(8, doc_id) — the triple-store
    layout, operators/retrieval.write_retrieval_tables) and the SAME
    BM25 query then runs off the store without re-tokenizing the
    corpus — the 100 TB serving shape. The term-keyed df aggregation
    rides the bucket layout with zero Exchange and the query's In
    filter reaches the parquet scan (pinned in test_retrieval).
    Gated by the same DuckDB oracle as bm25_topk — store-then-serve
    must be lossless."""
    from knowledgegraphgenerator_spark.operators.retrieval import (
        bm25_topk_served,
        write_retrieval_tables,
    )

    write_retrieval_tables(
        _tokens(spark, sf_dir).select("doc_id", "term"),
        postings_table="bm25_postings_gate",
        dl_table="bm25_doclen_gate",
        n_buckets=8,
    )
    return bm25_topk_served(
        spark,
        _BM25_QUERY_TERMS,
        k=20,
        postings_table="bm25_postings_gate",
        dl_table="bm25_doclen_gate",
    )


def q_bm25_incremental(spark, sf_dir):
    """Incremental index maintenance: the store is BUILT from the
    even-doc_id half of the corpus, the odd half is APPENDED as a
    later admitted batch (operators/retrieval.append_retrieval_tables
    — the indexing step of admit-only-novel ingestion), and the query
    is served off the merged store. Answers to the SAME DuckDB oracle
    as bm25_topk over the FULL corpus — append must equal rebuild
    value-for-value."""
    from knowledgegraphgenerator_spark.operators.retrieval import (
        append_retrieval_tables,
        bm25_topk_served,
        write_retrieval_tables,
    )

    toks = _tokens(spark, sf_dir).select("doc_id", "term")
    write_retrieval_tables(
        toks.where(F.col("doc_id") % 2 == 0),
        postings_table="bm25_inc_post_gate",
        dl_table="bm25_inc_dl_gate",
        n_buckets=8,
    )
    append_retrieval_tables(
        toks.where(F.col("doc_id") % 2 != 0),
        postings_table="bm25_inc_post_gate",
        dl_table="bm25_inc_dl_gate",
        n_buckets=8,
    )
    return bm25_topk_served(
        spark,
        _BM25_QUERY_TERMS,
        k=20,
        postings_table="bm25_inc_post_gate",
        dl_table="bm25_inc_dl_gate",
    )


def q_lm_doc_score(spark, sf_dir):
    """CCNet-style LM quality scoring (curation.lm_doc_score): every
    document scored by integer-exact negative log-likelihood under a
    corpus-trained add-one bigram LM — the perplexity-bucket signal
    that splits a crawl into head/middle/tail quality tiers (Wenzek et
    al. 2020). Self-supervised: no external model artifact. Per-bigram
    nll rounded ONCE to 1e-4 nats then summed as integers, so the
    cross-engine hash is exact (the BM25 trick)."""
    from knowledgegraphgenerator_spark.operators.curation import (
        lm_doc_score,
    )

    return lm_doc_score(
        _t(spark, sf_dir, "documents").select("doc_id", "text")
    )


def q_lm_heldout_score(spark, sf_dir):
    """Held-out LM scoring — the train/validation regime (CCNet trains
    on Wikipedia, scores the crawl): the bigram LM is trained on the
    even-doc_id half of the corpus and the odd half is scored, so
    UNSEEN bigrams and out-of-vocabulary contexts actually occur and
    the add-one smoothing path (left joins + coalesce(0)) is what the
    oracle certifies."""
    from knowledgegraphgenerator_spark.operators.curation import (
        lm_doc_score,
    )

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return lm_doc_score(
        docs.where(F.col("doc_id") % 2 != 0),
        train=docs.where(F.col("doc_id") % 2 == 0),
    )


def q_lm_ppl_buckets(spark, sf_dir):
    """The CCNet head/middle/tail split itself (Wenzek et al. 2020 §4.3
    — the corpus is divided into three equal-mass perplexity tiers and
    training mixes sample by tier): exact terciles of avg_nll_i4 are
    computed ONCE (type-7 `percentile`, the doc_length_quantiles
    parity shape — swap to approx_percentile at 100 TB), broadcast,
    and every document is assigned its tier in a narrow map — CCNet's
    actual production design (cutoffs are computed on a sample once,
    then assignment streams). Integer scores make the tier boundaries
    cross-engine-safe: a type-7 cut only ever equals a data value
    exactly or falls strictly between two integers, so <= comparisons
    cannot disagree on float round-off."""
    from knowledgegraphgenerator_spark.operators.curation import (
        lm_doc_score,
    )

    # persisted: both the tercile aggregation and the returned frame
    # consume the full scoring lineage — without this the corpus-wide
    # LM scoring runs twice
    scores = lm_doc_score(
        _t(spark, sf_dir, "documents").select("doc_id", "text")
    ).persist()
    cuts = scores.agg(
        F.expr("percentile(avg_nll_i4, 0.33333D)").alias("c1"),
        F.expr("percentile(avg_nll_i4, 0.66667D)").alias("c2"),
    )
    return scores.crossJoin(F.broadcast(cuts)).select(
        "doc_id",
        "avg_nll_i4",
        F.when(F.col("avg_nll_i4") <= F.col("c1"), F.lit("head"))
        .when(F.col("avg_nll_i4") <= F.col("c2"), F.lit("middle"))
        .otherwise(F.lit("tail"))
        .alias("bucket"),
    )


# RefinedWeb line-dedup seeds: the synthetic documents are single-line,
# so the corpus is unioned with deterministic multi-line documents
# (mirrored as VALUES in the DuckDB oracle — the docs_at_root seeding
# pattern) so the gate has discriminating non-zero n_dropped rows at
# every sf.
LINE_DEDUP_SEEDS = [
    (
        900000001,
        "cookie notice\nreal paragraph one\ncookie notice"
        "\nreal paragraph two\ncookie notice",
    ),
    (900000002, "a\n\n\nb\n\na"),
    (900000003, "no repeats here"),
]


def q_line_dedup(spark, sf_dir):
    """RefinedWeb-style in-document line dedup
    (curation.drop_repeated_lines): repeated exact lines removed
    keeping the first — nav bars / cookie banners / footers inside one
    page. Narrow zero-shuffle map; corpus unioned with
    LINE_DEDUP_SEEDS for discriminating output (see constant)."""
    from knowledgegraphgenerator_spark.operators.curation import (
        drop_repeated_lines,
    )

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    seeds = spark.createDataFrame(
        LINE_DEDUP_SEEDS, "doc_id long, text string"
    )
    return drop_repeated_lines(docs.unionByName(seeds))


def q_host_hits_served(spark, sf_dir):
    """Store-then-serve for HITS (the host_hits twin of
    kg_pagerank_served): the extracted host link graph is MATERIALIZED
    as a bucketBy(8, src) catalog table
    (operators/triples.write_bucketed_table) and integer HITS runs off
    the STORED edges with ``assume_distinct=True`` / ``persist=False``
    so the defensive dedup / persist cannot repartition away the
    bucket layout the hub-side joins ride. Gated against the SAME
    unrolled-CTE oracle as host_hits: serving off the store must be
    bit-identical, which also certifies the stored edge projection is
    distinct."""
    from knowledgegraphgenerator_spark.operators.components import (
        integer_hits,
    )
    from knowledgegraphgenerator_spark.operators.triples import (
        write_bucketed_table,
    )
    from knowledgegraphgenerator_spark.operators.webgraph import (
        extract_links,
        host_link_graph,
    )

    g = host_link_graph(
        extract_links(_host_pages(spark, sf_dir), "html", "url")
    )
    write_bucketed_table(
        g.select(
            F.col("src_host").alias("src"), F.col("dst_host").alias("dst")
        ),
        "host_edges_hits_gate",
        "src",
        n_buckets=8,
    )
    return integer_hits(
        spark.table("host_edges_hits_gate"),
        n_iters=2,
        assume_distinct=True,
        persist=False,
    )


def q_bpe_merge_pairs(spark, sf_dir):
    """Tokenizer-training prep: the corpus-wide adjacent character-pair
    statistic that drives one BPE merge iteration (Sennrich et al.
    2016) — pair counts weighted by word frequency, top-20 with rank.
    Two combinable groupBys (word dictionary, then pair agg over the
    DICTIONARY — ~|vocab| rows, not corpus tokens) + a
    TakeOrderedAndProject top-k; the ANSI sequence(1,0)-counts-DOWN
    trap is guarded by the length >= 2 filter."""
    toks = _tokens(spark, sf_dir)
    words = toks.groupBy("term").agg(F.count(F.lit(1)).alias("cnt"))
    pairs = words.where(F.length("term") >= 2).select(
        F.explode(
            F.expr(
                "transform(sequence(1, length(term) - 1),"
                " i -> substring(term, i, 2))"
            )
        ).alias("pair"),
        "cnt",
    )
    agg = pairs.groupBy("pair").agg(
        F.sum("cnt").cast("long").alias("cnt")
    )
    topk = agg.orderBy(F.desc("cnt"), F.asc("pair")).limit(20)
    w = Window.orderBy(F.desc("cnt"), F.asc("pair"))
    return topk.select(
        "pair", "cnt", F.row_number().over(w).cast("long").alias("rnk")
    )


# Anchor-text synthesis: deterministic pages whose <a> elements carry
# multi-word anchor TEXT (surface forms for the target host). The
# d%2==0 branch uses a single-quoted href with case/port/www noise so
# both quote styles AND host normalization are exercised; the d%3==0
# branch is a relative link extraction must DROP.
_ANCHOR_W1 = ("download", "install", "docs", "blog", "pricing")
_ANCHOR_W2 = ("spark", "engine", "guide")


def _anchor_pages(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    s = lambda e: F.expr(f"CAST({e} AS STRING)")  # noqa: E731
    w1 = F.element_at(
        F.array(*[F.lit(x) for x in _ANCHOR_W1]),
        (F.col("doc_id") % 5 + 1).cast("int"),
    )
    w2 = F.element_at(
        F.array(*[F.lit(x) for x in _ANCHOR_W2]),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    html = F.concat(
        F.lit('<html><p>page</p><a href="https://site'),
        s("(doc_id * 31) % 7"),
        F.lit(".example.com/p/"),
        s("(doc_id * 31) % 211"),
        F.lit('">'),
        w1,
        F.lit(" "),
        w2,
        F.lit("</a>"),
        F.when(
            F.col("doc_id") % 2 == 0,
            F.concat(
                F.lit("<a href='HTTPS://WWW.Site"),
                s("(doc_id * 17) % 7"),
                F.lit(".Example.COM:443/s'>"),
                w2,
                F.lit(" homepage</a>"),
            ),
        ).otherwise(F.lit("")),
        F.when(
            F.col("doc_id") % 3 == 0,
            F.lit('<a href="/rel/x">skip me</a>'),
        ).otherwise(F.lit("")),
        F.lit("</html>"),
    )
    url = F.concat(
        F.lit("https://site"), s("doc_id % 7"),
        F.lit(".example.com/p/"), s("doc_id"),
    )
    return d.select(url.alias("url"), html.alias("html"))


def q_anchor_text_profile(spark, sf_dir):
    """Per-host anchor-text surface forms: extract each absolute link
    WITH its anchor text (operators/webgraph.extract_anchors — whole
    <a> elements, both quote styles, no parser), normalize the target
    host, tokenize the anchors, and rank the top-3 terms per host
    (anchor_text_profile — per-key window, WindowGroupLimit-eligible).
    The oracle mirrors the synthesis, the two-pass element scan, and
    the host normalization in DuckDB."""
    from knowledgegraphgenerator_spark.operators.webgraph import (
        anchor_text_profile,
        extract_anchors,
    )

    return anchor_text_profile(
        extract_anchors(_anchor_pages(spark, sf_dir), "html", "url"),
        top_k=3,
    )


# Registry ORDER is deliberate: the driver gate reports exactly the
# FIRST 50 registry entries, so the first 50 slots carry every query
# that is new or changed this round, and the tail ROTATES (VERDICT r4
# "What's wrong" #2 / ADVICE r4 #4) so the union of consecutive
# CORRECTNESS_r{N} reports covers every registered name. Round-5
# rotation: the six TPC-H-ish tail queries of r4 (hourly_event_counts,
# parts_rollup, pricing_summary, top_orders_per_cust, cust_no_orders,
# region_supplier_counts) move INTO the first 50; twelve stable queries
# with green driver rows in r02-r04 (kg_ontology, trigram_count,
# dict_merge_priority, simhash16, canonical_urls, quality_score,
# token_stats, token_stats_bpe, winnow_fingerprint, lang_id_heuristic,
# pii_scrub, repetition_signals, domain_cap) move to the tail to make
# room for the four NEW round-5 queries (kg_pagerank_served,
# benchmark_overlap, domain_mixture_rebalance, training_shards), which
# take first-50 slots. Late-round-5 additions: latest_crawl,
# neardup_keep_best, crawl_delta, host_link_graph, and host_pagerank
# are NEW and take first-50 slots; jaccard_pairs, embedding_topk,
# minhash_signatures, sessionize, and path_prefix_antijoin (green
# driver rows r02-r04) rotate to the tail. Final round-5 additions:
# bm25_topk, anchor_text_profile, host_hits, and bpe_merge_pairs are
# NEW and take first-50 slots; stratified_sample, chunk_by_tokens,
# doc_length_quantiles, and salted_term_stats (green driver rows
# r03-r04) rotate to the tail; bm25_served (store-then-serve off
# bucketed postings/doclen catalog tables) and bm25_incremental
# (append-vs-rebuild store maintenance) are NEW in first-50 slots and
# doc_path_coverage / last_signup_propagation (green r02-r04) rotate
# to the tail. Post-round-5 additions: lm_doc_score (CCNet bigram-LM
# quality scoring), line_dedup (RefinedWeb in-doc line dedup), and
# host_hits_served (HITS off the bucketed edge store) are NEW and take
# first-50 slots; term_count_threshold, bigram_count, and
# substring_dedup (green driver rows in EVERY round r01-r04) rotate to
# the tail, as does doc_terms_ranked to make room for lm_heldout_score
# (held-out train/score split exercising the unseen-event smoothing
# path) and path_edges for lm_ppl_buckets (the CCNet head/middle/tail
# tier split).
# The FULL registry — all entries, count-asserted — is certified every
# round by scripts/full_gate.py (CORRECTNESS_LOCAL_r{N}.json).
QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "lm_doc_score": q_lm_doc_score,
    "lm_heldout_score": q_lm_heldout_score,
    "lm_ppl_buckets": q_lm_ppl_buckets,
    "line_dedup": q_line_dedup,
    "host_hits_served": q_host_hits_served,
    "host_pagerank": q_host_pagerank,
    "dedup_exact": q_dedup_exact,
    "lsh_candidate_pairs": q_lsh_candidate_pairs,
    "crawl_delta": q_crawl_delta,
    "embedding_topk_ivf": q_embedding_topk_ivf,
    "latest_crawl": q_latest_crawl,
    "neardup_keep_best": q_neardup_keep_best,
    "benchmark_overlap": q_benchmark_overlap,
    "domain_mixture_rebalance": q_domain_mixture_rebalance,
    "training_shards": q_training_shards,
    "domain_cap_salted": q_domain_cap_salted,
    "bm25_topk": q_bm25_topk,
    "bm25_served": q_bm25_served,
    "bm25_incremental": q_bm25_incremental,
    "anchor_text_profile": q_anchor_text_profile,
    "host_hits": q_host_hits,
    "bpe_merge_pairs": q_bpe_merge_pairs,
    "tfidf_top_terms": q_tfidf_top_terms,
    "rake_keywords": q_rake_keywords,
    "term_cooccurrence": q_term_cooccurrence,
    "host_link_graph": q_host_link_graph,
    "hourly_event_counts": q_hourly_event_counts,
    "parts_rollup": q_parts_rollup,
    "pricing_summary": q_pricing_summary,
    "top_orders_per_cust": q_top_orders_per_cust,
    "cust_no_orders": q_cust_no_orders,
    "region_supplier_counts": q_region_supplier_counts,
    "neardup_pairs_scale": q_neardup_pairs_scale,
    "neardup_components": q_neardup_components,
    "dup_ngram_fraction": q_dup_ngram_fraction,
    "dup_span_removal": q_dup_span_removal,
    "dup_span_removal_hot": q_dup_span_removal_hot,
    "dedup_chain": q_dedup_chain,
    "incremental_neardup": q_incremental_neardup,
    "kg_triples": q_kg_triples,
    "kg_triples_blocked": q_kg_triples_blocked,
    "kg_triples_auto": q_kg_triples_auto,
    "kg_entity_degree": q_kg_entity_degree,
    "kg_two_hop": q_kg_two_hop,
    "kg_ancestor_closure": q_kg_ancestor_closure,
    "kg_two_hop_served": q_kg_two_hop_served,
    "kg_closure_served": q_kg_closure_served,
    "kg_pagerank": q_kg_pagerank,
    "kg_pagerank_served": q_kg_pagerank_served,
    "docs_at_root": q_docs_at_root,
    # --- position 51+ (rotating tail, see comment above): stable
    # queries with green driver rows in r02-r04; certified by
    # scripts/full_gate.py every round
    "doc_path_coverage": q_doc_path_coverage,
    "last_signup_propagation": q_last_signup_propagation,
    "stratified_sample": q_stratified_sample,
    "chunk_by_tokens": q_chunk_by_tokens,
    "doc_length_quantiles": q_doc_length_quantiles,
    "salted_term_stats": q_salted_term_stats,
    "lang_id_heuristic": q_lang_id_heuristic,
    "pii_scrub": q_pii_scrub,
    "repetition_signals": q_repetition_signals,
    "domain_cap": q_domain_cap,
    "kg_ontology": q_kg_ontology,
    "trigram_count": q_trigram_count,
    "dict_merge_priority": q_dict_merge_priority,
    "simhash16": q_simhash16,
    "canonical_urls": q_canonical_urls,
    "quality_score": q_quality_score,
    "token_stats": q_token_stats,
    "token_stats_bpe": q_token_stats_bpe,
    "winnow_fingerprint": q_winnow_fingerprint,
    "jaccard_pairs": q_jaccard_pairs,
    "embedding_topk": q_embedding_topk,
    "minhash_signatures": q_minhash_signatures,
    "sessionize": q_sessionize,
    "path_prefix_antijoin": q_path_prefix_antijoin,
    "term_count_threshold": q_term_count_threshold,
    "bigram_count": q_bigram_count,
    "substring_dedup": q_substring_dedup,
    "doc_terms_ranked": q_doc_terms_ranked,
    "path_edges": q_path_edges,
}

# Bench-only callables (timed by bench.py, not driver-gated): the raw
# sketch operators whose output values are hash-engine-specific, so a
# DuckDB value oracle is impossible by construction. Their DECISION-level
# composition (neardup_pairs_scale) IS oracle-gated above.
BENCH_EXTRA: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "minhash_scale": q_minhash_scale,
    "simhash64_scale": q_simhash64_scale,
    "winnow_scale": q_winnow_scale,
    "quantiles_scale": q_quantiles_scale,
}


ORACLES: dict[str, str] = {
    "term_count_threshold": _UNIGRAM_SQL,
    "bigram_count": _BIGRAM_DICT_SQL,
    "trigram_count": (
        f"SELECT shingle AS term, CAST(count(*) AS BIGINT) AS cnt "
        f"FROM ({_SHINGLES_SQL}) GROUP BY shingle HAVING count(*) > 2"
    ),
    "substring_dedup": (
        f"WITH b AS ({_BIGRAM_DICT_SQL}) "
        "SELECT term, cnt FROM b x WHERE NOT EXISTS ("
        "SELECT 1 FROM b o WHERE o.cnt = x.cnt AND o.term <> x.term"
        " AND position(x.term IN o.term) > 0)"
    ),
    "dict_merge_priority": (
        f"WITH big AS ({_BIGRAM_DICT_SQL}), uni AS ({_UNIGRAM_SQL}), "
        f"verb AS (SELECT term, CAST(count(*) AS BIGINT) AS cnt "
        f"FROM ({_TOKENS_SQL}) WHERE term IN "
        f"{VERBISH!r} GROUP BY term HAVING count(*) >= 2) "
        "SELECT coalesce(verb.term, uni.term, big.term) AS term, "
        "coalesce(verb.cnt, uni.cnt, big.cnt) AS merged_cnt "
        "FROM big FULL OUTER JOIN uni ON big.term = uni.term "
        "FULL OUTER JOIN verb ON coalesce(uni.term, big.term) = verb.term"
    ),
    "doc_terms_ranked": _RANKED_SQL,
    "path_edges": (
        f"WITH r AS ({_RANKED_SQL}), "
        "n AS (SELECT doc_id, max(rnk) AS n FROM r GROUP BY doc_id), "
        "inner_e AS (SELECT DISTINCT p.term AS parent, c.term AS child "
        "FROM r p JOIN r c ON p.doc_id = c.doc_id AND p.rnk = c.rnk + 1), "
        "roots AS (SELECT DISTINCT 'Auto Ontology' AS parent, r.term AS child "
        "FROM r JOIN n ON r.doc_id = n.doc_id AND r.rnk = n.n) "
        "SELECT * FROM (SELECT * FROM inner_e UNION SELECT * FROM roots)"
    ),
    "path_prefix_antijoin": (
        f"WITH r AS ({_RANKED_SQL}), "
        "paths AS (SELECT DISTINCT "
        "array_to_string(list(term ORDER BY cnt DESC, term ASC), '/') AS path_str, "
        "list(term ORDER BY cnt DESC, term ASC) AS path "
        "FROM r GROUP BY doc_id), "
        "p2 AS (SELECT DISTINCT path_str, "
        "array_to_string(path[1:len(path)-1], '/') AS prefix_str, "
        "path[len(path)] AS demoted FROM paths WHERE len(path) >= 2) "
        "SELECT path_str, demoted FROM p2 WHERE prefix_str NOT IN "
        "(SELECT path_str FROM paths)"
    ),
    "dedup_exact": (
        "SELECT min(doc_id) AS keep_id, CAST(count(*) AS BIGINT) AS n_copies "
        "FROM documents GROUP BY text"
    ),
    "minhash_signatures": _MINHASH_SQL,
    "lsh_candidate_pairs": (
        f"WITH mh AS ({_MINHASH_SQL}), "
        "sigs AS (SELECT e.doc_id, CAST(e.j / 2 AS INT) AS band,"
        " e.mh AS h0, o.mh AS h1 "
        "FROM mh e JOIN mh o ON e.doc_id = o.doc_id AND o.j = e.j + 1 "
        "WHERE e.j % 2 = 0) "
        "SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b "
        "FROM sigs a JOIN sigs b ON a.band = b.band AND a.h0 = b.h0"
        " AND a.h1 = b.h1 WHERE a.doc_id < b.doc_id"
    ),
    "jaccard_pairs": (
        f"WITH sh AS ({_SHINGLES_SQL}), "
        "sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM sh"
        " GROUP BY doc_id), "
        "ix AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,"
        " CAST(count(*) AS BIGINT) AS inter "
        "FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id "
        "GROUP BY a.doc_id, b.doc_id) "
        "SELECT doc_a, doc_b, inter, na.n + nb.n - inter AS union_n "
        "FROM ix JOIN sizes na ON ix.doc_a = na.doc_id "
        "JOIN sizes nb ON ix.doc_b = nb.doc_id "
        "WHERE inter * 10 >= (na.n + nb.n - inter) * 8"
    ),
    # brute-force exact-Jaccard oracle for the xxhash-minhash+LSH+verify
    # chain: output equality holds because verify is integer-exact and
    # 16x1 banding recall at J>=0.8 is 1-(1-J)^16 (see q_neardup_pairs_scale)
    "neardup_pairs_scale": (
        f"WITH sh AS ({_SHINGLES_SQL}), "
        "sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM sh"
        " GROUP BY doc_id), "
        "ix AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,"
        " CAST(count(*) AS BIGINT) AS inter "
        "FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id "
        "GROUP BY a.doc_id, b.doc_id) "
        "SELECT id_a, id_b, inter, na.n + nb.n - inter AS union_n "
        "FROM ix JOIN sizes na ON ix.id_a = na.doc_id "
        "JOIN sizes nb ON ix.id_b = nb.doc_id "
        "WHERE inter * 10 >= (na.n + nb.n - inter) * 8"
    ),
    "dedup_chain": (
        # exact dedup (keep min id per text), then brute-force Jaccard
        # near-dedup among the survivors; drop every id_b of a verified
        # pair (id_a < id_b) — the same star-drop rule as the operator
        "WITH uniq AS MATERIALIZED ("
        " SELECT min(doc_id) AS doc_id, text FROM documents"
        " GROUP BY text), "
        "toks AS (SELECT doc_id, string_split(text, ' ') AS s FROM uniq), "
        "sh AS MATERIALIZED ("
        " SELECT DISTINCT doc_id, unnest(list_transform("
        " list_zip(s[1:len(s)-2], s[2:len(s)-1], s[3:]),"
        " x -> x[1] || ' ' || x[2] || ' ' || x[3])) AS shingle"
        " FROM toks WHERE len(s) >= 3), "
        "sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM sh"
        " GROUP BY doc_id), "
        "ix AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,"
        " CAST(count(*) AS BIGINT) AS inter"
        " FROM sh a JOIN sh b ON a.shingle = b.shingle"
        " AND a.doc_id < b.doc_id GROUP BY 1, 2), "
        "drp AS (SELECT DISTINCT id_b FROM ix"
        " JOIN sizes na ON ix.id_a = na.doc_id"
        " JOIN sizes nb ON ix.id_b = nb.doc_id"
        " WHERE inter * 10 >= (na.n + nb.n - inter) * 8) "
        "SELECT u.doc_id, u.text FROM uniq u"
        " LEFT JOIN drp d ON u.doc_id = d.id_b WHERE d.id_b IS NULL"
    ),
    "incremental_neardup": (
        f"WITH sh AS ({_SHINGLES_SQL}), "
        "shn AS (SELECT * FROM sh WHERE doc_id % 4 = 0), "
        "sho AS (SELECT * FROM sh WHERE doc_id % 4 <> 0), "
        "sn AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM shn"
        " GROUP BY 1), "
        "so AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM sho"
        " GROUP BY 1), "
        "ix AS (SELECT a.doc_id AS id_new, b.doc_id AS id_old,"
        " CAST(count(*) AS BIGINT) AS inter FROM shn a"
        " JOIN sho b ON a.shingle = b.shingle GROUP BY 1, 2) "
        "SELECT id_new, id_old, inter, sn.n + so.n - inter AS union_n"
        " FROM ix JOIN sn ON ix.id_new = sn.doc_id"
        " JOIN so ON ix.id_old = so.doc_id"
        " WHERE inter * 10 >= (sn.n + so.n - inter) * 8"
    ),
    "simhash16": (
        f"WITH toks AS ({_TOKENS_SQL}), "
        "ids AS (SELECT term, CAST(row_number() OVER (ORDER BY term) AS BIGINT)"
        " AS tid FROM (SELECT DISTINCT term FROM toks)), "
        "weighted AS (SELECT doc_id, t.term, CAST(count(*) AS BIGINT) AS w,"
        f" (any_value(tid) * {SIMHASH_MULT}) % 65536 AS h "
        "FROM toks t JOIN ids USING (term) GROUP BY doc_id, t.term), "
        "bits AS (SELECT unnest(generate_series(0, 15)) AS bit), "
        "persig AS (SELECT doc_id, bit, sum(CASE WHEN (h >> bit) & 1 = 1"
        " THEN w ELSE -w END) AS s FROM weighted CROSS JOIN bits"
        " GROUP BY doc_id, bit) "
        "SELECT doc_id, CAST(sum(CASE WHEN s > 0 THEN (1 << bit)"
        " ELSE 0 END) AS BIGINT) AS simhash FROM persig GROUP BY doc_id"
    ),
    "embedding_topk": (
        "WITH e AS (SELECT vec_id,"
        " unnest(generate_series(1, len(embedding))) AS pos,"
        " CAST(unnest(embedding) AS DOUBLE) AS v FROM embeddings), "
        "norms AS (SELECT vec_id, sqrt(sum(v * v)) AS nrm FROM e"
        " GROUP BY vec_id), "
        "q AS (SELECT vec_id AS query_id, pos, v AS qv FROM e"
        " WHERE vec_id < 10), "
        "dots AS (SELECT query_id, e.vec_id, sum(qv * v) AS dot "
        "FROM q JOIN e USING (pos) WHERE e.vec_id <> q.query_id "
        "GROUP BY query_id, e.vec_id), "
        "sims AS (SELECT query_id, d.vec_id,"
        " dot / (qn.nrm * nn.nrm) AS sim "
        "FROM dots d JOIN norms qn ON d.query_id = qn.vec_id "
        "JOIN norms nn ON d.vec_id = nn.vec_id), "
        "ranked AS (SELECT query_id, vec_id, CAST(row_number() OVER "
        "(PARTITION BY query_id ORDER BY sim DESC, vec_id ASC) AS BIGINT)"
        " AS rnk FROM sims) "
        "SELECT query_id, rnk, vec_id AS neighbor_id FROM ranked"
        " WHERE rnk <= 3"
    ),
    "lang_id_heuristic": (
        f"WITH toks AS ({_TOKENS_SQL}), "
        "agg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens, "
        f"CAST(sum(CASE WHEN term IN {DOC_STOPWORDS!r} THEN 1 ELSE 0 END)"
        " AS BIGINT) AS hits FROM toks GROUP BY doc_id) "
        "SELECT doc_id, hits, n_tokens, CASE WHEN hits * 10 >= n_tokens"
        " THEN 'en_like' ELSE 'other' END AS pred FROM agg"
    ),
    "pii_scrub": (
        "WITH inj AS (SELECT doc_id, text"
        " || CASE WHEN doc_id % 5 = 0 THEN ' contact user' ||"
        " CAST(doc_id AS VARCHAR) || '@example.com' ELSE '' END"
        " || CASE WHEN doc_id % 7 = 0 THEN ' call +555 123 4567'"
        " ELSE '' END"
        " || CASE WHEN doc_id % 11 = 0 THEN ' from 10.0.0.1' ELSE '' END"
        " AS text FROM documents), "
        "s1 AS (SELECT doc_id,"
        f" CAST(len(regexp_extract_all(text, '{_EMAIL_RE}')) AS BIGINT)"
        " AS n_emails,"
        f" regexp_replace(text, '{_EMAIL_RE}', '<EMAIL>', 'g') AS t1"
        " FROM inj), "
        "s2 AS (SELECT doc_id, n_emails,"
        f" CAST(len(regexp_extract_all(t1, '{_IPV4_RE}')) AS BIGINT)"
        " AS n_ips,"
        f" regexp_replace(t1, '{_IPV4_RE}', '<IP>', 'g') AS t2 FROM s1) "
        "SELECT doc_id, n_emails, n_ips,"
        f" CAST(len(regexp_extract_all(t2, '{_PHONE_RE}')) AS BIGINT)"
        " AS n_phones,"
        f" regexp_replace(t2, '{_PHONE_RE}', '<PHONE>', 'g') AS scrubbed"
        " FROM s2"
    ),
    "repetition_signals": (
        f"WITH toks AS ({_TOKENS_SQL}), "
        "uni AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS c"
        " FROM toks GROUP BY 1, 2), "
        "tu AS (SELECT doc_id, max(c) AS top_uni_cnt,"
        " CAST(sum(c) AS BIGINT) AS n_tokens FROM uni GROUP BY 1), "
        "seq AS (SELECT doc_id, pos, term,"
        " lead(term, 1) OVER w AS nxt, lead(term, 2) OVER w AS t2,"
        " lead(term, 3) OVER w AS t3, lead(term, 4) OVER w AS t4"
        " FROM toks WINDOW w AS (PARTITION BY doc_id ORDER BY pos)), "
        "bi AS (SELECT doc_id, term, nxt, count(*) AS c FROM seq"
        " WHERE nxt IS NOT NULL GROUP BY 1, 2, 3), "
        "tb AS (SELECT doc_id, CAST(max(c) AS BIGINT) AS top_bi_cnt"
        " FROM bi GROUP BY 1), "
        "g5 AS (SELECT doc_id, term || chr(2) || nxt || chr(2) || t2"
        " || chr(2) || t3 || chr(2) || t4 AS g FROM seq"
        " WHERE t4 IS NOT NULL), "
        "d5 AS (SELECT doc_id, CAST(count(g) - count(DISTINCT g) AS BIGINT)"
        " AS dup5_mass FROM g5 GROUP BY 1) "
        "SELECT tu.doc_id, n_tokens, top_uni_cnt,"
        " coalesce(top_bi_cnt, 0) AS top_bi_cnt,"
        " coalesce(dup5_mass, 0) AS dup5_mass,"
        " CASE WHEN n_tokens >= 15"
        " AND top_uni_cnt * 1000 // n_tokens < 300"
        " AND coalesce(top_bi_cnt, 0) * 1000 // n_tokens < 180"
        " AND coalesce(dup5_mass, 0) * 1000 // n_tokens < 300"
        " THEN 'keep' ELSE 'drop' END AS verdict "
        "FROM tu LEFT JOIN tb ON tu.doc_id = tb.doc_id"
        " LEFT JOIN d5 ON tu.doc_id = d5.doc_id"
    ),
    "domain_cap": (
        "SELECT doc_id, source FROM ("
        "SELECT doc_id, source, row_number() OVER ("
        "PARTITION BY source ORDER BY doc_id) AS rn FROM documents"
        ") WHERE rn <= 20"
    ),
    "stratified_sample": (
        # pmod spelled explicitly (((x % P) + P) % P) so negative ids
        # agree with Spark's pmod — DuckDB's % is sign-preserving
        "SELECT doc_id, lang, source FROM documents"
        " WHERE ((((doc_id % 1000000007) + 1000000007) % 1000000007)"
        " * 48271) % 1000 < CASE"
        " WHEN lang = 'en' THEN 200 WHEN lang = 'zh' THEN 500"
        " ELSE 700 END"
    ),
    "chunk_by_tokens": (
        "WITH t AS (SELECT doc_id,"
        " list_filter(string_split(text, ' '), x -> x <> '') AS toks"
        " FROM documents), "
        "n AS (SELECT doc_id, toks, len(toks) AS n FROM t"
        " WHERE len(toks) > 0), "
        "c AS (SELECT doc_id, toks, n, unnest(generate_series(0,"
        " greatest(1, (n - 10 + 29) // 30) - 1)) AS chunk_id FROM n) "
        "SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,"
        " CAST(len(toks[chunk_id * 30 + 1 :"
        " least(chunk_id * 30 + 40, n)]) AS BIGINT) AS n_chunk_tokens,"
        " array_to_string(toks[chunk_id * 30 + 1 :"
        " least(chunk_id * 30 + 40, n)], ' ') AS chunk_text FROM c"
    ),
    "canonical_urls": (
        "WITH urls AS (SELECT doc_id, CASE"
        " WHEN doc_id % 4 = 0 THEN 'HTTPS://WWW.' || source ||"
        " '.Example.COM:443/' || lang || '/page' ||"
        " CAST(doc_id AS VARCHAR) || '?utm_source=feed&b=2&a=1'"
        " WHEN doc_id % 4 = 1 THEN 'http://' || source ||"
        " '.shop.co.uk:80/item/' || CAST(doc_id AS VARCHAR) || '?id=' ||"
        " CAST(doc_id AS VARCHAR) || '&fbclid=xyz'"
        " WHEN doc_id % 4 = 2 THEN 'https://' || source || '.org/docs/'"
        " || CAST(doc_id AS VARCHAR)"
        " ELSE 'https://News.' || source ||"
        " '.net/a?z=1&y=2&utm_campaign=x' END AS url FROM documents), "
        "parts AS (SELECT doc_id,"
        " lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1))"
        " AS scheme,"
        " lower(regexp_extract(url,"
        " '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)', 1)) AS hostport,"
        " regexp_extract(url,"
        " '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1) AS rawpath,"
        " regexp_extract(url, '\\?([^#]*)', 1) AS rawq FROM urls), "
        "hosts AS (SELECT doc_id, scheme, rawpath, rawq,"
        " regexp_replace(CASE"
        " WHEN scheme = 'http' THEN regexp_replace(hostport, ':80$', '')"
        " WHEN scheme = 'https' THEN regexp_replace(hostport, ':443$', '')"
        " ELSE hostport END,"
        " '^www\\.', '') AS host FROM parts), "
        "comp AS (SELECT doc_id, scheme, rawpath, host,"
        " string_split(host, '.') AS labs,"
        " coalesce(array_to_string(list_sort(list_filter("
        "string_split(rawq, '&'), p -> p <> '' AND NOT regexp_matches(p,"
        " '^(utm_[a-z]+|fbclid|gclid|msclkid|ref)='))), '&'), '') AS cq"
        " FROM hosts) "
        "SELECT doc_id, host,"
        " CASE WHEN len(labs) >= 3 AND labs[-2] IN"
        " ('co','com','net','org','gov','ac','edu')"
        " THEN labs[-3] || '.' || labs[-2] || '.' || labs[-1]"
        " WHEN len(labs) >= 2 THEN labs[-2] || '.' || labs[-1]"
        " ELSE host END AS registered_domain,"
        " scheme || '://' || host ||"
        " (CASE WHEN rawpath = '' THEN '/' ELSE rawpath END) ||"
        " (CASE WHEN cq = '' THEN '' ELSE '?' || cq END)"
        " AS canonical_url FROM comp"
    ),
    "quality_score": (
        f"WITH toks AS ({_TOKENS_SQL}), "
        "agg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens, "
        "CAST(count(DISTINCT term) AS BIGINT) AS n_distinct, "
        f"CAST(sum(CASE WHEN term IN {DOC_STOPWORDS!r} THEN 1 ELSE 0 END)"
        " AS BIGINT) AS n_stop, "
        "CAST(sum(length(term)) AS BIGINT) AS sum_len FROM toks"
        " GROUP BY doc_id) "
        "SELECT doc_id, n_tokens, sum_len * 100 // n_tokens AS mean_len_x100, "
        "n_distinct * 1000 // n_tokens AS distinct_x1000, "
        "n_stop * 1000 // n_tokens AS stop_x1000, "
        "CASE WHEN n_tokens >= 20 AND n_stop * 1000 // n_tokens < 300 AND "
        "n_distinct * 1000 // n_tokens >= 200 THEN 'keep' ELSE 'drop' END"
        " AS verdict FROM agg"
    ),
    "token_stats": (
        f"WITH toks AS ({_TOKENS_SQL}), "
        "agg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens, "
        "CAST(count(DISTINCT term) AS BIGINT) AS n_distinct FROM toks"
        " GROUP BY doc_id) "
        "SELECT d.doc_id, CAST(length(d.text) AS BIGINT) AS n_chars,"
        " n_tokens, n_distinct FROM documents d JOIN agg"
        " ON d.doc_id = agg.doc_id"
    ),
    "winnow_fingerprint": (
        f"WITH toks AS ({_TOKENS_SQL}), "
        "ids AS (SELECT term, CAST(row_number() OVER (ORDER BY term) AS BIGINT)"
        " AS tid FROM (SELECT DISTINCT term FROM toks)), "
        "seq AS (SELECT doc_id, pos, tid FROM toks JOIN ids USING (term)), "
        "grams AS (SELECT doc_id, tid, "
        "lead(tid, 1) OVER w AS t1, lead(tid, 2) OVER w AS t2,"
        " lead(tid, 3) OVER w AS t3 FROM seq"
        " WINDOW w AS (PARTITION BY doc_id ORDER BY pos)) "
        f"SELECT doc_id, min((((tid * 31 + t1) % {FP_MOD} * 31 + t2)"
        f" % {FP_MOD} * 31 + t3) % {FP_MOD}) AS fingerprint, "
        "CAST(count(DISTINCT (((tid * 31 + t1) % "
        f"{FP_MOD} * 31 + t2) % {FP_MOD} * 31 + t3) % {FP_MOD})"
        " AS BIGINT) AS n_shingles "
        "FROM grams WHERE t3 IS NOT NULL GROUP BY doc_id"
    ),
    "salted_term_stats": (
        f"SELECT term, CAST(count(*) AS BIGINT) AS cnt, "
        f"CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs "
        f"FROM ({_TOKENS_SQL}) GROUP BY term HAVING count(*) > 50"
    ),
    "parts_rollup": (
        "SELECT coalesce(p_brand, '(all)') AS brand,"
        " coalesce(p_type, '(all)') AS ptype,"
        " CAST(count(*) AS BIGINT) AS n_parts, "
        "CAST(sum(p_size) AS BIGINT) AS sum_size "
        "FROM part GROUP BY ROLLUP (p_brand, p_type)"
    ),
    "token_stats_bpe": (
        "SELECT doc_id, "
        "CAST(len(string_split_regex(text, '\\s+')) AS BIGINT) AS ws_tokens, "
        "CAST(len(regexp_extract_all(text, '\\w+')) AS BIGINT)"
        " AS word_tokens, "
        "CAST(len(regexp_extract_all(text, '[^\\w\\s]')) AS BIGINT)"
        " AS punct_tokens FROM documents"
    ),
    "term_cooccurrence": (
        f"WITH toks AS (SELECT DISTINCT doc_id, term FROM ({_TOKENS_SQL})), "
        f"u AS ({_UNIGRAM_SQL}), "
        "dt AS (SELECT doc_id, term FROM toks WHERE term IN"
        " (SELECT term FROM u)) "
        "SELECT a.term AS ta, b.term AS tb, CAST(count(*) AS BIGINT) AS cnt "
        "FROM dt a JOIN dt b ON a.doc_id = b.doc_id AND a.term < b.term "
        "GROUP BY a.term, b.term HAVING count(*) >= 5"
    ),
    "tfidf_top_terms": (
        f"WITH toks AS ({_TOKENS_SQL}), "
        "tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf"
        " FROM toks GROUP BY doc_id, term), "
        "dfq AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf"
        " GROUP BY term), "
        "n AS (SELECT CAST(count(*) AS DOUBLE) AS nd FROM documents), "
        "scored AS (SELECT doc_id, term, tf, df,"
        " tf * ln(nd / df) AS tfidf FROM tf JOIN dfq USING (term), n), "
        "ranked AS (SELECT *, CAST(row_number() OVER (PARTITION BY doc_id"
        " ORDER BY tfidf DESC, term ASC) AS BIGINT) AS rnk FROM scored) "
        "SELECT doc_id, rnk, term, tf, df, round(tfidf, 4) AS tfidf"
        " FROM ranked WHERE rnk <= 5"
    ),
    "rake_keywords": (
        f"WITH toks AS (SELECT *, CASE WHEN term IN {DOC_STOPWORDS!r}"
        f" THEN 1 ELSE 0 END AS is_stop FROM ({_TOKENS_SQL})), "
        "wc AS (SELECT *, sum(is_stop) OVER (PARTITION BY doc_id"
        " ORDER BY pos ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
        " AS chunk_id FROM toks), "
        "words AS (SELECT * FROM wc WHERE is_stop = 0), "
        "clens AS (SELECT doc_id, chunk_id, CAST(count(*) AS BIGINT)"
        " AS clen FROM words GROUP BY doc_id, chunk_id), "
        "occ AS (SELECT w.doc_id, w.chunk_id, w.term, w.pos, clen"
        " FROM words w JOIN clens USING (doc_id, chunk_id)), "
        "ws AS (SELECT doc_id, term,"
        " CAST(sum(clen) AS DOUBLE) / count(*) AS wscore FROM occ"
        " GROUP BY doc_id, term), "
        "phr AS (SELECT doc_id, chunk_id,"
        " string_agg(term, ' ' ORDER BY pos) AS phrase FROM words"
        " GROUP BY doc_id, chunk_id), "
        "ps AS (SELECT DISTINCT w.doc_id, phrase, score FROM "
        "(SELECT doc_id, chunk_id, sum(wscore) AS score FROM words"
        " JOIN ws USING (doc_id, term) GROUP BY doc_id, chunk_id) w "
        "JOIN phr ON w.doc_id = phr.doc_id AND w.chunk_id = phr.chunk_id), "
        "ranked AS (SELECT *, CAST(row_number() OVER (PARTITION BY doc_id"
        " ORDER BY score DESC, phrase ASC) AS BIGINT) AS rnk FROM ps) "
        "SELECT doc_id, rnk, phrase, round(score, 4) AS score FROM ranked"
        " WHERE rnk <= 3"
    ),
    "pricing_summary": (
        "WITH prepared AS (SELECT l_returnflag, l_linestatus, "
        "CAST(round(l_quantity) AS BIGINT) AS qty, "
        "CAST(round(l_extendedprice * 100) AS BIGINT) AS cents, "
        "CAST(round(l_discount * 100) AS BIGINT) AS disc_pct, "
        "CAST(round(l_tax * 100) AS BIGINT) AS tax_pct "
        "FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-01') "
        "SELECT l_returnflag, l_linestatus, "
        "CAST(sum(qty) AS BIGINT) AS sum_qty, "
        "CAST(sum(cents) AS BIGINT) AS sum_base_cents, "
        "CAST(sum(cents * (100 - disc_pct)) AS BIGINT) AS sum_disc_x100, "
        "CAST(sum(cents * (100 - disc_pct) * (100 + tax_pct)) AS BIGINT)"
        " AS sum_charge_x10000, "
        "CAST(count(*) AS BIGINT) AS count_order "
        "FROM prepared GROUP BY l_returnflag, l_linestatus"
    ),
    "top_orders_per_cust": (
        "WITH top AS (SELECT *, CAST(row_number() OVER (PARTITION BY o_custkey"
        " ORDER BY o_totalprice DESC, o_orderkey ASC) AS BIGINT) AS rnk"
        " FROM orders) "
        "SELECT c_custkey, c_name, rnk, o_orderkey, "
        "CAST(round(o_totalprice * 100) AS BIGINT) AS price_cents "
        "FROM top JOIN customer ON top.o_custkey = customer.c_custkey "
        "WHERE rnk <= 3"
    ),
    "cust_no_orders": (
        "SELECT c_custkey, c_name FROM customer WHERE NOT EXISTS "
        "(SELECT 1 FROM orders WHERE o_custkey = c_custkey)"
    ),
    "region_supplier_counts": (
        "SELECT r_name, CAST(count(*) AS BIGINT) AS n_suppliers, "
        "CAST(sum(CAST(round(s_acctbal * 100) AS BIGINT)) AS BIGINT)"
        " AS acctbal_cents "
        "FROM supplier JOIN nation ON s_nationkey = n_nationkey "
        "JOIN region ON n_regionkey = r_regionkey GROUP BY r_name"
    ),
    "last_signup_propagation": (
        "SELECT event_id, user_id, "
        "last_value(CASE WHEN event_type = 'signup' THEN event_id END"
        " IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY ts, event_id"
        " ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
        " AS last_signup_event FROM events"
    ),
    "hourly_event_counts": (
        "SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_epoch,"
        " event_type, CAST(count(*) AS BIGINT) AS n "
        "FROM events GROUP BY 1, 2"
    ),
    "sessionize": (
        "WITH g AS (SELECT user_id, event_id,"
        " CAST(floor(epoch(ts)) AS BIGINT) AS ts_epoch, "
        "CAST(floor(epoch(lag(ts) OVER (PARTITION BY user_id ORDER BY ts,"
        " event_id))) AS BIGINT) AS prev_epoch FROM events), "
        "s AS (SELECT *, CASE WHEN prev_epoch IS NULL OR ts_epoch -"
        " prev_epoch > 1800 THEN 1 ELSE 0 END AS new_sess FROM g), "
        "t AS (SELECT *, CAST(sum(new_sess) OVER (PARTITION BY user_id"
        " ORDER BY ts_epoch, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND"
        " CURRENT ROW) AS BIGINT) AS session_id FROM s) "
        "SELECT user_id, session_id, CAST(count(*) AS BIGINT) AS n_events, "
        "min(ts_epoch) AS start_epoch, max(ts_epoch) AS end_epoch "
        "FROM t GROUP BY user_id, session_id"
    ),
}

# kg_triples / kg_ontology: the FULL pipeline (normalize → chunker →
# dictionary → greedy masked matching → optimiser → triples) expressed in
# DuckDB SQL, generated from the same pinned spec tables the engine uses —
# rows-only in round 1, three-check gated from round 2 (oracles_kg.py).
from knowledgegraphgenerator_spark.oracles_kg import (  # noqa: E402
    kg_ancestor_closure_oracle_sql,
    kg_docs_at_root_oracle_sql,
    kg_entity_degree_oracle_sql,
    kg_ontology_oracle_sql,
    kg_pagerank_oracle_sql,
    kg_path_coverage_oracle_sql,
    kg_triples_oracle_sql,
    kg_two_hop_oracle_sql,
)

ORACLES["embedding_topk_ivf"] = ORACLES["embedding_topk"]
ORACLES["kg_triples"] = kg_triples_oracle_sql()
ORACLES["kg_triples_blocked"] = kg_triples_oracle_sql()
ORACLES["kg_triples_auto"] = kg_triples_oracle_sql()
ORACLES["kg_ontology"] = kg_ontology_oracle_sql()
ORACLES["kg_entity_degree"] = kg_entity_degree_oracle_sql()
ORACLES["kg_two_hop"] = kg_two_hop_oracle_sql()
ORACLES["kg_ancestor_closure"] = kg_ancestor_closure_oracle_sql()
# the served variant reads the SAME pipeline triples back from the
# bucketed catalog table — lossless store-then-serve is exactly what
# sharing the oracle verifies
ORACLES["kg_closure_served"] = ORACLES["kg_ancestor_closure"]
# store-then-serve must be lossless: the bucketed-table variant is gated
# against the SAME oracle as the in-memory traversal
ORACLES["kg_two_hop_served"] = kg_two_hop_oracle_sql()
ORACLES["kg_pagerank"] = kg_pagerank_oracle_sql()
# store-then-serve must be BIT-identical for the integer power
# iteration: the bucketed-table variant shares the unrolled-CTE oracle
ORACLES["kg_pagerank_served"] = kg_pagerank_oracle_sql()
# decontamination: benchmark = shingles of docs with pmod(doc_id,37)=0,
# mirrored here with DuckDB's sign-preserving % wrapped to pmod
ORACLES["benchmark_overlap"] = (
    f"WITH sh AS ({_SHINGLES_SQL}), "
    "bench AS (SELECT DISTINCT shingle FROM sh"
    " WHERE ((doc_id % 37) + 37) % 37 = 0), "
    "m AS (SELECT s.doc_id,"
    " CASE WHEN b.shingle IS NOT NULL THEN 1 ELSE 0 END AS hit"
    " FROM sh s LEFT JOIN bench b ON s.shingle = b.shingle) "
    "SELECT doc_id, CAST(count(*) AS BIGINT) AS n_shingles,"
    " CAST(sum(hit) AS BIGINT) AS n_hit,"
    " CAST(sum(hit) * 1000 // count(*) AS BIGINT)"
    " AS contaminated_permille,"
    " CASE WHEN sum(hit) * 1000 // count(*) >= 200 THEN 'drop'"
    " ELSE 'keep' END AS verdict"
    " FROM m GROUP BY doc_id"
)
# uniform-mixture rebalance: integer rate derivation + the same
# explicit-pmod MINSTD scramble as the stratified_sample oracle
ORACLES["domain_mixture_rebalance"] = (
    "WITH c AS (SELECT source, CAST(count(*) AS BIGINT) AS c"
    " FROM documents GROUP BY source), "
    "t AS (SELECT CAST(sum(c) AS BIGINT) AS total,"
    " CAST(count(*) AS BIGINT) AS d FROM c), "
    "r AS (SELECT source,"
    " least(1000, (total * 500 // 1000 // d) * 1000 // c) AS rate"
    " FROM c, t) "
    "SELECT doc_id, source, lang FROM documents JOIN r USING (source)"
    " WHERE ((((doc_id % 1000000007) + 1000000007) % 1000000007)"
    " * 48271) % 1000 < rate"
)
ORACLES["training_shards"] = (
    "WITH t AS (SELECT doc_id,"
    " ((((doc_id % 1000000007) + 1000000007) % 1000000007) * 48271)"
    " % 8 AS shard,"
    " len(list_filter(string_split(text, ' '), x -> x <> ''))"
    " AS n_tokens FROM documents), "
    "p AS (SELECT shard, doc_id, n_tokens,"
    " sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id"
    " ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens"
    " AS start_offset FROM t WHERE n_tokens > 0) "
    "SELECT CAST(shard AS BIGINT) AS shard,"
    " CAST(start_offset // 256 AS BIGINT) AS pack_id,"
    " CAST(count(*) AS BIGINT) AS n_docs,"
    " CAST(sum(n_tokens) AS BIGINT) AS n_tokens"
    " FROM p GROUP BY shard, start_offset // 256"
)
ORACLES["doc_path_coverage"] = kg_path_coverage_oracle_sql()
ORACLES["docs_at_root"] = kg_docs_at_root_oracle_sql()

# Near-dup clusters: brute-force pairs (same SQL as neardup_pairs_scale)
# labeled by recursive-CTE min-label propagation. In an undirected
# component the set of nodes reachable from x IS the component, so
# min(reachable) = the component minimum — the same label
# large-star/small-star converges to. `edges` is MATERIALIZED: DuckDB
# 1.0 inlines CTEs, and an inlined CTE referenced from inside a
# recursive CTE re-evaluates every round.
ORACLES["neardup_components"] = (
    f"WITH RECURSIVE sh AS MATERIALIZED ({_SHINGLES_SQL}), "
    "sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM sh"
    " GROUP BY doc_id), "
    "ix AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,"
    " CAST(count(*) AS BIGINT) AS inter "
    "FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id "
    "GROUP BY a.doc_id, b.doc_id), "
    "pairs AS MATERIALIZED ("
    "SELECT id_a, id_b FROM ix "
    "JOIN sizes na ON ix.id_a = na.doc_id "
    "JOIN sizes nb ON ix.id_b = nb.doc_id "
    "WHERE inter * 10 >= (na.n + nb.n - inter) * 8), "
    "edges AS MATERIALIZED ("
    "SELECT id_a AS src, id_b AS dst FROM pairs "
    "UNION SELECT id_b, id_a FROM pairs), "
    "reach(id, comp) AS ("
    "SELECT src, src FROM edges "
    "UNION SELECT e.src, r.comp FROM edges e JOIN reach r ON e.dst = r.id) "
    "SELECT id, min(comp) AS component FROM reach GROUP BY id"
)

# Retention-policy dedup: the same recursive-CTE component labels joined
# to whitespace token counts; the keep rule (max n_tokens, ties min id)
# as a window — Spark's combinable max-over-struct must agree exactly.
ORACLES["neardup_keep_best"] = (
    f"WITH RECURSIVE sh AS MATERIALIZED ({_SHINGLES_SQL}), "
    "sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM sh"
    " GROUP BY doc_id), "
    "ix AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,"
    " CAST(count(*) AS BIGINT) AS inter "
    "FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id "
    "GROUP BY a.doc_id, b.doc_id), "
    "pairs AS MATERIALIZED ("
    "SELECT id_a, id_b FROM ix "
    "JOIN sizes na ON ix.id_a = na.doc_id "
    "JOIN sizes nb ON ix.id_b = nb.doc_id "
    "WHERE inter * 10 >= (na.n + nb.n - inter) * 8), "
    "edges AS MATERIALIZED ("
    "SELECT id_a AS src, id_b AS dst FROM pairs "
    "UNION SELECT id_b, id_a FROM pairs), "
    "reach(id, comp) AS ("
    "SELECT src, src FROM edges "
    "UNION SELECT e.src, r.comp FROM edges e JOIN reach r ON e.dst = r.id), "
    "labels AS (SELECT id, min(comp) AS component FROM reach GROUP BY id), "
    "nt AS (SELECT doc_id AS id,"
    " CAST(len(list_filter(string_split(text, ' '), x -> x <> ''))"
    " AS BIGINT) AS n_tokens FROM documents), "
    "m AS (SELECT l.component, l.id, nt.n_tokens"
    " FROM labels l JOIN nt USING (id)) "
    "SELECT CAST(component AS BIGINT) AS component,"
    " CAST(id AS BIGINT) AS kept_id,"
    " CAST(n_tokens AS BIGINT) AS best_score,"
    " CAST(n_members AS BIGINT) AS n_members FROM ("
    "SELECT component, id, n_tokens,"
    " row_number() OVER (PARTITION BY component"
    " ORDER BY n_tokens DESC, id ASC) AS rn,"
    " count(*) OVER (PARTITION BY component) AS n_members FROM m"
    ") WHERE rn = 1"
)

# Recrawl collapse: the oracle constructs the known canonical form of
# the three synthesized snapshot variants directly (canonicalization is
# separately gated by canonical_urls) and mirrors newest-ts-min-id as a
# window over the same MINSTD-scrambled timestamps.
ORACLES["latest_crawl"] = (
    "WITH t AS (SELECT doc_id, lang,"
    " 'https://site' || CAST((doc_id // 3) % 7 AS VARCHAR) ||"
    " '.example.com/p/' ||"
    " CAST(doc_id // 3 AS VARCHAR) AS canonical_url,"
    " 1700000000 + ((((doc_id % 1000000007) + 1000000007) % 1000000007)"
    " * 48271) % 1009 AS warc_ts_s"
    " FROM documents) "
    "SELECT canonical_url, CAST(warc_ts_s AS BIGINT) AS warc_ts_s,"
    " CAST(doc_id AS BIGINT) AS doc_id, lang,"
    " CAST(n_snapshots AS BIGINT) AS n_snapshots FROM ("
    "SELECT *,"
    " row_number() OVER (PARTITION BY canonical_url"
    " ORDER BY warc_ts_s DESC, doc_id ASC) AS rn,"
    " count(*) OVER (PARTITION BY canonical_url) AS n_snapshots FROM t"
    ") WHERE rn = 1"
)

# Incremental-crawl snapshot diff: same residue-defined cycles and
# changed-content marker, same md5, FULL OUTER JOIN + CASE.
ORACLES["crawl_delta"] = (
    "WITH o AS (SELECT doc_id AS page_id, md5(text) AS old_hash"
    " FROM documents WHERE doc_id % 5 <> 0), "
    "n AS (SELECT doc_id AS page_id,"
    " md5(CASE WHEN doc_id % 3 = 0 THEN text || ' v2' ELSE text END)"
    " AS new_hash FROM documents WHERE doc_id % 5 <> 4) "
    "SELECT coalesce(o.page_id, n.page_id) AS page_id,"
    " CASE WHEN o.page_id IS NULL THEN 'added'"
    " WHEN n.page_id IS NULL THEN 'removed'"
    " WHEN o.old_hash IS DISTINCT FROM n.new_hash THEN 'changed'"
    " ELSE 'unchanged' END AS status,"
    " o.old_hash, n.new_hash"
    " FROM o FULL OUTER JOIN n ON o.page_id = n.page_id"
)

# Web link graph: same deterministic HTML synthesis, DuckDB
# regexp_extract_all + unnest for the href scan, same absolute-scheme
# filter and host normalization (lowercase, strip default port and
# leading www). The CTE chain is shared with the host_pagerank oracle.
_HOST_EDGES_CTES = (
    "h AS (SELECT doc_id,"
    " '<html><body><p>page</p><a href=\"https://site'"
    " || CAST((doc_id * 31) % 7 AS VARCHAR) || '.example.com/p/'"
    " || CAST((doc_id * 31) % 211 AS VARCHAR)"
    " || '\">a</a><a href=\"HTTP://WWW.Site'"
    " || CAST((doc_id + 1) % 7 AS VARCHAR) || '.Example.COM:80/q\">b</a>'"
    " || CASE WHEN doc_id % 3 = 0 THEN '<a href=\"/rel/x\">c</a>'"
    " ELSE '' END"
    " || CASE WHEN doc_id % 2 = 0 THEN '<a href=''https://site'"
    " || CAST((doc_id * 17) % 7 AS VARCHAR)"
    " || '.example.com/s''>d</a>' ELSE '' END"
    " || '</body></html>' AS html,"
    " 'https://site' || CAST(doc_id % 7 AS VARCHAR) || '.example.com/p/'"
    " || CAST(doc_id AS VARCHAR) AS url FROM documents), "
    "l AS (SELECT url, unnest(list_concat("
    " regexp_extract_all(html, 'href=\"([^\"]+)\"', 1),"
    " regexp_extract_all(html, 'href=''([^'']+)''', 1))) AS href"
    " FROM h), "
    "f AS (SELECT url, href FROM l"
    " WHERE regexp_matches(href, '^[Hh][Tt][Tt][Pp][Ss]?://')), "
    "sp AS (SELECT"
    " lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1))"
    " AS s1,"
    " lower(regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)', 1))"
    " AS h1,"
    " lower(regexp_extract(href, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1))"
    " AS s2,"
    " lower(regexp_extract(href, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)', 1))"
    " AS h2 FROM f), "
    "e AS (SELECT"
    " regexp_replace(CASE"
    " WHEN s1 = 'http' THEN regexp_replace(h1, ':80$', '')"
    " WHEN s1 = 'https' THEN regexp_replace(h1, ':443$', '')"
    " ELSE h1 END, '^www\\.', '') AS src_host,"
    " regexp_replace(CASE"
    " WHEN s2 = 'http' THEN regexp_replace(h2, ':80$', '')"
    " WHEN s2 = 'https' THEN regexp_replace(h2, ':443$', '')"
    " ELSE h2 END, '^www\\.', '') AS dst_host FROM sp)"
)
ORACLES["host_link_graph"] = (
    f"WITH {_HOST_EDGES_CTES} "
    "SELECT src_host, dst_host, CAST(count(*) AS BIGINT) AS n_links"
    " FROM e WHERE src_host <> '' AND dst_host <> ''"
    " GROUP BY src_host, dst_host"
)


def _host_pagerank_oracle_sql(iters: int = 3) -> str:
    """Integer PageRank over the host link graph: the link-graph CTE
    chain feeding the same unrolled fixed-k iteration as
    kg_pagerank_oracle_sql (oracles_kg.py:564) — integer micro-units,
    nonnegative `//` only, bit-exact vs integer_pagerank."""
    steps = []
    prev = "pr0"
    for k in range(1, iters + 1):
        steps.append(
            f"c{k} AS ("
            f" SELECT dst AS entity, sum(pr // outdeg) AS contrib"
            f" FROM nt JOIN {prev} ON nt.src = {prev}.entity"
            f" JOIN outdeg USING (src) GROUP BY dst), "
            f"pr{k} AS MATERIALIZED ("
            f" SELECT nodes.entity,"
            f" 150000 // (SELECT n FROM nn)"
            f" + (85 * coalesce(contrib, 0)) // 100 AS pr"
            f" FROM nodes LEFT JOIN c{k} USING (entity))"
        )
        prev = f"pr{k}"
    chain = ", ".join(steps)
    return (
        f"WITH {_HOST_EDGES_CTES}, "
        "nt AS MATERIALIZED ("
        " SELECT DISTINCT src_host AS src, dst_host AS dst FROM e"
        " WHERE src_host <> '' AND dst_host <> ''), "
        "nodes AS MATERIALIZED (SELECT DISTINCT entity FROM ("
        " SELECT src AS entity FROM nt UNION ALL SELECT dst FROM nt)), "
        "nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM nodes), "
        "outdeg AS (SELECT src, CAST(count(*) AS BIGINT) AS outdeg"
        " FROM nt GROUP BY src), "
        "pr0 AS (SELECT entity, 1000000 // (SELECT n FROM nn) AS pr"
        " FROM nodes), "
        f"{chain} "
        f"SELECT entity, CAST(pr AS BIGINT) AS pr FROM {prev}"
    )


ORACLES["host_pagerank"] = _host_pagerank_oracle_sql()


def _host_hits_oracle_sql(iters: int = 2) -> str:
    """Integer HITS over the host link graph: the link-graph CTE chain
    + the fixed-k hub/authority iteration unrolled, mirroring
    operators/components.integer_hits value-for-value (authorities
    seed uniform; per half-step: join-sum over one edge direction,
    nodes-complete fill with 0, L1 normalization
    ``raw * 1000000 // sum(raw)`` — nonnegative integer ops only, so
    DuckDB `//` == Spark `div` bit-for-bit)."""
    steps = []
    prev_auth = "a0"
    hub = None
    for k in range(1, iters + 1):
        hub = f"h{k}"
        steps.append(
            f"h{k}r AS (SELECT nt.src AS entity,"
            f" CAST(sum({prev_auth}.auth) AS BIGINT) AS raw"
            f" FROM nt JOIN {prev_auth} ON nt.dst = {prev_auth}.entity"
            f" GROUP BY nt.src), "
            f"h{k}f AS MATERIALIZED (SELECT nodes.entity,"
            f" CAST(coalesce(raw, 0) AS BIGINT) AS raw"
            f" FROM nodes LEFT JOIN h{k}r USING (entity)), "
            f"h{k} AS MATERIALIZED (SELECT entity,"
            f" CASE WHEN (SELECT CAST(sum(raw) AS BIGINT) FROM h{k}f) = 0"
            f" THEN 0 ELSE raw * 1000000"
            f" // (SELECT CAST(sum(raw) AS BIGINT) FROM h{k}f)"
            f" END AS hub FROM h{k}f), "
            f"a{k}r AS (SELECT nt.dst AS entity,"
            f" CAST(sum(h{k}.hub) AS BIGINT) AS raw"
            f" FROM nt JOIN h{k} ON nt.src = h{k}.entity"
            f" GROUP BY nt.dst), "
            f"a{k}f AS MATERIALIZED (SELECT nodes.entity,"
            f" CAST(coalesce(raw, 0) AS BIGINT) AS raw"
            f" FROM nodes LEFT JOIN a{k}r USING (entity)), "
            f"a{k} AS MATERIALIZED (SELECT entity,"
            f" CASE WHEN (SELECT CAST(sum(raw) AS BIGINT) FROM a{k}f) = 0"
            f" THEN 0 ELSE raw * 1000000"
            f" // (SELECT CAST(sum(raw) AS BIGINT) FROM a{k}f)"
            f" END AS auth FROM a{k}f)"
        )
        prev_auth = f"a{k}"
    chain = ", ".join(steps)
    return (
        f"WITH {_HOST_EDGES_CTES}, "
        "nt AS MATERIALIZED ("
        " SELECT DISTINCT src_host AS src, dst_host AS dst FROM e"
        " WHERE src_host <> '' AND dst_host <> ''), "
        "nodes AS MATERIALIZED (SELECT DISTINCT entity FROM ("
        " SELECT src AS entity FROM nt UNION ALL SELECT dst FROM nt)), "
        "nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM nodes), "
        "a0 AS (SELECT entity, 1000000 // (SELECT n FROM nn) AS auth"
        " FROM nodes), "
        f"{chain} "
        f"SELECT {hub}.entity, CAST(hub AS BIGINT) AS hub,"
        f" CAST(auth AS BIGINT) AS auth"
        f" FROM {hub} JOIN {prev_auth} USING (entity)"
    )


ORACLES["host_hits"] = _host_hits_oracle_sql()

ORACLES["bm25_topk"] = _bm25_oracle_sql(
    _TOKENS_SQL, _BM25_QUERY_TERMS, k=20
)
# store-then-serve must be lossless: the served query answers to the
# SAME oracle as the from-tokens path; likewise append-vs-rebuild —
# the incrementally maintained store must answer identically
ORACLES["bm25_served"] = ORACLES["bm25_topk"]
ORACLES["bm25_incremental"] = ORACLES["bm25_topk"]

# serving HITS off the bucketed edge store must be bit-identical to the
# in-memory path
ORACLES["host_hits_served"] = _host_hits_oracle_sql()

# CCNet bigram-LM scoring: identical add-one model, identical one-round
# 1e-4-nat integerization per bigram TYPE, identical floor division
# held-out regime: counts/vocab from the even-doc_id half, scoring over
# the odd half; unseen events priced via left joins + coalesce(0)
ORACLES["lm_heldout_score"] = (
    "WITH fl AS (SELECT doc_id,"
    " list_filter(string_split(text, ' '), x -> x <> '') AS t"
    " FROM documents), "
    "tr AS (SELECT * FROM fl WHERE doc_id % 2 = 0), "
    "sc AS (SELECT * FROM fl WHERE doc_id % 2 <> 0), "
    "v AS (SELECT CAST(count(DISTINCT term) AS BIGINT) AS v"
    " FROM (SELECT unnest(t) AS term FROM tr)), "
    "tp AS (SELECT unnest(t[1:len(t)-1]) AS w1,"
    " unnest(t[2:len(t)]) AS w2 FROM tr WHERE len(t) >= 2), "
    "c2 AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c2 FROM tp"
    " GROUP BY w1, w2), "
    "c1 AS (SELECT w1, CAST(sum(c2) AS BIGINT) AS c1 FROM c2"
    " GROUP BY w1), "
    "sp AS (SELECT doc_id, unnest(t[1:len(t)-1]) AS w1,"
    " unnest(t[2:len(t)]) AS w2 FROM sc WHERE len(t) >= 2), "
    "ptf AS (SELECT doc_id, w1, w2, CAST(count(*) AS BIGINT) AS tf"
    " FROM sp GROUP BY doc_id, w1, w2), "
    "s AS (SELECT ptf.doc_id, ptf.tf,"
    " CAST(round(ln((coalesce(c1.c1, 0) + v.v)"
    " / (coalesce(c2.c2, 0) + 1.0)) * 10000) AS BIGINT) AS nll"
    " FROM ptf LEFT JOIN c2 USING (w1, w2) LEFT JOIN c1 USING (w1)"
    " CROSS JOIN v) "
    "SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_pairs,"
    " CAST(sum(tf * nll) AS BIGINT) AS nll_i4,"
    " CAST(sum(tf * nll) // sum(tf) AS BIGINT) AS avg_nll_i4"
    " FROM s GROUP BY doc_id"
)

_LM_SCORE_SQL = (
    "WITH fl AS (SELECT doc_id,"
    " list_filter(string_split(text, ' '), x -> x <> '') AS t"
    " FROM documents), "
    "v AS (SELECT CAST(count(DISTINCT term) AS BIGINT) AS v"
    " FROM (SELECT unnest(t) AS term FROM fl)), "
    "pairs AS (SELECT doc_id, unnest(t[1:len(t)-1]) AS w1,"
    " unnest(t[2:len(t)]) AS w2 FROM fl WHERE len(t) >= 2), "
    "ptf AS (SELECT doc_id, w1, w2, CAST(count(*) AS BIGINT) AS tf"
    " FROM pairs GROUP BY doc_id, w1, w2), "
    "c2 AS (SELECT w1, w2, CAST(sum(tf) AS BIGINT) AS c2 FROM ptf"
    " GROUP BY w1, w2), "
    "c1 AS (SELECT w1, CAST(sum(c2) AS BIGINT) AS c1 FROM c2"
    " GROUP BY w1), "
    "s AS (SELECT ptf.doc_id, ptf.tf,"
    " CAST(round(ln((c1.c1 + v.v) / (c2.c2 + 1.0)) * 10000) AS BIGINT)"
    " AS nll"
    " FROM ptf JOIN c2 USING (w1, w2) JOIN c1 USING (w1) CROSS JOIN v) "
    "SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_pairs,"
    " CAST(sum(tf * nll) AS BIGINT) AS nll_i4,"
    " CAST(sum(tf * nll) // sum(tf) AS BIGINT) AS avg_nll_i4"
    " FROM s GROUP BY doc_id"
)
ORACLES["lm_doc_score"] = _LM_SCORE_SQL

# CCNet tier split: the same scored frame, exact type-7 terciles as a
# 1-row CTE, tier assignment by <= comparison (integer scores make the
# boundaries round-off-safe)
ORACLES["lm_ppl_buckets"] = (
    f"WITH s AS ({_LM_SCORE_SQL}), "
    "c AS (SELECT quantile_cont(avg_nll_i4, 0.33333) AS c1,"
    " quantile_cont(avg_nll_i4, 0.66667) AS c2 FROM s) "
    "SELECT doc_id, avg_nll_i4,"
    " CASE WHEN avg_nll_i4 <= c1 THEN 'head'"
    " WHEN avg_nll_i4 <= c2 THEN 'middle'"
    " ELSE 'tail' END AS bucket"
    " FROM s, c"
)


def _line_dedup_seed_values() -> str:
    """LINE_DEDUP_SEEDS as DuckDB VALUES, newlines as chr(10)."""
    rows = []
    for doc_id, text in LINE_DEDUP_SEEDS:
        lit = " || chr(10) || ".join(
            "'" + p.replace("'", "''") + "'" for p in text.split("\n")
        )
        rows.append(f"(CAST({doc_id} AS BIGINT), {lit})")
    return ", ".join(rows)


# order-preserving distinct of lines: min(pos) grouping + ordered
# string_agg mirrors Spark array_distinct's first-occurrence order
ORACLES["line_dedup"] = (
    "WITH d AS (SELECT doc_id, text FROM documents UNION ALL"
    f" SELECT * FROM (VALUES {_line_dedup_seed_values()})"
    " AS seeds(doc_id, text)), "
    "l AS (SELECT doc_id,"
    " unnest(string_split(text, chr(10))) AS line,"
    " unnest(generate_series(1, len(string_split(text, chr(10)))))"
    " AS pos FROM d), "
    "f AS (SELECT doc_id, line, min(pos) AS fp FROM l"
    " GROUP BY doc_id, line), "
    "agg AS (SELECT doc_id,"
    " string_agg(line, chr(10) ORDER BY fp) AS text,"
    " CAST(count(*) AS BIGINT) AS n_kept FROM f GROUP BY doc_id), "
    "tot AS (SELECT doc_id,"
    " CAST(len(string_split(text, chr(10))) AS BIGINT) AS n_lines"
    " FROM d) "
    "SELECT doc_id, agg.text AS text, (n_lines - n_kept) AS n_dropped"
    " FROM agg JOIN tot USING (doc_id)"
)

ORACLES["bpe_merge_pairs"] = (
    f"WITH toks AS ({_TOKENS_SQL}), "
    "words AS (SELECT term, CAST(count(*) AS BIGINT) AS cnt FROM toks"
    " GROUP BY term), "
    "pairs AS (SELECT unnest(list_transform("
    "generate_series(1, length(term) - 1),"
    " i -> substr(term, i, 2))) AS pair, cnt"
    " FROM words WHERE length(term) >= 2), "
    "agg AS (SELECT pair, CAST(sum(cnt) AS BIGINT) AS cnt FROM pairs"
    " GROUP BY pair), "
    "ranked AS (SELECT pair, cnt, CAST(row_number() OVER ("
    " ORDER BY cnt DESC, pair) AS BIGINT) AS rnk FROM agg) "
    "SELECT pair, cnt, rnk FROM ranked WHERE rnk <= 20"
)

# Anchor-text profile: mirrors _anchor_pages' synthesis, the two-pass
# whole-<a>-element scan, and the host normalization; DuckDB lists are
# 1-indexed so the word pick is the same (doc_id % m) + 1.
_ANCHOR_W1_SQL = "['" + "', '".join(_ANCHOR_W1) + "']"
_ANCHOR_W2_SQL = "['" + "', '".join(_ANCHOR_W2) + "']"
ORACLES["anchor_text_profile"] = (
    "WITH ap AS (SELECT doc_id,"
    " '<html><p>page</p><a href=\"https://site'"
    " || CAST((doc_id * 31) % 7 AS VARCHAR) || '.example.com/p/'"
    " || CAST((doc_id * 31) % 211 AS VARCHAR) || '\">'"
    f" || ({_ANCHOR_W1_SQL})[CAST(doc_id % 5 + 1 AS INT)] || ' '"
    f" || ({_ANCHOR_W2_SQL})[CAST(doc_id % 3 + 1 AS INT)] || '</a>'"
    " || CASE WHEN doc_id % 2 = 0 THEN"
    " '<a href=''HTTPS://WWW.Site' || CAST((doc_id * 17) % 7 AS VARCHAR)"
    f" || '.Example.COM:443/s''>'"
    f" || ({_ANCHOR_W2_SQL})[CAST(doc_id % 3 + 1 AS INT)]"
    " || ' homepage</a>' ELSE '' END"
    " || CASE WHEN doc_id % 3 = 0 THEN '<a href=\"/rel/x\">skip me</a>'"
    " ELSE '' END || '</html>' AS html FROM documents), "
    "tags AS (SELECT unnest(list_concat("
    " regexp_extract_all(html, '<a href=\"[^\"]*\"[^>]*>[^<]*</a>'),"
    " regexp_extract_all(html, '<a href=''[^'']*''[^>]*>[^<]*</a>')))"
    " AS tag FROM ap), "
    "la AS (SELECT CASE WHEN regexp_matches(tag, '^<a href=\"')"
    " THEN regexp_extract(tag, 'href=\"([^\"]*)\"', 1)"
    " ELSE regexp_extract(tag, 'href=''([^'']*)''', 1) END AS href,"
    " regexp_extract(tag, '>([^<]*)<', 1) AS anchor FROM tags), "
    "f AS (SELECT href, anchor FROM la"
    " WHERE regexp_matches(href, '^[Hh][Tt][Tt][Pp][Ss]?://')), "
    "hn AS (SELECT"
    " lower(regexp_extract(href, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1))"
    " AS s2,"
    " lower(regexp_extract(href,"
    " '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)', 1)) AS h2,"
    " anchor FROM f), "
    "e AS (SELECT regexp_replace(CASE"
    " WHEN s2 = 'http' THEN regexp_replace(h2, ':80$', '')"
    " WHEN s2 = 'https' THEN regexp_replace(h2, ':443$', '')"
    " ELSE h2 END, '^www\\.', '') AS dst_host, anchor FROM hn), "
    "terms AS (SELECT dst_host, unnest(string_split(lower(anchor), ' '))"
    " AS term FROM e WHERE dst_host <> ''), "
    "cnts AS (SELECT dst_host, term, CAST(count(*) AS BIGINT) AS cnt"
    " FROM terms WHERE term <> '' GROUP BY dst_host, term), "
    "ranked AS (SELECT dst_host, CAST(row_number() OVER ("
    " PARTITION BY dst_host ORDER BY cnt DESC, term) AS BIGINT) AS rnk,"
    " term, cnt FROM cnts) "
    "SELECT dst_host, rnk, term, cnt FROM ranked WHERE rnk <= 3"
)

# Type-7 interpolated quantile in both engines (Spark `percentile`,
# DuckDB `quantile_cont`); one round(4) on each side absorbs float
# round-off between the two interpolation implementations.
ORACLES["doc_length_quantiles"] = (
    "SELECT lang, CAST(count(*) AS BIGINT) AS n_docs, "
    "round(quantile_cont(n_chars, 0.5), 4) AS p50, "
    "round(quantile_cont(n_chars, 0.9), 4) AS p90, "
    "round(quantile_cont(n_chars, 0.99), 4) AS p99 "
    "FROM documents GROUP BY lang"
)

ORACLES["dup_span_removal"] = (
    # span positions via parallel-unnest zipping (generate_series is not
    # lateral in DuckDB 1.0); canonical keeper = row_number 1 over
    # (doc_id, pos), matching Spark's min(struct(doc_id, pos))
    "WITH toks AS MATERIALIZED ("
    " SELECT doc_id, string_split(text, ' ') AS s FROM documents), "
    "spans AS MATERIALIZED ("
    " SELECT doc_id, unnest(generate_series(0, len(s) - 3)) AS pos,"
    " unnest(list_transform("
    "   list_zip(s[1:len(s)-2], s[2:len(s)-1], s[3:]),"
    "   x -> x[1] || ' ' || x[2] || ' ' || x[3])) AS shingle"
    " FROM toks WHERE len(s) >= 3), "
    "marked AS MATERIALIZED ("
    " SELECT doc_id, pos, count(*) OVER (PARTITION BY shingle) AS occ,"
    " row_number() OVER (PARTITION BY shingle ORDER BY doc_id, pos) AS rn"
    " FROM spans), "
    "dup AS MATERIALIZED ("
    " SELECT doc_id, pos FROM marked WHERE occ >= 2 AND rn > 1), "
    "tokpos AS MATERIALIZED ("
    " SELECT doc_id, unnest(generate_series(1, len(s))) AS p,"
    " unnest(s) AS tok FROM toks), "
    "keptagg AS ("
    " SELECT t.doc_id,"
    " coalesce(string_agg(t.tok, ' ' ORDER BY t.p), '') AS clean_text,"
    " CAST(count(t.tok) AS BIGINT) AS nk"
    " FROM tokpos t LEFT JOIN ("
    "   SELECT DISTINCT t2.doc_id, t2.p FROM tokpos t2"
    "   JOIN dup d ON t2.doc_id = d.doc_id"
    "   AND t2.p BETWEEN d.pos + 1 AND d.pos + 3) r"
    " ON t.doc_id = r.doc_id AND t.p = r.p"
    " WHERE r.p IS NULL GROUP BY t.doc_id) "
    "SELECT toks.doc_id, coalesce(k.clean_text, '') AS clean_text, "
    "CAST(len(s) - coalesce(k.nk, 0) AS BIGINT) AS tokens_removed, "
    "CAST(length(array_to_string(s, ' '))"
    " - length(coalesce(k.clean_text, '')) AS BIGINT) AS bytes_removed "
    "FROM toks LEFT JOIN keptagg k USING (doc_id)"
)

# the skew-fallback variants are row-identical to their defaults by
# construction (differentials in test_curation) and are gated against
# the SAME oracle SQL — a divergence in either variant fails its own
# driver row independently
ORACLES["dup_span_removal_hot"] = ORACLES["dup_span_removal"]
ORACLES["domain_cap_salted"] = ORACLES["domain_cap"]

ORACLES["dup_ngram_fraction"] = (
    f"WITH sh AS MATERIALIZED ({_SHINGLES_SQL}), "
    "dfc AS (SELECT shingle, CAST(count(*) AS BIGINT) AS df FROM sh"
    " GROUP BY shingle) "
    "SELECT doc_id, CAST(count(*) AS BIGINT) AS n_shingles, "
    "CAST(sum(CASE WHEN df >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup, "
    "CAST(sum(CASE WHEN df >= 2 THEN 1 ELSE 0 END) * 1000"
    " // count(*) AS BIGINT) AS dup_permille "
    "FROM sh JOIN dfc USING (shingle) GROUP BY doc_id"
)

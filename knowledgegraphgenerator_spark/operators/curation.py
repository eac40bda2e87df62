"""Corpus-curation operators for training-data pipelines.

The web-scale curation steps that sit between raw crawl text and a
training shard, each pure DataFrame SQL (JVM-side, whole-stage codegen,
no Python in the hot path) and each value-gated by a DuckDB oracle in
queries.py:

  * scrub_pii           sequential email -> IPv4 -> phone redaction with
                        per-class counts (regexp_replace / regexp_count)
  * repetition_signals  Gopher-style repetition metrics (Rae et al. 2021,
                        "Scaling Language Models", Table A1) in their
                        token-fraction form: top-unigram fraction,
                        top-bigram fraction, duplicate 5-gram occurrence
                        mass — integer-only so cross-engine hashing is
                        exact
  * cap_per_key         per-domain/source document cap (row_number over
                        the key, deterministic order)
  * mod_stratified_sample  deterministic per-stratum sampling by modular
                        arithmetic on the id — reproducible across runs
                        and engines, no RNG state

Scale notes: scrub_pii, repetition_signals, and the samplers are narrow
maps/filters — ZERO shuffles, one corpus scan, they pipeline into the
scan (repetition_signals computes all its n-gram statistics from each
row's own token array; plan-pinned in tests). cap_per_key is a
window over the key — the key's cardinality (domains) is what bounds
the skew, and a hot domain (the exact thing the cap exists for) is
bounded by AQE skew handling plus the cap itself discarding the tail
after rank K; for billion-row domains swap in the group-top-K
aggregate form (commented at the call-site) which partial-aggregates
map-side.

PII patterns are written in the RE2/Java-regex common subset so the
Spark plan and the DuckDB oracle compile the IDENTICAL pattern.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# RE2/Java common-subset patterns (no lookbehind, no \p classes)
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PHONE_RE = r"\+?\d{3}[- ]\d{3}[- ]\d{4}"


def scrub_pii(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Redact emails, then IPv4s, then phone numbers, counting each class
    on the text as it stood when that class was scanned (sequential
    semantics, so e.g. digits inside an already-redacted email can't be
    re-counted as a phone). Adds n_emails/n_ips/n_phones/scrubbed."""
    t0 = F.col(text_col)
    t1 = F.regexp_replace(t0, EMAIL_RE, "<EMAIL>")
    t2 = F.regexp_replace(t1, IPV4_RE, "<IP>")
    t3 = F.regexp_replace(t2, PHONE_RE, "<PHONE>")
    return df.withColumns(
        {
            "n_emails": F.regexp_count(t0, F.lit(EMAIL_RE)),
            "n_ips": F.regexp_count(t1, F.lit(IPV4_RE)),
            "n_phones": F.regexp_count(t2, F.lit(PHONE_RE)),
            "scrubbed": t3,
        }
    )


def repetition_signals(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_tokens: int = 15,
    top_uni_x1000: int = 300,
    top_bi_x1000: int = 180,
    dup5_x1000: int = 300,
) -> DataFrame:
    """Gopher-style repetition filter signals, token-fraction variant.

    Per document: n_tokens, the occurrence count of the most frequent
    unigram and of the most frequent adjacent bigram, and dup5_mass =
    (occurrences - distinct) of 5-token shingles, i.e. how much of the
    document is verbatim 5-gram repetition. The keep/drop verdict uses
    integer permille thresholds (defaults are the token-form analogue of
    the Gopher paper's character-fraction cuts — configurable, the
    thresholds are policy, the signals are the operator).

    Plan shape: everything is per-document over that row's own token
    sequence, so the whole operator is ONE narrow chain of projections
    — no token explode, no shuffle, no window; a 100 TB corpus is read
    exactly once and the signals pipeline into the scan. Top counts
    come from the max run length of the sorted n-gram array, computed
    (r6) as boundary-position arithmetic — run-end positions are the
    indices where the sorted array changes value, and the max run is
    the max gap between consecutive run ends — instead of the old
    ``aggregate`` fold that allocated a named_struct accumulator per
    element (interpreted, and the measured bulk of the operator's
    cost). Each non-cheap array (sorted forms, boundary lists) is
    bound to its own projection column so Catalyst does not re-inline
    it per reference. Duplicate mass is size - size(array_distinct).
    """
    # run-end positions of a SORTED array c: indices i (1-based) where
    # c[i] != c[i+1] (the last index always ends a run); try_element_at
    # keeps the i = size(c) probe NULL-safe under ANSI
    ends = (
        "filter(sequence(1, size({c})), i -> "
        "i = size({c}) OR try_element_at({c}, i + 1) != element_at({c}, i))"
    )
    # max run = max gap between consecutive run-end positions
    # (prepending 0 as the zeroth boundary); empty array -> 0
    max_gap = (
        "IF(size({e}) = 0, CAST(0 AS BIGINT), "
        "CAST(array_max(zip_with({e}, "
        "concat(array(0), slice({e}, 1, size({e}) - 1)), "
        "(x, y) -> x - y)) AS BIGINT))"
    )
    ngram = (
        "IF(size(toks) >= {n}, "
        "transform(sequence(1, size(toks) - {n1}), i -> {concat}), "
        "array())"
    )
    # n-gram elements stay chr(2)-joined STRINGS: a struct-of-references
    # form was measured 2x SLOWER (sort/distinct compare structs
    # field-by-field interpreted; strings use optimized binary compare)
    bi_concat = (
        "concat(element_at(toks, i), chr(2), element_at(toks, i + 1))"
    )
    g5_concat = (
        "concat(element_at(toks, i), chr(2), element_at(toks, i + 1),"
        " chr(2), element_at(toks, i + 2), chr(2), element_at(toks, i + 3),"
        " chr(2), element_at(toks, i + 4))"
    )
    out = (
        df.select(
            F.col(id_col),
            F.expr(
                f"filter(split({text_col}, ' '), x -> x != '')"
            ).alias("toks"),
        )
        .where(F.expr("size(toks) > 0"))
        .select(
            id_col,
            F.expr("CAST(size(toks) AS BIGINT)").alias("n_tokens"),
            F.expr("array_sort(toks)").alias("su"),
            F.expr(
                ngram.format(n=2, n1=1, concat=bi_concat)
            ).alias("bi"),
            F.expr(
                ngram.format(n=5, n1=4, concat=g5_concat)
            ).alias("g5"),
        )
        .select(
            id_col,
            "n_tokens",
            F.expr(ends.format(c="su")).alias("eu"),
            F.expr("array_sort(bi)").alias("sb"),
            F.expr(
                "CAST(size(g5) - size(array_distinct(g5)) AS BIGINT)"
            ).alias("dup5_mass"),
        )
        .select(
            id_col,
            "n_tokens",
            F.expr(max_gap.format(e="eu")).alias("top_uni_cnt"),
            F.expr(ends.format(c="sb")).alias("eb"),
            "dup5_mass",
        )
        .select(
            id_col,
            "n_tokens",
            "top_uni_cnt",
            F.expr(max_gap.format(e="eb")).alias("top_bi_cnt"),
            "dup5_mass",
        )
    )
    return out.select(
        id_col,
        "n_tokens",
        "top_uni_cnt",
        "top_bi_cnt",
        "dup5_mass",
        F.when(
            (F.col("n_tokens") >= min_tokens)
            & (F.expr("top_uni_cnt * 1000 div n_tokens") < top_uni_x1000)
            & (F.expr("top_bi_cnt * 1000 div n_tokens") < top_bi_x1000)
            & (F.expr("dup5_mass * 1000 div n_tokens") < dup5_x1000),
            F.lit("keep"),
        )
        .otherwise(F.lit("drop"))
        .alias("verdict"),
    )


# URL canonicalization — webtext ingest normalization. All components
# are extracted with RE2/Java common-subset regexes and list operations
# that exist verbatim in both Spark SQL and DuckDB, so the DuckDB value
# oracle compiles the identical logic. registered_domain uses a
# second-level-label heuristic ({co,com,net,org,gov,ac,edu} + >=3
# labels -> 3-label domain), a disclosed approximation of the public
# suffix list (the PSL is a data file, not an algorithm; swap it in by
# broadcasting the label set when available).

_TRACKING_PARAM_RE = "^(utm_[a-z]+|fbclid|gclid|msclkid|ref)="
_SLD_SET = "('co','com','net','org','gov','ac','edu')"


def canonical_urls(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Adds host, registered_domain, and canonical_url: lowercase
    scheme/host, default-port (:80 http / :443 https only — an explicit
    non-default port is a distinct origin and MUST survive, or two
    different servers' pages collapse into one dedup key) and
    leading-www strip, tracking params removed, remaining query params
    sorted (order-insensitive dedup key). Narrow projection — zero
    shuffles, pipelines into the scan."""
    u = url_col
    parts = {
        "scheme": f"lower(regexp_extract({u},"
        " '^([A-Za-z][A-Za-z0-9+.-]*)://', 1))",
        "hostport": f"lower(regexp_extract({u},"
        " '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)', 1))",
        "rawpath": f"regexp_extract({u},"
        " '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1)",
        "rawq": f"regexp_extract({u}, '\\\\?([^#]*)', 1)",
    }
    host = (
        "regexp_replace("
        "CASE WHEN scheme = 'http'"
        " THEN regexp_replace(hostport, ':80$', '')"
        " WHEN scheme = 'https'"
        " THEN regexp_replace(hostport, ':443$', '')"
        " ELSE hostport END,"
        " '^www\\\\.', '')"
    )
    clean_q = (
        "array_join(array_sort(filter(split(rawq, '&'),"
        f" p -> p != '' AND NOT p rlike '{_TRACKING_PARAM_RE}')), '&')"
    )
    reg_dom = (
        "CASE WHEN size(labs) >= 3 AND element_at(labs, -2) IN "
        f"{_SLD_SET} THEN concat_ws('.', element_at(labs, -3),"
        " element_at(labs, -2), element_at(labs, -1)) "
        "WHEN size(labs) >= 2 THEN concat_ws('.',"
        " element_at(labs, -2), element_at(labs, -1)) "
        "ELSE host END"
    )
    return (
        df.withColumns({k: F.expr(v) for k, v in parts.items()})
        .withColumn("host", F.expr(host))
        .withColumn("labs", F.expr("split(host, '\\\\.')"))
        .withColumn("registered_domain", F.expr(reg_dom))
        .withColumn("cq", F.expr(clean_q))
        .withColumn(
            "canonical_url",
            F.expr(
                "concat(scheme, '://', host,"
                " IF(rawpath = '', '/', rawpath),"
                " IF(cq = '', '', concat('?', cq)))"
            ),
        )
        .drop("scheme", "hostport", "rawpath", "rawq", "labs", "cq")
    )


def chunk_by_tokens(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_tokens: int = 256,
    overlap: int = 32,
) -> DataFrame:
    """Split each document into training-window chunks of at most
    ``max_tokens`` whitespace tokens with ``overlap`` tokens of context
    carried between consecutive chunks (the standard sharding step
    before tokenizer packing). Chunk starts stride by
    ``max_tokens - overlap``; the last chunk is short rather than
    padded; a document never emits a chunk that is pure overlap
    (n_chunks = ceil((n - overlap) / stride), floor 1).

    Zero-shuffle: chunks are computed from each row's own token array
    and posexploded — the corpus is read once and the op pipelines into
    the scan; output order (doc_id, chunk_id) is scan-stable."""
    if overlap >= max_tokens:
        raise ValueError("overlap must be smaller than max_tokens")
    stride = max_tokens - overlap
    chunks = (
        "transform(sequence(0, CAST(greatest(1, "
        f"(size(toks) - {overlap} + {stride} - 1) div {stride}"
        ") AS INT) - 1), "
        f"c -> slice(toks, c * {stride} + 1, {max_tokens}))"
    )
    return (
        df.select(
            F.col(id_col),
            F.expr(f"filter(split({text_col}, ' '), x -> x != '')").alias(
                "toks"
            ),
        )
        .where(F.expr("size(toks) > 0"))
        .select(
            id_col, F.posexplode(F.expr(chunks)).alias("chunk_id", "chunk")
        )
        .select(
            id_col,
            F.col("chunk_id").cast("long").alias("chunk_id"),
            F.expr("CAST(size(chunk) AS BIGINT)").alias("n_chunk_tokens"),
            F.array_join("chunk", " ").alias("chunk_text"),
        )
    )


def cap_per_key(
    df: DataFrame,
    key_col: str,
    order_col: str,
    k: int,
    variant: str = "window",
    n_salts: int = 32,
) -> DataFrame:
    """Keep at most ``k`` rows per key, deterministically the lowest
    ``order_col`` values (per-domain cap; deterministic requires
    ``order_col`` to totally order each key's rows, as q_domain_cap's
    unique doc_id does). Two coded forms, differential-equal
    (tests/test_curation.py):

    * ``variant="window"`` (default): one ``row_number`` window —
      and, measured rather than assumed (BENCH/SKEW_FALLBACKS.md),
      ALREADY the skew-proof 100 TB plan: Catalyst plans the
      ``rank <= k`` filter as ``WindowGroupLimit [key],[order],
      row_number(), k, Partial`` BEFORE the Exchange (plan-pinned in
      test_curation), so every map partition forwards at most k rows
      per key and a 10^9-row hot key never reaches one task. A 60M-row
      hot key: 2.1 s window vs 21.9 s salted on local[32].
    * ``variant="salted"``: the explicit two-pass form (VERDICT r4
      'What's wrong' #3b, via operators/skew.salted_topk_per_key) —
      pass 1 takes a local top-k within (key, salt), pass 2 re-ranks
      the ≤ ``n_salts * k``-per-key survivors. Slower here (it pays
      hashing + a second window for protection the optimizer already
      provides); retained differential-tested and oracle-gated as the
      engine-independent form and for rank shapes where group-limit
      cannot fire (non-rank window functions, or k above
      ``spark.sql.optimizer.windowGroupLimitThreshold``).
    """
    if variant == "salted":
        from knowledgegraphgenerator_spark.operators.skew import (
            salted_topk_per_key,
        )

        return salted_topk_per_key(
            df, [key_col], [F.col(order_col)], k, n_salts
        ).drop("rnk")
    if variant != "window":
        raise ValueError(f"unknown cap_per_key variant: {variant!r}")
    w = Window.partitionBy(key_col).orderBy(order_col)
    return (
        df.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .drop("rn")
    )


def mod_stratified_sample(
    df: DataFrame,
    id_col: str,
    strata_col: str,
    rates_permille: dict[str, int],
    default_permille: int = 0,
    mod: int = 1000,
) -> DataFrame:
    """Deterministic stratified sampling: keep a row iff
    ``pmod(pmod(id, P) * 48271, mod) < rate(stratum)`` with
    P = 1_000_000_007 (prime). The modular reduction FIRST bounds the
    multiplicand below 1e9, so the MINSTD multiplicative scramble (48271,
    so adjacent ids don't stripe) stays < 5e13 — overflow-free under ANSI
    mode for the FULL int64 id range, including negative
    ``xxhash64(url)`` ids (ADVICE r3 #4; the previous ``id * 48271``
    overflowed past |id| ~ 1.9e14). pmod keeps buckets non-negative for
    negative ids, matching the oracle's explicit ``((x % P) + P) % P``.
    No RNG, reproducible on any engine; rate bias vs the nominal
    permille is bounded by mod/P ≈ 1e-6 for ids uniform over int64."""
    rate = F.lit(default_permille)
    for stratum, permille in sorted(rates_permille.items()):
        rate = F.when(F.col(strata_col) == stratum, F.lit(permille)).otherwise(
            rate
        )
    prime = 1_000_000_007
    bucket = F.pmod(
        F.pmod(F.col(id_col), F.lit(prime)) * F.lit(48271), F.lit(mod)
    )
    return df.where(bucket < rate)


def remove_duplicate_spans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    min_repeats: int = 2,
    variant: str = "window",
) -> DataFrame:
    """Corpus-wide duplicated-span REMOVAL (the C4/suffix-dedup *drop*
    step, Raffel et al. 2020 §2.2 / Lee et al. 2022 — the diagnostic
    twin is queries.q_dup_ngram_fraction): delete every NON-CANONICAL
    occurrence of any ``k``-token sliding span whose shingle occurs
    ``>= min_repeats`` times corpus-wide. The canonical keeper is the
    globally first occurrence by ``(doc_id, pos)``; a token is removed
    iff some duplicate occurrence covers it (marks are computed in ONE
    pass against the ORIGINAL text — no cascading re-evaluation).

    -> (doc_id, clean_text, tokens_removed, bytes_removed) where
    clean_text rejoins the surviving tokens with single spaces and
    bytes_removed is measured on that canonical space-joined form.

    Scale shape (never all-pairs), ``variant="window"`` (default):
      1. explode sliding spans            narrow, derived ONCE (a
                                          groupBy+join-back form derives
                                          the explode per branch — 4
                                          Generate nodes; pinned to 1 in
                                          test_plans)
      2. count + row_number over          ONE shuffle on the shingle key;
         Window.partitionBy(shingle)      rn 1 by (doc_id, pos) is the
                                          canonical keeper
      3. filter dup occurrences →         1 shuffle, positions bounded
         groupBy(doc_id) removal starts   per doc
      4. left-join docs + array filter    narrow rebuild, no explode

    ``variant="groupby"`` is the HOT-SHINGLE form (VERDICT r4 'What's
    wrong' #3a, now code not docstring): windows are not
    AQE-splittable, so a boilerplate shingle with ~10^9 occurrences
    serializes step 2 onto one task. The groupby form replaces the
    window with ``groupBy(shingle).agg(count, min(struct(doc_id,
    pos)))`` + an equi-join back onto the spans — partial aggregation
    collapses the hot key map-side and AQE's skew-join splits the
    join-back — at the cost of deriving the span explode once per
    branch (2 Generate nodes; both plan shapes pinned in test_plans).
    ``min(struct(doc_id, pos))`` is exactly the window's rn=1 keeper
    (lexicographic first occurrence), so the two variants are
    row-identical: differential-tested in test_curation.py including a
    crafted hot-shingle corpus, and both are driver-gated against the
    SAME DuckDB oracle (queries dup_span_removal /
    dup_span_removal_hot). Measured (BENCH/SKEW_FALLBACKS.md): unlike
    cap_per_key, no WindowGroupLimit can prune this window (count +
    rank lower bound), yet the window default still wins to at least
    4M occurrences per shingle (0.55 s vs 1.26 s — the groupby form
    pays the double explode); select ``variant="groupby"`` when a
    corpus profile shows boilerplate shingles past ~10^8 occurrences,
    where one task cannot hold the partition. At 100 TB the shuffle key becomes
    ``xxhash64(shingle)`` instead of the string (the string form here
    keeps the DuckDB oracle exact; a collision merely merges two
    spans' counts, biasing toward removal).
    """
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.split(F.col(text_col), " ").alias("toks"),
    )
    spans = (
        toks.where(F.size("toks") >= k)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    f"transform(sequence(0, size(toks) - {k}), i -> "
                    f"struct(i as pos,"
                    f" concat_ws(' ', slice(toks, i + 1, {k})) as shingle))"
                )
            ).alias("sp"),
        )
        .select("doc_id", F.col("sp.pos").alias("pos"),
                F.col("sp.shingle").alias("shingle"))
    )
    if variant == "groupby":
        # the groupby form references the span explode from BOTH the
        # dup-shingle aggregation and the join-back branch — persist it
        # so the explode runs once per action instead of once per
        # branch (r6; the 2-Generate recompute was the measured cost
        # gap vs the window form, sf1.0: 16.5 s vs 8.5 s)
        spans = spans.persist()
        dup_shingles = (
            spans.groupBy("shingle")
            .agg(
                F.count(F.lit(1)).alias("occ"),
                F.min(F.struct("doc_id", "pos")).alias("keeper"),
            )
            .where(F.col("occ") >= min_repeats)
            .select("shingle", "keeper")
        )
        dup_starts = (
            spans.join(dup_shingles, "shingle")
            .where(
                (F.col("doc_id") != F.col("keeper.doc_id"))
                | (F.col("pos") != F.col("keeper.pos"))
            )
            .groupBy("doc_id")
            .agg(F.collect_set("pos").alias("starts"))
        )
    elif variant == "window":
        # r6: the canonical keeper is the lexicographic-min (doc_id,
        # pos) of the shingle's occurrences, so `row_number() > 1`
        # (which forces a full (shingle, doc_id, pos) sort and a second
        # Window node) is equivalent to `row != min(struct(doc_id,
        # pos))` over the UNORDERED shingle window — both aggregates
        # share one Window node and the input sorts on the partition
        # key only (differential-tested against the sequential
        # reference and the groupby variant)
        w = Window.partitionBy("shingle")
        dup_starts = (
            spans.withColumn("occ", F.count(F.lit(1)).over(w))
            .withColumn(
                "keeper", F.min(F.struct("doc_id", "pos")).over(w)
            )
            .where(
                (F.col("occ") >= min_repeats)
                & (
                    (F.col("doc_id") != F.col("keeper.doc_id"))
                    | (F.col("pos") != F.col("keeper.pos"))
                )
            )
            .groupBy("doc_id")
            .agg(F.collect_set("pos").alias("starts"))
        )
    else:
        raise ValueError(f"unknown remove_duplicate_spans variant: {variant!r}")
    kept = F.expr(
        f"filter(toks, (x, i) -> starts IS NULL"
        f" OR NOT exists(starts, s -> i >= s AND i < s + {k}))"
    )
    return (
        toks.join(dup_starts, "doc_id", "left")
        .select(
            "doc_id",
            F.concat_ws(" ", kept).alias("clean_text"),
            (F.size("toks") - F.size(kept)).cast("long")
            .alias("tokens_removed"),
            (
                F.length(F.concat_ws(" ", "toks"))
                - F.length(F.concat_ws(" ", kept))
            ).cast("long").alias("bytes_removed"),
        )
    )


def benchmark_overlap(
    doc_shingles: DataFrame,
    bench_shingles: DataFrame,
    threshold_permille: int = 200,
    use_broadcast: bool = True,
    id_col: str = "doc_id",
) -> DataFrame:
    """Eval-benchmark decontamination (the n-gram-overlap check every
    serious training-data pipeline runs before a training shard ships —
    GPT-3 Appendix C / PaLM §C / Llama-2 §A.6, all public): flag every
    training document whose token shingles collide with a held-out
    benchmark's shingle set.

    ``doc_shingles``: distinct (doc_id, shingle) rows for the corpus;
    ``bench_shingles``: (shingle) rows for the benchmark suite (any
    duplicates are dropped here). Returns one row per document:
    (doc_id, n_shingles, n_hit, contaminated_permille, verdict) with
    verdict = 'drop' iff the integer per-mille overlap reaches
    ``threshold_permille``.

    Scale shape: benchmark suites are MEGABYTES (a few 10^5 questions)
    against a 100 TB corpus, so the membership probe is a BROADCAST
    left join — zero shuffle, pipelined into the corpus scan — and the
    only Exchange in the whole plan is the per-doc aggregation, which
    partial-aggregates map-side. The hit flag rides the same pass that
    counts total shingles (ONE pass over the shingle set, not a
    semi-join plus a second scan). ``use_broadcast=False`` drops the
    hint for a benchmark set too large to broadcast; the plan becomes
    a shingle-keyed equi-join (still never all-pairs).
    """
    bench = bench_shingles.select("shingle").distinct()
    if use_broadcast:
        bench = F.broadcast(bench)
    marked = doc_shingles.join(
        bench.withColumn("hit", F.lit(1)), "shingle", "left"
    )
    return (
        marked.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum(F.coalesce(F.col("hit"), F.lit(0)))
            .cast("long").alias("n_hit"),
        )
        .select(
            id_col,
            "n_shingles",
            "n_hit",
            F.expr("n_hit * 1000 div n_shingles").cast("long")
            .alias("contaminated_permille"),
            F.when(
                F.expr("n_hit * 1000 div n_shingles")
                >= threshold_permille,
                F.lit("drop"),
            ).otherwise(F.lit("keep")).alias("verdict"),
        )
    )


def drop_contaminated(
    df: DataFrame,
    bench_shingles: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    threshold_permille: int = 200,
    use_broadcast: bool = True,
) -> DataFrame:
    """Decontamination as a FILTER: remove every document whose k-gram
    shingle overlap with the benchmark set reaches
    ``threshold_permille`` (benchmark_overlap's 'drop' verdict), keep
    everything else — including documents too short to shingle, which
    cannot overlap anything. Keeps all input columns.

    Scale shape: the flag computation is benchmark_overlap (broadcast
    membership probe + one per-doc agg); the resulting drop list is a
    tiny fraction of the corpus (that is the point of shipping clean
    benchmarks), so it comes back as a BROADCAST anti-join — the corpus
    itself is never shuffled by the filter.
    """
    from knowledgegraphgenerator_spark.operators.dedup import (
        token_shingles,
    )

    sh = token_shingles(df.select(id_col, text_col), text_col, id_col, k)
    dropped = (
        benchmark_overlap(
            sh,
            bench_shingles,
            threshold_permille=threshold_permille,
            use_broadcast=use_broadcast,
            id_col=id_col,
        )
        .where(F.col("verdict") == "drop")
        .select(id_col)
    )
    if use_broadcast:
        dropped = F.broadcast(dropped)
    return df.join(dropped, id_col, "left_anti")


def domain_mixture_rebalance(
    df: DataFrame,
    id_col: str = "doc_id",
    domain_col: str = "source",
    budget_permille: int = 500,
    mod: int = 1000,
) -> DataFrame:
    """Mixture rebalancing toward a UNIFORM per-domain share (the
    data-mixing step of web-corpus pipelines — The Pile / DoReMi-style
    reweighting, applied here as deterministic downsampling): derive a
    per-domain keep rate from the observed domain counts so the output
    approaches ``budget_permille``/1000 of the corpus split evenly
    across domains, then keep rows by the same overflow-free
    MINSTD modular scramble as mod_stratified_sample — no RNG,
    bit-reproducible on any engine.

    Rate derivation (all int64, engine-exact): with per-domain counts
    c_d over D domains and total T,
        budget   B = T * budget_permille // 1000
        target   t = B // D            (uniform share)
        rate_d     = min(1000, t * 1000 // c_d)
    Head domains get clamped down to their share; domains smaller than
    the share keep everything (rate 1000) — exactly the flattening a
    mixture rebalance is for. Output keeps every input column.

    Scale shape: ONE aggregation over the domain key (map-side partial;
    domain cardinality ≪ corpus size), a single-row totals aggregate
    crossJoin-broadcast onto it, and a BROADCAST join of the resulting
    rate table back onto the corpus — the corpus itself is never
    shuffled, the filter pipelines into the scan. Domains are
    config-cardinality (TLD+1 buckets, not URLs); a million-domain
    rate table is still a few MB and broadcastable.
    """
    counts = df.groupBy(domain_col).agg(F.count(F.lit(1)).alias("c"))
    totals = counts.agg(
        F.sum("c").alias("total"), F.count(F.lit(1)).alias("d")
    )
    rates = counts.crossJoin(F.broadcast(totals)).select(
        domain_col,
        F.least(
            F.lit(1000),
            F.expr(
                f"(total * {budget_permille} div 1000 div d) * 1000 div c"
            ),
        ).cast("long").alias("rate_permille"),
    )
    prime = 1_000_000_007
    bucket = F.pmod(
        F.pmod(F.col(id_col), F.lit(prime)) * F.lit(48271), F.lit(mod)
    )
    return (
        df.join(F.broadcast(rates), domain_col)
        .where(bucket < F.col("rate_permille"))
        .drop("rate_permille")
    )


def latest_snapshot_per_url(
    df: DataFrame,
    url_col: str = "canonical_url",
    ts_col: str = "warc_ts",
    id_col: str = "doc_id",
    payload_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Recrawl collapse: keep exactly ONE snapshot per URL — the row
    with the newest ``ts_col``, ties broken by the SMALLEST ``id_col``
    (deterministic; a crawl frontier can fetch the same page twice in
    one cycle with identical timestamps). This is the snapshot-selection
    step every Common-Crawl-style corpus needs before dedup/extraction:
    the same url appears once per crawl (the reference's FAQ loaders
    assume last-write-wins per question id the same way —
    /root/reference/faq_json_reader.py:24-33's dict overwrite).

    Output: one row per url with ``n_snapshots`` (how many crawls were
    collapsed) plus the kept row's ``ts_col``/``id_col``/payload.

    Scale shape: a single groupBy(url) with max-over-struct — structs
    compare lexicographically, so max(struct(ts, -id, payload)) selects
    newest-ts-then-lowest-id in ONE combinable aggregate. Unlike a
    row_number window, the partial max runs map-side, so a hot URL
    (a clone-farm page crawled 10^6 times) collapses to one row per
    mapper before the shuffle — no single-task window partition at
    100 TB. The tie-break uses the bitwise-NOT ordering ``-1 - id``
    (ADVICE r5): it reverses int64 order TOTALLY with no overflow, so
    negative ids (e.g. xxhash64-derived) are safe — the old ``-id``
    silently inverted ties for them and overflowed on Long.MIN."""
    w = F.struct(
        F.col(ts_col).alias("ts"),
        (F.lit(-1).cast("long") - F.col(id_col)).alias("neg_id"),
        *[F.col(c).alias(c) for c in payload_cols],
    )
    agg = df.groupBy(url_col).agg(
        F.max(w).alias("w"),
        F.count(F.lit(1)).cast("long").alias("n_snapshots"),
    )
    return agg.select(
        url_col,
        F.col("w.ts").alias(ts_col),
        (F.lit(-1).cast("long") - F.col("w.neg_id")).alias(id_col),
        *[F.col(f"w.{c}").alias(c) for c in payload_cols],
        "n_snapshots",
    )


def crawl_delta(
    old: DataFrame,
    new: DataFrame,
    key_col: str = "page_id",
    hash_col: str = "content_hash",
) -> DataFrame:
    """Snapshot diff between two crawl cycles: full-outer join two
    (key, content_hash) frames and classify every page as
    'added' (new only), 'removed' (old only), 'changed' (both, hash
    differs), or 'unchanged'. This is the incremental-corpus primitive:
    only 'added'+'changed' pages need re-extraction/re-linking, so a
    recrawl costs work proportional to the DELTA, not the corpus (the
    batch twin of streaming admit-only-novel ingestion,
    streaming/incremental.py:220). Inputs must already be one row per
    key (run latest_snapshot_per_url first on raw crawl logs).

    Output: (key, status, old_hash, new_hash); old_hash/new_hash are
    NULL on the missing side. Presence is tracked by explicit side
    markers, NOT hash nullness — a row with a NULL content hash (failed
    fetch, NULL text) still counts as present, and a NULL-vs-value hash
    pair is 'changed' (null-safe comparison), matching the oracle's
    key-based presence + IS DISTINCT FROM.

    Scale shape: ONE equi-shuffle full-outer join on the page key. Both
    crawl snapshots stored bucketed by the key (the triple-store layout,
    operators/triples.py:133) make it exchange-free; the key is unique
    per side, so there is no skew to salt."""
    o = old.select(
        F.col(key_col).alias("k"),
        F.col(hash_col).alias("old_hash"),
        F.lit(True).alias("in_old"),
    )
    n = new.select(
        F.col(key_col).alias("k"),
        F.col(hash_col).alias("new_hash"),
        F.lit(True).alias("in_new"),
    )
    return o.join(n, "k", "full_outer").select(
        F.col("k").alias(key_col),
        F.when(F.col("in_old").isNull(), F.lit("added"))
        .when(F.col("in_new").isNull(), F.lit("removed"))
        .when(
            ~F.col("old_hash").eqNullSafe(F.col("new_hash")),
            F.lit("changed"),
        )
        .otherwise(F.lit("unchanged")).alias("status"),
        "old_hash",
        "new_hash",
    )


def lm_doc_score(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    train: DataFrame | None = None,
) -> DataFrame:
    """CCNet-style language-model quality scoring (Wenzek et al. 2020,
    "CCNet: Extracting High Quality Monolingual Datasets from Web Crawl
    Data"): score every document by its negative log-likelihood under a
    corpus-trained bigram LM with add-one smoothing, the
    perplexity-bucket signal CCNet uses to split a crawl into
    head/middle/tail quality tiers. Self-supervised — the LM is trained
    on the corpus being scored, so there is no external model artifact
    (KenLM stands outside this sandbox; the bigram LM is the
    SQL-expressible member of the same family).

    Model: p(w2|w1) = (c2(w1,w2) + 1) / (c1(w1) + V), where c2 is the
    corpus bigram count, c1(w1) the count of w1 as a bigram CONTEXT
    (i.e. occurrences not in document-final position, == sum of c2 over
    w2), and V the corpus unigram vocabulary size. Per bigram TYPE the
    negative log-likelihood is rounded ONCE to integer 1e-4 nats
    (round(ln((c1 + V) / (c2 + 1.0)) * 10000)) and multiplied by the
    document's term frequency — the per-document sum is then an
    order-free exact integer, the same cross-engine trick as BM25
    (operators/retrieval.py module docstring). avg_nll_i4 uses
    nonnegative integer division (both engines floor it identically);
    perplexity = exp(avg_nll_i4 / 1e4) if a float is ever wanted.

    Output: (id_col, n_pairs, nll_i4, avg_nll_i4), one row per document
    with >= 2 tokens (a document with no bigram has no likelihood under
    a bigram model; callers treat absence as unscorable).

    ``train``: when given, counts and vocabulary come from the TRAIN
    frame and ``df`` is the held-out set being scored — the
    train/validation regime (CCNet trains on Wikipedia, scores the
    crawl). Unseen events are exactly what add-one smoothing prices:
    an unseen bigram under a seen context costs ln((c1 + V) / 1), an
    out-of-vocabulary context the uniform ln(V) — both ride the same
    rounded-once integer expression via left joins + coalesce(0), so
    held-out scoring stays hash-exact cross-engine. An empty/tokenless
    train frame (V = 0) has no model: every document is unscorable and
    the result is empty.

    Scale shape: bigram pairs come from zip-sliced split arrays — a
    NARROW projection, no self-join and no per-doc window, so the token
    stream is never shuffled on doc_id. Three aggregations follow
    ((doc, w1, w2) tf; (w1, w2) corpus counts; vocabulary scalar), all
    with map-side partial agg, then one equi-join of doc-bigram tf
    against corpus bigram counts on the (w1, w2) key — AQE handles hot
    bigrams ("of the") via skew-join splitting; the context-count
    frame c1 is vocabulary-sized and broadcast. Nothing here is
    quadratic and nothing materializes per-position state.
    """
    score_t = _lm_tokens(df, text_col, id_col)
    train_t = (
        score_t if train is None else _lm_tokens(train, text_col, id_col)
    )
    # vocabulary scalar (one small agg; config-sized driver value)
    v_row = (
        train_t.select(F.explode("t").alias("term"))
        .agg(F.countDistinct("term").alias("v"))
        .collect()[0]
    )
    vocab = int(v_row["v"] or 0)
    if vocab == 0:
        # no model (empty/tokenless train frame): nothing is scorable
        return _lm_empty_scores(df, id_col)
    ptf = _lm_ptf_from_tokens(score_t, id_col)
    if train is None:
        # self-trained: the doc-bigram tf frame feeds the scoring join
        # AND the model counts (c2, and c1 via c2) — persist it so the
        # token split + pair explode + tf aggregation run once per
        # action instead of three times (r6; the cache manager dedups
        # repeated calls by plan)
        ptf = ptf.persist()
        c2 = ptf.groupBy("w1", "w2").agg(F.sum("tf").alias("c2"))
    else:
        c2 = (
            _lm_pairs(train_t, id_col)
            .groupBy("w1", "w2")
            .agg(F.count(F.lit(1)).cast("long").alias("c2"))
        )
        # held-out: the train-side bigram counts feed both the scoring
        # join and the context-count derivation — persist the
        # model-sized frame, not the corpus
        c2 = c2.persist()
    return _lm_score_tail(ptf, c2, vocab, id_col)


def _lm_tokens(
    frame: DataFrame, text_col: str, id_col: str
) -> DataFrame:
    """(id, t: filtered token array) — shared by every LM path."""
    toks = F.filter(F.split(F.col(text_col), " "), lambda x: x != "")
    return frame.select(F.col(id_col), toks.alias("t"))


def _lm_ptf_from_tokens(with_t: DataFrame, id_col: str) -> DataFrame:
    """(id, w1, w2, tf) doc-bigram term frequencies — the scoring-side
    input every LM path builds."""
    return _lm_pairs(with_t, id_col).groupBy(id_col, "w1", "w2").agg(
        F.count(F.lit(1)).alias("tf")
    )


def _lm_ptf(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    return _lm_ptf_from_tokens(_lm_tokens(df, text_col, id_col), id_col)


def _lm_empty_scores(df: DataFrame, id_col: str) -> DataFrame:
    """Empty (id, n_pairs, nll_i4, avg_nll_i4) frame with the caller's
    id type — the nothing-is-scorable result."""
    from pyspark.sql.types import LongType, StructField, StructType

    return df.sparkSession.createDataFrame(
        [],
        StructType(
            [
                StructField(id_col, df.schema[id_col].dataType),
                StructField("n_pairs", LongType()),
                StructField("nll_i4", LongType()),
                StructField("avg_nll_i4", LongType()),
            ]
        ),
    )


def _lm_pairs(with_t: DataFrame, id_col: str) -> DataFrame:
    """(id, w1, w2) adjacent-pair rows from zip-sliced token arrays —
    narrow, never a doc_id shuffle or window."""
    return with_t.where(F.size("t") >= 2).select(
        id_col,
        F.explode(
            F.arrays_zip(
                F.slice(F.col("t"), 1, F.size("t") - 1).alias("w1"),
                F.slice(F.col("t"), 2, F.size("t") - 1).alias("w2"),
            )
        ).alias("p"),
    ).select(
        id_col, F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2")
    )


def _lm_score_tail(
    ptf: DataFrame,
    c2: DataFrame,
    vocab: int,
    id_col: str,
    c1: DataFrame | None = None,
) -> DataFrame:
    """Shared scoring tail of the self-trained / held-out /
    from-artifact LM paths: doc-bigram tf against model counts.
    c1 is always DERIVED from c2 (sum over w2), so a persisted model
    cannot carry an inconsistent context count — a caller that scores
    many batches against one frozen model (streaming ingest) derives
    it ONCE, persists, and passes it in. Left joins + coalesce(0): a
    no-op when the model was trained on the scored corpus itself
    (every pair is present), the unseen-event price otherwise."""
    if c1 is None:
        c1 = c2.groupBy("w1").agg(F.sum("c2").alias("c1"))
    nll = F.expr(
        f"CAST(round(ln((coalesce(c1, 0) + {vocab})"
        " / (coalesce(c2, 0) + 1.0)) * 10000) AS BIGINT)"
    )
    return (
        ptf.join(c2, ["w1", "w2"], "left")
        .join(F.broadcast(c1), "w1", "left")
        .groupBy(id_col)
        .agg(
            F.sum("tf").cast("long").alias("n_pairs"),
            F.sum(F.col("tf") * nll).cast("long").alias("nll_i4"),
        )
        .select(
            id_col,
            "n_pairs",
            "nll_i4",
            F.expr("nll_i4 div n_pairs").cast("long").alias("avg_nll_i4"),
        )
    )


def save_lm_artifact(
    train: DataFrame, path: str, text_col: str = "text"
) -> None:
    """Persist a trained bigram LM as ONE parquet table — the frozen
    reference-model regime (CCNet trains its LM once on a clean corpus
    and every crawl batch scores against it): rows
    (kind='bigram', w1, w2, cnt=c2) plus one (kind='meta',
    w1='vocab_size', cnt=V) row. Only bigram counts and the vocabulary
    scalar are stored; context counts are re-derived on load
    (sum of c2 over w2), so the artifact cannot go internally
    inconsistent. Same artifact discipline as the linking dictionary
    (operators/phrases.save_dictionary): batch refresh writes it,
    scoring jobs load it.

    Refuses to write a model with an empty vocabulary: an empty or
    tokenless training corpus is a misconfiguration (wrong path, empty
    read), and a vocab=0 artifact consumed by a quality-gated stream
    would silently drop every document forever — fail at training
    time, where the mistake is."""
    with_t = train.select(
        F.lit(0).cast("long").alias("_lm_id"), F.col(text_col)
    )
    with_t = _lm_tokens(with_t, text_col, "_lm_id")
    vocab = int(
        with_t.select(F.explode("t").alias("term"))
        .agg(F.countDistinct("term"))
        .collect()[0][0]
        or 0
    )
    if vocab == 0:
        raise ValueError(
            "save_lm_artifact: training corpus has no tokens — refusing "
            "to write an unusable vocab=0 model (check the input path)"
        )
    c2 = (
        _lm_pairs(with_t, "_lm_id")
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    meta = train.sparkSession.createDataFrame(
        [("meta", "vocab_size", None, vocab)],
        "kind string, w1 string, w2 string, cnt long",
    )
    c2.select(
        F.lit("bigram").alias("kind"), "w1", "w2", F.col("cnt")
    ).unionByName(meta).write.mode("overwrite").parquet(path)


def load_lm_artifact(spark, path: str) -> tuple[DataFrame, int]:
    """Load a save_lm_artifact() table into its scoring form:
    (c2 frame (w1, w2, c2), vocabulary size). Rejects non-artifact
    parquet loudly (no meta row) AND an unusable vocab<=0 model
    (save_lm_artifact refuses to write one, but a hand-built or
    corrupted table must not silently drop every scored document).
    One config-sized collect for the scalar; the c2 frame stays lazy —
    a stream loads the model ONCE at start and scores every batch
    against the same frames (the frozen dictionary discipline,
    streaming/incremental.py)."""
    art = spark.read.parquet(path)
    meta = art.where(
        (F.col("kind") == "meta") & (F.col("w1") == "vocab_size")
    ).select("cnt").collect()
    if not meta:
        raise ValueError(
            f"LM artifact at {path} has no meta/vocab_size row — not a "
            "save_lm_artifact() table"
        )
    vocab = int(meta[0]["cnt"] or 0)
    if vocab <= 0:
        raise ValueError(
            f"LM artifact at {path} has vocab_size={vocab} — an empty "
            "model scores nothing and a quality gate on it would drop "
            "every document; retrain on a non-empty corpus"
        )
    c2 = art.where(F.col("kind") == "bigram").select(
        "w1", "w2", F.col("cnt").alias("c2")
    )
    return c2, vocab


def lm_quality_filter(
    df: DataFrame,
    c2: DataFrame,
    vocab: int,
    max_avg_nll: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    c1: DataFrame | None = None,
) -> DataFrame:
    """Keep only documents whose avg_nll_i4 under the given model
    (load_lm_artifact frames) is <= ``max_avg_nll``; documents too
    short to score (<2 tokens) drop too — the same contract as the
    curate CLI's --max-avg-nll. Semi join, so the input schema passes
    through untouched. An empty model is rejected loudly (a vocab=0
    gate would silently drop everything; load_lm_artifact refuses to
    produce one). Per-batch callers (streaming ingest) pass the
    derived-and-persisted ``c1`` so the model is not re-aggregated
    per batch."""
    if vocab <= 0:
        raise ValueError(
            "lm_quality_filter: vocab must be positive — an empty model "
            "would drop every document"
        )
    keep = (
        _lm_score_tail(_lm_ptf(df, text_col, id_col), c2, vocab, id_col,
                       c1=c1)
        .where(F.col("avg_nll_i4") <= max_avg_nll)
        .select(id_col)
    )
    return df.join(keep, id_col, "semi")


def lm_doc_score_from_artifact(
    df: DataFrame,
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Score a corpus against a save_lm_artifact() model — exactly
    equal to ``lm_doc_score(df, train=<the corpus the artifact was
    trained on>)`` (differential-tested), without re-reading or
    re-pairing the training text. The model load is two scans of the
    compact artifact (bigram-type rows ~|bigram vocab|, one meta row);
    scoring cost is the usual one (w1, w2) equi-join."""
    c2, vocab = load_lm_artifact(df.sparkSession, path)
    return _lm_score_tail(_lm_ptf(df, text_col, id_col), c2, vocab, id_col)


def drop_repeated_lines(
    df: DataFrame,
    text_col: str = "text",
    sep: str = "\n",
) -> DataFrame:
    """RefinedWeb-style line-wise correction (Penedo et al. 2023 §3.3,
    "The RefinedWeb Dataset for Falcon LLM"): within each document,
    remove every repeated occurrence of an exact line, keeping the
    first — the in-document counterpart of cross-document span removal
    (remove_duplicate_spans), aimed at nav bars / cookie banners /
    footer text that repeat inside one page. Lines are compared EXACTLY
    (no trimming), empty lines included — so at most one empty line
    survives, which also collapses blank-line runs.

    Output: the input row with ``text_col`` rewritten plus ``n_dropped``
    (lines removed). ``array_distinct`` preserves first-occurrence
    order; the DuckDB oracle mirrors it with min(pos) grouping +
    ordered string_agg.

    Scale shape: a NARROW per-row map over the split array — zero
    shuffles, zero explodes, pipelines into the scan like scrub_pii.
    ``sep`` is a LITERAL separator (regex-escaped before F.split).
    """
    import re as _re

    lines = F.split(F.col(text_col), _re.escape(sep), -1)
    kept = F.array_distinct(lines)
    return df.withColumn(
        "n_dropped", (F.size(lines) - F.size(kept)).cast("long")
    ).withColumn(text_col, F.array_join(kept, sep))

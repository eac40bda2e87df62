"""Inverted-index / BM25 retrieval (operators/retrieval.py), integer
HITS (operators/components.integer_hits), and anchor-text extraction
(operators/webgraph.extract_anchors / anchor_text_profile). Driver-gated
twins: bm25_topk, host_hits, anchor_text_profile, bpe_merge_pairs
(queries.py) with DuckDB oracles."""

from __future__ import annotations

import math

import pytest

from knowledgegraphgenerator_spark.operators.retrieval import (
    bm25_topk,
    build_postings,
    doc_lengths,
)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


_CORPUS = [
    (1, "apple banana apple"),
    (2, "apple cherry"),
    (3, "banana banana banana cherry"),
]


def _tokens_df(spark):
    from pyspark.sql import functions as F

    return (
        spark.createDataFrame(_CORPUS, "doc_id long, text string")
        .select(
            "doc_id",
            F.explode(F.split("text", " ")).alias("term"),
        )
    )


def _ref_bm25(query, k1=1.2, b=0.75):
    """Plain-Python reference of the pinned scoring: per-term double,
    HALF_UP-rounded once to 1e-4 integer units, integer-summed."""
    toks = {d: t.split() for d, t in _CORPUS}
    dl = {d: len(t) for d, t in toks.items()}
    n = len(toks)
    avgdl = sum(dl.values()) / n
    out = {}
    for d, t in toks.items():
        total, hit = 0, 0
        for q in sorted(set(query)):
            tf = t.count(q)
            if tf == 0:
                continue
            df = sum(1 for tt in toks.values() if q in tt)
            idf = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
            s = idf * ((tf * (k1 + 1.0)) / (tf + (k1 * (1.0 - b) + k1 * b * (dl[d] / avgdl))))
            total += int(math.floor(s * 10000 + 0.5))
            hit += 1
        if hit:
            out[d] = (total, hit)
    return out


def test_bm25_matches_python_reference(spark):
    """Exact integer-unit agreement with the plain-Python reference,
    rank order (score desc, doc_id asc) included."""
    got = bm25_topk(_tokens_df(spark), ("apple", "cherry"), k=3).collect()
    ref = _ref_bm25(("apple", "cherry"))
    expected = sorted(
        ((s, h, d) for d, (s, h) in ref.items()),
        key=lambda x: (-x[0], x[2]),
    )
    assert [(r["score_i4"], r["n_hit"], r["doc_id"]) for r in got] == expected
    assert [r["rnk"] for r in got] == list(range(1, len(expected) + 1))


def test_bm25_idf_prefers_rare_terms(spark):
    """A doc matching only the rare term outscores a doc matching only
    the common term at equal tf and dl — the idf half of BM25."""
    rows = [
        (1, ["rare", "x", "y"]),
        (2, ["common", "x", "y"]),
        (3, ["common", "p", "q"]),
        (4, ["common", "r", "s"]),
    ]
    toks = spark.createDataFrame(
        [(d, t) for d, ts in rows for t in ts], "doc_id long, term string"
    )
    got = {r["doc_id"]: r["rnk"] for r in bm25_topk(toks, ("rare", "common"), k=4).collect()}
    assert got[1] == 1


def test_bm25_edge_cases(spark):
    toks = _tokens_df(spark)
    with pytest.raises(ValueError):
        bm25_topk(toks, [])
    assert bm25_topk(toks, ("absent",), k=5).count() == 0
    empty = toks.where("doc_id < 0")
    assert bm25_topk(empty, ("apple",), k=5).count() == 0


def test_bm25_long_repr_avgdl_matches_reference(spark):
    """ADVICE r5 (high): float constants interpolated as bare literals
    parse as DECIMAL, quantizing ``dl / avgdl`` to decimal(38,6) and
    diverging from the oracle's IEEE doubles by one 1e-4 unit on
    long-repr avgdl corpora (which can flip ranks). This corpus is
    seeded so avgdl has a full 17-significant-digit repr; every score
    must match the plain-Python double reference exactly."""
    import random

    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(40)]
    corpus = [
        (
            d,
            " ".join(
                rng.choice(vocab) for _ in range(rng.randint(3, 23))
            ),
        )
        for d in range(499)
    ]
    toks_py = {d: t.split() for d, t in corpus}
    dl = {d: len(t) for d, t in toks_py.items()}
    avgdl = sum(dl.values()) / len(dl)
    assert len(repr(avgdl)) > 10, f"corpus not long-repr: {avgdl!r}"
    query = ("w0", "w7", "w31")
    n = len(toks_py)
    ref = {}
    for d, t in toks_py.items():
        total, hit = 0, 0
        for q in sorted(set(query)):
            tf = t.count(q)
            if tf == 0:
                continue
            df = sum(1 for tt in toks_py.values() if q in tt)
            idf = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
            s = idf * (
                (tf * 2.2) / (tf + (0.3 + 0.9 * (dl[d] / avgdl)))
            )
            total += int(math.floor(s * 10000 + 0.5))
            hit += 1
        if hit:
            ref[d] = (total, hit)
    expected = sorted(
        ((s, h, d) for d, (s, h) in ref.items()),
        key=lambda x: (-x[0], x[2]),
    )[:20]
    from pyspark.sql import functions as F

    toks = (
        spark.createDataFrame(corpus, "doc_id long, text string")
        .select("doc_id", F.explode(F.split("text", " ")).alias("term"))
    )
    got = bm25_topk(toks, query, k=20).collect()
    assert [
        (r["score_i4"], r["n_hit"], r["doc_id"]) for r in got
    ] == expected


def test_bm25_empty_corpus_preserves_id_dtype(spark):
    """ADVICE r5: the empty-corpus result must carry the CORPUS
    doc_id dtype (string here), not a hardcoded long."""
    toks = spark.createDataFrame([], "doc_id string, term string")
    out = bm25_topk(toks, ("x",), k=5)
    assert out.schema["doc_id"].dataType.simpleString() == "string"
    assert out.count() == 0


def test_postings_and_lengths(spark):
    toks = _tokens_df(spark)
    post = {
        (r["term"], r["doc_id"]): r["tf"]
        for r in build_postings(toks).collect()
    }
    assert post[("apple", 1)] == 2 and post[("banana", 3)] == 3
    dl = {r["doc_id"]: r["dl"] for r in doc_lengths(toks).collect()}
    assert dl == {1: 3, 2: 2, 3: 4}


def test_bm25_topk_plan_uses_take_ordered(spark):
    """The global top-k must be TakeOrderedAndProject (per-partition
    heaps), not a global sort of all scored documents."""
    plan = _plan(bm25_topk(_tokens_df(spark), ("apple",), k=2))
    assert "TakeOrderedAndProject" in plan


def test_bm25_served_equals_plain_and_rides_buckets(spark):
    """Store-then-serve must be lossless: the bucketed-catalog-table
    path returns exactly the from-tokens result; the term-keyed df
    aggregation plans with ZERO Exchange on the term-bucketed postings
    and the query's In filter reaches the parquet scan."""
    from pyspark.sql import functions as F

    from knowledgegraphgenerator_spark.operators.retrieval import (
        bm25_topk_served,
        write_retrieval_tables,
    )

    toks = _tokens_df(spark)
    write_retrieval_tables(
        toks, "t_bm25_post", "t_bm25_dl", n_buckets=4
    )
    q = ("apple", "cherry")
    plain = sorted(
        tuple(r) for r in bm25_topk(toks, q, k=3).collect()
    )
    served = sorted(
        tuple(r)
        for r in bm25_topk_served(
            spark, q, k=3,
            postings_table="t_bm25_post", dl_table="t_bm25_dl",
        ).collect()
    )
    assert served == plain and len(served) == 3
    dfq = (
        spark.table("t_bm25_post")
        .where(F.col("term").isin(list(q)))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    plan = _plan(dfq)
    assert "Exchange" not in plan
    assert "In(term" in plan  # pushed to the parquet scan


def test_append_retrieval_tables_equals_rebuild(spark):
    """Incremental maintenance: building the store from half the
    corpus and appending the (doc-disjoint) other half must serve
    exactly what a full rebuild serves — postings, doc lengths, and
    the BM25 answer; the appended store still resolves zero-Exchange
    on the term key."""
    from pyspark.sql import functions as F

    from knowledgegraphgenerator_spark.operators.retrieval import (
        append_retrieval_tables,
        bm25_topk_served,
        write_retrieval_tables,
    )

    toks = _tokens_df(spark)
    write_retrieval_tables(
        toks, "t_full_post", "t_full_dl", n_buckets=2
    )
    write_retrieval_tables(
        toks.where(F.col("doc_id") != 3),
        "t_inc_post", "t_inc_dl", n_buckets=2,
    )
    append_retrieval_tables(
        toks.where(F.col("doc_id") == 3),
        "t_inc_post", "t_inc_dl", n_buckets=2,
    )
    for a, b in (("t_full_post", "t_inc_post"), ("t_full_dl", "t_inc_dl")):
        assert sorted(map(tuple, spark.table(a).collect())) == sorted(
            map(tuple, spark.table(b).collect())
        )
    q = ("apple", "cherry")
    full = [tuple(r) for r in bm25_topk_served(
        spark, q, k=3, postings_table="t_full_post", dl_table="t_full_dl"
    ).collect()]
    inc = [tuple(r) for r in bm25_topk_served(
        spark, q, k=3, postings_table="t_inc_post", dl_table="t_inc_dl"
    ).collect()]
    assert inc == full
    dfq = (
        spark.table("t_inc_post")
        .where(F.col("term").isin(list(q)))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    assert "Exchange" not in _plan(dfq)


def test_compact_bucketed_table_after_appends(spark):
    """Compaction rewrites an append-accumulated store to one file set
    per bucket: fewer files, identical values, and the zero-Exchange
    bucket-key plan survives the drop-and-rename swap."""
    import glob
    import os

    from pyspark.sql import functions as F

    from knowledgegraphgenerator_spark.operators.retrieval import (
        append_retrieval_tables,
        write_retrieval_tables,
    )
    from knowledgegraphgenerator_spark.operators.triples import (
        compact_bucketed_table,
        managed_table_location,
    )

    toks = _tokens_df(spark)
    write_retrieval_tables(
        toks.where("doc_id = 1"), "t_cmp_post", "t_cmp_dl", n_buckets=2
    )
    for d in (2, 3):
        append_retrieval_tables(
            toks.where(f"doc_id = {d}"), "t_cmp_post", "t_cmp_dl",
            n_buckets=2,
        )
    before = sorted(map(tuple, spark.table("t_cmp_post").collect()))
    loc = managed_table_location(spark, "t_cmp_post").removeprefix("file:")
    n_files_before = len(glob.glob(os.path.join(loc, "*.parquet")))
    compact_bucketed_table(spark, "t_cmp_post")  # spec from catalog
    loc2 = managed_table_location(spark, "t_cmp_post").removeprefix("file:")
    n_files_after = len(glob.glob(os.path.join(loc2, "*.parquet")))
    # pinned write partitions == bucket count -> at most one file per
    # bucket; the pre-compaction store carries one file set per append
    assert n_files_after <= 2 < n_files_before
    assert sorted(map(tuple, spark.table("t_cmp_post").collect())) == before
    dfq = (
        spark.table("t_cmp_post")
        .where(F.col("term").isin(["apple", "cherry"]))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    assert "Exchange" not in _plan(dfq)


def test_compact_recovers_from_interrupted_swap(spark):
    """ADVICE r5: a crash between DROP TABLE and ALTER..RENAME leaves
    the serving table absent and the compacted data stranded under
    <table>__compact. Re-running compact must rename it back into
    place instead of failing with 'requires an existing catalog
    table'."""
    from knowledgegraphgenerator_spark.operators.retrieval import (
        write_retrieval_tables,
    )
    from knowledgegraphgenerator_spark.operators.triples import (
        compact_bucketed_table,
    )

    toks = _tokens_df(spark)
    write_retrieval_tables(toks, "t_rec_post", "t_rec_dl", n_buckets=2)
    before = sorted(map(tuple, spark.table("t_rec_post").collect()))
    # simulate the crash window: the compacted table exists, the DROP
    # of the original succeeded, the RENAME never ran
    spark.sql("ALTER TABLE t_rec_post RENAME TO t_rec_post__compact")
    compact_bucketed_table(spark, "t_rec_post")
    assert sorted(map(tuple, spark.table("t_rec_post").collect())) == before
    # and the recovered table compacts normally afterwards
    compact_bucketed_table(spark, "t_rec_post")
    assert sorted(map(tuple, spark.table("t_rec_post").collect())) == before


def test_append_replay_and_repair(spark):
    """Replay safety: re-appending a fully applied batch is a no-op
    (the doclen guard filters it); after a simulated crash between the
    two appends, repair_retrieval_store rebuilds doclen from postings
    and the retried batch is then also a no-op — never double-counted."""
    from pyspark.sql import functions as F

    from knowledgegraphgenerator_spark.operators.retrieval import (
        append_retrieval_tables,
        repair_retrieval_store,
        write_retrieval_tables,
    )
    from knowledgegraphgenerator_spark.operators.triples import (
        write_bucketed_table,
    )

    toks = _tokens_df(spark)
    write_retrieval_tables(
        toks.where("doc_id = 1"), "t_rep_post", "t_rep_dl", n_buckets=2
    )
    batch = toks.where("doc_id = 2")
    append_retrieval_tables(batch, "t_rep_post", "t_rep_dl", n_buckets=2)
    snapshot = sorted(map(tuple, spark.table("t_rep_post").collect()))
    # full replay of the applied batch -> no-op
    append_retrieval_tables(batch, "t_rep_post", "t_rep_dl", n_buckets=2)
    assert sorted(map(tuple, spark.table("t_rep_post").collect())) == snapshot
    # crash between the appends: postings committed, doclen missing
    crash = toks.where("doc_id = 3")
    from knowledgegraphgenerator_spark.operators.retrieval import (
        build_postings,
    )

    write_bucketed_table(
        build_postings(crash), "t_rep_post", "term", 2, mode="append"
    )
    assert spark.table("t_rep_post").where("doc_id = 3").count() > 0
    assert spark.table("t_rep_dl").where("doc_id = 3").count() == 0
    repair_retrieval_store(spark, "t_rep_post", "t_rep_dl")
    assert spark.table("t_rep_dl").where("doc_id = 3").count() == 1
    after_repair = sorted(map(tuple, spark.table("t_rep_post").collect()))
    # retry of the crashed batch -> no-op (guard sees repaired doclen)
    append_retrieval_tables(crash, "t_rep_post", "t_rep_dl", n_buckets=2)
    assert sorted(
        map(tuple, spark.table("t_rep_post").collect())
    ) == after_repair
    # doclen stays consistent with postings everywhere
    derived = sorted(map(tuple, (
        spark.table("t_rep_post").groupBy("doc_id")
        .agg(F.sum("tf").alias("dl")).collect()
    )))
    assert sorted(map(tuple, spark.table("t_rep_dl").collect())) == derived


def test_append_adds_at_most_one_file_per_bucket(spark):
    """The batch repartitions onto the bucket key before each write,
    so one append adds at most n_buckets files per table regardless of
    shuffle partitioning."""
    import glob
    import os

    from knowledgegraphgenerator_spark.operators.retrieval import (
        append_retrieval_tables,
        write_retrieval_tables,
    )
    from knowledgegraphgenerator_spark.operators.triples import (
        managed_table_location,
    )

    toks = _tokens_df(spark)
    write_retrieval_tables(
        toks.where("doc_id = 1"), "t_one_post", "t_one_dl", n_buckets=2
    )
    loc = managed_table_location(spark, "t_one_post").removeprefix("file:")
    before = len(glob.glob(os.path.join(loc, "*.parquet")))
    append_retrieval_tables(
        toks.where("doc_id != 1"), "t_one_post", "t_one_dl", n_buckets=2
    )
    after = len(glob.glob(os.path.join(loc, "*.parquet")))
    assert after - before <= 2


def test_append_requires_existing_store(spark):
    """Appending to a store this session's catalog does not know must
    fail loudly — never CREATE a fork holding only the batch."""
    from knowledgegraphgenerator_spark.operators.retrieval import (
        append_retrieval_tables,
    )

    with pytest.raises(ValueError, match="existing catalog table"):
        append_retrieval_tables(
            _tokens_df(spark), "t_no_such_store", "t_no_such_dl"
        )


def test_integer_hits_star_graph(spark):
    """Two pages linking one target: sources are pure hubs (split
    mass), the target is the sole authority — exact integer values."""
    from knowledgegraphgenerator_spark.operators.components import (
        integer_hits,
    )

    edges = spark.createDataFrame(
        [("a", "c"), ("b", "c")], "src string, dst string"
    )
    got = {
        r["entity"]: (r["hub"], r["auth"])
        for r in integer_hits(edges, n_iters=2).collect()
    }
    assert got == {
        "a": (500000, 0),
        "b": (500000, 0),
        "c": (0, 1000000),
    }


def test_integer_hits_empty(spark):
    from knowledgegraphgenerator_spark.operators.components import (
        integer_hits,
    )

    edges = spark.createDataFrame([], "src string, dst string")
    assert integer_hits(edges).count() == 0


def test_extract_anchors_quote_styles_and_drops(spark):
    """Double- and single-quoted hrefs both carry their anchor text;
    relative links and anchors with nested markup are dropped (the
    plain-text-anchor contract)."""
    from knowledgegraphgenerator_spark.operators.webgraph import (
        extract_anchors,
    )

    html = (
        '<a href="https://a.com/x">download spark</a>'
        "<a href='https://b.com/y' rel=nofollow>user guide</a>"
        '<a href="/rel">local</a>'
        '<a href="https://c.com/z"><b>bold</b></a>'
    )
    df = spark.createDataFrame(
        [("https://src.com/", html)], "url string, html string"
    )
    got = sorted(
        (r["href"], r["anchor"])
        for r in extract_anchors(df, "html", "url").collect()
    )
    assert got == [
        ("https://a.com/x", "download spark"),
        ("https://b.com/y", "user guide"),
    ]


def test_anchor_text_profile_topk_and_ties(spark):
    """Per-host term ranking: count desc, then term asc on ties; rank
    cut at top_k; host normalization collapses www/port variants."""
    from knowledgegraphgenerator_spark.operators.webgraph import (
        anchor_text_profile,
    )

    rows = [
        ("s", "https://t.com/1", "spark engine"),
        ("s", "https://WWW.T.com:443/2", "spark docs"),
        ("s", "https://t.com/3", "engine"),
        ("s", "https://other.net/", "zz"),
    ]
    df = spark.createDataFrame(rows, "src_url string, href string, anchor string")
    got = [
        (r["dst_host"], r["rnk"], r["term"], r["cnt"])
        for r in anchor_text_profile(df, top_k=2).collect()
    ]
    assert sorted(got) == [
        ("other.net", 1, "zz", 1),
        ("t.com", 1, "engine", 2),
        ("t.com", 2, "spark", 2),
    ]


def test_bpe_pair_guard_short_words(spark, tmp_path):
    """Length-1 words must contribute no pairs (ANSI sequence(1,0)
    counts DOWN — the length >= 2 filter in q_bpe_merge_pairs is
    load-bearing). Exercises the REAL registered query on a crafted
    documents table where removing the guard crashes (ANSI) or mints
    phantom pairs."""
    from knowledgegraphgenerator_spark.queries import QUERIES

    docs = spark.createDataFrame(
        [(1, "a a a go", "en"), (2, "a go be", "en")],
        "doc_id long, text string, lang string",
    )
    sf = str(tmp_path / "sf")
    docs.write.parquet(f"{sf}/documents.parquet")
    got = {
        r["pair"]: (r["cnt"], r["rnk"])
        for r in QUERIES["bpe_merge_pairs"](spark, sf).collect()
    }
    # words: a(x4, len 1 -> no pairs), go(x2), be(x1)
    assert got == {"go": (2, 1), "be": (1, 2)}


def test_integer_hits_zero_iters_returns_seed(spark):
    """n_iters=0 returns the uniform seed state — the same
    degenerate-parameter contract as integer_pagerank."""
    from knowledgegraphgenerator_spark.operators.components import (
        integer_hits,
    )

    edges = spark.createDataFrame(
        [("a", "b")], "src string, dst string"
    )
    got = {
        r["entity"]: (r["hub"], r["auth"])
        for r in integer_hits(edges, n_iters=0).collect()
    }
    assert got == {"a": (500000, 500000), "b": (500000, 500000)}


def test_append_resolves_bucket_spec_from_catalog(spark):
    """The store owns its bucket spec: appending with a mismatched
    n_buckets flag (index CLI defaults 32, ingest --index-buckets 8)
    must follow the catalog spec instead of dying on an
    AnalysisException, and the store stays value-equal to a rebuild."""
    from pyspark.sql import functions as F

    from knowledgegraphgenerator_spark.operators.retrieval import (
        append_retrieval_tables,
        write_retrieval_tables,
    )
    from knowledgegraphgenerator_spark.operators.triples import (
        table_bucket_spec,
    )

    toks = _tokens_df(spark)
    write_retrieval_tables(
        toks.where(F.col("doc_id") != 3),
        "t_spec_post", "t_spec_dl", n_buckets=4,
    )
    append_retrieval_tables(
        toks.where(F.col("doc_id") == 3),
        "t_spec_post", "t_spec_dl", n_buckets=8,  # mismatched flag
    )
    assert table_bucket_spec(spark, "t_spec_post")[1] == 4
    write_retrieval_tables(toks, "t_spec_post_f", "t_spec_dl_f",
                           n_buckets=4)
    got = {
        tuple(r)
        for r in spark.table("t_spec_post").collect()
    }
    want = {
        tuple(r)
        for r in spark.table("t_spec_post_f").collect()
    }
    assert got == want

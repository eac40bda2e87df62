"""lm_doc_score (CCNet-style bigram-LM quality scoring) and
drop_repeated_lines (RefinedWeb line-wise correction) — exact-value
tests against pure-Python references."""

from __future__ import annotations

import math

from knowledgegraphgenerator_spark.operators.curation import (
    drop_repeated_lines,
    lm_doc_score,
)


def _py_lm_scores(docs: dict[int, str]) -> dict[int, tuple[int, int, int]]:
    """Plain-Python bigram LM with add-one smoothing, integer 1e-4
    nats rounded once per bigram TYPE — the operator's contract."""
    toks = {d: [t for t in s.split(" ") if t] for d, s in docs.items()}
    vocab = len({t for ts in toks.values() for t in ts})
    c2: dict[tuple[str, str], int] = {}
    for ts in toks.values():
        for a, b in zip(ts, ts[1:]):
            c2[(a, b)] = c2.get((a, b), 0) + 1
    c1: dict[str, int] = {}
    for (a, _), n in c2.items():
        c1[a] = c1.get(a, 0) + n
    out: dict[int, tuple[int, int, int]] = {}
    for d, ts in toks.items():
        if len(ts) < 2:
            continue
        total = 0
        for a, b in zip(ts, ts[1:]):
            nll = round(
                math.log((c1[a] + vocab) / (c2[(a, b)] + 1.0)) * 10000
            )
            total += nll
        n_pairs = len(ts) - 1
        out[d] = (n_pairs, total, total // n_pairs)
    return out


def test_lm_doc_score_matches_python_reference(spark):
    docs = {
        1: "the cat sat on the mat",
        2: "the cat sat on the cat",
        3: "dog",  # single token: no bigram, unscorable
        4: "the the the the",
        5: "mat on sat cat the",  # reversed-ish: rare bigrams
        6: "",  # empty: excluded
    }
    df = spark.createDataFrame(
        [(d, s) for d, s in docs.items()], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["n_pairs"], r["nll_i4"], r["avg_nll_i4"])
        for r in lm_doc_score(df).collect()
    }
    assert got == _py_lm_scores(docs)
    # common-bigram doc scores BETTER (lower nll) than the rare one
    assert got[1][2] < got[5][2]


def test_lm_doc_score_double_spaces_do_not_split_pairs(spark):
    # empty tokens are filtered BEFORE pairing: 'a  b' still forms (a,b)
    df = spark.createDataFrame(
        [(1, "a  b"), (2, "a b")], "doc_id long, text string"
    )
    rows = {r["doc_id"]: r["n_pairs"] for r in lm_doc_score(df).collect()}
    assert rows == {1: 1, 2: 1}


def test_drop_repeated_lines_keeps_first_occurrence(spark):
    df = spark.createDataFrame(
        [
            (1, "nav\nbody one\nnav\nbody two\nnav"),
            (2, "a\n\n\nb\n\na"),  # blank-line runs collapse to one
            (3, "unique"),
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["text"], r["n_dropped"])
        for r in drop_repeated_lines(df).collect()
    }
    assert got[1] == ("nav\nbody one\nbody two", 2)
    assert got[2] == ("a\n\nb", 3)
    assert got[3] == ("unique", 0)


def test_drop_repeated_lines_literal_separator(spark):
    # '.' must be treated literally, not as a regex wildcard
    df = spark.createDataFrame(
        [(1, "x.y.x.z")], "doc_id long, text string"
    )
    r = drop_repeated_lines(df, sep=".").collect()[0]
    assert (r["text"], r["n_dropped"]) == ("x.y.z", 1)


def test_lm_line_plan_shapes(spark):
    """Scale-shape pins: drop_repeated_lines is a zero-shuffle narrow
    map; lm_doc_score never shuffles the token stream on doc_id and
    never plans a Window (the bigram pairing is zip-sliced arrays, not
    a lag window)."""
    from pyspark.sql import functions as F

    df = spark.range(100).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("a b c a b \nx\nx\ny"), F.col("id").cast("string"))
        .alias("text"),
    )
    plan = (
        drop_repeated_lines(df)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan, plan

    plan2 = (
        lm_doc_score(df)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Window" not in plan2, plan2
    # every non-broadcast Exchange is an aggregation/join on term keys
    # or the final doc_id rollup of the tiny scored frame — none of
    # them re-partitions the raw token stream by position
    assert "posexplode" not in plan2.lower()


def _py_heldout_scores(
    train: dict[int, str], score: dict[int, str]
) -> dict[int, tuple[int, int, int]]:
    """Held-out twin of _py_lm_scores: counts/vocab from train, unseen
    events priced by add-one (c2=0 / c1=0 fall out of .get defaults)."""
    tt = {d: [t for t in s.split(" ") if t] for d, s in train.items()}
    st = {d: [t for t in s.split(" ") if t] for d, s in score.items()}
    vocab = len({t for ts in tt.values() for t in ts})
    c2: dict[tuple[str, str], int] = {}
    for ts in tt.values():
        for a, b in zip(ts, ts[1:]):
            c2[(a, b)] = c2.get((a, b), 0) + 1
    c1: dict[str, int] = {}
    for (a, _), n in c2.items():
        c1[a] = c1.get(a, 0) + n
    out: dict[int, tuple[int, int, int]] = {}
    for d, ts in st.items():
        if len(ts) < 2:
            continue
        total = 0
        for a, b in zip(ts, ts[1:]):
            nll = round(
                math.log(
                    (c1.get(a, 0) + vocab) / (c2.get((a, b), 0) + 1.0)
                )
                * 10000
            )
            total += nll
        out[d] = (len(ts) - 1, total, total // (len(ts) - 1))
    return out


def test_lm_doc_score_heldout_unseen_events(spark):
    train = {10: "the cat sat on the mat", 11: "the dog sat here"}
    score = {
        1: "the cat sat here",        # all events seen
        2: "the cat ate the mat",     # unseen bigram (cat, ate) + OOV 'ate'
        3: "zebra quagga",            # fully OOV context: uniform ln(V)
        4: "mat",                     # unscorable
    }
    tdf = spark.createDataFrame(
        list(train.items()), "doc_id long, text string"
    )
    sdf = spark.createDataFrame(
        list(score.items()), "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["n_pairs"], r["nll_i4"], r["avg_nll_i4"])
        for r in lm_doc_score(sdf, train=tdf).collect()
    }
    assert got == _py_heldout_scores(train, score)
    # unseen events cost more than seen ones
    assert got[3][2] > got[1][2]


def test_lm_doc_score_empty_train_is_unscorable(spark):
    sdf = spark.createDataFrame(
        [(1, "a b c")], "doc_id long, text string"
    )
    empty = spark.createDataFrame([], "doc_id long, text string")
    res = lm_doc_score(sdf, train=empty)
    assert res.count() == 0
    assert res.columns == ["doc_id", "n_pairs", "nll_i4", "avg_nll_i4"]


def test_lm_ppl_buckets_tercile_assignment(spark, tmp_path):
    """The CCNet tier split must match numpy's type-7 percentile
    (Spark `percentile` and DuckDB `quantile_cont` both implement it)
    applied to the same integer scores."""
    import numpy as np

    from knowledgegraphgenerator_spark.queries import (
        q_lm_doc_score,
        q_lm_ppl_buckets,
    )

    docs = [
        (i, " ".join(["the cat sat on the mat"] * (1 + i % 3))
         + (" zebra quagga xylophone" * (i % 4)))
        for i in range(12)
    ]
    sf = str(tmp_path)
    spark.createDataFrame(docs, "doc_id long, text string") \
        .write.mode("overwrite").parquet(f"{sf}/documents.parquet")

    scores = {
        r["doc_id"]: r["avg_nll_i4"]
        for r in q_lm_doc_score(spark, sf).collect()
    }
    vals = np.array(sorted(scores.values()), dtype=float)
    c1 = np.percentile(vals, 33.333, method="linear")
    c2 = np.percentile(vals, 66.667, method="linear")

    got = {
        r["doc_id"]: r["bucket"]
        for r in q_lm_ppl_buckets(spark, sf).collect()
    }
    want = {
        d: ("head" if v <= c1 else "middle" if v <= c2 else "tail")
        for d, v in scores.items()
    }
    assert got == want
    assert set(want.values()) == {"head", "middle", "tail"}


def test_lm_artifact_roundtrip_equals_heldout(spark, tmp_path):
    """save_lm_artifact + lm_doc_score_from_artifact must equal
    lm_doc_score(df, train=train) value-for-value — the frozen
    reference-model regime is lossless."""
    from knowledgegraphgenerator_spark.operators.curation import (
        lm_doc_score_from_artifact,
        save_lm_artifact,
    )

    train = spark.createDataFrame(
        [(10, "the cat sat on the mat"), (11, "the dog sat here")],
        "doc_id long, text string",
    )
    score = spark.createDataFrame(
        [
            (1, "the cat sat here"),
            (2, "the cat ate the mat"),
            (3, "zebra quagga"),
        ],
        "doc_id long, text string",
    )
    path = str(tmp_path / "lm_model")
    save_lm_artifact(train, path)

    direct = {
        tuple(r) for r in lm_doc_score(score, train=train).collect()
    }
    via_artifact = {
        tuple(r)
        for r in lm_doc_score_from_artifact(score, path).collect()
    }
    assert via_artifact == direct and len(direct) == 3

    import pytest as _pytest

    # a non-artifact parquet dir must be rejected loudly
    train.write.mode("overwrite").parquet(str(tmp_path / "not_model"))
    with _pytest.raises(Exception):
        lm_doc_score_from_artifact(score, str(tmp_path / "not_model"))


def test_cli_curate_lm_artifact_regime(spark, tmp_path):
    """curate --save-lm-artifact on a clean corpus, then curate
    --lm-artifact on a crawl: scores must equal the library's
    held-out path trained on the clean corpus."""
    from knowledgegraphgenerator_spark.__main__ import main

    clean = spark.createDataFrame(
        [(10, "the cat sat on the mat", "en"),
         (11, "the dog sat here", "en")],
        "doc_id long, text string, lang string",
    )
    crawl = spark.createDataFrame(
        [(1, "the cat sat here", "en"), (2, "zebra quagga xy", "en")],
        "doc_id long, text string, lang string",
    )
    clean_src = str(tmp_path / "clean")
    crawl_src = str(tmp_path / "crawl")
    clean.write.mode("overwrite").parquet(clean_src)
    crawl.write.mode("overwrite").parquet(crawl_src)
    model = str(tmp_path / "model")
    out1 = str(tmp_path / "out1")
    out2 = str(tmp_path / "out2")

    assert main(["curate", "--input", clean_src, "--output", out1,
                 "--save-lm-artifact", model], spark=spark) == 0
    assert main(["curate", "--input", crawl_src, "--output", out2,
                 "--lm-artifact", model], spark=spark) == 0

    got = {
        r["doc_id"]: r["avg_nll_i4"]
        for r in spark.read.parquet(out2).collect()
    }
    want = {
        r["doc_id"]: r["avg_nll_i4"]
        for r in lm_doc_score(crawl, train=clean).collect()
    }
    assert got == want


def test_lm_artifact_guards(spark, tmp_path):
    """Review-pass guards: (a) save_lm_artifact refuses an empty/
    tokenless training corpus; (b) load_lm_artifact rejects a
    hand-built vocab=0 table; (c) lm_quality_filter rejects vocab<=0
    instead of silently dropping everything."""
    import pytest

    from knowledgegraphgenerator_spark.operators.curation import (
        lm_quality_filter,
        load_lm_artifact,
        save_lm_artifact,
    )

    empty = spark.createDataFrame([(1, "")], "doc_id long, text string")
    with pytest.raises(ValueError, match="no tokens"):
        save_lm_artifact(empty, str(tmp_path / "m0"))

    spark.createDataFrame(
        [("meta", "vocab_size", None, 0)],
        "kind string, w1 string, w2 string, cnt long",
    ).write.mode("overwrite").parquet(str(tmp_path / "m1"))
    with pytest.raises(ValueError, match="vocab_size=0"):
        load_lm_artifact(spark, str(tmp_path / "m1"))

    df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    c2 = spark.createDataFrame([], "w1 string, w2 string, c2 long")
    with pytest.raises(ValueError, match="vocab must be positive"):
        lm_quality_filter(df, c2, 0, 100)


def test_cli_curate_recurate_and_train_after_filter(spark, tmp_path):
    """Review-pass fixes: (a) curating an already-scored corpus must
    not crash on duplicate LM columns — stale scores are replaced;
    (b) --save-lm-artifact trains on the text that SHIPS: with
    --max-avg-nll the dropped junk must not contaminate the model."""
    import pyspark.sql.functions as F

    from knowledgegraphgenerator_spark.__main__ import main
    from knowledgegraphgenerator_spark.operators.curation import (
        save_lm_artifact,
    )

    good = "the cat sat on the mat and the dog sat here too"
    junk = "zz qq ww ee rr tt yy uu ii oo pp"
    src = str(tmp_path / "src")
    spark.createDataFrame(
        [(1, good), (2, good + " again"), (3, junk)],
        "doc_id long, text string",
    ).write.mode("overwrite").parquet(src)

    out1 = str(tmp_path / "out1")
    assert main(["curate", "--input", src, "--output", out1,
                 "--lm-score"], spark=spark) == 0
    scored = spark.read.parquet(out1)
    assert "avg_nll_i4" in scored.columns

    # (a) re-curate the scored output with a filter — used to raise
    # AnalysisException on duplicate n_pairs/nll_i4/avg_nll_i4
    cut = int(
        scored.orderBy("avg_nll_i4").collect()[1]["avg_nll_i4"]
    )
    out2 = str(tmp_path / "out2")
    model = str(tmp_path / "model")
    assert main(["curate", "--input", out1, "--output", out2,
                 "--max-avg-nll", str(cut),
                 "--save-lm-artifact", model], spark=spark) == 0
    kept = spark.read.parquet(out2)
    ids = {r["doc_id"] for r in kept.collect()}
    assert 3 not in ids and len(ids) == 2
    assert kept.schema["avg_nll_i4"].dataType.typeName() == "long"

    # (b) the persisted model equals one trained on the SURVIVORS only
    expect_model = str(tmp_path / "model_expect")
    save_lm_artifact(
        kept.select("doc_id", "text"), expect_model
    )
    got = {
        tuple(r)
        for r in spark.read.parquet(model)
        .select("kind", "w1", "w2", "cnt").collect()
    }
    want = {
        tuple(r)
        for r in spark.read.parquet(expect_model)
        .select("kind", "w1", "w2", "cnt").collect()
    }
    assert got == want
    # junk bigrams are absent from the shipped model
    assert not any(k == "bigram" and w1 == "zz" for k, w1, _, _ in got)

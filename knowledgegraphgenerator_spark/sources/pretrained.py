"""S15: pretrained word-vector source (SURVEY.md §2.1).

The reference loads GoogleNews-style vectors with gensim
(``KeyedVectors.load_word2vec_format(binary=True)``,
/root/reference/synonym_generator/syn_gen_with_googlenews.py:35) and
takes top-3 most-similar per vocabulary word (:38-47), sorts the output
by best similarity descending and writes ``word,syn1/syn2/syn3`` rows
(:49-55).

Spark-first re-expression: vectors become a ``(word, vector)`` DataFrame
— the public word2vec TEXT format parses distributed via
``spark.read.text`` (header line skipped; no UDF, no driver loop); the
unsplittable BINARY format is parsed once on the driver (struct-unpacked,
size-gated) and should be converted to parquet for reuse. Similarity is
the same exact cosine top-k join used for trained models
(operators/word2vec.py:topk_synonyms_exact), so the 3 GB-vector scale
path is a broadcast-free aggregate join, not a gensim in-memory matrix.
"""

from __future__ import annotations

import struct

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from knowledgegraphgenerator_spark.config import W2V_TOP_N

_MAX_DRIVER_BINARY_BYTES = 256 * 1024 * 1024


def load_word2vec_text(spark: SparkSession, path: str) -> DataFrame:
    """word2vec TEXT format -> (word, vector array<double>).

    Format (public): first line ``<n_words> <dim>``, then one
    ``word v1 v2 ... vdim`` line per word. Fully distributed: text scan
    → split → slice; the header row is dropped by arity.
    """
    lines = spark.read.text(path).select(
        F.split(F.trim(F.col("value")), r"\s+").alias("parts")
    )
    return (
        lines.where(F.size("parts") > 2)  # header has exactly 2 fields
        .select(
            F.element_at("parts", 1).alias("word"),
            F.expr(
                "transform(slice(parts, 2, size(parts) - 1),"
                " x -> cast(x AS double))"
            ).alias("vector"),
        )
        .where(~F.exists("vector", lambda v: v.isNull()))
    )


def load_word2vec_binary(spark: SparkSession, path: str) -> DataFrame:
    """word2vec BINARY format -> (word, vector array<double>).

    The binary format is a single unsplittable stream (word bytes up to
    ' ', then dim float32s), so it is parsed ONCE on the driver and
    size-gated; convert to parquet and reuse for anything big.
    """
    import os

    size = os.path.getsize(path)
    if size > _MAX_DRIVER_BINARY_BYTES:
        raise ValueError(
            f"binary vector file is {size} bytes; convert to parquet or "
            "text format for distributed parsing (the binary format is "
            "unsplittable)"
        )
    rows: list[tuple[str, list[float]]] = []
    with open(path, "rb") as f:
        header = f.readline().split()
        n_words, dim = int(header[0]), int(header[1])
        vec_bytes = 4 * dim
        for _ in range(n_words):
            word_bytes = bytearray()
            while True:
                ch = f.read(1)
                if ch == b" " or ch == b"":
                    break
                if ch != b"\n":
                    word_bytes += ch
            vec = struct.unpack(f"<{dim}f", f.read(vec_bytes))
            rows.append((word_bytes.decode("utf-8", errors="replace"),
                         [float(x) for x in vec]))
    return spark.createDataFrame(rows, "word string, vector array<double>")


def topk_from_vector_table(
    vectors: DataFrame, vocabulary: list[str], k: int = W2V_TOP_N
) -> DataFrame:
    """(word, vector) table × vocab -> top-k cosine neighbors per vocab
    word: (word, synonym, similarity, rnk). Same join shape as
    operators/word2vec.py:topk_synonyms_exact — posexplode + hash-agg
    dot products, JVM-only."""
    spark = vectors.sparkSession
    e = vectors.select(
        "word", F.posexplode("vector").alias("pos", "v")
    )
    norms = e.groupBy("word").agg(
        F.sqrt(F.sum(F.col("v") * F.col("v"))).alias("nrm")
    )
    vocab_df = spark.createDataFrame(
        [(w.lower(),) for w in vocabulary], "qword string"
    )
    q = e.join(vocab_df, e.word == vocab_df.qword, "semi").select(
        F.col("word").alias("qword"), "pos", F.col("v").alias("qv")
    )
    dots = (
        q.join(e, "pos")
        .where(F.col("word") != F.col("qword"))
        .groupBy("qword", "word")
        .agg(F.sum(F.col("qv") * F.col("v")).alias("dot"))
    )
    qn = norms.select(F.col("word").alias("qword"), F.col("nrm").alias("qn"))
    sims = (
        dots.join(qn, "qword").join(norms, "word")
        .withColumn("similarity", F.col("dot") / (F.col("qn") * F.col("nrm")))
    )
    w = Window.partitionBy("qword").orderBy(
        F.desc("similarity"), F.asc("word")
    )
    return (
        sims.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
        .select(
            F.col("qword").alias("word"),
            F.col("word").alias("synonym"),
            "similarity", "rnk",
        )
    )


def fetch_synonyms_pretrained(
    vectors: DataFrame, vocabulary: list[str], k: int = W2V_TOP_N
) -> list[tuple[str, str]]:
    """Reference output protocol (syn_gen_with_googlenews.py:38-55):
    per vocab word take top-k neighbors, order words by their BEST
    similarity descending, emit (word, 'syn1/syn2/...') rows for the
    generated_synonyms.csv feedback file (S10 consumes it)."""
    top = topk_from_vector_table(vectors, vocabulary, k)
    grouped = (
        top.groupBy("word")
        .agg(
            F.max("similarity").alias("best"),
            F.concat_ws(
                "/",
                F.expr(
                    "transform(sort_array(collect_list("
                    "struct(rnk, synonym))), x -> x.synonym)"
                ),
            ).alias("synonyms"),
        )
        .orderBy(F.desc("best"), F.asc("word"))
    )
    return [(r["word"], r["synonyms"]) for r in grouped.collect()]

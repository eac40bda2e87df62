"""Mention detection / term assignment (J1 in SURVEY.md §2.5).

Semantically a broadcast theta-join (substring containment with priority
masking) between documents and the ranked term dictionary — not
expressible as an equi-join, so it runs as one fused Arrow pass:

  * the dictionary (corpus-derived, vocabulary-bounded) is broadcast once
    via ``SparkContext.broadcast``; each executor materializes a
    ``RankedDictionary`` (token inverted index + compiled-regex cache)
    lazily on first batch and reuses it for every subsequent batch;
  * per document the matcher runs the reference's greedy masked scan
    (core/matching.py) but only over terms whose lead token occurs in the
    document — a superset of possible ``\\b``-matches, so masking
    semantics are exactly preserved while the scan drops from O(|dict|)
    to O(doc tokens) per document;
  * ordering (O1) and the substring filter are applied in the same pass,
    so the stage output is final (doc_id, question, terms, tags) — no
    further shuffle.

Scale fallback (documented, not needed at current dictionary sizes): if
the dictionary outgrows broadcast, switch to token-block + verify — explode
doc tokens, equi-join on the term lead token, re-verify the full match and
replay masking per doc in a grouped applyInPandas.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from knowledgegraphgenerator_spark.core.matching import (
    RankedDictionary,
    assign_terms,
)

_ONTOLOGY_SCHEMA = (
    "doc_id long, question string, terms array<string>, tags array<string>"
)


def link_terms(
    df: DataFrame,
    dictionary: RankedDictionary,
    id_col: str = "doc_id",
    raw_col: str = "question",
    norm_col: str = "norm_text",
) -> DataFrame:
    """(doc_id, question, norm_text) -> (doc_id, question, terms, tags).

    Reference: GramBasedGenerator.generate_graph per-question loop,
    /root/reference/strategy/NGramStrategy.py:60-108.
    """
    spark = df.sparkSession
    payload = (
        dictionary.phrases,
        dictionary.unigrams,
        dictionary.verbs,
        dictionary.stop_tokens,
    )
    bc = spark.sparkContext.broadcast(payload)

    src = df.select(
        F.col(id_col).alias("doc_id"),
        F.col(raw_col).alias("question"),
        F.col(norm_col).alias("norm"),
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        phrases, unigrams, verbs, stop = bc.value
        matcher = RankedDictionary(phrases, unigrams, verbs, stop)
        for pdf in batches:
            terms_col: list[list[str]] = []
            tags_col: list[list[str]] = []
            for raw, norm in zip(pdf["question"], pdf["norm"]):
                terms, tags = assign_terms(norm or "", raw or "", matcher)
                terms_col.append(terms)
                tags_col.append(tags)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "question": pdf["question"],
                    "terms": terms_col,
                    "tags": tags_col,
                }
            )

    return src.mapInPandas(gen, schema=_ONTOLOGY_SCHEMA)

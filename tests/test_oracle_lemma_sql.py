"""The generated SQL lemma/classifier expressions == the Python spec.

The kg_* oracles are exactly equal to the sequential reference on the
driver corpus, but that only exercises the corpus VOCABULARY; these
property tests evaluate the generated noun/verb-lemma SQL (oracles_kg)
in DuckDB over arbitrary lowercase words and compare against the Python
functions, so a latent translation bug can't hide behind a small vocab.
"""

from __future__ import annotations

import duckdb
from hypothesis import given, settings
from hypothesis import strategies as st

from knowledgegraphgenerator_spark.core.lemmatize import noun_lemma, verb_lemma
from knowledgegraphgenerator_spark.oracles_kg import (
    _noun_lemma_sql,
    _verb_lemma_sql,
)

# lowercase \w-only words, biased toward inflection-looking suffixes
word_strategy = st.one_of(
    st.from_regex(r"[a-z]{1,10}", fullmatch=True),
    st.from_regex(r"[a-z]{2,8}(s|es|ses|ies|ives|ves|ches|shes|xes|zes)",
                  fullmatch=True),
    st.from_regex(r"[a-z]{2,8}(ing|ed|eed|ied)", fullmatch=True),
    st.sampled_from([
        "banking", "timings", "us", "statuses", "children", "wives",
        "classes", "address", "is", "bus", "running", "stopped",
        "made", "uses", "goes", "dies", "fees", "ss", "a", "transferred",
    ]),
)


def _sql_eval(expr_builder, words: list[str]) -> list[str]:
    con = duckdb.connect()
    vals = ", ".join("('" + w.replace("'", "''") + "')" for w in words)
    rows = con.sql(
        f"SELECT {expr_builder('w')} FROM (VALUES {vals}) t(w)"
    ).fetchall()
    return [r[0] for r in rows]


@given(st.lists(word_strategy, min_size=1, max_size=40))
@settings(max_examples=60, deadline=None)
def test_noun_lemma_sql_matches_python(words):
    got = _sql_eval(_noun_lemma_sql, words)
    assert got == [noun_lemma(w) for w in words], list(
        (w, g, noun_lemma(w)) for w, g in zip(words, got) if g != noun_lemma(w)
    )


@given(st.lists(word_strategy, min_size=1, max_size=40))
@settings(max_examples=60, deadline=None)
def test_verb_lemma_sql_matches_python(words):
    got = _sql_eval(_verb_lemma_sql, words)
    assert got == [verb_lemma(w) for w in words], list(
        (w, g, verb_lemma(w)) for w, g in zip(words, got) if g != verb_lemma(w)
    )

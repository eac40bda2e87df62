"""Property tests (SURVEY.md §5.2 item 3), pure Python — no Spark.

1. The token-subsequence matcher with adjacency-pair candidate blocking
   (core/matching.assign_terms) is EQUIVALENT to the reference's literal
   per-term ``\\b term \\b`` regex scan (tests/ref_impl generate_graph
   inner loop) on randomized corpora over the chunker's output space.
2. Structural invariants of the assignment: terms sorted ascending by
   merged corpus count, root appended last, no term is a substring of
   another, tags have at most one element.
"""

from __future__ import annotations

import re
from collections import Counter

from hypothesis import given, settings
from hypothesis import strategies as st

from knowledgegraphgenerator_spark.config import BOT_NAME, MASK_TOKEN
from knowledgegraphgenerator_spark.core.lemmatize import noun_lemma
from knowledgegraphgenerator_spark.core.matching import (
    RankedDictionary,
    assign_terms,
)
from knowledgegraphgenerator_spark.core.stopwords import get_stop_words
from knowledgegraphgenerator_spark.core.textnorm import normalize_text
from tests.ref_impl.pipeline import find_all_phrases

WORDS = [
    "neft", "service", "card", "account", "balance", "transfer", "bank",
    "mobile", "app", "statement", "rate", "fee", "atm", "branch", "wire",
    "deposit", "loan", "limit", "cycle", "otp", "e", "x",
]

corpus_strategy = st.lists(
    st.lists(st.sampled_from(WORDS), min_size=2, max_size=12).map(" ".join),
    min_size=5,
    max_size=25,
)


def _reference_assign(norm: str, dictionary: RankedDictionary):
    """Literal reference inner loop (NGramStrategy.py:60-105): per-term
    compiled regex over the lemmatized doc, masking via re.sub."""
    doc = " ".join(noun_lemma(t) for t in norm.split())
    terms, tag = [], ""
    for section in (dictionary.phrases, dictionary.unigrams):
        for term, cnt in section:
            if cnt == 1:
                break
            if term in dictionary.stop_tokens:
                continue
            regex = re.compile("\\b" + term + "\\b")
            if re.findall(regex, doc):
                doc = re.sub(regex, MASK_TOKEN, doc)
                terms.append(term)
    for term, cnt in dictionary.verbs:
        if cnt == 1:
            break
        if re.findall(re.compile("\\b" + term + "\\b"), doc):
            tag = term
    return terms, tag


def _dictionary_for(corpus: list[str]) -> RankedDictionary:
    stops = get_stop_words("en")
    norm = [normalize_text(q) for q in corpus]
    p, u, v = find_all_phrases(norm, stops)
    return RankedDictionary(
        p.most_common(), u.most_common(), v.most_common(), stops
    )


@given(corpus_strategy)
@settings(max_examples=60, deadline=None)
def test_token_matcher_equals_regex_matcher(corpus):
    d = _dictionary_for(corpus)
    for q in corpus:
        norm = normalize_text(q)
        got_terms, got_tags = assign_terms(norm, q, d)
        ref_terms, ref_tag = _reference_assign(norm, d)
        # compare pre-sort match sets AND post-sort output: rebuild the
        # reference's final ordering for exact comparison
        from knowledgegraphgenerator_spark.core.matching import (
            filter_substrings,
            single_word_tag,
        )

        if not (ref_terms or ref_tag):
            ref_tag = single_word_tag(q, d.stop_tokens)
        expected = sorted(
            filter_substrings(ref_terms), key=lambda t: d.merged_count[t]
        ) + [BOT_NAME]
        assert got_terms == expected, (q, got_terms, expected)
        assert got_tags == ([ref_tag] if ref_tag else [])


@given(corpus_strategy)
@settings(max_examples=40, deadline=None)
def test_assignment_invariants(corpus):
    d = _dictionary_for(corpus)
    for q in corpus:
        terms, tags = assign_terms(normalize_text(q), q, d)
        assert terms[-1] == BOT_NAME
        body = terms[:-1]
        counts = [d.merged_count[t] for t in body]
        assert counts == sorted(counts)  # ascending by merged count
        assert len(tags) <= 1
        for t in body:
            assert not any(t != o and t in o for o in body)


def test_counter_tie_order_matches_first_seen():
    """most_common insertion-order ties == (count desc, first_seen asc)."""
    items = ["b c", "a b", "b c", "a b", "x y", "x y"]
    c = Counter(items)
    by_most_common = [t for t, _ in c.most_common()]
    first_seen = {}
    for i, t in enumerate(items):
        first_seen.setdefault(t, i)
    by_key = sorted(c, key=lambda t: (-c[t], first_seen[t]))
    assert by_most_common == by_key


def _blocked_candidates(dictionary: RankedDictionary, norm: str):
    """Emulate operators/linking.link_terms_blocked candidate generation:
    per section in order, terms whose lead token (single-token) or lead
    adjacent pair (multi-token) occurs in the doc, ranked by section then
    most_common position — verbs UNfiltered (cnt-1 entries ride along
    for the merged-count key, as in _dictionary_df)."""
    doc = [noun_lemma(t) for t in norm.split()]
    toks = set(doc)
    pairs = {(doc[i], doc[i + 1]) for i in range(len(doc) - 1)}
    out = []
    for sec, section in enumerate(
        (dictionary.phrases, dictionary.unigrams, dictionary.verbs)
    ):
        for term, cnt in section:  # already in most_common order
            t = term.split(" ")
            hit = (t[0], t[1]) in pairs if len(t) >= 2 else t[0] in toks
            if hit:
                out.append((sec, term, cnt))
    return doc, out


@given(corpus_strategy)
@settings(max_examples=40, deadline=None)
def test_candidate_replay_equals_full_matcher(corpus):
    """The blocked-path kernel (assign_terms_from_candidates over
    lead-token/pair-blocked candidates) is pointwise equal to the
    broadcast matcher — the pure-Python property behind the Spark
    differential in tests/test_linking_blocked.py."""
    from knowledgegraphgenerator_spark.core.matching import (
        assign_terms_from_candidates,
    )

    dictionary = _dictionary_for(corpus)
    for raw in corpus:
        norm = normalize_text(raw)
        expected = assign_terms(norm, raw, dictionary)
        doc, cands = _blocked_candidates(dictionary, norm)
        got = assign_terms_from_candidates(
            doc, raw, cands, dictionary.stop_tokens
        )
        assert got == expected, (raw, got, expected)


@given(corpus_strategy)
@settings(max_examples=60, deadline=None)
def test_indexed_spans_equal_linear_spans(corpus):
    """_find_spans_indexed == _find_spans for every (doc, term) pair the
    dictionaries produce — the indexed fast path must preserve the exact
    non-overlapping left-to-right re.sub semantics."""
    from knowledgegraphgenerator_spark.core.matching import (
        _find_spans,
        _find_spans_indexed,
        _token_index,
    )

    dictionary = _dictionary_for(corpus)
    for raw in corpus:
        doc = [noun_lemma(t) for t in normalize_text(raw).split()]
        idx = _token_index(doc)
        for section in (dictionary.phrases, dictionary.unigrams,
                        dictionary.verbs):
            for term, _cnt in section:
                toks = term.split(" ")
                assert _find_spans_indexed(doc, idx, toks) == _find_spans(
                    doc, toks
                ), (doc, toks)

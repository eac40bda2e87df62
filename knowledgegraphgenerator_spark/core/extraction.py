"""Per-document phrase/unigram/verb feature extraction (shared spec).

Pure-Python mirror of the reference's per-question extraction
(/root/reference/strategy/phrase_finder.py:53-79), shared by the Spark
Arrow UDFs and the sequential oracle so both sides compute identical
features:

  1. noun chunks of the normalized sentence (chunker stand-in, see
     core/chunker.py) — reference: spaCy noun_chunks, phrase_finder.py:54;
  2. each chunk's text is lemmatized token-wise (phrase_finder.py:58),
     empty/stop tokens dropped (phrase_finder.py:59);
  3. unigrams = surviving tokens with len > 1 (phrase_finder.py:60,47-51);
  4. per chunk, trigrams are emitted before bigrams (phrase_finder.py:61-62
     — this sets Counter insertion order, SURVEY.md Appendix A.3), each
     gram space-joined and kept unless the gram tuple is a stop word;
  5. verbs = lemma tokens of verb spans, stop/len>1 filtered
     (phrase_finder.py:67-75).

Emission ORDER matters: corpus tie-breaking reproduces CPython Counter
insertion order via first-occurrence index (SURVEY.md Appendix A.4), so
each list preserves in-document emission order.
"""

from __future__ import annotations

from collections.abc import Iterable

from knowledgegraphgenerator_spark.core.chunker import noun_chunks, verb_span_lemmas
from knowledgegraphgenerator_spark.core.lemmatize import noun_lemma


def _ngrams(tokens: list[str], n: int) -> Iterable[tuple[str, ...]]:
    """nltk.util.ngrams-equivalent sliding windows (phrase_finder.py:78-79)."""
    return (tuple(tokens[i:i + n]) for i in range(len(tokens) - n + 1))


def extract_features(
    normalized_sentence: str, stop_tokens: frozenset[str]
) -> tuple[list[str], list[str], list[str]]:
    """-> (phrases, unigrams, verbs) for one normalized sentence.

    Reference: PhraseFinder.find_phrases, phrase_finder.py:53-76.
    """
    phrases: list[str] = []
    unigrams: list[str] = []
    for chunk in noun_chunks(normalized_sentence):
        lemmed = [noun_lemma(t) for t in chunk]
        tokens = [t for t in lemmed if t != "" and t not in stop_tokens]
        unigrams.extend(t for t in tokens if len(t) > 1)
        grams = list(_ngrams(tokens, 3))
        grams.extend(_ngrams(tokens, 2))
        for gram in grams:
            if gram not in stop_tokens:  # tuple-in-set, as in reference :63-65
                phrases.append(" ".join(gram))
    verbs = [
        v for v in verb_span_lemmas(normalized_sentence)
        if v not in stop_tokens and len(v) > 1
    ]
    return phrases, unigrams, verbs

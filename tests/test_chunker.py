"""Chunker stand-in spec tests (core/chunker.py)."""

from __future__ import annotations

from knowledgegraphgenerator_spark.core.chunker import (
    noun_chunks,
    token_class,
    verb_span_lemmas,
)
from knowledgegraphgenerator_spark.core.extraction import extract_features
from knowledgegraphgenerator_spark.core.stopwords import get_stop_words
from knowledgegraphgenerator_spark.core.textnorm import normalize_text


def test_token_classes():
    assert token_class("the") == "FUNC"
    assert token_class("transfer") == "VERB"
    assert token_class("transferred") == "VERB"
    assert token_class("quickly") == "ADV"
    assert token_class("neft") == "NOUNISH"


def test_noun_chunks_break_on_function_and_verb_words():
    s = normalize_text("How does the e-monies NEFT service differ from RGTS and EFT?")
    chunks = noun_chunks(s)
    assert ["e", "monies", "neft", "service"] in chunks
    assert ["rgts"] in chunks
    assert ["eft"] in chunks


def test_verb_spans_emit_lemmas():
    s = normalize_text("I transferred money and it was quickly refunded")
    verbs = verb_span_lemmas(s)
    assert "transfer" in verbs
    assert "refund" in verbs
    assert "quickly" in verbs  # ADV inside a verb span, reference keeps it


def test_extract_features_worked_example():
    """Canonical example (/root/reference/strategy/phrase_finder.py:82-90)."""
    stops = get_stop_words("en")
    s = normalize_text("How does the e-monies NEFT service differ from RGTS and EFT?")
    phrases, unigrams, verbs = extract_features(s, stops)
    assert "money neft service" in phrases  # lemmatized trigram
    assert "neft service" in phrases
    assert unigrams.count("neft") == 1
    assert "money" in unigrams and "service" in unigrams
    assert "e" not in unigrams  # len>1 filter on unigrams only
    assert any("e money" in p for p in phrases)  # grams keep 1-char tokens
    assert "differ" in verbs


def test_trigrams_before_bigrams_order():
    stops = frozenset()
    s = "alpha beta gamma delta"
    phrases, _, _ = extract_features(s, stops)
    tri = [p for p in phrases if len(p.split()) == 3]
    bi = [p for p in phrases if len(p.split()) == 2]
    # all trigrams of a chunk precede its bigrams (phrase_finder.py:61-62)
    assert phrases.index(tri[0]) < phrases.index(bi[0])

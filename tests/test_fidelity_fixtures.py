"""Fidelity fixtures vs the TRUE reference extractors (VERDICT r1 #4).

The engine's chunker/lemmatizer are pinned stand-in specs shared with the
sequential test oracle, so golden P/R=1.0 proves distributed==sequential
but not fidelity to the reference's real extractors (spaCy en_core_web_sm
noun_chunks + NLTK WordNetLemmatizer — neither installable here). These
fixtures close that loop as far as the sandbox allows: expected values
are HAND-DERIVED from public WordNet data files (noun.exc + morphy
detachment rules + min-length selection) and canonical spaCy noun_chunks
behavior — NOT from any code shared with the engine — so they can detect
stand-in drift the shared-spec goldens cannot.

The divergence set is pinned too: a fixed, documented list, so any NEW
divergence fails the suite. Four of the seven lemma divergences
(banking/timing/timings/us) are deliberate: the stand-in follows the
reference's own english_edit override map
(/root/reference/analyzer/kg_export/language/Lemmatize.py:84), which the
reference's MAIN path (Lemmatize.py:86-89, pure WordNetLemmatizer)
ignores — the reference ships both behaviors; the spec pins the curated
one. The remaining three (analyses/crises/data) are dictionary-gate
casualties: morphy validates candidates against the WordNet lexicon,
which the sandbox stand-in does not have.
"""

from __future__ import annotations

from knowledgegraphgenerator_spark.core.chunker import (
    FUNCTION_WORDS,
    noun_chunks,
)
from knowledgegraphgenerator_spark.core.lemmatize import noun_lemma

# word -> WordNetLemmatizer().lemmatize(word) (pos='n' default), derived
# from public WordNet 3.x data: noun.exc entries (children/child,
# feet/foot, monies/money, ...), detachment rules (s->'', ses->s, ves->f,
# xes->x, zes->z, ches->ch, shes->sh, ies->y) validated against the noun
# lexicon, min-length candidate selection (NLTK lemmatize()).
WORDNET_NOUN_LEMMAS: dict[str, str] = {
    # plain s-detachment
    "services": "service", "accounts": "account", "banks": "bank",
    "charges": "charge", "fees": "fee", "questions": "question",
    "answers": "answer", "customers": "customer", "payments": "payment",
    "transfers": "transfer", "limits": "limit", "cards": "card",
    "loans": "loan", "rates": "rate", "details": "detail",
    "numbers": "number", "offices": "office", "notices": "notice",
    # ches/shes/xes/ses
    "branches": "branch", "batches": "batch", "matches": "match",
    "wishes": "wish", "taxes": "tax", "boxes": "box", "buses": "bus",
    "statuses": "status", "viruses": "virus",
    # ies -> y
    "countries": "country", "currencies": "currency",
    "policies": "policy", "companies": "company",
    "facilities": "facility", "activities": "activity",
    # ves -> f / noun.exc
    "wives": "wife", "knives": "knife", "leaves": "leaf",
    # noun.exc irregulars
    "children": "child", "men": "man", "women": "woman", "feet": "foot",
    "teeth": "tooth", "geese": "goose", "mice": "mouse",
    "people": "people", "monies": "money", "criteria": "criterion",
    "indices": "index",
    # keep-s endings / not nouns-with-s
    "address": "address", "business": "business", "class": "class",
    "status": "status", "bonus": "bonus",
    # non-plural content words pass through at pos='n'
    "considered": "considered", "running": "running",
}

# word -> (true WordNet output, pinned stand-in output). Fixed list: a
# divergence OUTSIDE this table is a regression.
KNOWN_LEMMA_DIVERGENCES: dict[str, tuple[str, str]] = {
    # dictionary-gate casualties (morphy validates against the lexicon)
    "analyses": ("analysis", "analys"),
    "crises": ("crisis", "cris"),
    "data": ("datum", "data"),
    # reference english_edit override map, pinned deliberately
    # (Lemmatize.py:84; 'us'->'u' is the main path's actual output
    # because the letter 'u' is a WordNet noun)
    "us": ("u", "us"),
    "banking": ("banking", "bank"),
    "timing": ("timing", "time"),
    "timings": ("timing", "time"),
}


def test_lemma_agreement_with_true_wordnet_outputs():
    for word, expected in WORDNET_NOUN_LEMMAS.items():
        assert noun_lemma(word) == expected, word


def test_lemma_divergences_are_exactly_the_pinned_set():
    for word, (wn, mine) in KNOWN_LEMMA_DIVERGENCES.items():
        got = noun_lemma(word)
        assert got == mine, (word, got)
        assert got != wn, (word, "divergence healed — move to agreement set")


def test_lemma_fidelity_rate():
    """>= 85% exact agreement with true WordNet outputs across the whole
    fixture vocabulary (54 agree / 7 pinned divergences today)."""
    total = len(WORDNET_NOUN_LEMMAS) + len(KNOWN_LEMMA_DIVERGENCES)
    agree = sum(
        1 for w, e in WORDNET_NOUN_LEMMAS.items() if noun_lemma(w) == e
    )
    assert agree / total >= 0.85


# sentence -> spaCy en_core_web_sm noun_chunks (canonical, publicly
# documented behavior), compared on CONTENT tokens (function words
# stripped) because the stand-in chunker excludes determiners/pronouns
# that spaCy includes and the downstream extraction stop-filters anyway.
SPACY_CHUNK_FIXTURES: list[tuple[str, list[list[str]]]] = [
    (
        "i want to transfer money to my savings account",
        [["i"], ["money"], ["my", "savings", "account"]],
    ),
    (
        "what documents do i need to open a new account",
        [["what", "documents"], ["i"], ["a", "new", "account"]],
    ),
]


def _content(chunks: list[list[str]]) -> list[tuple[str, ...]]:
    out = []
    for c in chunks:
        kept = tuple(t for t in c if t not in FUNCTION_WORDS)
        if kept:
            out.append(kept)
    return out


def test_chunker_content_matches_spacy_on_domain_sentences():
    for sentence, spacy_chunks in SPACY_CHUNK_FIXTURES:
        expected = _content(spacy_chunks)
        got = _content(noun_chunks(sentence))
        assert got == expected, (sentence, got, expected)


def test_chunker_noun_verb_ambiguity_is_pinned():
    """'login' is both a noun and a verb; spaCy's tagger resolves it as
    the head noun of 'my online banking login', while the pinned
    closed-lexicon spec classes it VERB (it is in VERB_LEXICON) and ends
    the chunk at 'banking'. Pinned so a drift is loud."""
    got = _content(
        noun_chunks("how can i reset the password for my online banking login")
    )
    assert got == [("password",), ("online", "banking")]


def test_chunker_known_lexicon_gap_is_pinned():
    """'jumps' is outside the pinned verb lexicon, so the stand-in keeps
    it inside the noun chunk where spaCy ends the chunk at 'fox'. Pinned
    as the documented open-lexicon gap (extending VERB_LEXICON is a
    CHUNKER_VERSION bump)."""
    got = _content(noun_chunks("the quick brown fox jumps over the lazy dog"))
    assert got == [("quick", "brown", "fox", "jumps"), ("lazy", "dog")]

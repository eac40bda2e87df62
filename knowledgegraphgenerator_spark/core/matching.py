"""Greedy masked term assignment (J1 + O1 in SURVEY.md §2.5/§2.6).

Shared spec for per-document term/tag assignment against the ranked corpus
dictionary, mirroring /root/reference/strategy/NGramStrategy.py:49-113:

  * the lemmatized question is scanned against phrases, then unigrams, then
    verbs, each in most_common order (count desc, first-seen tie order);
  * a ``\\b term \\b`` regex match appends the term and MASKS the matched
    spans with ``~~~~`` so overlapping lower-priority terms cannot re-match
    (NGramStrategy.py:74,87); verbs never mask, the LAST matching verb in
    ranked order becomes the single tag (NGramStrategy.py:92-100);
  * loops break at count==1 (live only for verbs — phrases/unigrams are
    pre-thresholded higher, NGramStrategy.py:66-67,79-80,93-94);
  * if nothing matched, a single-content-word fallback tag is derived from
    the RAW question (NGramStrategy.py:36-47);
  * matched terms drop any term strictly contained in another matched term
    (NGramStrategy.py:21-33), are sorted ascending by merged corpus count
    (stable — ties keep match-discovery order) and the synthetic root is
    appended (NGramStrategy.py:105; BOT_NAME /root/reference/common.py:20).

Executed inside mapInPandas per Arrow batch with the dictionary broadcast
once per executor (the reference's O(Q×T) regex scan is cut to O(Q×k) by a
token inverted index: only terms whose tokens all occur in the document are
tried — a superset of possible matches, so masking semantics are intact).
"""

from __future__ import annotations

import re

from knowledgegraphgenerator_spark.config import BOT_NAME, MASK_TOKEN
from knowledgegraphgenerator_spark.core.lemmatize import noun_lemma


class RankedDictionary:
    """Corpus term dictionary in matching order.

    ``phrases``/``unigrams``/``verbs`` are [(term, count), ...] sorted by
    (count desc, first-seen asc) — Counter.most_common parity. merged_count
    reproduces dict.update overwrite priority phrases <- unigrams <- verbs
    (NGramStrategy.py:52-55).
    """

    __slots__ = ("phrases", "unigrams", "verbs", "merged_count",
                 "stop_tokens", "_token_index", "_regex_cache")

    def __init__(
        self,
        phrases: list[tuple[str, int]],
        unigrams: list[tuple[str, int]],
        verbs: list[tuple[str, int]],
        stop_tokens: frozenset[str],
    ) -> None:
        self.phrases = phrases
        self.unigrams = unigrams
        self.verbs = verbs
        self.stop_tokens = stop_tokens
        merged: dict[str, int] = {}
        merged.update(phrases)
        merged.update(unigrams)
        merged.update(verbs)
        self.merged_count = merged
        # token -> candidate positions per section, for the prefilter
        self._token_index: dict[str, dict[str, list[int]]] = {}
        for section, ranked in (("phrases", phrases),
                                ("unigrams", unigrams),
                                ("verbs", verbs)):
            idx: dict[str, list[int]] = {}
            for pos, (term, _) in enumerate(ranked):
                first = term.split(" ", 1)[0]
                idx.setdefault(first, []).append(pos)
            self._token_index[section] = idx
        self._regex_cache: dict[str, re.Pattern | None] = {}

    def _regex(self, term: str) -> re.Pattern | None:
        """Compile ``\\b term \\b`` exactly as the reference does — raw term,
        no escaping; terms that fail to compile are skipped
        (NGramStrategy.py:72-77)."""
        pat = self._regex_cache.get(term, False)
        if pat is False:
            try:
                pat = re.compile("\\b" + term + "\\b")
            except re.error:
                pat = None
            self._regex_cache[term] = pat
        return pat

    def candidates(self, section: str, doc_tokens: set[str]) -> list[int]:
        """Ranked positions of terms whose first token occurs in the doc —
        a superset of possible ``\\b``-matches, scanned in ranked order."""
        idx = self._token_index[section]
        positions: list[int] = []
        for tok in doc_tokens:
            positions.extend(idx.get(tok, ()))
        positions.sort()
        return positions


def filter_substrings(terms: list[str]) -> list[str]:
    """Drop any term strictly contained (substring) in another matched term
    (GramBasedGenerator._filter_substrings, NGramStrategy.py:21-33).
    Pure set semantics: removal is by membership over the original list."""
    return [
        t for t in terms
        if not any(t != o and t in o for o in terms)
    ]


def single_word_tag(raw_question: str, stop_tokens: frozenset[str]) -> str:
    """Fallback tag when no term/tag matched (NGramStrategy.py:36-47):
    strip, drop one trailing '?', lowercase-split minus stop words; if
    exactly one content word remains it becomes the tag."""
    ques = raw_question.strip()
    if ques.endswith("?"):
        ques = ques[:-1]
    words = set(ques.lower().split()).difference(stop_tokens)
    if len(words) == 1:
        return next(iter(words))
    return ""


def assign_terms(
    normalized_ques: str,
    raw_question: str,
    dictionary: RankedDictionary,
) -> tuple[list[str], list[str]]:
    """-> (terms ending in BOT_NAME, tags list of 0/1 elements)."""
    doc = " ".join(noun_lemma(t) for t in normalized_ques.split())
    doc_tokens = set(doc.split())
    stop = dictionary.stop_tokens
    terms: list[str] = []
    tag = ""

    for section, extra_cnt_gate in (("phrases", True), ("unigrams", False)):
        ranked = getattr(dictionary, section)
        for pos in dictionary.candidates(section, doc_tokens):
            term, cnt = ranked[pos]
            if cnt == 1:
                break
            if term in stop:
                continue
            pat = dictionary._regex(term)
            if pat is None:
                continue
            if pat.search(doc) and (cnt > 1 or not extra_cnt_gate):
                doc = pat.sub(MASK_TOKEN, doc)
                terms.append(term)

    for pos in dictionary.candidates("verbs", doc_tokens):
        term, cnt = dictionary.verbs[pos]
        if cnt == 1:
            break
        pat = dictionary._regex(term)
        if pat is not None and pat.search(doc):
            tag = term  # last ranked match wins (NGramStrategy.py:92-100)

    if not (terms or tag):
        tag = single_word_tag(raw_question, stop)

    terms = sorted(
        filter_substrings(terms),
        key=lambda t: dictionary.merged_count[t],
    ) + [BOT_NAME]
    tags = [tag] if tag else []
    return terms, tags

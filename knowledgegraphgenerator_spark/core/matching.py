"""Greedy masked term assignment (J1 + O1 in SURVEY.md §2.5/§2.6).

Shared spec for per-document term/tag assignment against the ranked corpus
dictionary, mirroring /root/reference/strategy/NGramStrategy.py:49-113:

  * the lemmatized question is scanned against phrases, then unigrams, then
    verbs, each in most_common order (count desc, first-seen tie order);
  * a matched term is appended and its matched spans are MASKED with
    ``~~~~`` so overlapping lower-priority terms cannot re-match
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

EXECUTION MODEL (the scale rewrite): the reference runs
``re.compile("\\b"+term+"\\b")`` per (question, term) — O(Q×|dict|) regex
scans (SURVEY.md §4.2). Dictionary terms here are space-joined ``\\w``-only
lemma tokens (the chunker emits nothing else), and on such terms the
``\\b term \\b`` regex over the lemmatized doc is EXACTLY a contiguous
token-subsequence match (``\\b`` can only bind at token boundaries) — the
golden tests in tests/test_pipeline_golden.py verify this equivalence
against the literal-regex sequential oracle. So the matcher:

  1. indexes the dictionary by its first one/two tokens;
  2. per document, collects candidates from the doc's token set and its
     ADJACENT TOKEN PAIRS — only terms whose first two tokens occur
     adjacently can possibly match, which keeps the candidate set
     O(doc length), not O(|dict|), even on degenerate small-vocab corpora;
  3. verifies/masks on the token list in ranked order (re.sub's
     non-overlapping left-to-right replacement, span collapsed to one
     mask token — string-identical to the reference's behavior).

Executed inside mapInPandas with the dictionary broadcast once per
executor. Fallback for dictionaries beyond broadcast reach: token-block
equi-join + grouped replay (operators/linking.py docstring).
"""

from __future__ import annotations

from knowledgegraphgenerator_spark.config import BOT_NAME, MASK_TOKEN
from knowledgegraphgenerator_spark.core.lemmatize import noun_lemma
from knowledgegraphgenerator_spark.core.textnorm import tokenize


class RankedDictionary:
    """Corpus term dictionary in matching order.

    ``phrases``/``unigrams``/``verbs`` are [(term, count), ...] sorted by
    (count desc, first-seen asc) — Counter.most_common parity.
    merged_count reproduces dict.update overwrite priority
    phrases <- unigrams <- verbs (NGramStrategy.py:52-55).
    """

    __slots__ = ("phrases", "unigrams", "verbs", "merged_count",
                 "stop_tokens", "_idx")

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
        # section -> (single-token index, adjacent-pair index); values are
        # (rank_pos, term_tokens, count) in ranked order
        self._idx: dict[str, tuple[dict, dict]] = {}
        for section, ranked in (("phrases", phrases),
                                ("unigrams", unigrams),
                                ("verbs", verbs)):
            idx1: dict[str, list] = {}
            idx2: dict[tuple[str, str], list] = {}
            for pos, (term, cnt) in enumerate(ranked):
                toks = term.split(" ")
                entry = (pos, toks, cnt, term)
                if len(toks) >= 2:
                    idx2.setdefault((toks[0], toks[1]), []).append(entry)
                else:
                    idx1.setdefault(toks[0], []).append(entry)
            self._idx[section] = (idx1, idx2)

    def candidates(self, section: str, doc_tokens: list[str]):
        """Ranked candidate entries whose first token (single-token terms)
        or first adjacent pair (multi-token terms) occurs in the doc —
        a superset of possible matches, scanned in ranked order."""
        idx1, idx2 = self._idx[section]
        out: list = []
        if idx1:
            for tok in set(doc_tokens):
                out.extend(idx1.get(tok, ()))
        if idx2:
            pairs = {
                (doc_tokens[i], doc_tokens[i + 1])
                for i in range(len(doc_tokens) - 1)
            }
            for pair in pairs:
                out.extend(idx2.get(pair, ()))
        out.sort(key=lambda e: e[0])
        return out


def _find_spans(doc: list[str], term_toks: list[str]) -> list[tuple[int, int]]:
    """Non-overlapping left-to-right occurrences of term_toks in doc —
    re.sub replacement-order parity."""
    n, m = len(doc), len(term_toks)
    spans: list[tuple[int, int]] = []
    i = 0
    first = term_toks[0]
    while i <= n - m:
        if doc[i] == first and doc[i:i + m] == term_toks:
            spans.append((i, i + m))
            i += m
        else:
            i += 1
    return spans


def _token_index(doc: list[str]) -> dict[str, list[int]]:
    """token -> ascending positions; rebuilt only after a mask mutates
    the doc (matches are rare relative to candidates)."""
    idx: dict[str, list[int]] = {}
    for i, t in enumerate(doc):
        idx.setdefault(t, []).append(i)
    return idx


def _find_spans_indexed(
    doc: list[str],
    idx: dict[str, list[int]],
    term_toks: list[str],
) -> list[tuple[int, int]]:
    """_find_spans over a first-token position index: identical output
    (same ascending scan, same non-overlap skip), O(occurrences of
    term_toks[0]) instead of O(|doc|) per candidate — the matcher's hot
    loop spends its time on candidates that FAIL, and they fail here in
    a handful of slice compares instead of a full-document scan."""
    m = len(term_toks)
    limit = len(doc) - m
    spans: list[tuple[int, int]] = []
    next_free = 0
    for i in idx.get(term_toks[0], ()):
        if i < next_free or i > limit:
            continue
        if doc[i:i + m] == term_toks:
            spans.append((i, i + m))
            next_free = i + m
    return spans


def _mask_spans(doc: list[str], spans: list[tuple[int, int]]) -> list[str]:
    """Replace each span with ONE mask token (re.sub of the span text with
    '~~~~' collapses it to one whitespace-delimited token)."""
    out: list[str] = []
    prev = 0
    for start, end in spans:
        out.extend(doc[prev:start])
        out.append(MASK_TOKEN)
        prev = end
    out.extend(doc[prev:])
    return out


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


def assign_terms_from_candidates(
    doc_tokens: list[str],
    raw_question: str,
    cands: list[tuple[int, str, int]],
    stop_tokens: frozenset[str],
) -> tuple[list[str], list[str]]:
    """Greedy masked replay over a PRE-SORTED candidate list — the
    per-document kernel of the token-block linking fallback
    (operators/linking.py:link_terms_blocked).

    ``cands``: (sec, term, cnt) sorted by (sec, -cnt, first_seen) where
    sec is 0=phrases / 1=unigrams / 2=verbs — exactly the scan order of
    the reference's three most_common loops (NGramStrategy.py:64-100).
    Semantics are identical to assign_terms with a full RankedDictionary:
    the blocked join guarantees every term that could match is present
    (lead token/pair blocking is a superset of \\b-matches), and cnt<2
    entries are skipped (break-at-1 ≡ filter on a count-descending scan)
    but still participate in the merged-count sort key (dict.update
    overwrite priority phrases <- unigrams <- verbs, NGramStrategy.py:52-55).
    """
    doc = doc_tokens
    idx = _token_index(doc)
    terms: list[str] = []
    tag = ""
    merged: dict[str, int] = {}
    for want_sec in (0, 1, 2):
        for sec, term, cnt in cands:
            if sec == want_sec:
                merged[term] = cnt

    for sec, term, cnt in cands:
        if cnt < 2:
            continue
        if sec < 2:
            if term in stop_tokens:
                continue
            toks = term.split(" ")
            spans = _find_spans_indexed(doc, idx, toks)
            if spans:
                doc = _mask_spans(doc, spans)
                idx = _token_index(doc)
                terms.append(term)
        elif _find_spans_indexed(doc, idx, term.split(" ")):
            tag = term  # last ranked match wins (NGramStrategy.py:92-100)

    if not (terms or tag):
        tag = single_word_tag(raw_question, stop_tokens)

    terms = sorted(
        filter_substrings(terms), key=lambda t: merged[t]
    ) + [BOT_NAME]
    return terms, ([tag] if tag else [])


def assign_terms(
    normalized_ques: str,
    raw_question: str,
    dictionary: RankedDictionary,
) -> tuple[list[str], list[str]]:
    """-> (terms ending in BOT_NAME, tags list of 0/1 elements)."""
    doc = [noun_lemma(t) for t in tokenize(normalized_ques)]
    orig_doc = doc
    idx = _token_index(doc)
    stop = dictionary.stop_tokens
    terms: list[str] = []
    tag = ""

    for section in ("phrases", "unigrams"):
        for _pos, toks, cnt, term in dictionary.candidates(section, orig_doc):
            if cnt == 1:
                break
            if term in stop:
                continue
            spans = _find_spans_indexed(doc, idx, toks)
            if spans:
                doc = _mask_spans(doc, spans)
                idx = _token_index(doc)
                terms.append(term)

    for _pos, toks, cnt, term in dictionary.candidates("verbs", orig_doc):
        if cnt == 1:
            break
        if _find_spans_indexed(doc, idx, toks):
            tag = term  # last ranked match wins (NGramStrategy.py:92-100)

    if not (terms or tag):
        tag = single_word_tag(raw_question, stop)

    terms = sorted(
        filter_substrings(terms),
        key=lambda t: dictionary.merged_count[t],
    ) + [BOT_NAME]
    tags = [tag] if tag else []
    return terms, tags
